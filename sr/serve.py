"""Minimal production serving endpoint for trained SR models.

Wraps the two serving surfaces in one stdlib HTTP server:

  * model mode (``--model_name --params``): any input size — routes
    through :func:`sr.infer.upscale` (fast tails, halo tiling, chroma
    merge for 1-channel models);
  * artifact mode (``--artifact``): a pre-exported StableHLO artifact
    (sr/export.py) with its static input size — the shape contract is
    reported by ``GET /info`` and enforced per request (production
    bucketed-serving style; no model code needed).

Endpoints:
  GET  /healthz          -> {"ok": true}
  GET  /info             -> serving config (mode, model, input contract)
  POST /upscale          -> request body: PNG/JPEG bytes;
                            response: image/png of the upscaled image

Usage:
  python -m sr.serve --model_name EDSR --params EDSR_params.npz --port 8000
  python -m sr.serve --artifact edsr_x4.hloart --scale_factor 4
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class SRService:
    """The request-independent serving state (loaded once)."""

    def __init__(self, model_name=None, params=None, artifact=None,
                 scale_factor: int = 4, fused: bool = True,
                 num_channels: int | None = None):
        if (artifact is None) == (model_name is None):
            raise ValueError("pass either --artifact or --model_name+--params")
        self.mode = "artifact" if artifact else "model"
        self.scale_factor = scale_factor
        self.model_name = model_name
        self.fused = fused
        self.num_channels = num_channels
        self.params = params
        if artifact:
            from sr.export import load_artifact

            self._fn = load_artifact(artifact)
            aval = self._fn.exported.in_avals[0]
            out_aval = self._fn.exported.out_avals[0]
            self.in_shape = tuple(
                None if not isinstance(d, int) else d for d in aval.shape
            )
            # pre-upsample artifacts (SRCNN/VDSR/DRCN) map H×W → H×W;
            # the server then owes the client the bicubic pre-upsample
            self.net_scale = out_aval.shape[1] // aval.shape[1]
        else:
            if params is None:
                raise ValueError("--model_name needs --params")
            self.in_shape = (None, None, None, None)
            self.net_scale = None  # model mode: sr.infer handles conventions

    def info(self) -> dict:
        return {
            "mode": self.mode,
            "model_name": self.model_name,
            "scale_factor": self.scale_factor,
            "input_shape": list(self.in_shape),
        }

    def upscale_bytes(self, data: bytes) -> bytes:
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        if self.mode == "artifact":
            _, h, w, c = self.in_shape
            if self.net_scale == 1:
                # pre-upsample model: accept the LR image and apply the
                # bicubic pre-upsample it was trained on
                r = self.scale_factor
                if img.shape[:2] == (h // r, w // r):
                    from sr.data.native import resize_bicubic_u8

                    img = resize_bicubic_u8(img, (h, w))
                elif img.shape[:2] != (h, w):
                    raise ValueError(
                        f"pre-upsample artifact serves {h // r}x{w // r} LR "
                        f"(or already-upscaled {h}x{w}) inputs, got "
                        f"{img.shape[0]}x{img.shape[1]}"
                    )
            elif img.shape[0] != h or img.shape[1] != w:
                raise ValueError(
                    f"artifact serves {h}x{w} inputs, got "
                    f"{img.shape[0]}x{img.shape[1]} (export per bucket size, "
                    "or use model mode for arbitrary sizes)"
                )
            x = img.astype(np.float32)[None] / 255.0
            if c == 1:
                from sr.eval.metrics import rgb_to_ycbcr

                # 1-channel artifacts super-resolve the LUMA channel and
                # return grayscale; use model mode for the chroma merge
                x = np.asarray(rgb_to_ycbcr(x * 255.0))[..., :1] / 255.0
            sr = np.asarray(self._fn(x), np.float32)[0]
            out = np.clip(np.round(sr * 255.0), 0, 255).astype(np.uint8)
            if out.shape[-1] == 1:
                out = np.repeat(out, 3, axis=-1)
        else:
            from sr.infer import upscale

            out = upscale(img, self.model_name, self.params,
                          scale_factor=self.scale_factor,
                          num_channels=self.num_channels, fused=self.fused)
        buf = io.BytesIO()
        Image.fromarray(out).save(buf, format="PNG")
        return buf.getvalue()


def make_server(service: SRService, port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; port 0 = ephemeral (tests)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; JSONL logging happens upstream
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b'{"ok": true}', "application/json")
            elif self.path == "/info":
                self._send(200, json.dumps(service.info()).encode(),
                           "application/json")
            else:
                self._send(404, b'{"error": "not found"}', "application/json")

        def do_POST(self):
            if self.path != "/upscale":
                self._send(404, b'{"error": "not found"}', "application/json")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self._send(400, b'{"error": "bad Content-Length"}',
                           "application/json")
                return
            if n > 64 << 20:  # bound request size (decoded images are far larger)
                # drain the declared body first so the client sees the
                # 413 instead of a broken pipe mid-upload
                left = n
                while left > 0:
                    chunk = self.rfile.read(min(left, 1 << 20))
                    if not chunk:
                        break
                    left -= len(chunk)
                self._send(413, b'{"error": "payload too large"}',
                           "application/json")
                return
            data = self.rfile.read(n)
            try:
                png = service.upscale_bytes(data)
            except Exception as e:  # noqa: BLE001 — report, don't crash the server
                self._send(400, json.dumps({"error": str(e)}).encode(),
                           "application/json")
                return
            self._send(200, png, "image/png")

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def serve_background(service: SRService, port: int = 0):
    """Start the server on a daemon thread; returns (server, actual_port)."""
    httpd = make_server(service, port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, httpd.server_address[1]


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model_name", default=None)
    p.add_argument("--params", default=None)
    p.add_argument("--artifact", default=None)
    p.add_argument("--scale_factor", type=int, default=4)
    p.add_argument("--num_channels", type=int, default=None)
    p.add_argument("--no_fused", action="store_true",
                   help="serve the exact graph instead of the fast tail")
    p.add_argument("--port", type=int, default=8000)
    a = p.parse_args(argv)
    service = SRService(
        model_name=a.model_name, params=a.params, artifact=a.artifact,
        scale_factor=a.scale_factor, fused=not a.no_fused,
        num_channels=a.num_channels,
    )
    httpd = make_server(service, a.port)
    print(f"serving {service.info()} on :{httpd.server_address[1]}")
    httpd.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
