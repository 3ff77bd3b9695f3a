"""HTTP serving endpoint (sr/serve.py): health, info, upscale round-trip."""

import http.client
import io
import json

import numpy as np
import pytest

import jax

from sr.models.registry import get_spec
from sr.serve import SRService, serve_background
from sr.utils.checkpoint import save_params
from sr.utils.config import SRConfig


def _png_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def espcn_params(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    cfg = SRConfig(model_name="ESPCN", num_channels=1, scale_factor=4,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    variables = model.init(jax.random.key(0),
                           jax.numpy.zeros((1, 8, 8, 1)), train=False)
    path = str(tmp / "ESPCN_params.npz")
    save_params(path, variables["params"], variables.get("batch_stats"))
    return path


def test_serve_model_mode_roundtrip(espcn_params):
    service = SRService(model_name="ESPCN", params=espcn_params,
                        scale_factor=4, num_channels=1, fused=False)
    httpd, port = serve_background(service)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        assert conn.getresponse().read() == b'{"ok": true}'
        conn.request("GET", "/info")
        r = conn.getresponse()
        assert b'"model_name": "ESPCN"' in r.read()

        img = np.random.default_rng(0).integers(
            0, 255, (16, 12, 3), np.uint8)
        conn.request("POST", "/upscale", body=_png_bytes(img),
                     headers={"Content-Type": "image/png"})
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        from PIL import Image

        out = np.asarray(Image.open(io.BytesIO(resp.read())))
        assert out.shape == (64, 48, 3)
    finally:
        httpd.shutdown()


def test_serve_artifact_mode_enforces_contract(tmp_path, espcn_params):
    from sr.export import export_predict, save_artifact

    exp = export_predict("ESPCN", espcn_params, scale_factor=4,
                         num_channels=1, dtype="float32", lr_size=8)
    art = str(tmp_path / "espcn.hloart")
    save_artifact(art, exp)
    service = SRService(artifact=art, scale_factor=4)
    httpd, port = serve_background(service)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        img8 = np.zeros((8, 8, 3), np.uint8)
        conn.request("POST", "/upscale", body=_png_bytes(img8))
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        from PIL import Image

        out = np.asarray(Image.open(io.BytesIO(resp.read())))
        assert out.shape == (32, 32, 3)

        # wrong size is a 400 with a helpful message, not a crash
        conn.request("POST", "/upscale",
                     body=_png_bytes(np.zeros((9, 9, 3), np.uint8)))
        resp = conn.getresponse()
        assert resp.status == 400
        assert b"artifact serves 8x8" in resp.read()
    finally:
        httpd.shutdown()


def test_serve_preupsample_artifact_applies_bicubic(tmp_path):
    """A pre-upsample artifact (SRCNN) accepts the LR image; the server
    owes it the bicubic pre-upsample (review finding: previously the raw
    LR pixels were fed straight in and nothing was upscaled)."""
    from sr.export import export_predict, save_artifact

    cfg = SRConfig(model_name="SRCNN", num_channels=1, scale_factor=4,
                   dtype="float32")
    model = get_spec("SRCNN").make_model(cfg)
    variables = model.init(jax.random.key(0),
                           jax.numpy.zeros((1, 16, 16, 1)), train=False)
    path = str(tmp_path / "SRCNN_params.npz")
    save_params(path, variables["params"], variables.get("batch_stats"))
    exp = export_predict("SRCNN", path, scale_factor=4, num_channels=1,
                         dtype="float32", lr_size=16)  # HR-size input
    art = str(tmp_path / "srcnn.hloart")
    save_artifact(art, exp)

    service = SRService(artifact=art, scale_factor=4)
    assert service.net_scale == 1
    httpd, port = serve_background(service)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        # client sends the 4x-smaller LR image
        lr = np.random.default_rng(0).integers(0, 255, (4, 4, 3), np.uint8)
        conn.request("POST", "/upscale", body=_png_bytes(lr))
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        import io as _io

        from PIL import Image

        out = np.asarray(Image.open(_io.BytesIO(resp.read())))
        assert out.shape == (16, 16, 3)  # upscaled, not same-size
    finally:
        httpd.shutdown()


def test_serve_bundle_multi_size(tmp_path, espcn_params):
    """ONE bundled artifact serves several image sizes (smallest-fitting
    bucket + pad + crop), embeds its scale, and rejects a contradicting
    --scale_factor (VERDICT r2 #8)."""
    from sr.export import export_bundle, save_bundle

    meta, exports = export_bundle(
        "ESPCN", espcn_params, scale_factor=4, num_channels=1,
        dtype="float32", lr_sizes=(8, 16))
    art = str(tmp_path / "espcn.srbundle")
    save_bundle(art, meta, exports)

    with pytest.raises(ValueError, match="contradicts"):
        SRService(artifact=art, scale_factor=2)

    service = SRService(artifact=art)  # no flag needed: scale embedded
    assert service.scale_factor == 4 and service.net_scale == 4
    httpd, port = serve_background(service)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        rng = np.random.default_rng(1)
        # exact-bucket AND between-bucket (padded) sizes, one artifact
        for in_shape, out_shape in (((8, 8), (32, 32)),
                                    ((12, 10), (48, 40)),
                                    ((16, 16), (64, 64))):
            img = rng.integers(0, 255, (*in_shape, 3), np.uint8)
            conn.request("POST", "/upscale", body=_png_bytes(img))
            resp = conn.getresponse()
            assert resp.status == 200, resp.read()
            import io as _io

            from PIL import Image

            out = np.asarray(Image.open(_io.BytesIO(resp.read())))
            assert out.shape == (*out_shape, 3)
        # beyond the largest bucket: helpful 400, not a crash
        conn.request("POST", "/upscale",
                     body=_png_bytes(np.zeros((20, 20, 3), np.uint8)))
        resp = conn.getresponse()
        assert resp.status == 400
        assert b"artifact serves" in resp.read()
    finally:
        httpd.shutdown()


def test_serve_artifact_chroma_matches_model_mode(tmp_path, espcn_params):
    """1-channel artifact serving now does the full chroma merge — the
    same image gives IDENTICAL bytes through artifact mode and model
    mode (ADVICE r2: artifact mode used to return grayscale)."""
    from sr.export import export_predict, save_artifact

    exp = export_predict("ESPCN", espcn_params, scale_factor=4,
                         num_channels=1, dtype="float32", lr_size=8)
    art = str(tmp_path / "espcn.hloart")
    save_artifact(art, exp)

    img = np.random.default_rng(2).integers(0, 255, (8, 8, 3), np.uint8)
    png = _png_bytes(img)
    art_service = SRService(artifact=art, scale_factor=4)
    model_service = SRService(model_name="ESPCN", params=espcn_params,
                              scale_factor=4, num_channels=1, fused=False)
    import io as _io

    from PIL import Image

    a = np.asarray(Image.open(_io.BytesIO(art_service.upscale_bytes(png))))
    m = np.asarray(Image.open(_io.BytesIO(model_service.upscale_bytes(png))))
    assert a.shape == m.shape == (32, 32, 3)
    # chroma present (not the old grayscale repeat) and equal to model
    # mode up to the u8 rounding wiggle between the artifact's f32 and
    # model mode's default bf16 compute (same conventions either side)
    assert not (a[..., 0] == a[..., 1]).all()
    assert np.abs(a.astype(int) - m.astype(int)).max() <= 1


def test_serve_micro_batching_and_metrics(tmp_path, espcn_params):
    """Concurrent same-bucket requests coalesce into fewer device
    dispatches (leader/follower micro-batching over the bundle's
    symbolic batch dim), outputs match the sequential path, and
    /metrics reports the counters."""
    import threading

    from sr.export import export_bundle, save_bundle

    meta, exports = export_bundle(
        "ESPCN", espcn_params, scale_factor=4, num_channels=1,
        dtype="float32", lr_sizes=(8,))
    art = str(tmp_path / "espcn_mb.srbundle")
    save_bundle(art, meta, exports)

    # generous linger so all threads join the leader's batch on a 1-CPU host
    service = SRService(artifact=art, micro_batch=True, linger_ms=300.0)
    httpd, port = serve_background(service)
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 255, (8, 8, 3), np.uint8) for _ in range(6)]

    # sequential reference through a second, non-batching service
    ref_service = SRService(artifact=art, micro_batch=False)
    refs = [ref_service.upscale_bytes(_png_bytes(im)) for im in imgs]

    results = [None] * len(imgs)

    def post(i):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/upscale", body=_png_bytes(imgs[i]))
        resp = conn.getresponse()
        results[i] = (resp.status, resp.read())
        conn.close()

    try:
        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(imgs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert all(r is not None and r[0] == 200 for r in results), results
        for (_, got), ref in zip(results, refs):
            assert got == ref  # byte-identical to the unbatched path
        assert service.batcher.dispatches < len(imgs), (
            service.batcher.dispatches)
        assert service.batcher.batched_requests >= 2

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/metrics")
        snap = json.loads(conn.getresponse().read())
        assert snap["requests_total"] == len(imgs)
        assert snap["errors_total"] == 0
        assert snap["device_dispatches"] == service.batcher.dispatches
        assert "latency_ms" in snap and snap["latency_ms"]["p50"] > 0
    finally:
        httpd.shutdown()
