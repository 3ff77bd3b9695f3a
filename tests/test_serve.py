"""HTTP serving endpoint (sr/serve.py): health, info, upscale round-trip."""

import http.client
import io
import json
import time

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


def test_serve_pyramid_level_default_flags(tmp_path):
    """LapSRN level serving under the SERVE DEFAULTS (fused=True):
    pyramid models have no fused tail, so --net_scale must serve the
    exact level graph, not 400 every /upscale (ADVICE r4 medium —
    the old guard rejected fused=True although it guarded nothing)."""
    cfg = SRConfig(model_name="LapSRN", num_channels=1, scale_factor=4,
                   dtype="float32")
    model = get_spec("LapSRN").make_model(cfg)
    variables = model.init(jax.random.key(0),
                           jax.numpy.zeros((1, 8, 8, 1)), train=False)
    path = str(tmp_path / "LapSRN_params.npz")
    save_params(path, variables["params"], variables.get("batch_stats"))

    # serve the x2 level of a x4-trained net with DEFAULT flags
    service = SRService(model_name="LapSRN", params=path,
                        scale_factor=2, num_channels=1, net_scale=4)
    httpd, port = serve_background(service)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        img = np.random.default_rng(0).integers(
            0, 255, (16, 12, 3), np.uint8)
        conn.request("POST", "/upscale", body=_png_bytes(img),
                     headers={"Content-Type": "image/png"})
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        from PIL import Image

        out = np.asarray(Image.open(io.BytesIO(resp.read())))
        assert out.shape == (32, 24, 3)
    finally:
        httpd.shutdown()

    # quantize + net_scale still refuses (int8 rewrites target the
    # final tail) — the guard narrowed, it didn't vanish
    q = SRService(model_name="LapSRN", params=path, scale_factor=2,
                  num_channels=1, net_scale=4, quantize="static")
    httpd, port = serve_background(q)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        img = np.random.default_rng(0).integers(
            0, 255, (16, 12, 3), np.uint8)
        conn.request("POST", "/upscale", body=_png_bytes(img),
                     headers={"Content-Type": "image/png"})
        resp = conn.getresponse()
        assert resp.status == 400
        assert b"quantize" in resp.read()
    finally:
        httpd.shutdown()


def test_serve_model_mode_quantize_static(espcn_params):
    """--quantize static end-to-end over HTTP: first request calibrates,
    output stays a valid image close to the f32 serve."""
    f32 = SRService(model_name="ESPCN", params=espcn_params,
                    scale_factor=4, num_channels=1, fused=False)
    q = SRService(model_name="ESPCN", params=espcn_params,
                  scale_factor=4, num_channels=1, fused=False,
                  quantize="static")
    img = np.random.default_rng(1).integers(0, 255, (16, 12, 3), np.uint8)
    outs = {}
    for name, svc in [("f32", f32), ("q", q)]:
        httpd, port = serve_background(svc)
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                              timeout=60)
            for _ in range(2):  # second request reuses the calibration
                conn.request("POST", "/upscale", body=_png_bytes(img),
                             headers={"Content-Type": "image/png"})
                resp = conn.getresponse()
                assert resp.status == 200, resp.read()
                body = resp.read()
            from PIL import Image

            outs[name] = np.asarray(Image.open(io.BytesIO(body)))
        finally:
            httpd.shutdown()
    assert outs["q"].shape == outs["f32"].shape == (64, 48, 3)
    assert np.abs(outs["q"].astype(int) - outs["f32"].astype(int)).max() <= 8


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


def test_serve_preupsample_bundle_lr_wins_bucket_coincidence(tmp_path):
    """A pre-upsample bundle whose buckets include 64 AND 256 must treat
    a 64px request as an LR image (bicubic to 256 then SR), not as
    'already pre-upscaled' just because 64 is also a bucket size
    (review finding: the coincidence silently skipped SR at exactly the
    advertised max LR size)."""
    from sr.export import export_bundle, save_bundle

    cfg = SRConfig(model_name="SRCNN", num_channels=1, scale_factor=4,
                   dtype="float32")
    model = get_spec("SRCNN").make_model(cfg)
    variables = model.init(jax.random.key(0),
                           jax.numpy.zeros((1, 16, 16, 1)), train=False)
    path = str(tmp_path / "SRCNN_params.npz")
    save_params(path, variables["params"], variables.get("batch_stats"))
    meta, exports = export_bundle("SRCNN", path, scale_factor=4,
                                  num_channels=1, dtype="float32",
                                  lr_sizes=(64, 256))
    art = str(tmp_path / "srcnn.srbundle")
    save_bundle(art, meta, exports)

    service = SRService(artifact=art)
    rng = np.random.default_rng(1)
    # 64x64 coincides with a bucket, but 64*4=256 fits -> LR wins
    out = service._serve_artifact(
        rng.integers(0, 255, (64, 64, 3), np.uint8))
    assert out.shape == (256, 256, 3)
    # 256x256: too big to be an LR input (1024 > max bucket), exactly
    # bucket-sized -> accepted as already pre-upscaled
    out = service._serve_artifact(
        rng.integers(0, 255, (256, 256, 3), np.uint8))
    assert out.shape == (256, 256, 3)


def test_micro_batcher_chunk_failure_isolated():
    """A failure in a LATER chunk of a split micro-batch must not 400
    the requests whose chunk already completed (review finding)."""
    import threading

    from sr.serve import MicroBatcher

    mb = MicroBatcher(max_batch=2, linger_s=0.25)
    calls = []

    def fn(x):
        calls.append(x.shape[0])
        if len(calls) == 2:
            raise RuntimeError("chunk 2 boom")
        return x * 2.0

    results = {}

    def req(i):
        x = np.full((1, 2, 2, 1), float(i), np.float32)
        try:
            results[i] = mb.run("k", fn, x)
        except RuntimeError as e:
            results[i] = e

    threads = [threading.Thread(target=req, args=(i,)) for i in range(3)]
    threads[0].start()
    time.sleep(0.05)  # let the leader enqueue first
    for t in threads[1:]:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert calls == [2, 1]  # two chunks dispatched
    ok = [i for i, v in results.items() if isinstance(v, np.ndarray)]
    failed = [i for i, v in results.items() if isinstance(v, RuntimeError)]
    assert len(ok) == 2 and len(failed) == 1
    for i in ok:
        np.testing.assert_array_equal(results[i], np.full((1, 2, 2, 1),
                                                          2.0 * i))


def test_serve_model_mode_self_ensemble(espcn_params):
    """--self_ensemble serves the D4 ensemble; artifact mode rejects it."""
    service = SRService(model_name="ESPCN", params=espcn_params,
                        scale_factor=4, num_channels=1, fused=False,
                        self_ensemble=True)
    assert service.info().get("self_ensemble") is True
    img = np.random.default_rng(3).integers(0, 255, (16, 12, 3), np.uint8)
    from PIL import Image

    ens = np.asarray(
        Image.open(io.BytesIO(service.upscale_bytes(_png_bytes(img)))))
    assert ens.shape == (64, 48, 3)
    plain_service = SRService(model_name="ESPCN", params=espcn_params,
                              scale_factor=4, num_channels=1, fused=False)
    plain = np.asarray(
        Image.open(io.BytesIO(plain_service.upscale_bytes(_png_bytes(img)))))
    assert (ens != plain).any()  # a different (averaged) image


def test_serve_artifact_self_ensemble(tmp_path, espcn_params):
    """The '+' mode in artifact serving (VERDICT r3 next #4): an
    ensemble-baked bundle round-trips over HTTP and equals model-mode
    --self_ensemble; a plain artifact served with --self_ensemble
    (serve-time D4 wrap of the lowered program) matches the baked one."""
    from PIL import Image

    from sr.export import export_bundle, export_predict, save_artifact, \
        save_bundle

    img = np.random.default_rng(5).integers(0, 255, (8, 8, 3), np.uint8)
    png = _png_bytes(img)

    # model-mode reference (f32 so artifact/model compute dtypes match)
    model_svc = SRService(model_name="ESPCN", params=espcn_params,
                          scale_factor=4, num_channels=1, fused=False,
                          self_ensemble=True)
    ref = np.asarray(Image.open(io.BytesIO(model_svc.upscale_bytes(png))))

    # baked-in '+': exported program runs all 8 forwards
    meta, exports = export_bundle(
        "ESPCN", espcn_params, scale_factor=4, num_channels=1,
        dtype="float32", lr_sizes=(8,), self_ensemble=True)
    assert meta["self_ensemble"] is True
    baked = str(tmp_path / "espcn_plus.srbundle")
    save_bundle(baked, meta, exports)
    svc = SRService(artifact=baked)
    assert svc.info()["self_ensemble"] is True
    httpd, port = serve_background(svc)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/upscale", body=png)
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        baked_out = np.asarray(Image.open(io.BytesIO(resp.read())))
    finally:
        httpd.shutdown()
    assert baked_out.shape == ref.shape == (32, 32, 3)
    # model mode defaults to bf16 while the artifact is f32; the D4
    # average narrows the gap — allow one u8 step
    assert np.abs(baked_out.astype(int) - ref.astype(int)).max() <= 1

    # serve-time wrap: plain single artifact + --self_ensemble
    exp = export_predict("ESPCN", espcn_params, scale_factor=4,
                         num_channels=1, dtype="float32", lr_size=8)
    plain = str(tmp_path / "espcn_plain.hloart")
    save_artifact(plain, exp)
    svc2 = SRService(artifact=plain, scale_factor=4, self_ensemble=True)
    wrapped_out = np.asarray(
        Image.open(io.BytesIO(svc2.upscale_bytes(png))))
    # same math, but the baked program is one fused XLA trace while the
    # wrap reuses the single-forward program 8x — allow ULP->u8 wiggle
    assert np.abs(wrapped_out.astype(int) - baked_out.astype(int)).max() <= 1


def test_serve_overload_shedding(espcn_params):
    """Bounded serving under load (VERDICT r3 weak #3): max_inflight
    admission control sheds excess concurrent requests with 429, an
    oversized body gets 413, successful responses stay correct, the
    observed concurrency never exceeds the bound, and /metrics exposes
    shed_total/inflight."""
    import threading

    service = SRService(model_name="ESPCN", params=espcn_params,
                        scale_factor=4, num_channels=1, fused=False,
                        max_inflight=2)
    # deterministic overload: make each inference slow and track the
    # true concurrency through the admission gate
    orig = service.upscale_bytes
    peak = {"now": 0, "max": 0}
    peak_lock = threading.Lock()

    def slow_upscale(data):
        with peak_lock:
            peak["now"] += 1
            peak["max"] = max(peak["max"], peak["now"])
        try:
            time.sleep(0.4)
            return orig(data)
        finally:
            with peak_lock:
                peak["now"] -= 1

    service.upscale_bytes = slow_upscale
    httpd, port = serve_background(service)
    rng = np.random.default_rng(7)
    sizes = [(16, 12), (8, 8), (12, 16), (16, 16), (8, 12), (12, 8),
             (16, 8), (8, 16)]
    results = [None] * len(sizes)

    def post(i):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        img = rng.integers(0, 255, (*sizes[i], 3), np.uint8)
        conn.request("POST", "/upscale", body=_png_bytes(img))
        resp = conn.getresponse()
        results[i] = (resp.status, resp.read())
        conn.close()

    try:
        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(sizes))]
        for t in threads:
            t.start()

        # one hostile client: declares a >64MB body, sends ~1KB
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.putrequest("POST", "/upscale")
        conn.putheader("Content-Length", str(100 << 20))
        conn.endheaders()
        conn.send(b"x" * 1024)
        conn.sock.shutdown(1)  # half-close: server's drain sees EOF
        resp = conn.getresponse()
        assert resp.status == 413, resp.read()
        conn.close()

        for t in threads:
            t.join(timeout=120)
        statuses = [r[0] for r in results]
        ok = [i for i, s in enumerate(statuses) if s == 200]
        shed = [i for i, s in enumerate(statuses) if s == 429]
        assert len(ok) + len(shed) == len(sizes), statuses
        assert shed, "expected at least one 429 with 8 clients vs bound 2"
        assert ok, "expected at least one success under shedding"
        from PIL import Image

        for i in ok:
            out = np.asarray(Image.open(io.BytesIO(results[i][1])))
            assert out.shape == (sizes[i][0] * 4, sizes[i][1] * 4, 3)
        for i in shed:
            assert b"overloaded" in results[i][1]
        assert peak["max"] <= 2, peak  # the bound actually bounds

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/metrics")
        snap = json.loads(conn.getresponse().read())
        assert snap["shed_total"] == len(shed)
        assert snap["errors_total"] == 0
        assert snap["inflight"] == 0
        assert snap["latency_ms"]["p99"] > 0
        conn.request("GET", "/info")
        info = json.loads(conn.getresponse().read())
        assert info["limits"]["max_inflight"] == 2
        assert info["limits"]["max_body_bytes"] == 64 << 20
    finally:
        httpd.shutdown()


def test_micro_batcher_queue_bound():
    """A full per-bucket queue sheds with Overloaded instead of growing
    host memory without limit."""
    import threading

    from sr.serve import MicroBatcher, Overloaded

    mb = MicroBatcher(max_batch=8, linger_s=0.5, max_queue=2)
    release = threading.Event()

    def fn(x):
        release.wait(timeout=30)
        return x

    results = {}

    def req(i):
        x = np.full((1, 2, 2, 1), float(i), np.float32)
        try:
            results[i] = mb.run("k", fn, x)
        except Overloaded as e:
            results[i] = e

    t0 = threading.Thread(target=req, args=(0,))
    t0.start()
    time.sleep(0.05)  # leader enqueued, lingering
    t1 = threading.Thread(target=req, args=(1,))
    t1.start()
    time.sleep(0.05)
    # queue now holds 2 (== max_queue): the third is shed immediately
    req(2)
    assert isinstance(results[2], Overloaded)
    release.set()
    t0.join(timeout=30)
    t1.join(timeout=30)
    assert isinstance(results[0], np.ndarray)
    assert isinstance(results[1], np.ndarray)
    assert mb.queue_depth() == 0
