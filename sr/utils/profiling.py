"""Profiling + debugging hooks (SURVEY §5 tracing/observability rows).

The reference's only observability is a per-epoch loss print. Here:

  * :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard-loadable trace (open with xprof / tensorboard-profile);
  * :func:`op_profile` — per-op DEVICE time breakdown of a jitted fn
    (captures a trace, parses it, aggregates XLA op durations) — works
    through this environment's TPU relay, where interactive xprof
    doesn't;
  * :class:`StepTimer` — throughput meter reporting steps/s and
    megapixels/s (the BASELINE.json unit), relay-safe (syncs through a
    caller-provided scalar, not block_until_ready — see bench.py note);
  * :func:`enable_nan_debugging` — flips ``jax_debug_nans`` so the first
    NaN-producing primitive raises with a stack trace.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/trace'): run_steps()`` → profiler dump."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def op_profile(fn, *args, iters: int = 3, log_dir: str | None = None):
    """Per-op device-time breakdown of ``fn(*args)``.

    Compiles/warms ``fn`` outside the trace, runs it ``iters`` times
    under ``jax.profiler``, parses the Chrome-trace dump, and aggregates
    'X' (complete) events from device tracks.

    Returns ``{"programs": [...], "ops": [...], "log_dir": ...}`` (the
    trace dump is kept at ``log_dir`` for TensorBoard) where each entry is
    ``{"name", "ms_per_iter", "count_per_iter", "pct"}``: *programs* are
    whole-module rows (``jit_*``), *ops* are individual XLA
    fusions/copies/convs; ``pct`` is of the summed op time. Works on any
    backend (CPU tests use host tracks when no device track exists).
    """
    import collections
    import glob
    import gzip
    import json
    import tempfile

    # force completion even where block_until_ready doesn't sync (this
    # environment's relay): fetch ONE element of the first array leaf
    def _sync(res):
        jax.block_until_ready(res)
        arrs = [x for x in jax.tree.leaves(res) if hasattr(x, "shape")]
        if arrs:
            import numpy as np

            lf = arrs[0]
            np.asarray(jax.device_get(lf.ravel()[:1] if lf.ndim else lf))

    _sync(fn(*args))  # compile + warm outside the trace
    log_dir = log_dir or tempfile.mkdtemp(prefix="sr_opprof_")
    with trace(log_dir):
        for _ in range(iters):
            _sync(fn(*args))

    runs = sorted(glob.glob(f"{log_dir}/plugins/profile/*/"))
    if not runs:
        raise RuntimeError(f"no profile dump under {log_dir}")
    try:
        # preferred: the xplane protobuf. The Chrome-JSON export caps at
        # 1e6 events and fills them host-first, so a scan-K training
        # step's host event storm evicts the ENTIRE device track
        # (observed round 4: 2.78M host vs 182k device events → empty
        # attribution); the xplane keeps every plane and also carries
        # hlo_category / flops / source / tf_op stats the JSON lacks.
        return parse_xplane(runs[-1], iters=iters, log_dir=log_dir)
    except Exception:  # no TF protos / layout change: Chrome fallback
        pass
    traces = glob.glob(f"{runs[-1]}/*.trace.json.gz")
    if not traces:
        raise RuntimeError(f"no trace.json.gz under {runs[-1]}")
    with gzip.open(traces[0]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_name = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, n in pid_name.items() if n.startswith("/device:")}
    if not device_pids:  # CPU backend: fall back to host track
        device_pids = set(pid_name)

    dur = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            name = e.get("name", "?")
            dur[name] += e.get("dur", 0.0)  # microseconds
            cnt[name] += 1

    programs, ops = [], []
    op_total = sum(d for n, d in dur.items() if not n.startswith("jit_"))
    for name, d in sorted(dur.items(), key=lambda kv: -kv[1]):
        row = {
            "name": name,
            "ms_per_iter": round(d / 1e3 / iters, 4),
            "count_per_iter": cnt[name] / iters,
        }
        if name.startswith("jit_"):
            programs.append(row)
        else:
            row["pct"] = round(100.0 * d / op_total, 2) if op_total else 0.0
            ops.append(row)
    return {"programs": programs, "ops": ops, "log_dir": log_dir}


def parse_xplane(run_dir: str, iters: int = 1, log_dir: str | None = None):
    """Parse a ``*.xplane.pb`` profiler dump into the op_profile schema.

    Reads the device plane's "XLA Modules" line as *programs* and the
    "XLA Ops" line as *ops* (leaf ops only — `while`/`conditional`
    containers envelope their children and would double-count).
    Each op row additionally carries the XLA ``category``, summed
    ``flops``/``bytes`` per iteration, the achieved ``tflops``/``gbps``,
    and the JAX-level ``source`` file:line — none of which exist in the
    Chrome-JSON export. Requires the TF tsl profiler protos (present in
    this image); :func:`op_profile` falls back to the Chrome trace
    without them.
    """
    import collections
    import glob

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: PLC0415

    paths = glob.glob(f"{run_dir}/*.xplane.pb")
    if not paths:
        raise RuntimeError(f"no xplane.pb under {run_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())

    device = [p for p in space.planes
              if p.name.startswith("/device:") and p.lines]
    if not device:  # CPU backend: host plane carries the XLA lines
        device = [p for p in space.planes if p.lines]
    if not device:
        raise RuntimeError("xplane has no populated planes")
    plane = device[0]
    md, smd = plane.event_metadata, plane.stat_metadata
    sname = {k: v.name for k, v in smd.items()}

    def stat_map(stats):
        return {sname.get(s.metadata_id, "?"): s for s in stats}

    def num(s):
        return s.int64_value or s.uint64_value or s.double_value

    programs = []
    for line in plane.lines:
        if line.name != "XLA Modules":
            continue
        agg = collections.defaultdict(float)
        cnt = collections.Counter()
        for e in line.events:
            n = md[e.metadata_id].name.split("(")[0]
            agg[n] += e.duration_ps / 1e9
            cnt[n] += 1
        for n, d in sorted(agg.items(), key=lambda kv: -kv[1]):
            programs.append({"name": n, "ms_per_iter": round(d / iters, 4),
                             "count_per_iter": cnt[n] / iters})

    dur = collections.defaultdict(float)
    cnt = collections.Counter()
    flops = collections.defaultdict(float)
    nbytes = collections.defaultdict(float)
    extra: dict[str, dict] = {}
    _containers = ("while", "conditional", "call")
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for e in line.events:
            m = md[e.metadata_id]
            st = stat_map(m.stats)
            cat = st["hlo_category"].str_value if "hlo_category" in st else ""
            if cat in _containers:
                continue
            n = m.display_name or m.name
            dur[n] += e.duration_ps / 1e9
            cnt[n] += 1
            if "flops" in st:
                flops[n] += num(st["flops"])
            if "bytes_accessed" in st:
                nbytes[n] += num(st["bytes_accessed"])
            if n not in extra:
                extra[n] = {"category": cat}
                if "source" in st and st["source"].str_value:
                    extra[n]["source"] = st["source"].str_value

    ops = []
    op_total = sum(dur.values())
    for n, d in sorted(dur.items(), key=lambda kv: -kv[1]):
        row = {"name": n, "ms_per_iter": round(d / iters, 4),
               "count_per_iter": cnt[n] / iters,
               "pct": round(100.0 * d / op_total, 2) if op_total else 0.0,
               **extra[n]}
        if flops[n]:
            row["gflops_per_iter"] = round(flops[n] / iters / 1e9, 3)
            row["tflops"] = round(flops[n] / (d / 1e3) / 1e12, 2)
        if nbytes[n]:
            row["gbps"] = round(nbytes[n] / (d / 1e3) / 1e9, 1)
        ops.append(row)
    if not ops:
        # e.g. the CPU backend's xplane has no "XLA Ops" line — let
        # op_profile fall back to the Chrome-JSON host-track parse
        raise RuntimeError(f"no XLA Ops line in {paths[0]}")
    return {"programs": programs, "ops": ops, "log_dir": log_dir or run_dir}


class StepTimer:
    """Wall-clock throughput over a window of steps.

    Call :meth:`tick` once per step with a device scalar to sync on
    (e.g. the loss); reading it forces completion of the step's work.
    """

    def __init__(self, pixels_per_step: float = 0.0, window: int = 50):
        self.pixels_per_step = pixels_per_step
        self.window = window
        self._count = 0
        self._t0 = None
        self.last_steps_per_s = 0.0
        self.last_mps = 0.0

    def tick(self, sync_scalar=None) -> dict | None:
        if sync_scalar is not None:
            float(sync_scalar)  # forces the step chain to complete
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            return None
        self._count += 1
        if self._count >= self.window:
            dt = now - self._t0
            self.last_steps_per_s = self._count / dt
            self.last_mps = self.pixels_per_step * self._count / dt / 1e6
            self._count = 0
            self._t0 = now
            return {
                "steps_per_s": round(self.last_steps_per_s, 3),
                "megapixels_per_s": round(self.last_mps, 3),
            }
        return None
