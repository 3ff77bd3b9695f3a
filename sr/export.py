"""Ahead-of-time serving export: StableHLO artifacts via ``jax.export``.

The reference ships checkpoints only — serving means importing the model
code and rebuilding the module (reference: each wrapper's
``load_model``/``test``). The TPU-native serving story is stronger: the
jitted predict function lowers to StableHLO once, serializes to a
self-contained artifact, and reloads WITHOUT the model code (any JAX
process on a supported platform can ``deserialize(...).call(x)`` —
that's what production serving binaries do).

  * batch dimension is SYMBOLIC by default — one artifact serves any
    batch size;
  * spatial dims are static by design: every distinct (H, W) is its own
    XLA program anyway (SURVEY §7 hard part 6), and serving stacks pick
    a small set of bucket sizes (sr/eval/runner.py's static-shape
    bucketing does the same at eval time);
  * ``platforms`` lets one artifact carry lowerings for cpu+tpu.

    from sr.export import export_predict, save_artifact, load_artifact
    exp = export_predict("EDSR", "EDSR_params.npz", lr_size=128)
    save_artifact("edsr_x4.hloart", exp)
    ...
    fn = load_artifact("edsr_x4.hloart")   # no sr.models import needed
    sr_batch = fn(lr_batch)                # (b, 128, 128, 3) -> (b, 512, ...)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _build_predict(model_name: str, params_path: str, scale_factor: int,
                   num_channels: int | None, dtype: str, fused: bool,
                   cfg_overrides: dict | None = None):
    from sr.models.registry import get_spec
    from sr.utils.checkpoint import load_params
    from sr.utils.config import SRConfig

    spec = get_spec(model_name)
    channels = num_channels or spec.default_channels
    cfg = SRConfig(model_name=model_name, scale_factor=scale_factor,
                   num_channels=channels, dtype=dtype,
                   **(cfg_overrides or {}))
    model = spec.make_model(cfg)
    params, batch_stats = load_params(params_path)
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    from sr.infer import make_serving_predict

    return make_serving_predict(model, variables, fused), channels


def export_predict(
    model_name: str,
    params_path: str,
    scale_factor: int = 4,
    num_channels: int | None = None,
    dtype: str = "bfloat16",
    fused: bool = False,
    lr_size: int | tuple[int, int] = 128,
    symbolic_batch: bool = True,
    platforms: tuple[str, ...] | None = None,
    cfg_overrides: dict | None = None,
):
    """Lower a trained model's predict fn to a serializable Exported.

    ``lr_size``: the (static) LR input spatial size this artifact serves
    (pre-upsample models receive the bicubic-upscaled input, so pass the
    HR size for those). ``platforms``: e.g. ``("cpu", "tpu")`` for a
    multi-platform artifact; None exports for the current backend.
    Returns a ``jax.export.Exported``.
    """
    from jax import export as jex

    predict, channels = _build_predict(
        model_name, params_path, scale_factor, num_channels, dtype, fused,
        cfg_overrides)
    h, w = (lr_size, lr_size) if isinstance(lr_size, int) else lr_size
    if symbolic_batch:
        (b,) = jex.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, h, w, channels), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((1, h, w, channels), jnp.float32)
    kwargs = {"platforms": platforms} if platforms else {}
    return jex.export(jax.jit(predict), **kwargs)(spec)


def save_artifact(path: str, exported) -> None:
    """Serialize an Exported to a self-contained artifact file."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)


def load_artifact(path: str):
    """Load an artifact and return ``fn(x) -> sr`` (no model code needed)."""
    from jax import export as jex

    with open(path, "rb") as f:
        exported = jex.deserialize(bytearray(f.read()))

    def fn(x):
        return exported.call(jnp.asarray(x, jnp.float32))

    fn.exported = exported
    return fn


def main(argv: list[str] | None = None) -> None:
    """CLI: python -m sr.export --model_name EDSR --params p.npz --out a.hloart"""
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model_name", required=True)
    p.add_argument("--params", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--scale_factor", type=int, default=4)
    p.add_argument("--num_channels", type=int, default=None)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--fused", action="store_true",
                   help="export the fused/folded fast tail (serving mode)")
    p.add_argument("--lr_size", type=int, default=128)
    p.add_argument("--platforms", nargs="*", default=None,
                   help="e.g. --platforms cpu tpu for a portable artifact")
    p.add_argument("--num_resblocks", type=int, default=None)
    p.add_argument("--base_filter", type=int, default=None)
    p.add_argument("--res_scale", type=float, default=None,
                   help="EDSR residual scaling — param-free, MUST match "
                        "training or the artifact silently diverges")
    p.add_argument("--num_recursions", type=int, default=None)
    a = p.parse_args(argv)
    overrides = {
        k: v for k, v in
        (("num_resblocks", a.num_resblocks), ("base_filter", a.base_filter),
         ("res_scale", a.res_scale), ("num_recursions", a.num_recursions))
        if v is not None
    }
    exp = export_predict(
        a.model_name, a.params, a.scale_factor, a.num_channels, a.dtype,
        a.fused, a.lr_size,
        platforms=tuple(a.platforms) if a.platforms else None,
        cfg_overrides=overrides or None,
    )
    save_artifact(a.out, exp)
    in_shape = exp.in_avals[0].shape
    print(f"exported {a.model_name} -> {a.out} "
          f"(input {in_shape}, platforms {exp.platforms})")


if __name__ == "__main__":
    main()
