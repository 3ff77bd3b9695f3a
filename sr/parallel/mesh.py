"""Device mesh + sharding helpers.

The reference is single-GPU with bare ``.cuda()`` calls and no collectives
(SURVEY §2.3). Scale-out here is TPU-idiomatic: a ``jax.sharding.Mesh``
over the chips, batches sharded over the ``data`` axis, parameters
replicated, and XLA GSPMD inserting the gradient all-reduce over ICI —
zero hand-written communication.

Axes:
  * ``data``    — batch (data parallel; gradients psum over ICI)
  * ``spatial`` — image rows for tiled/sharded large-image inference
    (the CNN analogue of sequence parallelism; XLA inserts conv halo
    exchanges automatically when lowering spatially-sharded convs)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: tuple[int, ...] = (),
    axes: tuple[str, ...] = ("data",),
    devices=None,
) -> Mesh:
    """Mesh over the available devices; defaults to 1-D data parallel."""
    if devices is None:
        devices = jax.devices()
    if not shape:
        shape = (len(devices),)
        axes = axes[:1]
    assert len(shape) == len(axes), (shape, axes)
    n = int(np.prod(shape))
    assert n <= len(devices), f"mesh {shape} needs {n} devices, have {len(devices)}"
    dev_array = mesh_utils.create_device_mesh(shape, devices=devices[:n])
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim (batch) sharding for NHWC batches."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard H of an NHWC tensor over the 'spatial' axis (batch over 'data')."""
    return NamedSharding(mesh, P("data", "spatial"))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully-replicated on ``mesh`` — multi-host safe.

    ``jax.device_put`` rejects committed arrays when the sharding spans
    non-addressable devices (other processes), so on a multi-host mesh
    each leaf is rebuilt from its host-local value with
    ``make_array_from_process_local_data`` (every process holds the same
    value — that IS replication). Typed PRNG keys round-trip through
    ``key_data``/``wrap_key_data`` (their raw form is what serializes).
    """
    sh = replicated_sharding(mesh)
    if sh.is_fully_addressable:
        return jax.device_put(tree, sh)

    def put(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            data = jax.random.key_data(x)
            g = jax.make_array_from_process_local_data(sh, np.asarray(data))
            return jax.random.wrap_key_data(g)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(put, tree)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a (dict of) host/device array(s) with batch-dim sharding."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
