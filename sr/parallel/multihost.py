"""Multi-host (multi-process) initialization and data placement.

The reference is strictly single-process (SURVEY §2.3 last row: no
process groups, no launchers). The TPU-native scale-out story has two
tiers:

  * single-host multi-chip — sr/parallel/mesh.py (GSPMD over one
    process's devices); fully exercised by the test suite and the
    driver's multichip dryrun;
  * multi-host (pod slices / multi-slice) — THIS module:
    ``jax.distributed.initialize`` bootstrap + host-local → global batch
    assembly. PROCESS-LEVEL tested: tests/test_multihost.py launches a
    genuine 2-process ``jax.distributed`` job on localhost (4 virtual
    CPU devices per process, Gloo collectives) that forms the global
    8-device mesh and runs one production Trainer step, equal to the
    single-process run. On a real pod the same calls apply unchanged,
    because everything downstream (mesh, shardings, jitted steps)
    already goes through GSPMD and is process-count-agnostic.

Bootstrap contract (mirrors JAX conventions):

  * On TPU pods, ``jax.distributed.initialize()`` with NO arguments
    autodetects coordinator/process topology from the TPU runtime.
  * Elsewhere, pass ``coordinator_address``, ``num_processes`` and
    ``process_id`` explicitly, or set the environment variables
    ``SR_COORDINATOR`` / ``SR_NUM_PROCESSES`` / ``SR_PROCESS_ID``.

Data path: each host feeds its local shard of the global batch;
:func:`host_local_to_global` assembles the host-local arrays into one
globally-sharded ``jax.Array`` (``jax.make_array_from_process_local_data``)
so the jitted train step sees a single logical batch regardless of
process count. This also works single-process, which is how it is tested.
"""

from __future__ import annotations

import os

import jax


def multihost_env() -> dict | None:
    """Read SR_COORDINATOR/SR_NUM_PROCESSES/SR_PROCESS_ID, or None."""
    addr = os.environ.get("SR_COORDINATOR")
    if not addr:
        return None
    return {
        "coordinator_address": addr,
        "num_processes": int(os.environ.get("SR_NUM_PROCESSES", "1")),
        "process_id": int(os.environ.get("SR_PROCESS_ID", "0")),
    }


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Bring up the JAX distributed runtime for a multi-process run.

    Resolution order: explicit args → SR_* environment variables → TPU
    autodetection (argument-less initialize) when requested via
    ``SR_MULTIHOST=auto``. Returns True when ``jax.distributed.initialize``
    was called, False for the (default) single-process no-op. Call BEFORE
    any other jax API touches the backend.
    """
    if coordinator_address is None:
        env = multihost_env()
        if env is not None:
            coordinator_address = env["coordinator_address"]
            num_processes = num_processes or env["num_processes"]
            process_id = process_id if process_id is not None else env["process_id"]
        elif os.environ.get("SR_MULTIHOST", "") == "auto":
            # TPU pod: the runtime provides coordinator + topology
            jax.distributed.initialize()
            return True
        else:
            return False
    kwargs = {
        "coordinator_address": coordinator_address,
        "num_processes": num_processes,
        "process_id": process_id,
    }
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return True


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/logs/renders."""
    return jax.process_index() == 0


def host_local_to_global(batch, mesh, axis: str = "data"):
    """Assemble per-host batch shards into one globally-sharded array.

    ``batch``: (dict of) host-local numpy/jax arrays — each process
    passes ITS slice of the global batch (global batch size =
    local · process_count). Returns ``jax.Array``s sharded over ``axis``
    of ``mesh`` spanning all processes' devices.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, x), batch
    )
