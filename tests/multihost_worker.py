"""Worker for the REAL 2-process ``jax.distributed`` integration test.

Launched by tests/test_multihost.py as ``python multihost_worker.py
<port> <process_id> <num_processes> <out.json>``. Each process brings up
a 4-virtual-device CPU backend, joins the localhost coordinator through
:func:`sr.parallel.multihost.initialize_multihost`, builds the GLOBAL
8-device mesh, contributes its host-local half of the batch via
:func:`host_local_to_global`, and runs ONE production ``Trainer`` step —
the full multi-host data path (SURVEY §2.3 last row), not a mock.
"""

import json
import os
import sys


def main() -> None:
    port, pid, nprocs, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from sr.parallel.multihost import (
        host_local_to_global,
        initialize_multihost,
        is_coordinator,
        process_count,
    )

    assert initialize_multihost(f"localhost:{port}", nprocs, pid)
    assert process_count() == nprocs

    import jax.numpy as jnp
    import numpy as np

    from sr.parallel.mesh import make_mesh
    from sr.train.trainer import Trainer
    from sr.utils.config import SRConfig

    n_global = len(jax.devices())
    mesh = make_mesh((n_global,), ("data",))

    cfg = SRConfig(model_name="EDSR", num_channels=3, scale_factor=4,
                   num_resblocks=2, base_filter=16, dtype="float32")
    tr = Trainer(cfg, mesh=mesh)

    # every process derives the SAME global batch, then contributes only
    # its host-local slice — the real multi-host data-feeding contract
    rng = np.random.default_rng(0)
    gbatch = {
        "lr": rng.random((8, 12, 12, 3), np.float32),
        "hr": rng.random((8, 48, 48, 3), np.float32),
    }
    per = 8 // nprocs
    local = {k: v[pid * per : (pid + 1) * per] for k, v in gbatch.items()}
    batch = host_local_to_global(local, mesh)

    state = tr.init_state(jax.random.key(0), jnp.zeros((1, 12, 12, 3), jnp.float32))
    state, metrics = tr.train_step(state, batch)
    result = {
        "pid": pid,
        "loss": float(metrics["loss"]),
        "step": int(state.step),
        "global_devices": n_global,
        "coordinator": is_coordinator(),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
