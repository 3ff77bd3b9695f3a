"""Worker for the multi-host FAULT-TOLERANCE integration test.

Launched by tests/test_multihost.py as ``python multihost_ft_worker.py
<port> <process_id> <num_processes> <out.json> <ckpt_dir> <mode>``.

Each process joins a REAL localhost ``jax.distributed`` group (4 virtual
CPU devices each -> global 8-device mesh) and trains a tiny ESPCN with
the production ``Trainer.fit`` + ``Checkpointer`` (Orbax, multiprocess-
coordinated saves), feeding global batches through
``host_local_to_global`` — SURVEY §5 failure-detection row, proven under
an actual failure (VERDICT r3 next #6).

Modes:
  * ``full``   — train 4 epochs straight; write the final param digest.
  * ``crash``  — same run, but process 1 SIGKILLs itself right after the
                 epoch-3 checkpoint is durably written (the coordinator
                 is left hanging in the next collective; the test reaps
                 it). Models a worker dying mid-job.
  * ``resume`` — fresh group, restore the latest Orbax checkpoint,
                 finish the schedule; final params must be BIT-EQUAL to
                 the ``full`` run's.
"""

import hashlib
import json
import os
import sys


SPE, EPOCHS = 4, 4


def digest(tree) -> str:
    import jax
    import numpy as np

    h = hashlib.sha256()
    for leaf in jax.tree.leaves(tree):
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


def main() -> None:
    port, pid, nprocs, out_path, ckpt_dir, mode = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5], sys.argv[6],
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    from sr.parallel.multihost import (
        host_local_to_global,
        initialize_multihost,
    )

    assert initialize_multihost(f"localhost:{port}", nprocs, pid)

    import jax.numpy as jnp
    import numpy as np

    from sr.data.datasets import SyntheticDataset
    from sr.data.pipeline import PatchPipeline
    from sr.parallel.mesh import make_mesh
    from sr.train.trainer import Trainer
    from sr.utils.checkpoint import Checkpointer, run_meta
    from sr.utils.config import SRConfig

    mesh = make_mesh((len(jax.devices()),), ("data",))
    cfg = SRConfig(model_name="ESPCN", num_channels=1, scale_factor=2,
                   crop_size=16, batch_size=8, dtype="float32",
                   steps_per_epoch=SPE, num_epochs=EPOCHS, save_epochs=1)
    tr = Trainer(cfg, mesh=mesh)

    # every process derives the SAME batch from the shared key stream,
    # then contributes only its host-local slice (the multi-host data
    # contract); k=1 single-step path keeps the run bit-deterministic
    ds = SyntheticDataset(num_images=2, size=(32, 32), channels=1)
    pipe = PatchPipeline([ds[i] for i in range(2)], crop_size=16,
                         scale_factor=2, batch_size=8, channels=1,
                         augment=False, random_scale=False)
    per = cfg.batch_size // nprocs

    def global_pipeline(key):
        full = jax.tree.map(np.asarray, pipe(key))
        local = {k: v[pid * per:(pid + 1) * per] for k, v in full.items()}
        return host_local_to_global(local, mesh)

    ck = Checkpointer(ckpt_dir, keep=5, meta=run_meta(cfg))
    state = tr.init_state(jax.random.key(1),
                          jnp.zeros((1, 8, 8, 1), jnp.float32))
    if mode == "resume":
        restored = ck.restore(state)
        assert restored is not None, "resume mode found no checkpoint"
        state = restored

    hook = None
    if mode == "crash" and pid == 1:
        def hook(s, epoch):
            if epoch == 2:  # 3rd epoch's checkpoint just issued
                ck.wait()  # make it durable, then die like a real worker
                os.kill(os.getpid(), 9)

    state = tr.fit(state, global_pipeline, num_epochs=EPOCHS,
                   steps_per_epoch=SPE, checkpointer=ck, eval_hook=hook)
    ck.close()
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "step": int(state.step),
                   "digest": digest(state.params)}, f)


if __name__ == "__main__":
    main()
