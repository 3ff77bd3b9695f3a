"""Full train-state checkpointing with resume (Orbax-backed).

The reference checkpoints params only (``torch.save(state_dict)``) and
cannot resume training — no optimizer state, no step counter
(reference: each wrapper's save_model/load_model; SURVEY §3.5). Here the
FULL state (params + optimizer + batch stats + step + PRNG key) is saved
atomically with keep-last-k retention, plus a params-only export for eval.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from sr.train.state import SRTrainState


def _state_to_tree(state: SRTrainState) -> dict:
    tree = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.batch_stats is not None:
        tree["batch_stats"] = state.batch_stats
    if state.rng is not None:
        # typed PRNG keys are not serializable; store raw key data
        tree["rng_data"] = jax.random.key_data(state.rng)
    return tree


def _tree_to_state(tree: dict, like: SRTrainState) -> SRTrainState:
    rng = like.rng
    if "rng_data" in tree and like.rng is not None:
        data = np.asarray(tree["rng_data"])
        # match the template's (mesh-replicated) placement: a bare
        # jnp.asarray is a host-LOCAL single-device array, which a
        # multi-process run cannot re-serialize at the next save
        # (found by tests/test_multihost.py kill/resume).
        # make_array_from_process_local_data assembles the GLOBAL
        # replicated array from identical per-process values —
        # device_put cannot target non-addressable shardings.
        if hasattr(like.rng, "sharding"):
            data = jax.make_array_from_process_local_data(
                like.rng.sharding, data)
        rng = jax.random.wrap_key_data(jnp.asarray(data))
    return like.replace(
        params=tree["params"],
        opt_state=tree["opt_state"],
        step=jnp.asarray(tree["step"]),
        batch_stats=tree.get("batch_stats", like.batch_stats),
        rng=rng,
    )


def run_meta(cfg) -> dict:
    """The schedule/topology constants a resumed run must not change.

    Epoch recovery is ``step // steps_per_epoch`` (and the GAN phase
    boundary is ``pretrain_epochs``), so changing either between runs
    silently shifts the schedule; changing the topology knobs makes the
    checkpoint unrestorable with a confusing Orbax structure error.
    Stored as ``run_meta.json`` next to the checkpoints and validated by
    :class:`Checkpointer` before any restore (VERDICT r2 weak #7).
    """
    return {
        "model_name": cfg.model_name,
        "scale_factor": cfg.scale_factor,
        "num_channels": cfg.num_channels,
        "base_filter": cfg.base_filter,
        "num_resblocks": cfg.num_resblocks,
        "num_recursions": cfg.num_recursions,
        "res_scale": cfg.res_scale,
        "steps_per_epoch": cfg.steps_per_epoch,
        "pretrain_epochs": cfg.pretrain_epochs,
        # lr schedules are pure functions of the restored opt-state step
        # count — changing the halving interval between runs silently
        # shifts a resumed run's lr (same class of bug as steps_per_epoch)
        "lr_halve_steps": cfg.lr_halve_steps,
    }


class Checkpointer:
    """keep-last-k full-state checkpoints under ``directory``.

    ``meta`` (see :func:`run_meta`): consistency contract for resumes —
    if the directory already holds checkpoints saved under different
    meta values, construction fails loudly instead of letting the
    resumed run silently shift its schedule or crash deep in restore.
    """

    def __init__(self, directory: str, keep: int = 3,
                 meta: dict | None = None, resume: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep),
        )
        if meta is not None:
            self._check_meta(meta, resume)

    def _check_meta(self, meta: dict, resume: bool = True) -> None:
        # a non-resuming run starts fresh, so changed constants are fine
        # — just record the NEW contract (the advertised --no_resume
        # escape hatch must actually bypass the check)
        path = os.path.join(self.directory, "run_meta.json")
        if resume and os.path.exists(path) \
                and self._mgr.latest_step() is not None:
            with open(path) as f:
                old = json.load(f)
            mismatch = {
                k: (old[k], v) for k, v in meta.items()
                if k in old and old[k] != v
            }
            if mismatch:
                detail = "; ".join(
                    f"{k}: checkpoint={a!r} vs run={b!r}"
                    for k, (a, b) in sorted(mismatch.items())
                )
                raise ValueError(
                    f"resume-consistency check failed for {self.directory}: "
                    f"{detail}. Changing steps_per_epoch/pretrain_epochs "
                    "silently shifts the epoch schedule of a resumed run, "
                    "and a changed topology cannot restore; use a fresh "
                    "save_dir or pass --no_resume."
                )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, path)

    def save(self, state: SRTrainState, wait: bool = False,
             step: int | None = None) -> int:
        """Save at ``state.step`` (or an explicit ``step`` id, e.g. to key a
        discriminator snapshot by the generator's step)."""
        step = int(state.step) if step is None else int(step)
        self._mgr.save(step, args=ocp.args.StandardSave(_state_to_tree(state)))
        if wait:
            self._mgr.wait_until_finished()
        return step

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def wait(self) -> None:
        """Block until async saves are durably on disk (e.g. before a
        test deliberately kills the process)."""
        self._mgr.wait_until_finished()

    def restore(self, like: SRTrainState, step: int | None = None) -> SRTrainState | None:
        """Restore into the structure of ``like``; None if no checkpoint."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        target = jax.tree.map(np.asarray, _state_to_tree(like))
        tree = self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        return _tree_to_state(tree, like)

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params(path: str, params: Any, batch_stats: Any = None) -> None:
    """Params-only export (the eval-time artifact, like the reference's
    ``<Model>_param.pkl``), as a flattened .npz."""
    from flax.traverse_util import flatten_dict

    flat = {
        "/".join(k): np.asarray(v)
        for k, v in flatten_dict({"params": params}).items()
    }
    if batch_stats is not None:
        flat.update(
            {
                "/".join(k): np.asarray(v)
                for k, v in flatten_dict({"batch_stats": batch_stats}).items()
            }
        )
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_params(path: str) -> tuple[dict, dict | None]:
    """Inverse of :func:`save_params` → (params, batch_stats|None)."""
    from flax.traverse_util import unflatten_dict

    with np.load(path) as z:
        flat = {tuple(k.split("/")): z[k] for k in z.files}
    tree = unflatten_dict(flat)
    params = tree.get("params", {})
    if "Scan_RecStep_0" in params:  # pre-round-3 DRCN layout
        from sr.models.drcn import migrate_params_r2

        params = migrate_params_r2(params)
    return params, tree.get("batch_stats")
