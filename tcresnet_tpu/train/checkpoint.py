"""Orbax-backed checkpointing with reference-equivalent semantics.

Replaces tf.train.Saver + placeholder-feed Ckpt loading
(helper/trainer.py:83-86,406-414; common/model_loader.py:11-165):
  - save every `step_save_checkpoint` steps, keep `max_to_keep`;
  - resume restores the full train state incl. global step (the
    reference parsed the step from the ckpt filename,
    common/tf_utils.py:237-247 — orbax tracks steps natively);
  - partial restore with include/exclude scopes for transfer learning
    (model_loader.py:42-83) via `restore_params_partial`.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Optional, Sequence

import jax
import orbax.checkpoint as ocp

from tcresnet_tpu.utils import get_logger

log = get_logger("ckpt")


class CheckpointManager:
    def __init__(self, directory, max_to_keep: int = 5):
        self._dir = Path(directory).resolve()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    @property
    def directory(self) -> Path:
        return self._dir

    def save(self, step: int, state, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def all_steps(self) -> Sequence[int]:
        # Re-scan the directory on every call: a watcher process creates
        # its manager BEFORE the trainer process writes any checkpoint
        # (cached listing would stay empty forever), and the trainer's
        # max_to_keep GC deletes steps a backlogged watcher still has
        # listed. Newer orbax deprecated all_steps(read=True) — and it no
        # longer actually re-reads — in favor of an explicit reload().
        if hasattr(self._mgr, "reload"):
            self._mgr.reload()
            return sorted(self._mgr.all_steps())
        return sorted(self._mgr.all_steps(read=True))

    def restore(self, state_like, step: Optional[int] = None):
        """Restore a full train state; `state_like` supplies the pytree
        structure/shardings (an abstract or concrete state)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {self._dir}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_like)
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        log.info(f"Restored checkpoint step {step} from {self._dir}")
        return restored

    def restore_raw(self, step: Optional[int] = None):
        """Restore the checkpoint's pytree WITHOUT a structure template.

        Returns plain nested dicts/lists of host arrays in whatever
        structure the checkpoint was saved with. This is what makes
        cross-architecture transfer possible (reference
        common/model_loader.py:42-83 `ignore_missing_vars`: restore a
        variable subset from a checkpoint of a DIFFERENT graph) — a
        template-based StandardRestore against the current state would
        fail on the first structural mismatch, before any scope filter
        runs.
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {self._dir}")
        restored = self._mgr.restore(step)
        log.info(f"Raw-restored checkpoint step {step} from {self._dir}")
        return restored

    def delete(self, step: int) -> None:
        self._mgr.delete(step)

    def close(self) -> None:
        self._mgr.close()


def _path_matches(path_str: str, scopes: Sequence[str]) -> bool:
    # PREFIX-ANCHORED (re.match), matching the reference's
    # var.op.name.startswith(prefix) scope filters
    # (common/model_loader.py:55-56): "fc" must not match "block3/fc_proj".
    return any(re.match(s, path_str) for s in scopes)


def restore_params_partial(
    params,
    restored_params,
    include_scopes: Optional[Sequence[str]] = None,
    exclude_scopes: Optional[Sequence[str]] = None,
    ignore_missing: bool = False,
):
    """Merge `restored_params` into `params` with scope filters.

    Equivalent capability to Ckpt's include/exclude scope restore
    (common/model_loader.py:42-83). Scopes are prefix-anchored regexes
    matched against the '/'-joined param path (reference startswith
    semantics).
    """
    flat_new = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_old = dict(jax.tree_util.tree_flatten_with_path(restored_params)[0])

    def path_str(path):
        return "/".join(str(getattr(k, "key", k)) for k in path)

    merged = {}
    for path, new_leaf in flat_new.items():
        p = path_str(path)
        wanted = True
        if include_scopes:
            wanted = _path_matches(p, include_scopes)
        if wanted and exclude_scopes and _path_matches(p, exclude_scopes):
            wanted = False
        if wanted and path in flat_old:
            old_leaf = flat_old[path]
            if old_leaf.shape != new_leaf.shape:
                if not ignore_missing:
                    raise ValueError(
                        f"Shape mismatch for {p}: {old_leaf.shape} vs {new_leaf.shape}"
                    )
                merged[path] = new_leaf
            else:
                merged[path] = old_leaf
        elif wanted and not ignore_missing and path not in flat_old:
            raise KeyError(f"Missing {p} in restored params")
        else:
            merged[path] = new_leaf

    treedef = jax.tree_util.tree_structure(params)
    ordered_paths = [p for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(treedef, [merged[p] for p in ordered_paths])
