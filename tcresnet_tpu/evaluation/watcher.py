"""Checkpoint-watching loop evaluator.

Reference parity: the decoupled two-process train/eval design
(SURVEY.md section 1, layer 10): the trainer writes checkpoints, a
second evaluator process polls the directory (`checkpoints_iterator`,
common/tf_utils.py:65-67; evaluate_audio.py:57-60), scores each new
checkpoint on the valid split, promotes bests (BestKeeper), and exits
past max_step (helper/evaluator.py:102-133).

TPU-native form: polls the orbax CheckpointManager step directory; can
run (a) as a separate OS process sharing the filesystem — exactly the
reference topology — or (b) in-process between train calls.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Iterator, Optional

from tcresnet_tpu.config import ExperimentConfig
from tcresnet_tpu.data.device_data import DeviceDataset
from tcresnet_tpu.evaluation.best_keeper import DEFAULT_BEST_METRICS, BestKeeper
from tcresnet_tpu.evaluation.evaluator import Evaluator
from tcresnet_tpu.metrics.writers import MetricWriter
from tcresnet_tpu.models import param_count
from tcresnet_tpu.train.checkpoint import CheckpointManager
from tcresnet_tpu.train.state import create_train_state
from tcresnet_tpu.utils import get_logger


def checkpoint_iterator(
    ckpt: CheckpointManager,
    poll_interval: float = 2.0,
    timeout: Optional[float] = None,
    start_after: int = -1,
    should_stop=None,
) -> Iterator[int]:
    """Yield new checkpoint steps as they appear (ckpt_iterator parity).

    `should_stop()` is consulted once the backlog is drained — the
    watcher passes a train-completion probe so an epoch/from-restore
    -capped run (whose effective final step is below cfg.train.max_step)
    still terminates the loop instead of polling forever."""
    last = start_after
    waited = 0.0
    while True:
        steps = [s for s in ckpt.all_steps() if s > last]
        if steps:
            waited = 0.0
            for s in steps:
                last = s
                yield s
        else:
            if timeout is not None and waited >= timeout:
                return
            if should_stop is not None and should_stop():
                return
            time.sleep(poll_interval)
            waited += poll_interval


class WatchingEvaluator:
    """Evaluate every checkpoint of a run; keep the best."""

    def __init__(
        self,
        cfg: ExperimentConfig,
        data: DeviceDataset,
        workdir,
        mesh=None,
        metrics_with_modes: Optional[Dict[str, str]] = None,
    ):
        self.cfg = cfg
        self.data = data
        self.mesh = mesh
        self.workdir = Path(workdir)
        self.split = data.split or "valid"
        self.log = get_logger(f"watcher/{self.split}")
        self.evaluator = Evaluator(cfg, data, mesh=mesh)
        self.ckpt = CheckpointManager(
            self.workdir / "ckpt", max_to_keep=cfg.train.max_to_keep
        )
        self.best_keeper = BestKeeper(
            metrics_with_modes or dict(DEFAULT_BEST_METRICS),
            self.split,
            self.workdir / "best",
        )
        self.writer = MetricWriter(self.workdir, self.split)
        self._template_state = self._make_template()
        self._n_params = param_count(self._template_state.params)

    def _make_template(self):
        import jax
        import jax.numpy as jnp

        from tcresnet_tpu.ops import dsp
        from tcresnet_tpu.train.optim import build_optimizer

        shape = dsp.feature_shape(self.cfg.audio)
        sample = jnp.zeros((2,) + shape, jnp.float32)

        def build():
            variables = self.evaluator.model.init(
                {"params": jax.random.key(0), "dropout": jax.random.key(1)},
                sample,
                training=True,
            )
            # tx must see params so masked (trainable_scopes) opt states
            # match. num_samples=batch_size=1: the template only supplies
            # the opt-state STRUCTURE, which schedule boundary values
            # never affect (unit-LR optimizer, optim.py:74-135) — without
            # it, boundaries_epoch=True configs couldn't build a template
            # at all (the watcher has the eval split, not the train split
            # the real boundary resolution needs).
            tx, _ = build_optimizer(
                self.cfg.optim, num_samples=1, batch_size=1,
                params=variables["params"],
            )
            return create_train_state(
                self.evaluator.model,
                tx,
                jax.random.key(0),
                sample,
                use_ema=self.cfg.optim.use_ema,
            )

        # the template only supplies structure to orbax StandardRestore
        # (checkpoint.restore maps to_shape_dtype_struct over it anyway),
        # so trace it abstractly: a real model.init here op-by-op-compiled
        # ~112 tiny XLA programs, each under the persistent-cache
        # threshold — 52 s of the evaluator CLI's startup on one CPU core
        return jax.eval_shape(build)

    def evaluate_once(self, step: int) -> Optional[Dict[str, float]]:
        """Load a checkpoint and run a full-split evaluation
        (helper/evaluator.py:102-133 parity).

        Returns None when the checkpoint vanished between listing and
        restore: the trainer writes faster than a full-split eval runs,
        so a backlog can exceed max_to_keep and orbax GC deletes steps
        the iterator already yielded — skip those instead of crashing
        the watcher process."""
        try:
            state = self.ckpt.restore(self._template_state, step)
        except Exception:
            if step not in self.ckpt.all_steps():
                self.log.warning(
                    f"checkpoint step {step} was garbage-collected before "
                    f"evaluation (trainer outpaced the watcher); skipping"
                )
                # the failed restore of a vanished step poisons orbax's
                # item-layout detection (later restores raise 'Must
                # provide args of type Composite') — start fresh
                self.ckpt = CheckpointManager(
                    self.workdir / "ckpt",
                    max_to_keep=self.cfg.train.max_to_keep,
                )
                return None
            raise
        if self.mesh is not None:
            import jax

            from tcresnet_tpu.parallel import replicated_sharding

            state = jax.device_put(state, replicated_sharding(self.mesh))
        scores = self.evaluator.evaluate(state)
        tracked = {
            k: scores[k] for k in self.best_keeper.modes if k in scores
        }
        _, keep = self.best_keeper.monitor(tracked)
        self.best_keeper.save_scores(
            keep, scores, meta_info={"step": step, "model_size": self._n_params}
        )
        # Promote from the state in memory, not the trainer's ckpt dir:
        # orbax max_to_keep GC may delete the step dir while the (slower)
        # evaluator is mid-pass.
        import jax

        self.best_keeper.save_best_state(keep, jax.device_get(state), step)
        self.writer.write(step, scores)
        # accuracy/loss may be excluded via cfg.data.exclude_metric_names
        # (BestKeeper.monitor already tolerates a missing tracked metric)
        shown = "  ".join(
            f"{k} {scores[k]:.4f}" for k in ("accuracy", "loss") if k in scores
        )
        self.log.info(
            f"step {step}: {shown or f'{len(scores)} metrics'}"
            + ("  [best kept]" if any(keep.values()) else "")
        )
        # log-only classification report, as the reference's report op
        # (metrics/ops/non_tensor_ops.py: is_for_log, never summarized)
        report = scores.get("classification_report")
        if report:
            self.log.info(f"classification report (step {step}):\n{report}")
        return scores

    def watch(
        self,
        max_step: Optional[int] = None,
        poll_interval: float = 2.0,
        timeout: Optional[float] = None,
    ) -> Optional[Dict[str, float]]:
        """Loop over checkpoints until max_step is evaluated, the trainer
        signals completion (TRAIN_DONE sentinel — covers epoch/from-
        restore-capped runs whose final step is below cfg.train.max_step),
        or timeout."""
        max_step = max_step or self.cfg.train.max_step
        done_file = self.ckpt.directory / "TRAIN_DONE"
        last_scores = None
        for step in checkpoint_iterator(
            self.ckpt, poll_interval, timeout,
            should_stop=done_file.exists,
        ):
            scores = self.evaluate_once(step)
            if scores is not None:
                last_scores = scores
            if step >= max_step:
                break
        self.writer.flush()
        return last_scores
