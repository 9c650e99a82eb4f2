"""Best-checkpoint keeping with scores.tsv persistence.

Reference parity: common/tf_utils.py:70-216 (BestKeeper) — per-(dataset,
metric) best tracking with min/max modes and epsilon 5e-5, promotion of
the best checkpoint into `<dir>/<dataset>/<metric>/`, scores persisted as
scores.tsv and re-read on restart (resumable).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Dict, Optional, Tuple

from tcresnet_tpu.utils import get_logger


class BestKeeper:
    def __init__(
        self,
        metric_with_modes: Dict[str, str],
        dataset_name: str,
        directory,
        epsilon: float = 5e-5,
        score_file: str = "scores.tsv",
    ):
        self.log = get_logger("best_keeper")
        self.dataset_name = dataset_name
        self.directory = Path(directory)
        self.epsilon = epsilon
        self.score_file = score_file
        self.modes = dict(metric_with_modes)
        self.metric_best: Dict[str, float] = {}

        for metric, mode in self.modes.items():
            if mode not in ("min", "max"):
                raise ValueError(f"Unsupported mode {mode!r} for {metric}")
            default = float("inf") if mode == "min" else float("-inf")
            self.metric_best[metric] = self._load_score(metric, default)
        self.log.info(
            f"BestKeeper[{dataset_name}]: {self.modes} (resumed bests "
            f"{ {k: v for k, v in self.metric_best.items() if abs(v) != float('inf')} })"
        )

    def _metric_dir(self, metric: str) -> Path:
        return self.directory / self.dataset_name / metric

    def _load_score(self, metric: str, default: float) -> float:
        path = self._metric_dir(metric) / self.score_file
        if not path.exists():
            return default
        with open(path) as f:
            header = f.readline().strip().split("\t")
            values = f.readline().strip().split("\t")
        try:
            return float(values[header.index(metric)])
        except (ValueError, IndexError):
            return default

    def _better(self, metric: str, x: float, y: float) -> bool:
        if self.modes[metric] == "min":
            return x < y - self.epsilon
        return x > y + self.epsilon

    def monitor(self, eval_scores: Dict[str, float]) -> Tuple[bool, Dict[str, bool]]:
        """Check which tracked metrics improved; updates the bests."""
        keep = {}
        any_keep = False
        for metric in self.modes:
            if metric not in eval_scores:
                # a tracked metric can be absent (e.g. listed in
                # DataConfig.exclude_metric_names) — don't crash the
                # eval pass, but say so: a typo'd metric name would
                # otherwise silently never promote anything
                self.log.warning(
                    f"[KeepBest/{self.dataset_name}] tracked metric "
                    f"{metric!r} missing from eval results "
                    f"(available: {sorted(eval_scores)[:8]}...) — not promoting"
                )
                keep[metric] = False
                continue
            score = eval_scores[metric]
            if self._better(metric, score, self.metric_best[metric]):
                self.log.info(
                    f"[KeepBest/{self.dataset_name}] {metric} "
                    f"{self.metric_best[metric]:.6f} -> {score:.6f}"
                )
                self.metric_best[metric] = score
                keep[metric] = True
                any_keep = True
            else:
                keep[metric] = False
        return any_keep, keep

    def save_best_state(
        self, metrics_keep: Dict[str, bool], state, step: int
    ) -> None:
        """Promote the just-evaluated in-memory state: write a FRESH
        checkpoint into each improved metric dir.

        Immune to the trainer's max_to_keep GC racing the evaluator (the
        copy-from-ckpt-dir path could lose the best checkpoint without
        error when the step dir was already deleted); the reference
        likewise copied eagerly inside the eval pass
        (common/tf_utils.py:148-170).
        """
        from tcresnet_tpu.train.checkpoint import CheckpointManager

        for metric, is_keep in metrics_keep.items():
            if not is_keep:
                continue
            # Same on-disk layout as the trainer's checkpoints, so the
            # export/eval CLIs restore promoted bests identically;
            # max_to_keep=1 garbage-collects the previously promoted step.
            mgr = CheckpointManager(self._metric_dir(metric), max_to_keep=1)
            if step in mgr.all_steps():
                # Re-promoting an existing step (fresh `evaluate.py
                # --valid-type once` over a finished run, or a RETRAINED
                # run reusing the train_dir without clearing best/):
                # orbax raises StepAlreadyExistsError even with
                # force=True, and skipping could silently keep a STALE
                # previous-run checkpoint — delete and rewrite the
                # just-evaluated state instead.
                mgr.delete(step)
            mgr.save(step, state, force=True)
            mgr.wait()
            mgr.close()

    def save_best(
        self, metrics_keep: Dict[str, bool], ckpt_dir, step: Optional[int] = None
    ) -> None:
        """Copy the checkpoint for `step` into each improved metric dir.

        Prefer save_best_state (race-free); this path raises loudly if
        the source step dir has been garbage-collected.
        """
        ckpt_dir = Path(ckpt_dir)
        src = ckpt_dir if step is None else ckpt_dir / str(step)
        if not any(metrics_keep.values()):
            return
        if not src.exists():
            raise FileNotFoundError(
                f"Cannot promote best checkpoint: {src} no longer exists "
                "(likely max_to_keep GC); use save_best_state to promote "
                "from the evaluated state instead."
            )
        for metric, is_keep in metrics_keep.items():
            if not is_keep:
                continue
            dst = self._metric_dir(metric)
            if dst.exists():
                for child in dst.iterdir():
                    if child.name != self.score_file:
                        if child.is_dir():
                            shutil.rmtree(child)
                        else:
                            child.unlink()
            dst.mkdir(parents=True, exist_ok=True)
            shutil.copytree(src, dst / src.name, dirs_exist_ok=True)

    def save_scores(
        self,
        metrics_keep: Dict[str, bool],
        eval_scores: Dict[str, float],
        meta_info: Optional[Dict] = None,
    ) -> None:
        scores = {k: v for k, v in eval_scores.items() if not isinstance(v, str)}
        if meta_info:
            scores.update(meta_info)
        keys = sorted(scores)
        for metric, is_keep in metrics_keep.items():
            if not is_keep:
                continue
            path = self._metric_dir(metric)
            path.mkdir(parents=True, exist_ok=True)
            with open(path / self.score_file, "w") as f:
                f.write("\t".join(keys) + "\n")
                f.write("\t".join(f"{scores[k]:.5f}" for k in keys) + "\n")

    def best_checkpoint_dir(self, metric: str) -> Optional[Path]:
        """Directory of the promoted best checkpoint for `metric`."""
        d = self._metric_dir(metric)
        if not d.exists():
            return None
        steps = [p for p in d.iterdir() if p.is_dir() and p.name.isdigit()]
        if not steps:
            return None
        return max(steps, key=lambda p: int(p.name))


# Default metric/mode set tracked for audio classification, mirroring
# the best-keep flags on the reference's metric ops
# (metrics/ops/non_tensor_ops.py is_for_best_keep properties).
DEFAULT_BEST_METRICS = {
    "accuracy": "max",
    "loss": "min",
}
