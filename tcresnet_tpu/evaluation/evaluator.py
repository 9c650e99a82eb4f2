"""Full-split evaluation with device-side scoring.

Reference parity: helper/base.py:52-143 (run_inference/run_evaluation)
+ helper/evaluator.py:102-133 (evaluate_once), redesigned TPU-first:

- the eval split lives in HBM (DeviceDataset); a jitted step gathers an
  index batch, runs preprocess+forward in eval mode (background volume 0
  + silence zeroing for naive/v1 mixing — scripts/commands/*.sh:5
  semantics; with naive_background_mix=False, silence rows are mixed
  with noise at U[0,1) even at eval, augmentation_factory.py:81-95) and
  returns softmax scores;
- every sample is evaluated exactly once via pad+mask final batches
  (deviation from the reference's split-dividing batch sizes,
  SURVEY.md 7.4.7);
- metric battery (accuracy/top-5/mAP/per-class/report) computed on host
  from the gathered scores, as the reference did with sklearn;
- wall-clock batch_infer_time / unit_infer_time metrics retained
  (helper/base.py:106-115).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tcresnet_tpu.config import ExperimentConfig
from tcresnet_tpu.data.device_data import DeviceDataset
from tcresnet_tpu.metrics.host_metrics import compute_classification_metrics
from tcresnet_tpu.models import build_model
from tcresnet_tpu.ops import dsp
from tcresnet_tpu.train import loss as losslib
from tcresnet_tpu.utils import get_logger


class Evaluator:
    def __init__(
        self,
        cfg: ExperimentConfig,
        data: DeviceDataset,
        mesh=None,
        model=None,
        use_ema: Optional[bool] = None,
    ):
        self.cfg = cfg
        self.data = data
        self.mesh = mesh
        self.log = get_logger(f"evaluator/{data.split or 'eval'}")
        self.feature_shape = dsp.feature_shape(cfg.audio)
        self.model = model or build_model(
            cfg.model, self.feature_shape, cfg.train.compute_dtype
        )
        self.use_ema = cfg.optim.use_ema if use_ema is None else use_ema
        self._eval_fn = jax.jit(self._eval_step)

    def _eval_step(self, params, batch_stats, arrays, idx, key):
        # arrays are jit ARGUMENTS (closing over them would bake GB-scale
        # HBM datasets into the compiled HLO as constants)
        wavs, labels, silent = DeviceDataset.gather_batch(
            arrays, idx, self.mesh, clip_len=self.cfg.audio.desired_samples
        )
        if (
            getattr(self.cfg.augment, "naive_background_mix", True)
            or self.data.noise_bank is None
        ):
            # naive/v1 eval-mode augmentation: every volume is 0 at eval,
            # so background mixing reduces to silence-row zeroing
            # (eval scripts pass background_frequency 0.0).
            wavs = jnp.where(silent[:, None], 0.0, wavs)
        else:
            # v2 (augmentation_factory.py:81-95): SILENCE rows are mixed
            # with background noise at volume U[0,1) even at eval, so the
            # silence class is scored on the distribution it was trained
            # on. Same eval flags as the reference scripts: no shift,
            # background_frequency/max_volume 0.0 for non-silence rows.
            import dataclasses

            from tcresnet_tpu.ops import augment as auglib

            eval_aug = dataclasses.replace(
                self.cfg.augment,
                method="anchored_slice_or_pad",
                background_frequency=0.0,
                background_max_volume=0.0,
            )
            wavs = auglib.augment_batch(
                wavs, silent, key, eval_aug, self.data.noise_bank,
                is_training=False,
            )
        feats = dsp.preprocess(wavs, self.cfg.audio, mesh=self.mesh)
        logits = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, feats, training=False
        )
        onehot = jax.nn.one_hot(labels, self.cfg.model.num_classes)
        # per-example losses: the final partial batch is padded with
        # duplicate rows, so the mean must be taken on host over the
        # valid rows only (a batch-mean here would bias the eval loss).
        losses = losslib.per_example_softmax_cross_entropy(
            logits, onehot, self.cfg.model.label_smoothing
        )
        return jax.nn.softmax(logits, axis=-1), labels, losses

    def evaluate(
        self, state_or_params, batch_stats=None, include_report: bool = True
    ) -> Dict[str, float]:
        """Evaluate the whole split; returns the metric dict.

        `include_report` adds the sklearn classification report as a
        string under "classification_report" (the reference logged it at
        every eval, metrics/ops/non_tensor_ops.py report op)."""
        if batch_stats is None:
            params = (
                state_or_params.eval_params
                if self.use_ema
                else state_or_params.params
            )
            batch_stats = state_or_params.batch_stats
        else:
            params = state_or_params

        batch = self.cfg.data.eval_batch_size
        all_scores, all_labels, all_losses = [], [], []
        infer_times = []
        arrays = self.data.arrays
        # deterministic per-batch keys: repeated evals of the same state
        # score identically (matters for BestKeeper promotions); only the
        # v2 silence-noise path consumes them
        key_base = jax.random.key(self.cfg.train.seed)
        for ordinal, (idx, mask) in enumerate(
            self.data.eval_index_batches(batch)
        ):
            t0 = time.perf_counter()
            scores, labels, losses = self._eval_fn(
                params, batch_stats, arrays, jnp.asarray(idx),
                jax.random.fold_in(key_base, ordinal),
            )
            # ONE device->host fetch for all three arrays: through a
            # tunneled device each np.asarray is a full round trip, and
            # three of them would dominate small-batch eval loops
            scores, labels, losses = jax.device_get((scores, labels, losses))
            infer_times.append(time.perf_counter() - t0)
            all_scores.append(scores[mask])
            all_labels.append(labels[mask])
            all_losses.append(losses[mask])

        scores = np.concatenate(all_scores)
        labels = np.concatenate(all_labels)
        max_labels = getattr(self.cfg.data, "max_labels_for_class_metrics", 10)
        metrics = compute_classification_metrics(
            scores,
            labels,
            self.data.label_names,
            use_class_metrics=len(self.data.label_names) < max_labels,
            include_report=include_report,
        )
        # exact mean over true samples (padded rows masked out above)
        metrics["loss"] = float(np.mean(np.concatenate(all_losses)))
        metrics["num_samples"] = float(len(labels))
        # steady-state latency stats (skip the compile-laden first batch).
        # NOTE: these are HOST wall-clock times around the device call,
        # matching the reference protocol (helper/base.py:106-115); on a
        # tunneled/remote device they are dominated by the ~30 ms RTT per
        # sync and must not be quoted as device latency — use
        # serve.benchmark.benchmark_on_device for that.
        steady = infer_times[1:] or infer_times
        metrics["batch_infer_time"] = float(np.mean(steady))
        metrics["unit_infer_time"] = float(np.mean(steady)) / batch
        for name in getattr(self.cfg.data, "exclude_metric_names", ()):
            metrics.pop(name, None)
        return metrics
