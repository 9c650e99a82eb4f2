#!/usr/bin/env python
"""End-to-end train throughput benchmark (driver-run, real TPU).

Measures steady-state utterances/sec of the FULL flagship training path —
device-side batch sampling from the HBM-resident dataset, augmentation
(shift + background mix + silence), MFCC front end, TCResNet8-1.0
forward/backward, SGD-momentum update — i.e. the same fused step the real
trainer runs, on a Speech-Commands-sized synthetic dataset.

Prints ONE JSON line:
  {"metric": "train_utterances_per_sec", "value": N, "unit": "utt/s",
   "vs_baseline": N / 50000}
vs_baseline is against BASELINE.md's >=50k utt/s end-to-end target.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main(argv=None):
    from tcresnet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import argparse
    import dataclasses
    import tempfile

    import jax

    from tcresnet_tpu.config import get_preset
    from tcresnet_tpu.data.device_data import DeviceDataset
    from tcresnet_tpu.data.synthetic import make_synthetic_dataset
    from tcresnet_tpu.parallel import make_mesh
    from tcresnet_tpu.train.trainer import Trainer

    p = argparse.ArgumentParser()
    # defaults re-tuned on v5e (round 3): batch 1536 + 200-step scans =
    # 640k utt/s vs 592k at the old 1024/50 — longer scans amortize the
    # per-call dispatch through the tunnel, and 1536 sits just under the
    # point where the augment kernel's linear row cost wins over MXU
    # utilization (2048+ measured slower on the 50-step protocol)
    p.add_argument("--batch", type=int, default=1536)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--steps-per-call", type=int, default=200)
    p.add_argument("--dsp-backend", default="auto",
                   choices=["xla", "pallas", "auto"])
    p.add_argument("--frontend", default="auto", choices=["auto", "on", "off"],
                   help="single-kernel gather+augment+MFCC input path")
    p.add_argument("--conv-backend", default="xla", choices=["xla", "pallas"],
                   help="temporal-conv implementation (ops/pallas/tconv.py)")
    args = p.parse_args(argv)

    cfg = get_preset("TCResNet8-1.0")
    # Reference recipe is batch 100 on one GPU (SURVEY.md 6.2); on TPU we
    # scale the per-step batch to fill the chip — throughput is the metric.
    batch = args.batch
    steps_per_call = args.steps_per_call
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, batch_size=batch, max_step=10**9, compute_dtype=args.dtype
        ),
        audio=dataclasses.replace(
            cfg.audio, dsp_backend=args.dsp_backend, frontend_fuse=args.frontend
        ),
        model=dataclasses.replace(cfg.model, conv_backend=args.conv_backend),
    )

    # Speech-Commands-scale dataset resident in HBM (24k utterances).
    host = make_synthetic_dataset(
        num_samples=24_100, num_classes=12, desired_samples=16000, seed=0
    )

    mesh = make_mesh(cfg.mesh)
    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(
            cfg,
            DeviceDataset(host, mesh),
            mesh=mesh,
            workdir=tmp,
            steps_per_call=steps_per_call,
        )
        arrays = trainer.data.arrays
        noise = trainer.data.noise_bank
        state = trainer.state

        # warmup / compile; the float() fetch forces real synchronization
        # (block_until_ready is not a reliable barrier through the axon
        # device tunnel).
        state, summary = trainer._train_fn(state, *arrays, noise)
        float(summary["total_loss"])

        # timed: 5 fused calls = 100 steps; each step depends on the
        # previous state, so fetching the last summary syncs the chain
        calls = 5
        t0 = time.perf_counter()
        for _ in range(calls):
            state, summary = trainer._train_fn(state, *arrays, noise)
        assert float(summary["total_loss"]) > 0
        dt = time.perf_counter() - t0

    utt_per_sec = batch * steps_per_call * calls / dt
    print(
        json.dumps(
            {
                "metric": "train_utterances_per_sec",
                "value": round(utt_per_sec, 1),
                "unit": "utt/s",
                "vs_baseline": round(utt_per_sec / 50000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
