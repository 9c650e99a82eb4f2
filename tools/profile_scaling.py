#!/usr/bin/env python
"""Stage-level batch-scaling profiler for the fused train step (real TPU).

Answers: why does train utt/s change with batch size?  Times each pipeline
stage in isolation — device-side batch gather, fused augmentation, MFCC
front end — plus the full fused train step, across a sweep of batch sizes.

Technique (CLAUDE.md): every stage runs as a device-side fori_loop with a
TRACED trip count (one compile per stage/batch), with a nonlinear reduction
(sum of squares) carried through the loop so XLA can neither hoist the body
nor algebraically eliminate it.  Per-iteration time is the difference
between two trip counts, which cancels the tunnel round-trip and dispatch
overhead.  Completion is forced with float() fetches (block_until_ready is
not a reliable barrier through the axon tunnel).

Usage:
  python tools/profile_scaling.py --batches 1024 2048 4096 8192
Prints one JSON line per (stage, batch) and a final summary table.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    from tcresnet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import dataclasses
    import tempfile

    import jax
    import jax.numpy as jnp

    from tcresnet_tpu.config import get_preset
    from tcresnet_tpu.data.device_data import DeviceDataset
    from tcresnet_tpu.data.synthetic import make_synthetic_dataset
    from tcresnet_tpu.ops import augment as aug
    from tcresnet_tpu.ops import dsp
    from tcresnet_tpu.parallel import make_mesh
    from tcresnet_tpu.train.trainer import Trainer

    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+",
                   default=[1024, 2048, 4096, 8192])
    p.add_argument("--stages", nargs="+",
                   default=["sample", "augment", "augment_xla", "mfcc", "step"])
    p.add_argument("--dataset-size", type=int, default=24_100)
    p.add_argument("--n1", type=int, default=10)
    p.add_argument("--n2", type=int, default=60)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--dsp-backend", default="xla",
                   choices=["xla", "pallas", "auto"])
    args = p.parse_args(argv)

    import dataclasses as _dc

    cfg0 = get_preset("TCResNet8-1.0")
    cfg0 = cfg0.replace(
        audio=_dc.replace(cfg0.audio, dsp_backend=args.dsp_backend)
    )
    host = make_synthetic_dataset(
        num_samples=args.dataset_size, num_classes=12,
        desired_samples=16000, seed=0,
    )
    mesh = make_mesh(cfg0.mesh)
    data = DeviceDataset(host, mesh)
    arrays = data.arrays
    noise = data.noise_bank
    platform = mesh.devices.flat[0].platform if mesh else jax.default_backend()

    def timed_loop(make_body, n1, n2):
        """Compile loop(n) once; return seconds/iter from the n2-n1 diff.

        The dataset arrays are explicit jit arguments — closing over them
        would embed them as HLO constants and blow the remote-compile
        request size limit through the tunnel.
        """

        @jax.jit
        def run(n, arrs, nz):
            return jax.lax.fori_loop(0, n, make_body(arrs, nz), jnp.float32(0.0))

        float(run(jnp.int32(2), arrays, noise))  # compile + warm
        t0 = time.perf_counter()
        float(run(jnp.int32(n1), arrays, noise))
        t1 = time.perf_counter()
        float(run(jnp.int32(n2), arrays, noise))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (n2 - n1)

    def make_stage_body(batch, stage):
        cfg = cfg0

        clip = cfg.audio.desired_samples

        def factory(arrs, nz):
            def body(i, acc):
                key = jax.random.fold_in(jax.random.key(7), i)
                ks, ka = jax.random.split(key)
                if stage in ("gather_augment", "gather_augment_mfcc"):
                    # v5: gather+decode+augment in one kernel pass
                    idx, labels, silent = DeviceDataset.sample_indices(
                        arrs, ks, batch, mesh
                    )
                    x = aug.augment_gathered(
                        arrs[0], idx, silent, ka, cfg.augment, nz,
                        is_training=True, clip_len=clip, platform=platform,
                    )
                    if stage == "gather_augment_mfcc":
                        x = dsp.preprocess(x, cfg.audio)
                    return acc + jnp.sum(x.astype(jnp.float32) ** 2)
                wavs, labels, silent = DeviceDataset.sample_batch(
                    arrs, ks, batch, mesh, clip_len=clip
                )
                x = wavs
                if stage in ("augment", "augment_xla", "mfcc", "mfcc_pallas"):
                    plat = "cpu" if stage == "augment_xla" else platform
                    x = aug.augment(
                        x, silent, ka, cfg.augment, nz,
                        is_training=True, platform=plat, mesh=mesh,
                    )
                if stage == "mfcc":
                    x = dsp.preprocess(x, cfg.audio)
                if stage == "mfcc_pallas":
                    from tcresnet_tpu.ops.pallas.mfcc import fused_mfcc

                    x = fused_mfcc(x, cfg.audio)
                return acc + jnp.sum(x.astype(jnp.float32) ** 2)

            return body

        return factory

    results = []
    for batch in args.batches:
        for stage in args.stages:
            if stage == "step":
                cfg = cfg0.replace(
                    train=dataclasses.replace(
                        cfg0.train, batch_size=batch, max_step=10**9,
                        compute_dtype=args.dtype,
                    )
                )
                with tempfile.TemporaryDirectory() as tmp:
                    trainer = Trainer(
                        cfg, data, mesh=mesh, workdir=tmp, steps_per_call=50
                    )
                    state = trainer.state
                    state, s = trainer._train_fn(state, *arrays, noise)
                    float(s["total_loss"])  # compile + warm
                    t0 = time.perf_counter()
                    state, s = trainer._train_fn(state, *arrays, noise)
                    float(s["total_loss"])
                    t1 = time.perf_counter()
                    for _ in range(5):
                        state, s = trainer._train_fn(state, *arrays, noise)
                    float(s["total_loss"])
                    t2 = time.perf_counter()
                    sec = ((t2 - t1) - (t1 - t0)) / (4 * 50)
            else:
                sec = timed_loop(make_stage_body(batch, stage), args.n1, args.n2)
            row = {
                "stage": stage,
                "batch": batch,
                "us_per_iter": round(sec * 1e6, 1),
                "us_per_utt": round(sec * 1e6 / batch, 4),
                "utt_per_s": round(batch / sec, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    # summary table: rows = batch, cols = stage us_per_iter
    stages = args.stages
    print("\nbatch | " + " | ".join(f"{s} µs" for s in stages))
    for batch in args.batches:
        vals = [
            next(
                (r["us_per_iter"] for r in results
                 if r["batch"] == batch and r["stage"] == s),
                float("nan"),
            )
            for s in stages
        ]
        print(f"{batch:5d} | " + " | ".join(f"{v:10.1f}" for v in vals))


if __name__ == "__main__":
    main()
