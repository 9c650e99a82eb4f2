#!/usr/bin/env python
"""Benchmark sweep across model presets — the full bench matrix.

Covers BASELINE.json's configs list: flagship TC-ResNets, DS-CNN, KWS
baselines, Res nets. For each preset measures (a) train throughput of
the fused step and (b) AOT inference latency with the 10-warmup/50-run
protocol (tflite_tools/run_benchmark.sh parity). Writes a JSON report.

Example:
  python tools/benchmark.py --presets TCResNet8-1.0 TCResNet14-1.5 \
      --batch 1024 --out bench_report.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_PRESETS = [
    "TCResNet8-1.0",
    "TCResNet14-1.5",
    "DSCNNS",
    "KWSfpool3",
    "Res8",
    "Res15",
]


def bench_preset(name: str, batch: int, steps_per_call: int, dtype: str, host,
                 conv_backend: str = None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tcresnet_tpu.config import get_preset
    from tcresnet_tpu.data.device_data import DeviceDataset
    from tcresnet_tpu.parallel import make_mesh
    from tcresnet_tpu.serve.benchmark import benchmark_compiled
    from tcresnet_tpu.serve.export import compile_inference
    from tcresnet_tpu.train.trainer import Trainer

    cfg = get_preset(name)
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, batch_size=batch, max_step=10**9, compute_dtype=dtype
        )
    )
    if conv_backend:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, conv_backend=conv_backend)
        )
    mesh = make_mesh(cfg.mesh)
    result = {"preset": name, "batch": batch, "compute_dtype": dtype}
    if conv_backend:
        result["conv_backend"] = conv_backend

    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(
            cfg, DeviceDataset(host, mesh), mesh=mesh, workdir=tmp,
            steps_per_call=steps_per_call,
        )
        arrays, noise = trainer.data.arrays, trainer.data.noise_bank
        state = trainer.state
        state, summary = trainer._train_fn(state, *arrays, noise)
        float(summary["total_loss"])  # forced sync (tunnel barrier)
        calls = 3
        t0 = time.perf_counter()
        for _ in range(calls):
            state, summary = trainer._train_fn(state, *arrays, noise)
        assert float(summary["total_loss"]) >= 0
        dt = time.perf_counter() - t0
        result["train_utt_per_sec"] = round(batch * steps_per_call * calls / dt, 1)
        result["train_ms_per_step"] = round(dt / (steps_per_call * calls) * 1e3, 3)

        compiled, in_shape = compile_inference(cfg, state, batch_size=1)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, in_shape).astype(np.float32)
        )
        stats = benchmark_compiled(compiled, x)
        result["infer_latency_us"] = {
            k: round(v, 1) for k, v in stats.items() if k != "count"
        }
    return result


def main(argv=None):
    from tcresnet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--presets", nargs="*", default=DEFAULT_PRESETS)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--steps-per-call", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--num-samples", type=int, default=8192)
    p.add_argument("--conv-backend", default=None,
                   help="override ModelConfig.conv_backend for every "
                        "preset (e.g. im2col for the Res families)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from tcresnet_tpu.data.synthetic import make_synthetic_dataset

    host = make_synthetic_dataset(
        num_samples=args.num_samples, num_classes=12, desired_samples=16000
    )
    results = []
    for name in args.presets:
        print(f"benchmarking {name}...", file=sys.stderr, flush=True)
        try:
            r = bench_preset(name, args.batch, args.steps_per_call,
                             args.dtype, host, args.conv_backend)
        except Exception as e:  # record and continue the sweep
            r = {"preset": name, "error": str(e)[:200]}
        results.append(r)
        print(json.dumps(r), flush=True)

    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
