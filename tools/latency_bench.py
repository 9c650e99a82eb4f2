#!/usr/bin/env python
"""Per-model compiled-inference latency sweep (real TPU).

TPU analog of the reference's on-device benchmark run
(tflite_tools/run_benchmark.sh + README.md:100-108, e.g. TCResNet14-1.5
avg=5701.96 µs on a Pixel CPU): for each preset, AOT-compile the
wav->softmax inference function at batch 1 and measure per-inference
latency with the tunnel-free device-side fori_loop protocol
(serve/benchmark.benchmark_on_device). Random-init params — latency does
not depend on weight values.

Usage:
  python tools/latency_bench.py                      # all presets
  python tools/latency_bench.py --models TCResNet8-1.0 Res15
Prints one JSON line per model and a markdown table at the end.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    from tcresnet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tcresnet_tpu.config import PRESETS, get_preset
    from tcresnet_tpu.models import build_model, param_count
    from tcresnet_tpu.ops import dsp
    from tcresnet_tpu.serve.benchmark import benchmark_on_device
    from tcresnet_tpu.serve.export import build_inference_fn

    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="+", default=sorted(PRESETS))
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-runs", type=int, default=None,
                   help="runs per fori_loop diff (default: 50 for the "
                        "XLA row, 500 for the single-digit-us fused row "
                        "— see the fused-row comment)")
    p.add_argument("--include-preprocess", action="store_true", default=True)
    p.add_argument("--features-only", dest="include_preprocess",
                   action="store_false",
                   help="benchmark features->softmax (no DSP front end)")
    args = p.parse_args(argv)

    rows = []
    for name in args.models:
        cfg = get_preset(name)
        shape = dsp.feature_shape(cfg.audio)
        model = build_model(cfg.model, shape, cfg.train.compute_dtype)
        sample = jnp.zeros((2,) + shape, jnp.float32)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            sample, training=True,
        )
        fn = build_inference_fn(
            cfg, dict(variables), include_preprocess=args.include_preprocess
        )
        if args.include_preprocess:
            in_shape = (args.batch_size, cfg.audio.desired_samples)
        else:
            in_shape = (args.batch_size,) + shape
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, in_shape).astype(np.float32))
        dev = benchmark_on_device(fn, x, num_runs=args.num_runs or 50)
        row = {
            "model": name,
            "params": param_count(variables["params"]),
            "input": "x".join(map(str, in_shape)),
            "device_avg_us": round(dev["avg"], 2),
            "device_spread_us": [round(dev["min"], 2), round(dev["max"], 2)],
            # adaptive-repeat protocol (serve/benchmark.py): how many
            # diff samples the row rests on and whether the trimmed
            # spread converged to within ±25% of the median
            "device_repeats": int(dev["repeats"]),
            "device_converged": bool(dev["converged"]),
        }
        from tcresnet_tpu.ops.pallas.infer import fused_infer_available
        from tcresnet_tpu.ops.pallas.infer2d import fused_infer2d_available

        fusable = fused_infer_available(
            cfg.model, cfg.audio
        ) or fused_infer2d_available(cfg.model, cfg.audio)
        if args.include_preprocess and fusable:
            fused_fn = build_inference_fn(
                cfg, dict(variables), include_preprocess=True, backend="fused"
            )
            # Fused latencies are single-digit us; at the default 50 runs
            # the diffed wall-times are ~ms against a ~30 ms tunnel RTT
            # and the per-repeat samples can even go negative. 500 runs
            # puts the signal well above host jitter.
            fdev = benchmark_on_device(
                fused_fn, x, num_runs=args.num_runs or 500
            )
            row["fused_kernel_avg_us"] = round(fdev["avg"], 2)
            row["fused_kernel_spread_us"] = [
                round(fdev["min"], 2), round(fdev["max"], 2)
            ]
            row["fused_repeats"] = int(fdev["repeats"])
            row["fused_converged"] = bool(fdev["converged"])
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| model | params | input | device median µs (min–max) | fused kernel µs (min–max) |")
    print("|---|---|---|---|---|")
    for r in rows:
        fused = (
            f"{r['fused_kernel_avg_us']:.2f} "
            f"({r['fused_kernel_spread_us'][0]:.2f}–{r['fused_kernel_spread_us'][1]:.2f})"
            if "fused_kernel_avg_us" in r else "—"
        )
        print(
            f"| {r['model']} | {r['params']:,} | {r['input']} "
            f"| {r['device_avg_us']:.2f} "
            f"({r['device_spread_us'][0]:.2f}–{r['device_spread_us'][1]:.2f}) "
            f"| {fused} |"
        )


if __name__ == "__main__":
    main()
