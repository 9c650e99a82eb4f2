#!/usr/bin/env python
"""Export CLI — the freeze.py replacement.

Reference parity: /root/reference/freeze.py (ckpt -> frozen .pb, then
tflite_convert per README.md:56-60). Here: checkpoint -> AOT-compiled
inference function, optionally serialized as a portable StableHLO
artifact (.jaxexport), with softmax-parity verification against the
training graph (BASELINE.md <=1e-5 gate).

Examples:
  python tools/export.py --preset TCResNet8-1.0 --train-dir runs/x \
      --output model.jaxexport
  python tools/export.py --preset TCResNet8-1.0 --train-dir runs/x \
      --no-preprocess --batch-size 1 --benchmark
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="TCResNet8-1.0")
    p.add_argument("--train-dir", required=True)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--output", default=None, help="write serialized artifact here")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--no-preprocess", action="store_true",
                   help="export the features->softmax graph only "
                        "(freeze.py include_preprocess=False parity)")
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--benchmark", action="store_true",
                   help="run the 10-warmup/50-run latency protocol")
    p.add_argument("--best-metric", default=None,
                   help="load the promoted best ckpt for this metric "
                        "(e.g. accuracy) instead of the latest")
    p.add_argument("--fused-kernel", action="store_true",
                   help="serve via the whole-model single-kernel path "
                        "(ops/pallas/infer.py temporal TC-ResNets, "
                        "ops/pallas/infer2d.py 2D/Res/DS-CNN/KWS — all "
                        "15 presets; requires MFCC preprocessing)")
    p.add_argument("--parity-precision", default="highest",
                   choices=["default", "highest"],
                   help="matmul precision for the fused-vs-XLA parity "
                        "gate: 'highest' restores true-f32 accumulation "
                        "on TPU (default-precision f32 matmuls are "
                        "bf16-pass there) so the <=1e-5 gate holds ON "
                        "THE CHIP; 'default' only logs the agreement "
                        "(~3e-3 on TPU) without gating")
    return p.parse_args(argv)


def main(argv=None):
    from tcresnet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    args = parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from tcresnet_tpu.config import get_preset
    from tcresnet_tpu.ops import dsp
    from tcresnet_tpu.serve.benchmark import (
        benchmark_compiled,
        benchmark_on_device,
        format_report,
    )
    from tcresnet_tpu.serve.export import (
        build_inference_fn,
        compile_inference,
        export_serialized,
    )
    from tcresnet_tpu.evaluation.watcher import WatchingEvaluator  # noqa: F401
    from tcresnet_tpu.train.checkpoint import CheckpointManager
    from tcresnet_tpu.train.optim import build_optimizer
    from tcresnet_tpu.train.state import create_train_state
    from tcresnet_tpu.models import build_model
    from tcresnet_tpu.utils import get_logger
    import jax

    log = get_logger("export_cli")
    from tools.train import load_run_config

    # export must rebuild the EXACT trained model: prefer the run's own
    # saved config over the preset named on the command line
    cfg = load_run_config(args.train_dir)
    if cfg is not None:
        log.info(f"Config base: {args.train_dir}/config.json (run config)")
    else:
        cfg = get_preset(args.preset)

    ckpt_dir = Path(args.train_dir) / "ckpt"
    if args.best_metric:
        from tcresnet_tpu.evaluation.best_keeper import BestKeeper

        bk_dir = Path(args.train_dir) / "best"
        bk = BestKeeper({args.best_metric: "max"}, "valid", bk_dir)
        best = bk.best_checkpoint_dir(args.best_metric)
        if best is None:
            raise SystemExit(f"No promoted best ckpt for {args.best_metric}")
        ckpt_dir = best.parent
        args.step = int(best.name)
        log.info(f"Using best-{args.best_metric} checkpoint: {best}")

    ckpt = CheckpointManager(ckpt_dir)
    shape = dsp.feature_shape(cfg.audio)
    model = build_model(cfg.model, shape, cfg.train.compute_dtype)
    sample = jnp.zeros((2,) + shape, jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        sample, training=True,
    )
    tx, _ = build_optimizer(cfg.optim, params=variables["params"])
    template = create_train_state(
        model, tx, jax.random.key(0), sample, use_ema=cfg.optim.use_ema,
    )
    state = ckpt.restore(template, args.step)

    include_preprocess = not args.no_preprocess
    compiled, in_shape = compile_inference(
        cfg, state, args.batch_size, include_preprocess, args.use_ema
    )
    log.info(f"AOT-compiled inference: input {in_shape} -> softmax")

    # parity check vs the (eval-mode) training graph
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, in_shape).astype(np.float32))
    fn = build_inference_fn(cfg, state, include_preprocess, args.use_ema)
    ref, got = np.asarray(fn(x)), np.asarray(compiled(x))
    max_err = np.abs(ref - got).max()
    log.info(f"softmax parity (AOT vs training graph): max abs {max_err:.2e}")
    assert max_err <= 1e-5, "parity gate failed"

    if args.output:
        data = export_serialized(
            cfg, state, args.batch_size, include_preprocess, args.use_ema
        )
        Path(args.output).write_bytes(bytes(data))
        log.info(f"Wrote {len(data)} bytes to {args.output}")

    fused_fn = None
    if args.fused_kernel:
        fused_fn = build_inference_fn(
            cfg, state, include_preprocess, args.use_ema, backend="fused"
        )
        fused = np.asarray(fused_fn(x))
        log.info(
            "fused-kernel softmax vs XLA path: max abs "
            f"{np.abs(fused - ref).max():.2e} (exact in f32; on TPU the "
            "XLA path's default-precision convs round differently)"
        )
        if args.parity_precision == "highest":
            # the gated parity line: both paths rebuilt with true-f32
            # matmul accumulation (serve/export._with_matmul_precision)
            # — the reference verifies its frozen graph by running it
            # (freeze.py:16-49); this gate holds on the artifact's own
            # platform, TPU included (measured 1.8e-7 on v5e)
            hi_xla = build_inference_fn(
                cfg, state, include_preprocess, args.use_ema,
                backend="xla", precision="highest",
            )
            hi_fused = build_inference_fn(
                cfg, state, include_preprocess, args.use_ema,
                backend="fused", precision="highest",
            )
            err_hi = float(
                np.abs(np.asarray(hi_fused(x)) - np.asarray(hi_xla(x))).max()
            )
            log.info(
                "fused-kernel softmax parity at matmul precision HIGHEST: "
                f"max abs {err_hi:.2e}"
            )
            assert err_hi <= 1e-5, (
                f"fused/XLA parity {err_hi} > 1e-5 at precision=highest"
            )

    if args.benchmark:
        stats = benchmark_compiled(compiled, x)
        log.info(f"host-timed latency (us): {format_report(stats)}")
        dev = benchmark_on_device(fn, x)
        log.info(
            f"device latency (us): count={dev['count']:.0f} "
            f"avg={dev['avg']:.2f}  (tunnel-free, fori_loop-diffed)"
        )
        if fused_fn is not None:
            fdev = benchmark_on_device(fused_fn, x)
            log.info(
                f"fused-kernel device latency (us): count={fdev['count']:.0f} "
                f"avg={fdev['avg']:.2f}"
            )


if __name__ == "__main__":
    main()
