#!/usr/bin/env python
"""Evaluate CLI.

Reference parity: /root/reference/evaluate_audio.py — `--valid-type once`
evaluates the latest (or a specific) checkpoint; `--valid-type loop`
watches the train dir, scores every new checkpoint and promotes bests
(the reference's second-process pattern, SURVEY.md section 1 layer 10).

Examples:
  python tools/evaluate.py --preset TCResNet8-1.0 --train-dir runs/x \
      --dataset-root ~/gsc_v1 --split valid --valid-type loop
  python tools/evaluate.py --preset TCResNet8-1.0 --train-dir runs/x \
      --synthetic --split test --valid-type once
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.train import build_config, load_run_config, load_split  # noqa: E402


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="TCResNet8-1.0")
    p.add_argument("--dataset-root", default=None)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--train-dir", required=True)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-samples", type=int, default=4096)
    p.add_argument("--split", default="valid")
    p.add_argument("--valid-type", choices=["once", "loop"], default="once")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step for --valid-type once (default latest)")
    p.add_argument("--max-step", type=int, default=None)
    p.add_argument("--timeout", type=float, default=None,
                   help="loop mode: stop after this many idle seconds")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--compute-dtype", default=None)
    p.add_argument("--num-silent", type=int, default=None)
    p.add_argument("--clip-duration-ms", type=int, default=None)
    p.add_argument("--best-metric", default=None,
                   help="once mode: load the promoted best checkpoint for "
                        "this metric from <train-dir>/best/<best-split>/"
                        "<metric> (the reference's final test eval loaded "
                        "valid/accuracy, scripts/commands/*.sh:7)")
    p.add_argument("--best-split", default="valid",
                   help="split whose promoted best to load with "
                        "--best-metric (default 'valid', the reference's "
                        "watch split; set this if your loop evaluator "
                        "watched a different split)")
    p.add_argument("--device", choices=["auto", "cpu"], default="auto",
                   help="cpu: pin to host CPU devices (loop evaluator "
                        "alongside a training process on one chip)")
    p.add_argument("--cfg", action="append", default=[],
                   metavar="SECTION.FIELD=VALUE",
                   help="generic config override (same syntax as "
                        "tools/train.py), applied on top of the run's "
                        "saved config.json / the preset")
    return p.parse_args(argv)


def main(argv=None):
    from tcresnet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    args = parse_args(argv)
    # Base the eval config on the RUN's saved config when available
    # (model/width/dtype/features must match the checkpoints being
    # scored); flags and --cfg overrides still apply on top.
    base = load_run_config(args.train_dir)
    cfg = build_config(args, base=base)
    if args.batch_size:
        # the evaluator reads data.eval_batch_size, not train.batch_size
        # (which build_config's shared mapping sets)
        import dataclasses

        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, eval_batch_size=args.batch_size)
        )

    from tcresnet_tpu.data.device_data import DeviceDataset
    from tcresnet_tpu.evaluation.watcher import WatchingEvaluator
    from tcresnet_tpu.parallel import make_mesh
    from tcresnet_tpu.utils import get_logger
    from tools.train import select_devices

    log = get_logger("eval_cli")
    if base is not None:
        log.info(f"Config base: {args.train_dir}/config.json (run config)")
    mesh = make_mesh(cfg.mesh, devices=select_devices(args.device))
    host = load_split(cfg, args.split)
    watcher = WatchingEvaluator(
        cfg, DeviceDataset(host, mesh), args.train_dir, mesh=mesh
    )

    if args.valid_type == "once":
        if args.best_metric:
            # reference final-eval pattern: load the best-valid promotion
            # via BestKeeper's own layout (single source of truth — the
            # same lookup tools/export.py uses)
            from tcresnet_tpu.evaluation.best_keeper import BestKeeper
            from tcresnet_tpu.train.checkpoint import CheckpointManager

            bk = BestKeeper(
                {args.best_metric: "max"}, args.best_split,
                Path(args.train_dir) / "best",
            )
            best = bk.best_checkpoint_dir(args.best_metric)
            if best is None:
                promoted = sorted(
                    str(p.relative_to(Path(args.train_dir) / "best"))
                    for p in (Path(args.train_dir) / "best").glob("*/*")
                ) if (Path(args.train_dir) / "best").exists() else []
                raise SystemExit(
                    f"No promoted best checkpoint for "
                    f"{args.best_split}/{args.best_metric}"
                    + (f" (promoted: {promoted})" if promoted else "")
                )
            watcher.ckpt = CheckpointManager(best.parent)
            if args.step is None:
                args.step = int(best.name)
            log.info(
                f"Loading best-{args.best_split}/{args.best_metric} from {best}"
            )
        step = args.step if args.step is not None else watcher.ckpt.latest_step()
        if step is None:
            raise SystemExit(f"No checkpoints under {args.train_dir}/ckpt")
        scores = watcher.evaluate_once(step)
    else:
        scores = watcher.watch(max_step=args.max_step, timeout=args.timeout)
    if scores:
        for k in sorted(scores):
            if not isinstance(scores[k], str) and "/" not in k:
                log.info(f"{args.split}/{k}: {scores[k]:.5f}")


if __name__ == "__main__":
    main()
