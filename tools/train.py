#!/usr/bin/env python
"""Train CLI.

Reference parity: /root/reference/train_audio.py (+ the shell scripts in
scripts/commands/). Select a preset or compose config overrides;
train_dir supports the reference's %DATE%/%USER% placeholders
(common/utils.py:22-59).

Examples:
  python tools/train.py --preset TCResNet8-1.0 --dataset-root ~/gsc_v1 \
      --train-dir runs/%DATE%_tcresnet8
  python tools/train.py --preset TCResNet8-1.0 --synthetic --max-step 500
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import getpass
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def expand_train_dir(train_dir: str, cfg=None) -> str:
    """%DATE% / %USER% / %<CONFIG_FIELD>% placeholder expansion
    (common/utils.py:22-59 — the reference also expands any flag name,
    e.g. %BATCH_SIZE% or %WIDTH_MULTIPLIER%, into its value)."""
    out = train_dir.replace(
        "%DATE%", datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    ).replace("%USER%", getpass.getuser())
    if cfg is not None and "%" in out:
        for section in dataclasses.fields(cfg):
            sub = getattr(cfg, section.name)
            for f in dataclasses.fields(sub):
                ph = f"%{f.name.upper()}%"
                if ph in out:
                    v = getattr(sub, f.name)
                    if isinstance(v, (list, tuple)):
                        v = ",".join(map(str, v))
                    v = str(v)
                    out = out.replace(ph, "UNKNOWN" if "/" in v else v)
    return out


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="TCResNet8-1.0")
    p.add_argument("--dataset-root", default=None)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--train-dir", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic dataset (no Speech Commands needed)")
    p.add_argument("--synthetic-samples", type=int, default=4096)
    p.add_argument("--max-step", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--compute-dtype", choices=["float32", "bfloat16"], default=None)
    p.add_argument("--eval-split", default="valid",
                   help="split evaluated after training ('' to skip)")
    p.add_argument("--num-silent", type=int, default=None)
    p.add_argument("--steps-per-call", type=int, default=None)
    p.add_argument("--step-save-checkpoint", type=int, default=None)
    p.add_argument("--clip-duration-ms", type=int, default=None)
    # warm start / transfer (reference: --checkpoint_path + scope flags,
    # common/model_loader.py:42-83)
    p.add_argument("--checkpoint-path", default=None,
                   help="warm-start params from another run's ckpt dir")
    p.add_argument("--checkpoint-include-scopes", nargs="*", default=None)
    p.add_argument("--checkpoint-exclude-scopes", nargs="*", default=None)
    p.add_argument("--ignore-missing-vars", action="store_true")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of the run here")
    p.add_argument("--device", choices=["auto", "cpu"], default="auto",
                   help="cpu: pin to host CPU devices (used by the "
                        "orchestrator to keep the loop evaluator off the "
                        "training chip)")
    p.add_argument("--cfg", action="append", default=[],
                   metavar="SECTION.FIELD=VALUE",
                   help="generic config override, e.g. --cfg "
                        "train.max_step_from_restore=1000 --cfg "
                        "optim.lr_list='[0.1,0.01]' (JSON values; the "
                        "dataclass-era equivalent of the reference's "
                        "per-field argparse flags)")
    return p.parse_args(argv)


def _check_declared_type(sub, field, val, path, raw):
    """Validate/coerce an override for a field whose current value is None.

    Unwraps Optional[...] from the dataclass annotation and checks the
    JSON-decoded value against it (ADVICE r2: `--cfg model.bn_momentum=abc`
    used to store the raw string and fail opaquely inside tracing).
    """
    import types
    import typing

    hints = typing.get_type_hints(type(sub))
    declared = hints.get(field)
    if declared is None:
        return val
    origin = typing.get_origin(declared)
    if origin is typing.Union or origin is types.UnionType:
        non_none = [a for a in typing.get_args(declared) if a is not type(None)]
        if len(non_none) != 1:
            return val
        declared = non_none[0]
        origin = typing.get_origin(declared)
    if declared is float:
        if isinstance(val, bool) or not isinstance(val, (int, float)):
            raise SystemExit(f"--cfg {path} expects a number, got {raw!r}")
        return float(val)
    if declared is int:
        if isinstance(val, bool) or not isinstance(val, int):
            raise SystemExit(f"--cfg {path} expects an integer, got {raw!r}")
        return val
    if declared is bool:
        if not isinstance(val, bool):
            raise SystemExit(f"--cfg {path} expects a JSON bool, got {raw!r}")
        return val
    if declared is str:
        if not isinstance(val, str):
            raise SystemExit(f"--cfg {path} expects a string, got {raw!r}")
        return val
    if origin is tuple and not isinstance(val, tuple):
        raise SystemExit(f"--cfg {path} expects a JSON list, got {raw!r}")
    return val


def apply_cfg_overrides(cfg, items):
    """Apply SECTION.FIELD=VALUE overrides; unknown fields raise."""
    import json

    for item in items:
        path, sep, raw = item.partition("=")
        if not sep:
            raise SystemExit(f"--cfg expects SECTION.FIELD=VALUE, got {item!r}")
        section, sep2, field = path.partition(".")
        sub = getattr(cfg, section, None)
        if not sep2 or sub is None or not hasattr(sub, field):
            raise SystemExit(f"Unknown config field {path!r}")
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            val = raw  # bare strings, e.g. optim.optimizer=adam
        if isinstance(val, list):
            val = tuple(val)
        old = getattr(sub, field)
        # type-check against the current value: a tuple field given a
        # scalar (or vice versa) would be stored as-is by dataclasses
        # and silently misbehave downstream (e.g. a bare string iterated
        # character-by-character by exclude_metric_names)
        if isinstance(old, tuple) and not isinstance(val, tuple):
            raise SystemExit(
                f"--cfg {path} expects a JSON list, got {raw!r}"
            )
        if isinstance(old, bool) != isinstance(val, bool) and old is not None:
            if isinstance(old, bool) or isinstance(val, bool):
                raise SystemExit(f"--cfg {path} expects a JSON bool, got {raw!r}")
        if isinstance(old, (int, float)) and not isinstance(old, bool):
            if not isinstance(val, (int, float)) or isinstance(val, bool):
                # reject strings AND lists/bools: [100] into max_step
                # would fail with a TypeError deep inside the train loop
                raise SystemExit(f"--cfg {path} expects a number, got {raw!r}")
            val = type(old)(val)
        if old is None and val is not None:
            # Current value gives no type signal — validate against the
            # dataclass field's declared type so a bad override fails here
            # instead of deep inside jit tracing.
            val = _check_declared_type(sub, field, val, path, raw)
        cfg = cfg.replace(**{section: dataclasses.replace(sub, **{field: val})})
    return cfg


def select_devices(device: str):
    """Returns the device list for the mesh; pins the default device when
    forced to CPU (TPU plugins register regardless of JAX_PLATFORMS)."""
    import jax

    if device == "cpu":
        cpus = jax.devices("cpu")
        jax.config.update("jax_default_device", cpus[0])
        return cpus
    return None  # make_mesh default: all devices


def load_run_config(train_dir):
    """The config a run was actually trained with (<train_dir>/config.json,
    written by Trainer), or None. Evaluate/export use it as their config
    base so a run trained with --cfg overrides (width, dtype, features)
    is never silently rebuilt from the bare preset."""
    from tcresnet_tpu.config import ExperimentConfig

    p = Path(train_dir) / "config.json" if train_dir else None
    if p and p.is_file():
        return ExperimentConfig.from_json(p.read_text())
    return None


def build_config(args, base=None):
    from tcresnet_tpu.config import get_preset

    cfg = base if base is not None else get_preset(args.preset)
    train_kw = {}
    for field, attr in [
        ("max_step", "max_step"), ("batch_size", "batch_size"), ("seed", "seed"),
        ("compute_dtype", "compute_dtype"),
        ("step_save_checkpoint", "step_save_checkpoint"),
    ]:
        v = getattr(args, attr, None)
        if v is not None:
            train_kw[field] = v
    if getattr(args, "clip_duration_ms", None):
        cfg = cfg.replace(
            audio=dataclasses.replace(cfg.audio, clip_duration_ms=args.clip_duration_ms)
        )
    if args.train_dir:
        train_kw["train_dir"] = args.train_dir  # expanded below, with cfg
    if train_kw:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **train_kw))
    data_kw = {}
    if args.dataset_root:
        data_kw["dataset_root"] = args.dataset_root
    if args.cache_dir:
        data_kw["cache_dir"] = args.cache_dir
    if args.synthetic:
        data_kw["use_synthetic"] = True
        data_kw["synthetic_num_samples"] = args.synthetic_samples
    if data_kw:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, **data_kw))
    if args.num_silent is not None:
        cfg = cfg.replace(
            augment=dataclasses.replace(cfg.augment, num_silent=args.num_silent)
        )
    if getattr(args, "cfg", None):
        cfg = apply_cfg_overrides(cfg, args.cfg)
    if "%" in cfg.train.train_dir:
        cfg = cfg.replace(
            train=dataclasses.replace(
                cfg.train, train_dir=expand_train_dir(cfg.train.train_dir, cfg)
            )
        )
    return cfg


def load_split(cfg, split):
    from tcresnet_tpu.data import load_speech_commands, make_synthetic_dataset

    if cfg.data.use_synthetic:
        n = cfg.data.synthetic_num_samples
        if split != "train":
            n = max(n // 8, 128)
        return make_synthetic_dataset(
            num_samples=n,
            num_classes=cfg.model.num_classes,
            desired_samples=cfg.audio.desired_samples,
            sample_rate=cfg.audio.sample_rate,
            seed=0 if split == "train" else 1,
            split=split,
        )
    if not cfg.data.dataset_root:
        raise SystemExit("--dataset-root is required (or pass --synthetic)")
    return load_speech_commands(
        cfg.data.dataset_root,
        split,
        desired_samples=cfg.audio.desired_samples,
        num_silent=cfg.augment.num_silent,
        cache_dir=cfg.data.cache_dir or None,
        # Train-split only, like the reference (oversampling is applied to
        # the training file list, data_wrapper_base.py:219-248).
        oversampling_ratio=(
            cfg.data.oversampling_ratio if split == "train" else None
        ),
        # fail loudly on wrong-rate wavs (feature geometry is rate-fixed)
        sample_rate=cfg.audio.sample_rate,
        add_null_class=cfg.data.add_null_class,
    )


def main(argv=None):
    from tcresnet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    args = parse_args(argv)
    cfg = build_config(args)

    from tcresnet_tpu.data.device_data import DeviceDataset
    from tcresnet_tpu.evaluation.watcher import WatchingEvaluator
    from tcresnet_tpu.parallel import make_mesh
    from tcresnet_tpu.train import Trainer
    from tcresnet_tpu.utils import get_logger

    log = get_logger("train_cli")
    mesh = make_mesh(cfg.mesh, devices=select_devices(args.device))
    log.info(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    train_host = load_split(cfg, "train")
    trainer = Trainer(
        cfg, DeviceDataset(train_host, mesh), mesh=mesh,
        workdir=cfg.train.train_dir, steps_per_call=args.steps_per_call,
    )
    if args.checkpoint_path:
        trainer.warm_start(
            args.checkpoint_path,
            include_scopes=args.checkpoint_include_scopes,
            exclude_scopes=args.checkpoint_exclude_scopes,
            ignore_missing=args.ignore_missing_vars,
        )

    from tcresnet_tpu.utils.profiling import trace

    with trace(args.profile_dir):
        state = trainer.train(args.max_step)
    log.info(f"training done at step {int(state.step)}")

    if args.eval_split:
        try:
            eval_host = load_split(cfg, args.eval_split)
        except (FileNotFoundError, SystemExit) as e:
            log.warning(f"skipping eval: {e}")
            return
        watcher = WatchingEvaluator(
            cfg, DeviceDataset(eval_host, mesh), trainer.workdir, mesh=mesh
        )
        scores = watcher.evaluate_once(int(state.step))
        log.info(
            f"{args.eval_split}: accuracy {scores['accuracy']:.4f} "
            f"loss {scores['loss']:.4f}"
        )


if __name__ == "__main__":
    main()
