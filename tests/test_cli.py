"""In-process CLI smoke tests (tools/train.py, tools/evaluate.py)."""

import json
from pathlib import Path

import numpy as np

from tools.evaluate import main as evaluate_main
from tools.train import build_config, expand_train_dir, main as train_main, parse_args


def test_expand_train_dir_placeholders():
    args = parse_args(["--preset", "TCResNet8-1.5", "--synthetic"])
    cfg = build_config(args)
    out = expand_train_dir("runs/%DATE%_%USER%_bs%BATCH_SIZE%_wm%WIDTH_MULTIPLIER%", cfg)
    assert "%" not in out
    assert "bs100" in out and "wm1.5" in out


def test_config_overrides():
    args = parse_args([
        "--preset", "TCResNet8-1.0", "--synthetic", "--max-step", "7",
        "--batch-size", "3", "--compute-dtype", "bfloat16", "--num-silent", "5",
    ])
    cfg = build_config(args)
    assert cfg.train.max_step == 7
    assert cfg.train.batch_size == 3
    assert cfg.train.compute_dtype == "bfloat16"
    assert cfg.augment.num_silent == 5
    assert cfg.data.use_synthetic


def test_generic_cfg_overrides():
    """--cfg section.field=value reaches any config field (the
    dataclass-era equivalent of the reference's per-field flags)."""
    import pytest

    args = parse_args([
        "--preset", "TCResNet8-1.0", "--synthetic",
        "--cfg", "train.max_step_from_restore=123",
        "--cfg", "optim.lr_list=[0.5,0.05]",
        "--cfg", "optim.optimizer=adam",
        "--cfg", "train.class_sampling_factor=7",
    ])
    cfg = build_config(args)
    assert cfg.train.max_step_from_restore == 123
    assert cfg.optim.lr_list == (0.5, 0.05)
    assert cfg.optim.optimizer == "adam"
    assert cfg.train.class_sampling_factor == 7

    bad = parse_args(
        ["--preset", "TCResNet8-1.0", "--synthetic", "--cfg", "train.nope=1"]
    )
    with pytest.raises(SystemExit):
        build_config(bad)


def test_train_then_evaluate_cli(tmp_path):
    """Full CLI round trip: train -> checkpoint -> eval once."""
    run = str(tmp_path / "run")
    train_main([
        "--preset", "TCResNet8-1.0", "--synthetic", "--synthetic-samples", "96",
        "--max-step", "6", "--batch-size", "16", "--train-dir", run,
        "--eval-split", "",
    ])
    assert (Path(run) / "ckpt").exists()
    metrics = [
        json.loads(l)
        for l in (Path(run) / "train_metrics.jsonl").read_text().splitlines()
    ]
    assert metrics and metrics[-1]["step"] == 6

    evaluate_main([
        "--preset", "TCResNet8-1.0", "--synthetic", "--synthetic-samples", "96",
        "--train-dir", run, "--split", "valid", "--valid-type", "once",
    ])
    valid = [
        json.loads(l)
        for l in (Path(run) / "valid_metrics.jsonl").read_text().splitlines()
    ]
    assert valid and "accuracy" in valid[-1]
    # best promotion happened
    assert (Path(run) / "best" / "valid" / "accuracy" / "scores.tsv").exists()


def test_none_field_cfg_override_typing():
    """Overrides onto fields whose current value is None are validated
    against the declared dataclass type (ADVICE r2: junk used to be
    stored raw and fail opaquely inside tracing)."""
    import pytest

    ok = build_config(parse_args([
        "--preset", "TCResNet8-1.0", "--synthetic",
        "--cfg", "model.bn_momentum=0.9",
        "--cfg", "data.oversampling_ratio=1",
    ]))
    assert ok.model.bn_momentum == 0.9
    assert ok.data.oversampling_ratio == 1.0  # int coerced to float

    for bad in ["model.bn_momentum=abc", "model.bn_momentum=true",
                "data.oversampling_ratio=[1,2]",
                "train.max_step=[100]",  # list into a scalar numeric
                "train.max_step=true"]:
        with pytest.raises(SystemExit):
            build_config(parse_args(
                ["--preset", "TCResNet8-1.0", "--synthetic", "--cfg", bad]
            ))


def test_oversampling_reaches_loader(tmp_path):
    """--cfg data.oversampling_ratio inflates the TRAIN split via
    load_split (VERDICT r2 missing #5: the capability existed in
    data/speech_commands.py but was unreachable from the CLI)."""
    from tcresnet_tpu.data import wav as wavlib
    from tools.train import load_split

    root = tmp_path / "gsc"
    # imbalanced: "yes" x1, "no" x5 -> ratio 1.0 inflates yes to >= 5
    rng_sig = (np.arange(2000) % 100 / 100.0 - 0.5).astype(np.float32)
    for split in ("train", "valid"):
        wavlib.write_wav_pcm16(root / split / "yes" / "a.wav", rng_sig)
        for i in range(5):
            wavlib.write_wav_pcm16(root / split / "no" / f"{i}.wav", rng_sig)
    args = parse_args([
        "--preset", "TCResNet8-1.0", "--dataset-root", str(root),
        "--num-silent", "0",
        "--cfg", "model.num_classes=2",
        "--cfg", "data.oversampling_ratio=1.0",
    ])
    cfg = build_config(args)
    train = load_split(cfg, "train")
    # literal reference semantics incl. the n=5 scale quirk
    # (data_wrapper_base.py:219-248): ratio = int(max(need/cnt,1)*5+.5),
    # so yes 1*25=25 and no 5*5=25 LOGICAL entries. Physical rows stay
    # unique (6 wavs): duplication lives in the sample_row index map,
    # so the decode cache and HBM never grow with the ratio.
    assert train.num_logical_samples == 50
    assert train.num_samples == 6
    assert train.sample_row is not None and len(train.sample_row) == 50
    # every logical entry points at a physical row with the same label
    labels_of_rows = train.labels[train.sample_row]
    import collections

    by_label = collections.Counter(labels_of_rows.tolist())
    # yes (1 file) inflated x25, no (5 files) x5 -> 25 entries each
    assert sorted(by_label.values()) == [25, 25]
    valid = load_split(cfg, "valid")  # eval splits are never oversampled
    assert valid.num_samples == 6 and valid.sample_row is None

    # ratio 0 means OFF (DataConfig doc) — must not trip oversample()'s
    # max(ratio, 1.0)*5 floor and silently inflate the split x5
    args0 = parse_args([
        "--preset", "TCResNet8-1.0", "--dataset-root", str(root),
        "--num-silent", "0",
        "--cfg", "model.num_classes=2",
        "--cfg", "data.oversampling_ratio=0",
    ])
    assert load_split(build_config(args0), "train").num_samples == 6


def test_run_config_persisted_and_reloaded(tmp_path):
    """The trainer persists the EFFECTIVE config (config.json); evaluate
    rebuilds from it, so a run trained with --cfg overrides (e.g. width)
    is never silently rebuilt from the bare preset — which would fail at
    restore or, worse, score the wrong model."""
    from tools.train import load_run_config

    run = str(tmp_path / "run")
    train_main([
        "--preset", "TCResNet8-1.0", "--synthetic", "--synthetic-samples", "96",
        "--max-step", "4", "--batch-size", "16", "--train-dir", run,
        "--eval-split", "",
        "--cfg", "model.width_multiplier=1.5",
        "--cfg", "model.bn_momentum=0.9",
    ])
    saved = load_run_config(run)
    assert saved is not None
    assert saved.model.width_multiplier == 1.5
    assert saved.model.bn_momentum == 0.9
    assert saved.data.use_synthetic and saved.data.synthetic_num_samples == 96
    # evaluate WITHOUT re-stating the overrides: must pick up the saved
    # config (a bare-preset rebuild would die on a param-shape mismatch)
    evaluate_main([
        "--preset", "TCResNet8-1.0", "--train-dir", run,
        "--split", "valid", "--valid-type", "once", "--device", "cpu",
    ])
    # missing config.json -> None (preset fallback path)
    assert load_run_config(str(tmp_path / "nope")) is None


def test_run_experiment_forwards_cfg(tmp_path):
    """--cfg overrides reach every child process of the orchestrator."""
    from tools.run_experiment import build_commands, parse_args as rx_parse

    args = rx_parse([
        "--preset", "TCResNet8-1.0", "--synthetic",
        "--train-dir", str(tmp_path / "x"),
        "--cfg", "optim.use_ema=true",
        "--cfg", "train.class_sampling_factor=3",
    ])
    for cmd in build_commands(args, str(tmp_path / "x")):
        joined = " ".join(cmd)
        assert "--cfg optim.use_ema=true" in joined
        assert "--cfg train.class_sampling_factor=3" in joined


def test_add_null_class_reachable(tmp_path):
    """--cfg data.add_null_class=false drops the __null__ class entirely
    (reference --no-add_null_class, data_wrapper_base.py:259-262)."""
    from tcresnet_tpu.data import wav as wavlib
    from tools.train import load_split

    root = tmp_path / "gsc"
    sig = (np.arange(1000) % 50 / 50.0 - 0.5).astype(np.float32)
    for lbl in ("yes", "no"):
        wavlib.write_wav_pcm16(root / "train" / lbl / "a.wav", sig)
    args = parse_args([
        "--preset", "TCResNet8-1.0", "--dataset-root", str(root),
        "--cfg", "model.num_classes=2",
        "--cfg", "data.add_null_class=false",
    ])
    ds = load_split(build_config(args), "train")
    assert ds.label_names == ("no", "yes")  # no __null__ at index 0
    assert ds.num_samples == 2 and not ds.is_silent.any()


def test_config_json_roundtrip_exact():
    """config.json is load-bearing (evaluate/export rebuild from it):
    to_json -> from_json must reproduce the EXACT config, including
    overridden fields, tuples, None-able fields, and every section."""
    import dataclasses as dc

    from tcresnet_tpu.config import ExperimentConfig, get_preset

    for preset in ("TCResNet8-1.0", "Res15Narrow", "DSCNNM", "KWSfpool3"):
        cfg = get_preset(preset)
        assert ExperimentConfig.from_json(cfg.to_json()) == cfg, preset

    cfg = get_preset("TCResNet8-1.0")
    cfg = cfg.replace(
        model=dc.replace(cfg.model, bn_momentum=0.9, width_multiplier=1.5),
        optim=dc.replace(cfg.optim, lr_list=(0.5,), boundaries=(),
                         trainable_scopes=("fc",)),
        data=dc.replace(cfg.data, oversampling_ratio=0.5,
                        exclude_metric_names=("mAP_samples",),
                        add_null_class=False),
    )
    assert ExperimentConfig.from_json(cfg.to_json()) == cfg
