"""Watching-evaluator integration: train -> watch -> best promotion."""

import numpy as np

from tcresnet_tpu.data.device_data import DeviceDataset
from tcresnet_tpu.data.synthetic import make_synthetic_dataset
from tcresnet_tpu.evaluation.watcher import WatchingEvaluator, checkpoint_iterator
from tcresnet_tpu.train.trainer import Trainer

from tests.test_train import tiny_config


def test_watcher_evaluates_and_promotes(tmp_path):
    host = make_synthetic_dataset(num_samples=192, num_classes=4, desired_samples=4000, seed=4)
    valid = make_synthetic_dataset(num_samples=64, num_classes=4, desired_samples=4000, seed=5)

    cfg = tiny_config(tmp_path / "run", max_step=60)  # ckpts at 30, 60
    trainer = Trainer(cfg, DeviceDataset(host), workdir=tmp_path / "run")
    trainer.train()
    trainer.ckpt.wait()

    valid.split = "valid"
    watcher = WatchingEvaluator(cfg, DeviceDataset(valid), tmp_path / "run")
    scores = watcher.watch(max_step=60, poll_interval=0.1, timeout=1.0)
    assert scores is not None and np.isfinite(scores["loss"])

    # best promoted for accuracy with scores.tsv
    best = watcher.best_keeper.best_checkpoint_dir("accuracy")
    assert best is not None and best.name in ("30", "60")
    tsv = best.parent / "scores.tsv"
    assert tsv.exists()
    header = tsv.read_text().splitlines()[0].split("\t")
    assert "accuracy" in header and "step" in header and "model_size" in header


def test_promotion_survives_checkpoint_gc(tmp_path):
    """The trainer's max_to_keep GC may delete a step dir while the
    evaluator is mid-pass; promotion must still produce a loadable best
    checkpoint (it snapshots the in-memory state, not the source dir)."""
    import shutil

    host = make_synthetic_dataset(num_samples=128, num_classes=4, desired_samples=4000, seed=6)
    valid = make_synthetic_dataset(num_samples=48, num_classes=4, desired_samples=4000, seed=7)
    cfg = tiny_config(tmp_path / "run", max_step=30)
    trainer = Trainer(cfg, DeviceDataset(host), workdir=tmp_path / "run")
    trainer.train()
    trainer.ckpt.wait()

    valid.split = "valid"
    watcher = WatchingEvaluator(cfg, DeviceDataset(valid), tmp_path / "run")

    # Simulate GC racing the eval pass: the step dir vanishes after the
    # watcher restored the state but before promotion.
    orig_evaluate = watcher.evaluator.evaluate

    def evaluate_and_gc(state, *a, **kw):
        shutil.rmtree(watcher.ckpt.directory / "30")
        return orig_evaluate(state, *a, **kw)

    watcher.evaluator.evaluate = evaluate_and_gc
    scores = watcher.evaluate_once(30)
    assert np.isfinite(scores["loss"])

    best = watcher.best_keeper.best_checkpoint_dir("accuracy")
    assert best is not None and best.name == "30"
    # the promoted checkpoint restores into the same state tree
    from tcresnet_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(best.parent)
    restored = mgr.restore(watcher._template_state, 30)
    assert int(restored.step) == 30


def test_repromoting_same_step_is_idempotent(tmp_path):
    """Re-evaluating an already-promoted step (fresh evaluate.py over a
    finished run, resumed scores.tsv) must not crash on orbax's
    StepAlreadyExistsError — the promoted copy IS this state."""
    host = make_synthetic_dataset(num_samples=64, num_classes=4, desired_samples=4000, seed=8)
    valid = make_synthetic_dataset(num_samples=32, num_classes=4, desired_samples=4000, seed=9)
    cfg = tiny_config(tmp_path / "run", max_step=10)
    trainer = Trainer(cfg, DeviceDataset(host), workdir=tmp_path / "run")
    trainer.train()
    trainer.ckpt.wait()

    valid.split = "valid"
    w1 = WatchingEvaluator(cfg, DeviceDataset(valid), tmp_path / "run")
    w1.evaluate_once(10)
    # fresh watcher (fresh BestKeeper resume) forced to re-promote the
    # same step: pretend the recorded best was worse
    w2 = WatchingEvaluator(cfg, DeviceDataset(valid), tmp_path / "run")
    w2.best_keeper.metric_best["accuracy"] = 0.0
    w2.evaluate_once(10)  # must not raise
    best = w2.best_keeper.best_checkpoint_dir("accuracy")
    assert best is not None and best.name == "10"


def test_save_best_raises_when_source_gone(tmp_path):
    from tcresnet_tpu.evaluation.best_keeper import BestKeeper
    import pytest

    bk = BestKeeper({"accuracy": "max"}, "valid", tmp_path / "best")
    with pytest.raises(FileNotFoundError):
        bk.save_best({"accuracy": True}, tmp_path / "ckpt", 30)


def test_checkpoint_iterator_timeout(tmp_path):
    from tcresnet_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(tmp_path / "empty")
    steps = list(checkpoint_iterator(ckpt, poll_interval=0.05, timeout=0.2))
    assert steps == []


def test_watch_exits_on_train_done_sentinel(tmp_path):
    """An epoch/from-restore-capped run finishes BELOW cfg.train.max_step;
    watch() must exit via the trainer's TRAIN_DONE sentinel instead of
    polling forever (default --timeout is None)."""
    host = make_synthetic_dataset(num_samples=128, num_classes=4, desired_samples=4000, seed=10)
    valid = make_synthetic_dataset(num_samples=32, num_classes=4, desired_samples=4000, seed=11)
    import dataclasses

    cfg = tiny_config(tmp_path / "run", max_step=10_000)
    # epoch cap: 128 samples / batch 32 = 4 steps/epoch -> stops at 28
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, max_epoch=7))
    trainer = Trainer(cfg, DeviceDataset(host), workdir=tmp_path / "run")
    trainer.train()
    trainer.ckpt.wait()
    assert (trainer.ckpt.directory / "TRAIN_DONE").read_text() == "28"

    valid.split = "valid"
    watcher = WatchingEvaluator(cfg, DeviceDataset(valid), tmp_path / "run")
    # no timeout: without the sentinel this would hang (max_step=10000 is
    # never reached)
    scores = watcher.watch(poll_interval=0.05, timeout=None)
    assert scores is not None and np.isfinite(scores["loss"])


def test_watcher_skips_gc_deleted_checkpoint(tmp_path):
    """A backlogged step GC'd between listing and restore is skipped with
    a warning, not a watcher crash."""
    import shutil

    host = make_synthetic_dataset(num_samples=128, num_classes=4, desired_samples=4000, seed=12)
    valid = make_synthetic_dataset(num_samples=32, num_classes=4, desired_samples=4000, seed=13)
    cfg = tiny_config(tmp_path / "run", max_step=60)  # ckpts at 30, 60
    trainer = Trainer(cfg, DeviceDataset(host), workdir=tmp_path / "run")
    trainer.train()
    trainer.ckpt.wait()

    valid.split = "valid"
    watcher = WatchingEvaluator(cfg, DeviceDataset(valid), tmp_path / "run")
    shutil.rmtree(watcher.ckpt.directory / "30")  # GC races the restore
    assert watcher.evaluate_once(30) is None  # skipped, no crash
    scores = watcher.watch(max_step=60, poll_interval=0.05, timeout=1.0)
    assert scores is not None and np.isfinite(scores["loss"])


def test_watcher_tolerates_excluded_metrics(tmp_path):
    """cfg.data.exclude_metric_names removing accuracy/loss must not
    crash the post-eval log line."""
    import dataclasses

    host = make_synthetic_dataset(num_samples=64, num_classes=4, desired_samples=4000, seed=14)
    valid = make_synthetic_dataset(num_samples=32, num_classes=4, desired_samples=4000, seed=15)
    cfg = tiny_config(tmp_path / "run", max_step=10)
    trainer = Trainer(cfg, DeviceDataset(host), workdir=tmp_path / "run")
    trainer.train()
    trainer.ckpt.wait()

    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, exclude_metric_names=("accuracy",))
    )
    valid.split = "valid"
    watcher = WatchingEvaluator(cfg, DeviceDataset(valid), tmp_path / "run")
    scores = watcher.evaluate_once(10)  # must not raise KeyError
    assert "accuracy" not in scores and np.isfinite(scores["loss"])


def test_template_builds_with_epoch_boundaries(tmp_path):
    """boundaries_epoch=True configs need a template too (the watcher has
    no train split to resolve real boundaries; structure is unaffected)."""
    import dataclasses

    from tcresnet_tpu.config import OptimConfig

    valid = make_synthetic_dataset(num_samples=32, num_classes=4, desired_samples=4000, seed=16)
    cfg = tiny_config(tmp_path / "run", max_step=10)
    cfg = cfg.replace(
        optim=OptimConfig(
            optimizer="adam", lr_list=(3e-3, 3e-4), boundaries=(2,),
            boundaries_epoch=True,
        )
    )
    valid.split = "valid"
    watcher = WatchingEvaluator(cfg, DeviceDataset(valid), tmp_path / "run")
    assert watcher._template_state is not None
