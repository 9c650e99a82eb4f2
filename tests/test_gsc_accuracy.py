"""End-to-end accuracy gate on real Google Speech Commands v1.

Opt-in: runs only when GSC_ROOT points at a prepared dataset tree
(train/valid/test/<label>/*.wav — see docs/GSC_RECIPE.md for the
one-command prep). Asserts the BASELINE.md target: TCResNet8-1.0
reaches >=96% top-1 on the 12-class test split.

The dataset is absent in the no-egress build environment, so this test
is expected to SKIP there; it exists so the gate fires the moment real
data is available.
"""

import os

import pytest

GSC_ROOT = os.environ.get("GSC_ROOT", "")

pytestmark = pytest.mark.skipif(
    not GSC_ROOT, reason="GSC_ROOT not set (real Speech Commands absent)"
)


@pytest.mark.gsc
def test_tcresnet8_full_recipe_accuracy(tmp_path):
    import dataclasses

    from tcresnet_tpu.config import get_preset
    from tcresnet_tpu.data import load_speech_commands
    from tcresnet_tpu.data.device_data import DeviceDataset
    from tcresnet_tpu.evaluation.watcher import WatchingEvaluator
    from tcresnet_tpu.parallel import make_mesh
    from tcresnet_tpu.train.trainer import Trainer

    cfg = get_preset("TCResNet8-1.0")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset_root=GSC_ROOT,
            cache_dir=os.environ.get("GSC_CACHE", str(tmp_path / "cache")),
        ),
        train=dataclasses.replace(cfg.train, train_dir=str(tmp_path / "run")),
    )
    # reference num_silent per split: 1854 / 258 / 257
    # (scripts/commands/TCResNet8Model-1.0_mfcc_40_3010_0.001_mom_l1.sh:3-7)
    mesh = make_mesh(cfg.mesh)
    train = load_speech_commands(
        GSC_ROOT, "train", num_silent=1854,
        cache_dir=cfg.data.cache_dir,
    )
    trainer = Trainer(cfg, DeviceDataset(train, mesh), mesh=mesh,
                      workdir=cfg.train.train_dir)
    state = trainer.train()  # full 30k-step flagship recipe
    assert int(state.step) == 30000

    valid = load_speech_commands(
        GSC_ROOT, "valid", num_silent=258, cache_dir=cfg.data.cache_dir
    )
    valid.split = "valid"
    watcher = WatchingEvaluator(cfg, DeviceDataset(valid, mesh),
                                cfg.train.train_dir, mesh=mesh)
    watcher.watch(max_step=30000, poll_interval=0.5, timeout=30.0)

    test = load_speech_commands(
        GSC_ROOT, "test", num_silent=257, cache_dir=cfg.data.cache_dir
    )
    test.split = "test"
    best = watcher.best_keeper.best_checkpoint_dir("accuracy")
    assert best is not None
    from tcresnet_tpu.train.checkpoint import CheckpointManager

    final = WatchingEvaluator(cfg, DeviceDataset(test, mesh),
                              cfg.train.train_dir, mesh=mesh)
    final.ckpt = CheckpointManager(best.parent)
    scores = final.evaluate_once(int(best.name))
    assert scores["accuracy"] >= 0.96, scores  # BASELINE.md gate
