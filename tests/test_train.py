"""Trainer/evaluator/best-keeper tests: the overfit-tiny-batch gate.

SURVEY.md section 4: the rebuild creates the test pyramid the reference
lacks — this file holds the training-convergence and resume tests.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tcresnet_tpu.config import (
    AudioConfig,
    AugmentConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from tcresnet_tpu.data.device_data import DeviceDataset
from tcresnet_tpu.data.synthetic import make_synthetic_dataset
from tcresnet_tpu.evaluation.best_keeper import BestKeeper
from tcresnet_tpu.evaluation.evaluator import Evaluator
from tcresnet_tpu.train import loss as losslib
from tcresnet_tpu.train import optim as optimlib
from tcresnet_tpu.train.trainer import Trainer


def tiny_config(workdir, max_step=60, **model_kw) -> ExperimentConfig:
    """Small clips (250ms -> 23 frames) keep CPU tests fast.

    bn_momentum 0.9: at the reference decay 0.997 the BN running stats
    are still ~64% their init after 150 steps, so eval-mode accuracy on
    these short runs is RNG-luck rather than convergence. Real recipes
    (9k-30k steps) keep the reference decay.
    """
    model_kw.setdefault("bn_momentum", 0.9)
    return ExperimentConfig(
        audio=AudioConfig(clip_duration_ms=250, num_mfccs=20, num_mel_bins=32),
        augment=AugmentConfig(background_frequency=0.2, background_max_volume=0.05),
        model=ModelConfig(name="TCResNet8", num_classes=4, weight_decay=1e-4, **model_kw),
        optim=OptimConfig(optimizer="adam", lr_list=(3e-3,), boundaries=()),
        train=TrainConfig(
            batch_size=32, max_step=max_step, step_save_checkpoint=30,
            max_to_keep=3, train_dir=str(workdir),
        ),
        data=DataConfig(eval_batch_size=64),
    )


@pytest.fixture()
def tiny_data():
    return make_synthetic_dataset(
        num_samples=256, num_classes=4, desired_samples=4000, seed=1
    )


def test_lr_schedule_piecewise():
    sched = optimlib.piecewise_constant([10, 20], [0.1, 0.01, 0.001])
    # TF semantics: values[0] while step <= boundaries[0]
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(10)) == pytest.approx(0.1)
    assert float(sched(11)) == pytest.approx(0.01)
    assert float(sched(20)) == pytest.approx(0.01)
    assert float(sched(21)) == pytest.approx(0.001)
    assert float(sched(10**6)) == pytest.approx(0.001)


def test_label_smoothing_math():
    logits = jnp.asarray([[2.0, 0.0, -1.0]])
    onehot = jnp.asarray([[1.0, 0.0, 0.0]])
    plain = losslib.smoothed_softmax_cross_entropy(logits, onehot, 0.0)
    lp = jax.nn.log_softmax(logits)[0]
    np.testing.assert_allclose(float(plain), float(-lp[0]), rtol=1e-6)
    smooth = losslib.smoothed_softmax_cross_entropy(logits, onehot, 0.3)
    y = onehot * 0.7 + 0.1
    want = float(-(y[0] * lp).sum())
    np.testing.assert_allclose(float(smooth), want, rtol=1e-6)


def test_l2_excludes_batchnorm():
    params = {
        "conv0_conv": {"kernel": jnp.ones((2, 2))},
        "conv0_bn": {"scale": jnp.ones((5,)) * 10, "bias": jnp.ones((5,)) * 10},
    }
    l2 = losslib.l2_regularization(params, weight_decay=2.0)
    # only the 4 kernel ones count: 2.0 * 0.5 * 4 = 4.0
    np.testing.assert_allclose(float(l2), 4.0)


def test_overfit_tiny_dataset(tmp_path, tiny_data):
    cfg = tiny_config(tmp_path / "run", max_step=150)
    trainer = Trainer(cfg, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    state = trainer.train()
    assert int(state.step) == 150

    evaluator = Evaluator(cfg, DeviceDataset(tiny_data))
    metrics = evaluator.evaluate(state)
    # 4 distinct tones, 256 samples: must overfit far above chance (0.25)
    assert metrics["accuracy"] > 0.9, metrics
    assert metrics["num_samples"] == 256
    assert "mAP_macro" in metrics and "top5_accuracy" in metrics
    # per-class metrics present (num classes < 10)
    assert any(k.startswith("precision/") for k in metrics)


def test_overfit_bf16_dsp(tmp_path, tiny_data):
    """The bf16 windowed-DFT front end must not cost convergence: same
    overfit gate as test_overfit_tiny_dataset with dsp_matmul_dtype
    bfloat16 (the bench/TPU-throughput configuration)."""
    import dataclasses

    cfg = tiny_config(tmp_path / "run", max_step=150)
    cfg = cfg.replace(
        audio=dataclasses.replace(cfg.audio, dsp_matmul_dtype="bfloat16")
    )
    trainer = Trainer(cfg, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    state = trainer.train()
    evaluator = Evaluator(cfg, DeviceDataset(tiny_data))
    metrics = evaluator.evaluate(state)
    assert metrics["accuracy"] > 0.9, metrics


def test_dsp_backend_auto_resolves_on_cpu(tmp_path, tiny_data):
    """dsp_backend="auto" must resolve at Trainer init from the EXECUTION
    platform (never Mosaic lowering on a CPU mesh/host)."""
    import dataclasses

    cfg = tiny_config(tmp_path / "run", max_step=1)
    cfg = cfg.replace(audio=dataclasses.replace(cfg.audio, dsp_backend="auto"))
    tr = Trainer(cfg, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    assert tr.platform == "cpu"
    assert tr.cfg.audio.dsp_backend == "xla"


def test_checkpoint_save_resume(tmp_path, tiny_data):
    cfg = tiny_config(tmp_path / "run", max_step=30)
    tr1 = Trainer(cfg, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    s1 = tr1.train()
    assert int(s1.step) == 30
    tr1.ckpt.wait()

    # fresh trainer resumes from the checkpoint and continues
    cfg2 = tiny_config(tmp_path / "run", max_step=40)
    tr2 = Trainer(cfg2, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    restored = tr2.maybe_restore()
    assert restored == 30
    p_old = jax.tree_util.tree_leaves(s1.params)[0]
    p_new = jax.tree_util.tree_leaves(tr2.state.params)[0]
    np.testing.assert_allclose(np.asarray(p_old), np.asarray(p_new), atol=1e-7)
    s2 = tr2.train()
    assert int(s2.step) == 40


def test_checkpoint_cadence_with_nondividing_steps_per_call(tmp_path, tiny_data):
    """Interval checks must fire on boundary CROSSINGS: with steps_per_call
    not dividing step_save_checkpoint, `step % N == 0` never fires and a
    crash would lose the whole run."""
    import dataclasses

    cfg = tiny_config(tmp_path / "run", max_step=130)  # ckpt every 30
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, max_to_keep=10))
    tr = Trainer(
        cfg, DeviceDataset(tiny_data), workdir=tmp_path / "run", steps_per_call=8
    )
    tr.train()
    tr.ckpt.wait()
    steps = list(tr.ckpt.all_steps())
    # boundaries 30/60/90/120 are crossed at call-end steps 32/64/96/120,
    # plus the final step 130
    assert steps == [32, 64, 96, 120, 130], steps
    # partial-length chunk fns are memoized per distinct remainder
    # (here only n=2: 130 = 16*8 + 2) so a steps-per-call sweep in one
    # process cannot silently accumulate retraces (VERDICT r2 weak #8)
    assert list(tr._partial_fns) == [2], list(tr._partial_fns)


def test_ema_tracking(tmp_path, tiny_data):
    cfg = tiny_config(tmp_path / "run", max_step=10)
    cfg = cfg.replace(optim=OptimConfig(optimizer="adam", lr_list=(1e-3,), boundaries=(),
                                        use_ema=True, ema_decay=0.9))
    tr = Trainer(cfg, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    state = tr.train()
    assert state.ema_params is not None
    p = jax.tree_util.tree_leaves(state.params)[0]
    e = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))  # EMA lags params


def test_unit_lr_optimizer_scaled_by_schedule(tmp_path, tiny_data):
    """The applied LR is schedule(global_step): with lr 0 the params must
    not move (proves the scale_updates path IS the learning rate)."""
    cfg = tiny_config(tmp_path / "run", max_step=10)
    cfg = cfg.replace(optim=OptimConfig(optimizer="mom", lr_list=(0.0,), boundaries=()))
    tr = Trainer(cfg, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    p0 = jax.device_get(tr.state.params)
    state = tr.train()
    p1 = jax.device_get(state.params)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state.step) == 10


def test_relative_schedule_shift_on_resume(tmp_path, tiny_data):
    """cfg.optim.relative_schedule shifts LR boundaries forward by the
    restored step (reference helper/trainer.py:120-133)."""
    cfg = tiny_config(tmp_path / "run", max_step=30)
    tr1 = Trainer(cfg, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    tr1.train()
    tr1.ckpt.wait()

    opt = OptimConfig(
        optimizer="adam", lr_list=(3e-3, 3e-4), boundaries=(20,),
        relative_schedule=True,
    )
    cfg2 = tiny_config(tmp_path / "run", max_step=40).replace(optim=opt)
    tr2 = Trainer(cfg2, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    assert tr2.maybe_restore() == 30
    # boundary 20 shifted to 50: step 40 still uses the FIRST lr
    assert float(tr2.lr_schedule(40)) == pytest.approx(3e-3)
    assert float(tr2.lr_schedule(51)) == pytest.approx(3e-4)

    # without the flag, step 40 is past the unshifted boundary
    cfg3 = cfg2.replace(optim=OptimConfig(
        optimizer="adam", lr_list=(3e-3, 3e-4), boundaries=(20,)))
    tr3 = Trainer(cfg3, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    tr3.maybe_restore()
    assert float(tr3.lr_schedule(40)) == pytest.approx(3e-4)


def test_max_epoch_stop(tmp_path, tiny_data):
    """max_epoch caps training at num_samples//batch steps per epoch
    (reference helper/trainer.py:419-425)."""
    import dataclasses

    cfg = tiny_config(tmp_path / "run", max_step=60)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, max_epoch=2))
    tr = Trainer(cfg, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    state = tr.train()
    # 256 samples / batch 32 = 8 steps per epoch; 2 epochs = 16 steps
    assert int(state.step) == 16


def test_max_step_from_restore(tmp_path, tiny_data):
    """From-restore stop counts from THIS process's restore point
    (reference helper/trainer.py:419-425): a resumed run with
    max_step_from_restore=N trains exactly N more steps."""
    import dataclasses

    cfg = tiny_config(tmp_path / "run", max_step=20)
    tr1 = Trainer(cfg, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    tr1.train()
    assert int(tr1.state.step) == 20

    cfg2 = tiny_config(tmp_path / "run", max_step=1000)
    cfg2 = cfg2.replace(
        train=dataclasses.replace(cfg2.train, max_step=1000, max_step_from_restore=7)
    )
    tr2 = Trainer(cfg2, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    state = tr2.train()
    assert int(state.step) == 27  # 20 restored + 7 from restore

    # epoch variant: 256/32 = 8 steps per epoch
    cfg3 = tiny_config(tmp_path / "run", max_step=1000)
    cfg3 = cfg3.replace(
        train=dataclasses.replace(cfg3.train, max_step=1000, max_epoch_from_restore=1)
    )
    tr3 = Trainer(cfg3, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    state = tr3.train()
    assert int(state.step) == 27 + 8


def test_train_stream_eval_sample_count(tmp_path, tiny_data, caplog):
    """Train-stream eval draws class_sampling_factor*num_classes samples
    (reference --class_sampling_factor, helper/trainer.py:589-592)."""
    import dataclasses

    cfg = tiny_config(tmp_path / "run", max_step=2)
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, class_sampling_factor=5)
    )
    tr = Trainer(cfg, DeviceDataset(tiny_data), workdir=tmp_path / "run")
    captured = {}
    orig = DeviceDataset.sample_batch

    def spy(arrays, key, batch, mesh=None, clip_len=None):
        captured["n"] = batch
        return orig(arrays, key, batch, mesh, clip_len=clip_len)

    DeviceDataset.sample_batch = staticmethod(spy)
    try:
        tr.train()
        tr._train_stream_eval(2)
    finally:
        DeviceDataset.sample_batch = staticmethod(orig)
    assert captured["n"] == 5 * 4  # factor * num_classes


def test_eval_loss_excludes_padded_rows(tiny_data):
    """Eval loss must be the exact mean over true samples regardless of
    the batch size's padding of the final partial batch."""
    cfg = tiny_config("/tmp/unused_loss")
    dd = DeviceDataset(tiny_data)
    from tcresnet_tpu.train.state import create_train_state
    from tcresnet_tpu.train.optim import build_optimizer
    from tcresnet_tpu.models import build_model
    from tcresnet_tpu.ops import dsp
    model = build_model(cfg.model, dsp.feature_shape(cfg.audio))
    tx, _ = build_optimizer(cfg.optim)
    state = create_train_state(
        model, tx, jax.random.key(0),
        jnp.zeros((2,) + dsp.feature_shape(cfg.audio), jnp.float32),
    )
    # batch 100 pads the last batch with 44 duplicate rows; batch 256
    # divides exactly. The losses must agree.
    m_padded = Evaluator(cfg.replace(data=DataConfig(eval_batch_size=100)), dd).evaluate(state)
    m_exact = Evaluator(cfg.replace(data=DataConfig(eval_batch_size=256)), dd).evaluate(state)
    assert m_padded["loss"] == pytest.approx(m_exact["loss"], rel=1e-5)
    assert "classification_report" in m_padded
    assert isinstance(m_padded["classification_report"], str)


def test_best_keeper_roundtrip(tmp_path):
    bk = BestKeeper({"accuracy": "max", "loss": "min"}, "valid", tmp_path)
    keep, which = bk.monitor({"accuracy": 0.5, "loss": 1.0})
    assert keep and which == {"accuracy": True, "loss": True}
    bk.save_scores(which, {"accuracy": 0.5, "loss": 1.0}, {"step": 100})

    # tiny improvement below epsilon is NOT kept
    keep, which = bk.monitor({"accuracy": 0.50001, "loss": 0.99999})
    assert not keep

    keep, which = bk.monitor({"accuracy": 0.6, "loss": 2.0})
    assert which == {"accuracy": True, "loss": False}
    bk.save_scores(which, {"accuracy": 0.6, "loss": 2.0}, {"step": 200})

    # resume: best restored from scores.tsv
    bk2 = BestKeeper({"accuracy": "max", "loss": "min"}, "valid", tmp_path)
    assert bk2.metric_best["accuracy"] == pytest.approx(0.6)
    assert bk2.metric_best["loss"] == pytest.approx(1.0)
    keep, _ = bk2.monitor({"accuracy": 0.55, "loss": 3.0})
    assert not keep


def test_eval_padding_masks_partial_batch(tiny_data):
    cfg = tiny_config("/tmp/unused")
    cfg = cfg.replace(data=DataConfig(eval_batch_size=100))  # 256 % 100 != 0
    dd = DeviceDataset(tiny_data)
    ev = Evaluator(cfg, dd)
    tr_cfg = tiny_config("/tmp/unused2", max_step=1)
    # fresh params suffice: we only check sample accounting
    from tcresnet_tpu.train.state import create_train_state
    from tcresnet_tpu.train.optim import build_optimizer
    from tcresnet_tpu.models import build_model
    from tcresnet_tpu.ops import dsp
    model = build_model(cfg.model, dsp.feature_shape(cfg.audio))
    tx, _ = build_optimizer(cfg.optim)
    state = create_train_state(
        model, tx, jax.random.key(0),
        jnp.zeros((2,) + dsp.feature_shape(cfg.audio), jnp.float32),
    )
    metrics = ev.evaluate(state)
    assert metrics["num_samples"] == 256


def test_eval_metric_gating_and_exclusion(tiny_data):
    """maximum_num_labels_for_metric + exclude_metric_names parity
    (reference metrics/manager.py:9-46, metrics/base.py exclusion)."""
    import dataclasses

    from tcresnet_tpu.train.state import create_train_state
    from tcresnet_tpu.train.optim import build_optimizer
    from tcresnet_tpu.models import build_model
    from tcresnet_tpu.ops import dsp

    cfg = tiny_config("/tmp/unused3")
    dd = DeviceDataset(tiny_data)
    model = build_model(cfg.model, dsp.feature_shape(cfg.audio))
    tx, _ = build_optimizer(cfg.optim)
    state = create_train_state(
        model, tx, jax.random.key(0),
        jnp.zeros((2,) + dsp.feature_shape(cfg.audio), jnp.float32),
    )

    # 4 labels < default 10 -> per-class metrics present
    base = Evaluator(cfg, dd).evaluate(state)
    assert any(k.startswith("class/") or "precision" in k for k in base)

    # lowering the gate below the label count removes them; exclusion
    # drops named metrics from the result dict
    cfg2 = cfg.replace(
        data=dataclasses.replace(
            cfg.data,
            max_labels_for_class_metrics=3,
            exclude_metric_names=("top5_accuracy",),
        )
    )
    gated = Evaluator(cfg2, dd).evaluate(state)
    assert not any(k.startswith("class/") or "f1" in k for k in gated)
    assert "top5_accuracy" not in gated and "accuracy" in gated


def test_epoch_boundaries_reference_math():
    """Epoch-unit LR boundaries use (b * N) // B — the reference's exact
    integer math (helper/trainer.py:121) — not b * (N // B)."""
    import dataclasses as dc

    from tcresnet_tpu.config import OptimConfig
    from tcresnet_tpu.train.optim import resolve_boundaries

    cfg = OptimConfig(boundaries=(30,), boundaries_epoch=True,
                      lr_list=(0.1, 0.01))
    got = resolve_boundaries(cfg, num_samples=22250, batch_size=64)
    assert got == ((30 * 22250) // 64,) == (10429,)  # not 30*(22250//64)=10410
    # step units unaffected
    cfg2 = dc.replace(cfg, boundaries_epoch=False)
    assert resolve_boundaries(cfg2) == (30,)


def test_train_budget_unbounded_guard(tmp_path):
    """max_step=0 disables the absolute cap (reference scripts bound runs
    only with --max_step_from_restore); an entirely unbounded budget is
    refused, and a from-restore budget alone bounds the run."""
    import dataclasses as dc

    host = make_synthetic_dataset(num_samples=64, num_classes=4, desired_samples=4000)
    cfg = tiny_config(tmp_path / "r", max_step=5)
    cfg = cfg.replace(train=dc.replace(cfg.train, max_step=0))
    tr = Trainer(cfg, DeviceDataset(host), workdir=tmp_path / "r")
    with pytest.raises(ValueError, match="unbounded"):
        tr.train()
    cfg2 = cfg.replace(
        train=dc.replace(cfg.train, max_step=0, max_step_from_restore=3)
    )
    tr2 = Trainer(cfg2, DeviceDataset(host), workdir=tmp_path / "r2")
    state = tr2.train()
    assert int(state.step) == 3


def test_eval_v2_silence_rows_get_noise(tmp_path, tiny_data):
    """With naive_background_mix=False (v2), the evaluator must mix
    background noise into SILENCE rows at volume U[0,1) even at eval
    (reference augmentation_factory.py:81-95) instead of zeroing them —
    and repeated evals of the same state must be identical (deterministic
    per-batch keys, BestKeeper depends on it)."""
    import dataclasses as dc

    cfg = tiny_config(tmp_path / "run", max_step=1)
    state = Trainer(
        cfg, DeviceDataset(tiny_data), workdir=tmp_path / "run"
    ).train()
    cfg_v2 = cfg.replace(
        augment=dc.replace(cfg.augment, naive_background_mix=False)
    )
    dd = DeviceDataset(tiny_data)
    assert dd.noise_bank is not None
    ev_v1 = Evaluator(cfg, dd)
    ev_v2 = Evaluator(cfg_v2, dd)
    m_v1 = ev_v1.evaluate(state, include_report=False)
    m_v2a = ev_v2.evaluate(state, include_report=False)
    m_v2b = ev_v2.evaluate(state, include_report=False)
    # deterministic across calls
    assert m_v2a["loss"] == m_v2b["loss"]
    assert m_v2a["accuracy"] == m_v2b["accuracy"]
    # silence rows see noise instead of zeros -> the eval distribution
    # (and therefore the loss) must differ from v1's zeroed silence
    assert m_v2a["loss"] != m_v1["loss"]
