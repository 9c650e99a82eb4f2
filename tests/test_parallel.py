"""Data-parallel training over a virtual 8-device CPU mesh.

Validates the SURVEY.md 2.10 capability checklist: DP via Mesh+jit
shardings (XLA-emitted gradient all-reduce), with the `model` axis
present as a no-op TP axis.
"""

import jax
import numpy as np
import pytest

from tcresnet_tpu.config import MeshConfig
from tcresnet_tpu.data.device_data import DeviceDataset
from tcresnet_tpu.data.synthetic import make_synthetic_dataset
from tcresnet_tpu.evaluation.evaluator import Evaluator
from tcresnet_tpu.parallel import make_mesh
from tcresnet_tpu.train.trainer import Trainer

from tests.test_train import tiny_config


@pytest.fixture(scope="module")
def mesh8(cpu_devices):
    assert len(cpu_devices) == 8
    return make_mesh(MeshConfig(), devices=cpu_devices)


def test_mesh_axes(mesh8):
    assert mesh8.axis_names == ("data", "model")
    assert mesh8.devices.shape == (8, 1)


def test_mesh_model_axis(cpu_devices):
    mesh = make_mesh(MeshConfig(model=2), devices=cpu_devices)
    assert mesh.devices.shape == (4, 2)


def test_mesh_bad_model_axis(cpu_devices):
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(model=3), devices=cpu_devices)


def test_mesh_too_few_devices(cpu_devices):
    with pytest.raises(ValueError, match="needs 16 devices, have 8"):
        make_mesh(MeshConfig(data=16), devices=cpu_devices)


def test_mesh_explicit_axes_truncate(cpu_devices):
    """Explicit (data, model) that doesn't divide the device count is
    still legal: 2x3 over 8 devices truncates to 6 (the divisibility
    check only applies when data is derived from the device count)."""
    mesh = make_mesh(MeshConfig(data=2, model=3), devices=cpu_devices)
    assert mesh.devices.shape == (2, 3)


def test_mesh_honors_string_device_pin():
    """JAX accepts jax_default_device as a platform STRING too; make_mesh
    must not assume a Device object (.platform AttributeError)."""
    import jax

    prev = jax.config.jax_default_device
    try:
        jax.config.update("jax_default_device", "cpu")
        mesh = make_mesh(MeshConfig())
        assert all(d.platform == "cpu" for d in mesh.devices.flat)
    finally:
        jax.config.update("jax_default_device", prev)


def test_dp_training_on_8_devices(tmp_path, mesh8):
    host = make_synthetic_dataset(num_samples=256, num_classes=4, desired_samples=4000, seed=2)
    cfg = tiny_config(tmp_path / "dp", max_step=40)
    with mesh8:
        trainer = Trainer(cfg, DeviceDataset(host, mesh8), mesh=mesh8, workdir=tmp_path / "dp")
        state = trainer.train()
        assert int(state.step) == 40
        # state must be fully replicated across the mesh
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

        ev = Evaluator(cfg, DeviceDataset(host, mesh8), mesh=mesh8)
        metrics = ev.evaluate(state)
        assert np.isfinite(metrics["loss"])
        assert metrics["num_samples"] == 256


def test_dp_matches_single_device(tmp_path, mesh8):
    """Same seed, same data: 8-way DP must match single-device training
    (the global batch and RNG derivation are identical by construction)."""
    host = make_synthetic_dataset(num_samples=128, num_classes=4, desired_samples=4000, seed=3)
    cfg = tiny_config(tmp_path / "a", max_step=8)

    tr1 = Trainer(cfg, DeviceDataset(host), workdir=tmp_path / "a")
    s1 = tr1.train()

    cfg2 = tiny_config(tmp_path / "b", max_step=8)
    with mesh8:
        tr2 = Trainer(cfg2, DeviceDataset(host, mesh8), mesh=mesh8, workdir=tmp_path / "b")
        s2 = tr2.train()

    # Reduction order differs between sharded/unsharded layouts and Adam's
    # rsqrt amplifies it early on; agreement to ~1e-3 abs after 8 steps
    # demonstrates the same global batch + RNG stream is being consumed.
    p1 = np.asarray(jax.tree_util.tree_leaves(s1.params)[0])
    p2 = np.asarray(jax.tree_util.tree_leaves(s2.params)[0])
    np.testing.assert_allclose(p1, p2, atol=1e-3)


def _fused_frontend_cfg(workdir, batch_size, frontend_fuse="on", max_step=2):
    """Fusable-geometry config: 160 ms clips (2560 samples — lane-aligned
    and hop-decomposable), MFCC front end, small TCResNet8."""
    import dataclasses

    from tcresnet_tpu.config import (
        AudioConfig,
        AugmentConfig,
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        OptimConfig,
        TrainConfig,
    )

    return ExperimentConfig(
        audio=AudioConfig(
            clip_duration_ms=160, num_mfccs=20, num_mel_bins=32,
            frontend_fuse=frontend_fuse,
        ),
        augment=AugmentConfig(
            background_frequency=0.8, background_max_volume=0.2
        ),
        model=ModelConfig(name="TCResNet8", num_classes=4, bn_momentum=0.9),
        optim=OptimConfig(optimizer="mom", lr_list=(0.02,), boundaries=()),
        train=TrainConfig(
            batch_size=batch_size, max_step=max_step,
            step_save_checkpoint=100, train_dir=str(workdir),
        ),
        data=DataConfig(eval_batch_size=64),
    )


def test_dp_train_step_through_fused_frontend(tmp_path, mesh8):
    """The COMPOSED multi-chip production program (VERDICT r3 missing #2):
    the fused gather+augment+MFCC Pallas kernel executes INSIDE the jitted
    scan train step under the 8-device mesh — shard_map'd pallas_call +
    value_and_grad + XLA-emitted gradient all-reduce in ONE jit, with the
    REAL kernel (interpret mode on CPU), no monkeypatch — and the result
    matches the single-device run consuming the same RNG stream.

    This is the exact composition Trainer._input_features routes a real
    >=2048-batch multi-chip TPU run through (train/trainer.py)."""
    from tcresnet_tpu.ops.pallas import frontend

    host = make_synthetic_dataset(
        num_samples=128, num_classes=4, desired_samples=2560, seed=7
    )
    # batch 64 = 8 devices x 8-row kernel tiles: the shard_map path engages
    cfg = _fused_frontend_cfg(tmp_path / "dp", batch_size=64)

    tr1 = Trainer(
        cfg, DeviceDataset(host), workdir=tmp_path / "single",
        steps_per_call=2,
    )
    assert frontend.frontend_fusable(
        tr1.data.arrays[0], cfg.augment, cfg.audio, tr1.data.noise_bank,
        cfg.audio.desired_samples,
    )
    s1, sum1 = tr1._train_fn(tr1.state, *tr1.data.arrays, tr1.data.noise_bank)

    with mesh8:
        tr2 = Trainer(
            cfg, DeviceDataset(host, mesh8), mesh=mesh8,
            workdir=tmp_path / "dp", steps_per_call=2,
        )
        s2, sum2 = tr2._train_fn(
            tr2.state, *tr2.data.arrays, tr2.data.noise_bank
        )
        # params updated on the mesh stay fully replicated
        leaf = jax.tree_util.tree_leaves(s2.params)[0]
        assert leaf.sharding.is_fully_replicated

    # Identical RNG stream + bit-equal kernel features (proven separately
    # below); the remaining difference is sharded-vs-unsharded reduction
    # order in the loss/grad all-reduce.
    np.testing.assert_allclose(
        float(sum1["total_loss"]), float(sum2["total_loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(sum1["accuracy"]), float(sum2["accuracy"]), atol=1e-6
    )
    p1 = np.asarray(jax.tree_util.tree_leaves(s1.params)[0])
    p2 = np.asarray(jax.tree_util.tree_leaves(s2.params)[0])
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_gather_augment_shard_map_equivalence(mesh8):
    """The v5 kernel under shard_map on an 8-device CPU mesh (interpret
    mode) must equal the unsharded call bit-for-bit: validates the
    in/out specs and local-shape handling the real multi-chip TPU path
    uses (a pallas_call cannot be partitioned by plain jit)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tcresnet_tpu.config import AugmentConfig
    from tcresnet_tpu.ops.pallas.augment import fused_gather_augment, gather_fusable

    rng = np.random.default_rng(11)
    n = 2048
    num_rows, batch = 64, 128
    data = rng.integers(-32768, 32768, (num_rows, n)).astype(np.int16)
    cfg = AugmentConfig(background_frequency=0.9, background_max_volume=0.3)
    noise = rng.normal(size=(3, 3 * n)).astype(np.float32) * 0.1

    repl = NamedSharding(mesh8, P())
    wavs3d = jax.device_put(data.reshape(num_rows, n // 128, 128), repl)
    noise_d = jax.device_put(noise, repl)
    idx_host = rng.integers(0, num_rows, batch).astype(np.int32)
    silent_host = rng.integers(0, 4, batch) == 0
    idx = jax.device_put(idx_host, NamedSharding(mesh8, P("data")))
    silent = jax.device_put(silent_host, NamedSharding(mesh8, P("data")))
    assert gather_fusable(wavs3d, cfg, noise_d, n)

    key = jax.random.key(9)
    with mesh8:
        sharded = np.asarray(
            fused_gather_augment(
                wavs3d, idx, silent, key, cfg, noise_d, True, n,
                interpret=True, mesh=mesh8,
            )
        )
    plain = np.asarray(
        fused_gather_augment(
            jnp.asarray(data.reshape(num_rows, n // 128, 128)),
            jnp.asarray(idx_host), jnp.asarray(silent_host),
            key, cfg, jnp.asarray(noise), True, n, interpret=True,
        )
    )
    np.testing.assert_array_equal(sharded, plain)


def test_frontend_shard_map_equivalence(mesh8):
    """Single-kernel front end (gather+augment+MFCC) under shard_map on
    the 8-device CPU mesh (interpret mode) == unsharded bit-for-bit."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tcresnet_tpu.config import AudioConfig, AugmentConfig
    from tcresnet_tpu.ops.pallas.frontend import (
        frontend_fusable,
        fused_gather_augment_mfcc,
    )

    rng = np.random.default_rng(13)
    n = 2560  # % 128 == 0 and % 160 == 0
    num_rows, batch = 32, 128
    data = np.zeros((num_rows, 4096), np.int16)
    data[:, :n] = rng.integers(-32768, 32768, (num_rows, n)).astype(np.int16)
    aug_cfg = AugmentConfig(background_frequency=0.9, background_max_volume=0.3)
    audio_cfg = AudioConfig(clip_duration_ms=160, num_mfccs=20, num_mel_bins=32)
    noise = rng.normal(size=(3, 3 * n)).astype(np.float32) * 0.1

    repl = NamedSharding(mesh8, P())
    wavs3d = jax.device_put(data.reshape(num_rows, 32, 128), repl)
    noise_d = jax.device_put(noise, repl)
    idx_host = rng.integers(0, num_rows, batch).astype(np.int32)
    silent_host = rng.integers(0, 4, batch) == 0
    idx = jax.device_put(idx_host, NamedSharding(mesh8, P("data")))
    silent = jax.device_put(silent_host, NamedSharding(mesh8, P("data")))
    assert frontend_fusable(wavs3d, aug_cfg, audio_cfg, noise_d, n)

    key = jax.random.key(9)
    with mesh8:
        sharded = np.asarray(
            fused_gather_augment_mfcc(
                wavs3d, idx, silent, key, aug_cfg, audio_cfg, noise_d,
                True, n, interpret=True, mesh=mesh8,
            )
        )
    plain = np.asarray(
        fused_gather_augment_mfcc(
            jnp.asarray(data.reshape(num_rows, 32, 128)),
            jnp.asarray(idx_host), jnp.asarray(silent_host),
            key, aug_cfg, audio_cfg, jnp.asarray(noise), True, n,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(sharded, plain)


def test_fused_infer_shard_map_equivalence(mesh8):
    """Whole-model inference kernel under shard_map on the 8-device CPU
    mesh (interpret mode) == unsharded bit-for-bit."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tcresnet_tpu.config import AudioConfig, ModelConfig
    from tcresnet_tpu.models import build_model
    from tcresnet_tpu.ops import dsp
    from tcresnet_tpu.ops.pallas.infer import build_fused_infer

    rng = np.random.default_rng(14)
    audio_cfg = AudioConfig(clip_duration_ms=160, num_mfccs=20, num_mel_bins=32)
    model_cfg = ModelConfig(name="TCResNet8", num_classes=4)
    feat = dsp.feature_shape(audio_cfg)
    model = build_model(model_cfg, feat, "float32")
    v = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((2,) + feat, jnp.float32), training=True,
    )
    wavs = rng.uniform(-1, 1, (16, audio_cfg.desired_samples)).astype(np.float32)

    sharded_fn = build_fused_infer(
        model_cfg, audio_cfg, v["params"], v["batch_stats"],
        tb=2, interpret=True, mesh=mesh8,
    )
    plain_fn = build_fused_infer(
        model_cfg, audio_cfg, v["params"], v["batch_stats"], tb=2, interpret=True,
    )
    xd = jax.device_put(wavs, NamedSharding(mesh8, P("data")))
    with mesh8:
        sharded = np.asarray(sharded_fn(xd))
    plain = np.asarray(plain_fn(jnp.asarray(wavs)))
    np.testing.assert_array_equal(sharded, plain)


def test_fused_mfcc_shard_map_equivalence(mesh8):
    """Sharded fused MFCC == unsharded (interpret mode, 8 CPU devices)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tcresnet_tpu.config import AudioConfig
    from tcresnet_tpu.ops.pallas.mfcc import fused_mfcc

    cfg = AudioConfig(clip_duration_ms=200)  # 3200 samples, 160-hop
    rng = np.random.default_rng(12)
    x = rng.uniform(-1, 1, (64, cfg.desired_samples)).astype(np.float32)
    xd = jax.device_put(x, NamedSharding(mesh8, P("data")))
    with mesh8:
        sharded = np.asarray(fused_mfcc(xd, cfg, interpret=True, mesh=mesh8))
    plain = np.asarray(fused_mfcc(jnp.asarray(x), cfg, interpret=True))
    np.testing.assert_array_equal(sharded, plain)
