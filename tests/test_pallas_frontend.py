"""Single-kernel front end (gather+augment+MFCC): bit-exactness vs the
two-kernel path, and the in-kernel lane->hop re-framing primitive."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcresnet_tpu.config import AudioConfig, AugmentConfig
from tcresnet_tpu.ops.pallas.augment import fused_gather_augment
from tcresnet_tpu.ops.pallas.frontend import (
    _hops_from_lanes,
    frontend_fusable,
    fused_gather_augment_mfcc,
)
from tcresnet_tpu.ops.pallas.mfcc import fused_mfcc


def _audio_cfg(n, window_ms=30.0, stride_ms=10.0, mel=64, mfcc=40):
    # desired_samples == n via clip_duration_ms at 16 kHz
    assert n % 16 == 0
    return AudioConfig(
        clip_duration_ms=n // 16,
        window_size_ms=window_ms,
        window_stride_ms=stride_ms,
        num_mel_bins=mel,
        num_mfccs=mfcc,
    )


def _dataset(rng, n, p, batch=16, num_rows=32):
    data = np.zeros((num_rows, p), np.int16)
    data[:, :n] = rng.integers(-32768, 32768, (num_rows, n)).astype(np.int16)
    wavs3d = jnp.asarray(data.reshape(num_rows, p // 128, 128))
    idx = jnp.asarray(rng.integers(0, num_rows, batch), jnp.int32)
    silent = jnp.asarray(rng.integers(0, 4, batch) == 0)
    noise = jnp.asarray(rng.normal(size=(3, 3 * n)).astype(np.float32) * 0.1)
    return wavs3d, idx, silent, noise


def test_hops_from_lanes_is_exact_reframing(rng):
    """[R,128] lane-major -> [R*128/hop, hop] must equal a flat reshape."""
    for hop, rows in [(160, 10), (320, 5), (160, 125), (128, 4)]:
        flat = rng.normal(size=(rows * 128,)).astype(np.float32)
        got = np.asarray(_hops_from_lanes(jnp.asarray(flat.reshape(rows, 128)), hop))
        want = flat.reshape(-1, hop)
        np.testing.assert_array_equal(got, want)
        assert math.gcd(hop, 128) >= 32 or hop == 128


def test_frontend_fusable_gates(rng):
    aug = AugmentConfig()
    n = 2560
    wavs3d, _, _, noise = _dataset(rng, n, p=4096)
    cfg = _audio_cfg(n)
    assert frontend_fusable(wavs3d, aug, cfg, noise, n)
    import dataclasses

    # log-mel shares the fused tail (r4); raw waveform does not
    assert frontend_fusable(
        wavs3d,
        aug,
        dataclasses.replace(cfg, preprocess_method="log_mel_spectrogram"),
        noise,
        n,
    )
    assert not frontend_fusable(
        wavs3d,
        aug,
        dataclasses.replace(cfg, preprocess_method="no_preprocessing"),
        noise,
        n,
    )
    # 25 ms window: 400 % 160 != 0 -> fused MFCC unavailable
    assert not frontend_fusable(
        wavs3d, aug, dataclasses.replace(cfg, window_size_ms=25.0), noise, n
    )
    # noise clips shorter than the output length: the crop-offset draw
    # randint(0, clip_len - n + 1) would have an empty range -> OOB DMA
    assert not frontend_fusable(wavs3d, aug, cfg, noise[:, : n - 128], n)
    # no-augmentation method is not gather-fusable
    assert not frontend_fusable(
        wavs3d, AugmentConfig(method="no_augmentation_audio"), cfg, noise, n
    )


@pytest.mark.parametrize("variant", ["hops", "phases", "radix4"])
@pytest.mark.parametrize(
    "window_ms,stride_ms", [(30.0, 10.0), (40.0, 20.0)], ids=["3010", "4020"]
)
def test_fused_frontend_matches_two_kernel_path(rng, window_ms, stride_ms, variant):
    """ONE kernel (gather+augment+MFCC) vs the composed fused_gather_augment
    -> fused_mfcc path with the same key: identical draws, identical math,
    for both in-kernel DFT decompositions (mfcc.phase_dft_plan).

    Tolerance is ULP-level, not exact: the augment arithmetic fuses into
    the DFT matmul in the single-kernel graph, so the compiler may
    contract mul+add chains (FMA) differently than in the standalone
    augment kernel — observed |diff| <= 4e-6 on coefficients of magnitude
    ~70 (silent rows, whose foreground path is zeroed, match exactly)."""
    import dataclasses

    aug = AugmentConfig(background_frequency=0.8, background_max_volume=0.3)
    n = 2560  # % 128 == 0, % 160 == 0, % 320 == 0
    wavs3d, idx, silent, noise = _dataset(rng, n, p=4096)
    cfg = dataclasses.replace(
        _audio_cfg(n, window_ms, stride_ms), dft_variant=variant
    )
    assert frontend_fusable(wavs3d, aug, cfg, noise, n)

    key = jax.random.key(42)
    got = np.asarray(
        fused_gather_augment_mfcc(
            wavs3d, idx, silent, key, aug, cfg, noise, True, n, interpret=True
        )
    )
    wavs = fused_gather_augment(
        wavs3d, idx, silent, key, aug, noise, True, n, interpret=True
    )
    want = np.asarray(fused_mfcc(wavs, cfg, interpret=True, variant=variant))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)


def test_fused_frontend_real_geometry(rng):
    """Flagship geometry: 16000 samples, 480/160 window -> [B, 98, 40]."""
    aug = AugmentConfig(background_frequency=1.0, background_max_volume=0.2)
    n = 16000
    wavs3d, idx, silent, noise = _dataset(rng, n, p=16384, batch=8, num_rows=12)
    cfg = AudioConfig()
    assert cfg.desired_samples == n
    assert frontend_fusable(wavs3d, aug, cfg, noise, n)

    key = jax.random.key(7)
    got = np.asarray(
        fused_gather_augment_mfcc(
            wavs3d, idx, silent, key, aug, cfg, noise, True, n, interpret=True
        )
    )
    wavs = fused_gather_augment(
        wavs3d, idx, silent, key, aug, noise, True, n, interpret=True
    )
    want = np.asarray(fused_mfcc(wavs, cfg, interpret=True))
    assert got.shape == (8, 98, 40)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)


def test_fused_frontend_tb_invariant(rng):
    """The kernel batch tile is a pure scheduling knob: tb=4/16 must be
    BIT-identical to the default tb=8 (same draws, same per-row math —
    only the grid shape and matmul M dim change). Unlocked by the
    per-kernel scoped-vmem raise (mfcc.vmem_params); tb>8 was
    uncompilable before."""
    aug = AugmentConfig(background_frequency=0.8, background_max_volume=0.3)
    n = 2560
    wavs3d, idx, silent, noise = _dataset(rng, n, p=4096, batch=20)
    cfg = _audio_cfg(n)
    key = jax.random.key(11)

    args = (wavs3d, idx, silent, key, aug, cfg, noise, True, n)
    want = np.asarray(fused_gather_augment_mfcc(*args, interpret=True))
    for tb in (4, 16):
        got = np.asarray(
            fused_gather_augment_mfcc(*args, interpret=True, tb=tb)
        )
        np.testing.assert_array_equal(got, want)


def test_fused_frontend_log_mel(rng):
    """Log-mel through the single-kernel front end == the two-kernel path
    (same draws, magnitude tail + identity DCT)."""
    import dataclasses

    aug = AugmentConfig(background_frequency=0.8, background_max_volume=0.3)
    n = 2560
    wavs3d, idx, silent, noise = _dataset(rng, n, p=4096)
    cfg = dataclasses.replace(
        _audio_cfg(n), preprocess_method="log_mel_spectrogram"
    )
    assert frontend_fusable(wavs3d, aug, cfg, noise, n)

    key = jax.random.key(21)
    got = np.asarray(
        fused_gather_augment_mfcc(
            wavs3d, idx, silent, key, aug, cfg, noise, True, n, interpret=True
        )
    )
    wavs = fused_gather_augment(
        wavs3d, idx, silent, key, aug, noise, True, n, interpret=True
    )
    want = np.asarray(fused_mfcc(wavs, cfg, interpret=True))
    assert got.shape == want.shape == (16, 14, 64)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)


def test_fused_frontend_eval_mode(rng):
    """Eval (is_training=False, naive mix): volumes are 0; features must
    equal the plain XLA front end on the decoded, silence-zeroed rows."""
    from tcresnet_tpu.ops import dsp

    aug = AugmentConfig(method="anchored_slice_or_pad")
    n = 2560
    wavs3d, idx, silent, noise = _dataset(rng, n, p=4096)
    cfg = _audio_cfg(n)
    key = jax.random.key(3)
    got = np.asarray(
        fused_gather_augment_mfcc(
            wavs3d, idx, silent, key, aug, cfg, noise, False, n, interpret=True
        )
    )
    rows = np.asarray(wavs3d).reshape(wavs3d.shape[0], -1)[np.asarray(idx), :n]
    decoded = rows.astype(np.float32) / 32768.0
    decoded[np.asarray(silent)] = 0.0
    want = np.asarray(dsp.mfcc(jnp.asarray(decoded), cfg))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)


def _frontend_cfg(workdir, frontend_fuse):
    import dataclasses

    from tcresnet_tpu.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        OptimConfig,
        TrainConfig,
    )

    # 160 ms at 16 kHz = 2560 samples: lane-aligned (%128) and
    # hop-decomposable (%160) -> frontend_fusable on the synthetic set
    return ExperimentConfig(
        audio=AudioConfig(
            clip_duration_ms=160, num_mfccs=20, num_mel_bins=32,
            frontend_fuse=frontend_fuse,
        ),
        augment=AugmentConfig(background_frequency=0.2, background_max_volume=0.05),
        model=ModelConfig(name="TCResNet8", num_classes=4, bn_momentum=0.9),
        optim=OptimConfig(optimizer="adam", lr_list=(3e-3,), boundaries=()),
        train=TrainConfig(
            batch_size=32, max_step=2, step_save_checkpoint=100,
            train_dir=str(workdir),
        ),
        data=DataConfig(eval_batch_size=64),
    )


@pytest.mark.parametrize("mode,expect_called", [("on", True), ("off", False)])
def test_trainer_dispatches_frontend_kernel(tmp_path, monkeypatch, mode, expect_called):
    """Trainer._input_features must route through the single-kernel front
    end when enabled+fusable, and fall back cleanly when disabled."""
    from tcresnet_tpu.data.device_data import DeviceDataset
    from tcresnet_tpu.data.synthetic import make_synthetic_dataset
    from tcresnet_tpu.ops import augment as xla_augment
    from tcresnet_tpu.ops import dsp
    from tcresnet_tpu.ops.pallas import frontend
    from tcresnet_tpu.train.trainer import Trainer

    called = {"n": 0}

    def fake_frontend(wavs3d, idx, silent, key, aug_cfg, audio_cfg,
                      noise_bank, is_training, n, interpret=False, mesh=None):
        called["n"] += 1
        wavs = xla_augment.augment_gathered(
            wavs3d, idx, silent, key, aug_cfg, noise_bank, is_training, n,
            platform="cpu",
        )
        return dsp.preprocess(wavs, audio_cfg)[..., 0]

    monkeypatch.setattr(frontend, "fused_gather_augment_mfcc", fake_frontend)

    data = make_synthetic_dataset(
        num_samples=128, num_classes=4, desired_samples=2560, seed=3
    )
    cfg = _frontend_cfg(tmp_path / "run", frontend_fuse=mode)
    trainer = Trainer(cfg, DeviceDataset(data), workdir=tmp_path / "run")
    if mode == "on":
        # force the TPU decision path; the monkeypatched kernel runs on
        # CPU ("off" keeps platform=cpu — its fallback augment kernel
        # would otherwise need real Mosaic lowering)
        trainer.platform = "tpu"
    assert frontend.frontend_fusable(
        trainer.data.arrays[0], cfg.augment, cfg.audio,
        trainer.data.noise_bank, cfg.audio.desired_samples,
    )
    trainer.train(max_step=2)
    assert (called["n"] > 0) == expect_called
