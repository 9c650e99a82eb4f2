"""Fused Pallas MFCC kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

from tcresnet_tpu.config import AudioConfig
from tcresnet_tpu.ops import dsp
from tcresnet_tpu.ops.pallas.mfcc import (
    fused_mfcc,
    fused_mfcc_available,
    phase_dft_available,
    phase_dft_plan,
)

CFG_3010 = AudioConfig()  # 480/160 -> 98x40
CFG_4020 = AudioConfig(window_size_ms=40.0, window_stride_ms=20.0)  # 640/320 -> 49x40


def _small(cfg, n=2560):
    """Same window geometry on a short clip (interpret mode is slow)."""
    import dataclasses

    return dataclasses.replace(cfg, clip_duration_ms=n // 16)


def test_availability():
    assert fused_mfcc_available(CFG_3010)
    assert fused_mfcc_available(CFG_4020)
    # non-divisible hop geometry unsupported
    assert not fused_mfcc_available(AudioConfig(window_size_ms=25.0))
    # log-mel shares the kernel (magnitude tail + identity DCT); raw
    # waveform passthrough does not
    assert fused_mfcc_available(AudioConfig(preprocess_method="log_mel_spectrogram"))
    assert not fused_mfcc_available(AudioConfig(preprocess_method="no_preprocessing"))


def test_phase_plan_geometry():
    # flagship: hop 160, lcm(160,128)=640 -> 4 phases x 5-row superblocks
    assert phase_dft_available(CFG_3010)
    num_p, s_rows, nsb, frames, phases = phase_dft_plan(480, 160, 16000, 512)
    assert (num_p, s_rows, nsb, frames) == (4, 5, 25, 98)
    assert [f for _, _, f, _ in phases] == [25, 25, 24, 24]
    assert [r for _, r, _, _ in phases] == [4, 4, 5, 5]
    # every per-phase DFT matrix embeds the windowed-DFT rows at offset o_p
    dft = dsp.windowed_rdft_matrix(480, 512)
    for p, (c, rows_p, _, w) in enumerate(phases):
        o = (160 * p) % 128
        assert w.shape == (rows_p * 128, 514)
        np.testing.assert_array_equal(w[o : o + 480], dft)
        assert not w[:o].any() and not w[o + 480 :].any()
    # 40/20 config: hop 320 -> 2 phases
    assert phase_dft_available(CFG_4020)
    assert phase_dft_plan(640, 320, 16000, 1024)[0] == 2
    # clip not divisible by lcm(hop, 128) -> unavailable
    assert not phase_dft_available(CFG_3010, 2720)


@pytest.mark.parametrize("variant", ["hops", "phases", "radix4"])
@pytest.mark.parametrize("cfg", [CFG_3010, CFG_4020], ids=["30/10", "40/20"])
def test_kernel_matches_xla_path(cfg, rng, variant):
    cfg = _small(cfg)
    n = cfg.desired_samples
    audio = rng.uniform(-1, 1, size=(8, n)).astype(np.float32)
    want = np.asarray(dsp.mfcc(audio, cfg))
    got = np.asarray(fused_mfcc(audio, cfg, interpret=True, variant=variant))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["hops", "phases", "radix4"])
@pytest.mark.parametrize("cfg", [CFG_3010, CFG_4020], ids=["30/10", "40/20"])
def test_kernel_matches_xla_path_real_geometry(cfg, rng, variant):
    audio = rng.uniform(-1, 1, size=(8, 16000)).astype(np.float32)
    want = np.asarray(dsp.mfcc(audio, cfg))
    got = np.asarray(fused_mfcc(audio, cfg, interpret=True, variant=variant))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("variant", ["hops", "phases", "radix4"])
def test_kernel_matches_xla_log_mel(rng, variant):
    """Log-mel through the SAME fused kernel (magnitude spectrum, identity
    DCT — mfcc_plan) must match dsp.log_mel_spectrogram; the reference
    treats both features symmetrically (preprocessors.py:161-194)."""
    import dataclasses

    cfg = dataclasses.replace(
        _small(CFG_3010), preprocess_method="log_mel_spectrogram"
    )
    n = cfg.desired_samples
    audio = rng.uniform(-1, 1, size=(8, n)).astype(np.float32)
    want = np.asarray(dsp.log_mel_spectrogram(audio, cfg, magnitude_squared=False))
    got = np.asarray(fused_mfcc(audio, cfg, interpret=True, variant=variant))
    assert got.shape == want.shape == (8, dsp.num_frames_for(n, 480, 160), 64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_kernel_pads_odd_batches(rng):
    audio = rng.uniform(-1, 1, size=(5, 16000)).astype(np.float32)
    got = np.asarray(fused_mfcc(audio, CFG_3010, interpret=True))
    want = np.asarray(dsp.mfcc(audio, CFG_3010))
    assert got.shape == (5, 98, 40)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fallback_for_unsupported_geometry(rng):
    cfg = AudioConfig(window_size_ms=25.0)  # 400 % 160 != 0
    audio = rng.uniform(-1, 1, size=(2, 16000)).astype(np.float32)
    got = np.asarray(fused_mfcc(audio, cfg, interpret=True))
    want = np.asarray(dsp.mfcc(audio, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fallback_for_unsupported_geometry_log_mel(rng):
    """A log-mel config with kernel-unsupported geometry must fall back
    to the XLA LOG-MEL feature (magnitude spectrum, no DCT, width
    num_mel_bins) — not to MFCC."""
    import dataclasses

    cfg = dataclasses.replace(
        AudioConfig(window_size_ms=25.0),
        preprocess_method="log_mel_spectrogram",
    )
    assert not fused_mfcc_available(cfg)
    audio = rng.uniform(-1, 1, size=(2, 16000)).astype(np.float32)
    got = np.asarray(fused_mfcc(audio, cfg, interpret=True))
    want = np.asarray(dsp.log_mel_spectrogram(audio, cfg, magnitude_squared=False))
    assert got.shape == want.shape == (2, 98, 64)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_radix4_window_lookahead_guard(rng):
    """radix4's _strided_rows_128 reads one superblock ahead of a row's
    start block; positions past window <= lcm(hop, 128) + hop pick up
    garbage that the window multiply cannot erase. A 60 ms/10 ms window
    (960 > 640 + 160) must be rejected — and fused_mfcc(variant=radix4)
    must silently take the hops path and still match XLA (a 0.147
    feature deviation was measured with the guard absent)."""
    from tcresnet_tpu.ops.pallas.mfcc import radix4_kernel_available

    assert radix4_kernel_available(CFG_3010)
    assert radix4_kernel_available(CFG_4020)
    cfg = AudioConfig(window_size_ms=60.0)  # 960/160: hop-divisible, too long
    assert fused_mfcc_available(cfg)
    assert not radix4_kernel_available(cfg)
    cfg = _small(cfg)
    audio = rng.uniform(-1, 1, size=(2, cfg.desired_samples)).astype(np.float32)
    got = np.asarray(fused_mfcc(audio, cfg, interpret=True, variant="radix4"))
    want = np.asarray(dsp.mfcc(audio, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
