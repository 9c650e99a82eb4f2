"""Fused Pallas MFCC kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

from tcresnet_tpu.config import AudioConfig
from tcresnet_tpu.ops import dsp
from tcresnet_tpu.ops.pallas.mfcc import fused_mfcc, fused_mfcc_available

CFG_3010 = AudioConfig()  # 480/160 -> 98x40
CFG_4020 = AudioConfig(window_size_ms=40.0, window_stride_ms=20.0)  # 640/320 -> 49x40


def test_availability():
    assert fused_mfcc_available(CFG_3010)
    assert fused_mfcc_available(CFG_4020)
    # non-divisible hop geometry unsupported
    assert not fused_mfcc_available(AudioConfig(window_size_ms=25.0))
    assert not fused_mfcc_available(AudioConfig(preprocess_method="log_mel_spectrogram"))


@pytest.mark.parametrize("cfg", [CFG_3010, CFG_4020], ids=["30/10", "40/20"])
def test_kernel_matches_xla_path(cfg, rng):
    audio = rng.uniform(-1, 1, size=(8, 16000)).astype(np.float32)
    want = np.asarray(dsp.mfcc(audio, cfg))
    got = np.asarray(fused_mfcc(audio, cfg, interpret=True))
    assert got.shape == want.shape
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
