"""Golden-value tests for the DSP front end.

The oracle reimplements the reference's *training-path* math
(/root/reference/datasets/preprocessors.py:64-96,182-194 — tf.signal
stft/mel/DCT) with numpy/scipy FFTs, entirely independently of the jnp
matmul formulation under test. Agreement to ~1e-4 relative establishes
the BASELINE.md parity requirement at the math level.
"""

import numpy as np
import pytest
import scipy.fftpack

from tcresnet_tpu.config import AudioConfig
from tcresnet_tpu.ops import dsp


# ---------------------------------------------------------------------------
# numpy oracle (FFT-based, independent of the matmul implementation)
# ---------------------------------------------------------------------------


def oracle_stft_spec(audio, window, hop, magnitude_squared):
    fft_length = dsp.fft_length_for(window)
    frames = 1 + (audio.shape[-1] - window) // hop
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(window) / window)
    out = []
    for b in range(audio.shape[0]):
        rows = []
        for f in range(frames):
            seg = audio[b, f * hop : f * hop + window] * win
            spec = np.fft.rfft(seg, n=fft_length)
            rows.append(np.abs(spec) ** 2 if magnitude_squared else np.abs(spec))
        out.append(rows)
    return np.asarray(out)


def oracle_mel_matrix(num_mel, num_bins, sr, lo, hi):
    def mel(f):
        return 1127.0 * np.log1p(np.asarray(f, float) / 700.0)

    freqs = np.linspace(0, sr / 2, num_bins)[1:]
    spec_mel = mel(freqs)[:, None]
    edges = np.linspace(mel(lo), mel(hi), num_mel + 2)
    lower, center, upper = edges[None, :-2], edges[None, 1:-1], edges[None, 2:]
    w = np.maximum(
        0, np.minimum((spec_mel - lower) / (center - lower), (upper - spec_mel) / (upper - center))
    )
    return np.pad(w, [[1, 0], [0, 0]])


def oracle_mfcc(audio, cfg: AudioConfig):
    window, hop = cfg.window_size_samples, cfg.window_stride_samples
    spec = oracle_stft_spec(audio, window, hop, magnitude_squared=True)
    mel_w = oracle_mel_matrix(
        cfg.num_mel_bins,
        dsp.fft_length_for(window) // 2 + 1,
        cfg.sample_rate,
        cfg.lower_edge_hertz,
        cfg.upper_edge_hertz,
    )
    log_mel = np.log(spec @ mel_w + 1e-6)
    # tf.signal.mfccs_from_log_mel_spectrograms = scipy dct-II (factor 2,
    # no norm) * rsqrt(2*M), keep first num_mfccs.
    dct = scipy.fftpack.dct(log_mel, type=2, axis=-1, norm=None)
    dct *= 1.0 / np.sqrt(2.0 * cfg.num_mel_bins)
    return dct[..., : cfg.num_mfccs]


def oracle_log_mel(audio, cfg: AudioConfig):
    window, hop = cfg.window_size_samples, cfg.window_stride_samples
    spec = oracle_stft_spec(audio, window, hop, magnitude_squared=False)
    mel_w = oracle_mel_matrix(
        cfg.num_mel_bins,
        dsp.fft_length_for(window) // 2 + 1,
        cfg.sample_rate,
        cfg.lower_edge_hertz,
        cfg.upper_edge_hertz,
    )
    return np.log(spec @ mel_w + 1e-6)


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

CFG_3010 = AudioConfig(window_size_ms=30.0, window_stride_ms=10.0, num_mfccs=40)
CFG_4020 = AudioConfig(window_size_ms=40.0, window_stride_ms=20.0, num_mfccs=40)
CFG_1040 = AudioConfig(window_size_ms=40.0, window_stride_ms=20.0, num_mfccs=10)


def test_geometry():
    # SURVEY.md section 2.3 feature geometry table.
    assert dsp.feature_shape(CFG_3010) == (98, 40, 1)
    assert dsp.feature_shape(CFG_4020) == (49, 40, 1)
    assert dsp.feature_shape(CFG_1040) == (49, 10, 1)
    assert dsp.fft_length_for(480) == 512
    assert dsp.fft_length_for(640) == 1024


def test_mel_matrix_matches_oracle():
    got = dsp.linear_to_mel_weight_matrix(64, 257, 16000, 80.0, 7600.0)
    want = oracle_mel_matrix(64, 257, 16000, 80.0, 7600.0)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (257, 64)
    # first bin zeroed, all weights in [0, 1]
    assert got[0].sum() == 0
    assert got.min() >= 0 and got.max() <= 1.0


def test_dct_matrix_matches_scipy():
    x = np.random.default_rng(0).normal(size=(5, 64)).astype(np.float32)
    want = scipy.fftpack.dct(x, type=2, axis=-1, norm=None) / np.sqrt(2.0 * 64)
    got = x @ dsp.dct_ii_matrix(64, 64)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cfg", [CFG_3010, CFG_4020], ids=["30/10", "40/20"])
def test_spectrogram_matches_fft_oracle(cfg, rng):
    audio = rng.uniform(-1, 1, size=(3, 16000)).astype(np.float32)
    window, hop = cfg.window_size_samples, cfg.window_stride_samples
    got = np.asarray(dsp.spectrogram(audio, window, hop, magnitude_squared=True))
    want = oracle_stft_spec(audio.astype(np.float64), window, hop, True)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("cfg", [CFG_3010, CFG_4020, CFG_1040], ids=["30/10", "40/20", "10x49"])
def test_mfcc_matches_oracle(cfg, rng):
    audio = rng.uniform(-1, 1, size=(4, 16000)).astype(np.float32)
    got = np.asarray(dsp.mfcc(audio, cfg))
    want = oracle_mfcc(audio.astype(np.float64), cfg)
    assert got.shape == want.shape == (4,) + dsp.feature_shape(cfg)[:2]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)


def test_log_mel_matches_oracle(rng):
    audio = rng.uniform(-1, 1, size=(2, 16000)).astype(np.float32)
    got = np.asarray(dsp.log_mel_spectrogram(audio, CFG_3010, magnitude_squared=False))
    want = oracle_log_mel(audio.astype(np.float64), CFG_3010)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)


def test_preprocess_shapes(rng):
    audio = rng.uniform(-1, 1, size=(2, 16000)).astype(np.float32)
    for method, shape in [
        ("mfcc", (2, 98, 40, 1)),
        ("log_mel_spectrogram", (2, 98, 64, 1)),
        ("no_preprocessing", (2, 16000, 1, 1)),
    ]:
        cfg = AudioConfig(preprocess_method=method)
        assert dsp.preprocess(audio, cfg).shape == shape


def test_silence_gives_constant_features():
    # log(0 + 1e-6) path must be finite: silence inputs are all-zero wavs.
    audio = np.zeros((1, 16000), np.float32)
    feats = np.asarray(dsp.mfcc(audio, CFG_3010))
    assert np.isfinite(feats).all()
    # every frame identical for a constant signal
    np.testing.assert_allclose(feats[0, 0], feats[0, -1], atol=1e-5)


def test_bf16_dsp_matmul_close_to_f32():
    """dsp_matmul_dtype=bfloat16 runs the DFT as one native MXU pass; the
    feature error must stay ~1e-2 absolute on a ~70-unit feature range."""
    import jax

    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 16000)).astype(np.float32))
    with jax.default_device(jax.devices("cpu")[0]):
        a = np.asarray(dsp.preprocess(x, AudioConfig()))
        b = np.asarray(
            dsp.preprocess(x, AudioConfig(dsp_matmul_dtype="bfloat16"))
        )
    assert a.shape == b.shape
    err = np.abs(a - b).max()
    assert 0 < err < 0.1, err  # bf16 rounding is real but small


def test_radix4_bin_map_is_a_permutation():
    """Every FFT bin 0..N/2 appears exactly once across the three
    radix-4 branches; dead rows are -1 and zero in the permuted mel."""
    for fft in (512, 1024):
        bins = dsp.radix4_bin_map(fft)
        used = bins[bins >= 0]
        assert sorted(used.tolist()) == list(range(fft // 2 + 1))
        mel = dsp.radix4_mel_matrix(64, fft, 16000, 80.0, 7600.0)
        assert mel.shape == (3 * (fft // 4), 64)
        assert not mel[bins < 0].any()
        np.testing.assert_array_equal(
            mel[bins >= 0],
            dsp.linear_to_mel_weight_matrix(64, fft // 2 + 1, 16000,
                                            80.0, 7600.0)[used],
        )


@pytest.mark.parametrize("cfg", [CFG_3010, CFG_4020], ids=["30/10", "40/20"])
@pytest.mark.parametrize("method", ["mfcc", "log_mel_spectrogram"])
def test_radix4_xla_path_matches_dense(cfg, rng, method):
    """dft_variant='radix4' on the XLA path: the factored rDFT +
    permuted-mel formulation is the same math to reassociation level."""
    import dataclasses

    import jax.numpy as jnp

    cfg = dataclasses.replace(cfg, preprocess_method=method)
    cfg4 = dataclasses.replace(cfg, dft_variant="radix4")
    audio = rng.uniform(-1, 1, size=(3, 16000)).astype(np.float32)
    a = np.asarray(dsp.preprocess(jnp.asarray(audio), cfg))
    b = np.asarray(dsp.preprocess(jnp.asarray(audio), cfg4))
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)
