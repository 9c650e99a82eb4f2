"""MFCC / log-mel DSP front end, TPU-first.

ONE implementation used for train, eval, and AOT serving — the reference
shipped two numerically different MFCC paths (training: tf.signal ops at
/root/reference/datasets/preprocessors.py:64-96,182-194; deploy: legacy
contrib_audio C++ ops at :98-124) and a *broken* deploy log-mel (missing
mel constants, :126-136). We standardize on the training path's math,
which produced the published checkpoints/accuracies (SURVEY.md 7.4.1).

TPU design: everything after framing is a batched matmul on the MXU —

    frames[B,F,W] --(windowed real-DFT matmul, [W, 2K])--> re/im[B,F,2K]
    power/magnitude[B,F,K] --(mel matmul [K,M])--> mel[B,F,M]
    log(mel + 1e-6) --(DCT-II matmul [M,C])--> mfcc[B,F,C]

The real FFT is expressed as a dense real-DFT matmul (W x 2K constants;
W=480, K=257 for the 30/10ms config): at these sizes the MXU matmul beats
an FFT and fuses with the mel/DCT stages. The zero-padding of frames to
fft_length is implicit (DFT matrix rows only cover the W real samples).

Exact TF-1.13 semantics reproduced (validated in tests/test_dsp.py
against a numpy/scipy oracle):
  - tf.signal.stft: periodic Hann window, fft_length = 2^ceil(log2(W)),
    pad_end=False -> F = 1 + (N - W) // hop frames.
  - MFCC uses the power spectrum, log-mel uses the magnitude spectrum
    (preprocessors.py:183-194 vs :161-170).
  - tf.signal.linear_to_mel_weight_matrix: HTK mel = 1127*ln(1+f/700),
    first FFT bin zeroed, triangular band interpolation in mel space.
  - tf.signal.mfccs_from_log_mel_spectrograms: unnormalized (scipy-style,
    factor-2) DCT-II scaled by rsqrt(2*M), no k=0 special case.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tcresnet_tpu.config import AudioConfig


# ---------------------------------------------------------------------------
# Geometry helpers
# ---------------------------------------------------------------------------


def fft_length_for(window_size_samples: int) -> int:
    """tf.signal.stft default: smallest power of 2 >= frame_length."""
    return 2 ** int(math.ceil(math.log2(window_size_samples)))


def num_frames_for(num_samples: int, window: int, hop: int) -> int:
    """pad_end=False framing: 1 + floor((N - W) / hop)."""
    return 1 + (num_samples - window) // hop


def feature_width(cfg: AudioConfig) -> int:
    """Coefficient count per frame of the spectral front ends: num_mfccs
    for MFCC, num_mel_bins for log-mel (the fused kernels share one tail
    implementation parameterized by this width)."""
    if cfg.preprocess_method == "mfcc":
        return cfg.num_mfccs
    if cfg.preprocess_method == "log_mel_spectrogram":
        return cfg.num_mel_bins
    raise ValueError(
        f"no spectral feature width for {cfg.preprocess_method!r}"
    )


def feature_shape(cfg: AudioConfig) -> tuple:
    """(frames, coeffs, channels) of the front end's output for `cfg`.

    Reference writes these back into args as height/width/channels
    (factory/audio_nets.py:82-83).
    """
    frames = num_frames_for(
        cfg.desired_samples, cfg.window_size_samples, cfg.window_stride_samples
    )
    if cfg.preprocess_method == "mfcc":
        return (frames, cfg.num_mfccs, 1)
    if cfg.preprocess_method == "log_mel_spectrogram":
        return (frames, cfg.num_mel_bins, 1)
    if cfg.preprocess_method == "no_preprocessing":
        return (cfg.desired_samples, 1, 1)
    raise ValueError(f"Unknown preprocess_method {cfg.preprocess_method!r}")


# ---------------------------------------------------------------------------
# Constant matrices (numpy, cached; folded into the jitted graph as consts)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def hann_window(window_size: int) -> np.ndarray:
    """Periodic Hann, matching tf.signal.hann_window(periodic=True)."""
    n = np.arange(window_size, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / window_size)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def windowed_rdft_matrix(window_size: int, fft_length: int) -> np.ndarray:
    """[W, 2K] matrix computing (Re, Im) of the windowed real DFT.

    frames @ M = concat([Re(rfft(w*frame, fft_length)),
                         Im(rfft(w*frame, fft_length))], -1)
    """
    num_bins = fft_length // 2 + 1
    n = np.arange(window_size, dtype=np.float64)[:, None]
    k = np.arange(num_bins, dtype=np.float64)[None, :]
    angle = 2.0 * np.pi * n * k / fft_length
    win = hann_window(window_size).astype(np.float64)[:, None]
    cos_m = win * np.cos(angle)
    sin_m = win * -np.sin(angle)
    return np.concatenate([cos_m, sin_m], axis=1).astype(np.float32)


@functools.lru_cache(maxsize=None)
def dft_hop_blocks(window: int, hop: int, fft_length: int) -> np.ndarray:
    """[hop, k*2K] hop-decomposed DFT matrix: block j holds rows
    j*hop:(j+1)*hop of windowed_rdft_matrix (frame = concat of k hop
    blocks, so reim[f] = sum_j hops[f+j] @ block_j). The single source
    for the hop-blocked layout used by _reim_via_hops and the fused
    Pallas kernels (ops/pallas/{mfcc,frontend,infer}.py)."""
    dft = windowed_rdft_matrix(window, fft_length)
    k = window // hop
    return np.concatenate(
        [dft[j * hop : (j + 1) * hop] for j in range(k)], axis=1
    )


@functools.lru_cache(maxsize=None)
def linear_to_mel_weight_matrix(
    num_mel_bins: int,
    num_spectrogram_bins: int,
    sample_rate: int,
    lower_edge_hertz: float,
    upper_edge_hertz: float,
) -> np.ndarray:
    """[K, M] mel filterbank, exact tf.signal.linear_to_mel_weight_matrix.

    HTK-style mel scale (natural log, Q=1127), triangular bands linearly
    spaced in mel, lowest FFT bin zeroed (bands_to_zero=1), no area
    normalization. Reference call site: preprocessors.py:80-86.
    """

    def hz_to_mel(f):
        return 1127.0 * np.log1p(np.asarray(f, dtype=np.float64) / 700.0)

    bands_to_zero = 1
    nyquist = sample_rate / 2.0
    linear_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)[bands_to_zero:]
    spectrogram_bins_mel = hz_to_mel(linear_freqs)[:, None]

    band_edges_mel = np.linspace(
        hz_to_mel(lower_edge_hertz), hz_to_mel(upper_edge_hertz), num_mel_bins + 2
    )
    lower_edge = band_edges_mel[None, 0:-2]
    center = band_edges_mel[None, 1:-1]
    upper_edge = band_edges_mel[None, 2:]

    lower_slopes = (spectrogram_bins_mel - lower_edge) / (center - lower_edge)
    upper_slopes = (upper_edge - spectrogram_bins_mel) / (upper_edge - center)
    weights = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))

    return np.pad(weights, [[bands_to_zero, 0], [0, 0]]).astype(np.float32)


@functools.lru_cache(maxsize=None)
def dct_ii_matrix(num_mel_bins: int, num_mfccs: int) -> np.ndarray:
    """[M, C] matrix for tf.signal.mfccs_from_log_mel_spectrograms.

    TF computes scipy-convention DCT-II (leading factor 2, no ortho
    special-casing of k=0) scaled by rsqrt(2*M), i.e.
    D[n, k] = sqrt(2/M) * cos(pi * k * (2n + 1) / (2M)).
    Reference call site: preprocessors.py:191.
    """
    n = np.arange(num_mel_bins, dtype=np.float64)[:, None]
    k = np.arange(num_mfccs, dtype=np.float64)[None, :]
    d = np.cos(np.pi * k * (2.0 * n + 1.0) / (2.0 * num_mel_bins))
    return (d * np.sqrt(2.0 / num_mel_bins)).astype(np.float32)


# ---------------------------------------------------------------------------
# jnp compute path (jittable; constants close over numpy arrays)
# ---------------------------------------------------------------------------


def dsp_matmul_dtype(cfg: AudioConfig):
    """Configured operand dtype of the windowed-DFT matmul."""
    name = getattr(cfg, "dsp_matmul_dtype", "float32")
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def frame_signal(audio: jnp.ndarray, window: int, hop: int) -> jnp.ndarray:
    """[..., N] -> [..., F, W] overlapping frames (pad_end=False)."""
    num_samples = audio.shape[-1]
    frames = num_frames_for(num_samples, window, hop)
    idx = np.arange(frames)[:, None] * hop + np.arange(window)[None, :]
    return audio[..., idx]


def _reim_via_gather(
    audio: jnp.ndarray, window: int, hop: int, matmul_dtype=jnp.float32
) -> jnp.ndarray:
    """Framing gather + one windowed-DFT matmul -> [..., F, 2K].

    matmul_dtype=bfloat16 casts BOTH operands to bf16 (f32 accumulation
    via preferred_element_type) — a single native MXU pass instead of the
    multi-pass f32 emulation; ~3e-3 relative feature error.
    """
    fft_length = fft_length_for(window)
    frames = frame_signal(audio, window, hop).astype(matmul_dtype)
    dft = jnp.asarray(windowed_rdft_matrix(window, fft_length)).astype(matmul_dtype)
    return jnp.einsum(
        "...fw,wk->...fk", frames, dft, preferred_element_type=jnp.float32
    )


def _reim_via_hops(audio: jnp.ndarray, window: int, hop: int) -> jnp.ndarray:
    """Gather-free windowed DFT via hop decomposition -> [..., F, 2K].

    Requires window % hop == 0 and N % hop == 0 (true for both reference
    feature configs: 480 = 3*160, 640 = 2*320). Frame f is the
    concatenation of hop-blocks f..f+k-1, so with the [window, 2K] DFT
    matrix split into k row-blocks D_j:

        reim[f] = sum_j hops[f + j] @ D_j

    — one [*, n_hops, hop] x [hop, k*2K] MXU matmul followed by k shifted
    adds. Measured on v5e this loses to the gather path (the unaligned
    shifted adds force relayouts: 1.9ms vs 0.58ms per 1024x16000 batch),
    so the gather path is the default; kept as the blockwise formulation
    the fused Pallas kernel uses internally (ops/pallas/mfcc.py).
    """
    fft_length = fft_length_for(window)
    num_bins2 = 2 * (fft_length // 2 + 1)
    k = window // hop
    n_hops = audio.shape[-1] // hop
    frames = n_hops - k + 1
    hops = audio.reshape(audio.shape[:-1] + (n_hops, hop))
    dft_blocks = jnp.asarray(dft_hop_blocks(window, hop, fft_length))
    partial = jnp.einsum(
        "...nh,hk->...nk", hops, dft_blocks, preferred_element_type=jnp.float32
    )
    reim = partial[..., 0:frames, 0:num_bins2]
    for j in range(1, k):
        reim = reim + partial[..., j : j + frames, j * num_bins2 : (j + 1) * num_bins2]
    return reim


def spectrogram(
    audio: jnp.ndarray,
    window: int,
    hop: int,
    magnitude_squared: bool,
    matmul_dtype=jnp.float32,
) -> jnp.ndarray:
    """[..., N] float32 -> [..., F, K] power or magnitude spectrogram.

    Matches tf.contrib.signal.stft + |.|^2 (or |.|) at
    preprocessors.py:68-77, expressed as MXU matmuls via the framing
    gather (measured fastest XLA formulation; the hop decomposition
    lost to it on hardware and now lives only inside the fused Pallas
    kernels — docs/BENCH_RESULTS.md, ops/pallas/mfcc.py).
    """
    audio = audio.astype(jnp.float32)
    num_bins = fft_length_for(window) // 2 + 1
    reim = _reim_via_gather(audio, window, hop, matmul_dtype)
    re, im = reim[..., :num_bins], reim[..., num_bins:]
    power = re * re + im * im
    if magnitude_squared:
        return power
    return jnp.sqrt(power)


def log_mel_spectrogram(
    audio: jnp.ndarray, cfg: AudioConfig, magnitude_squared: bool
) -> jnp.ndarray:
    """[..., N] -> [..., F, M] log-mel features (preprocessors.py:64-96)."""
    window = cfg.window_size_samples
    hop = cfg.window_stride_samples
    spec = spectrogram(
        audio, window, hop, magnitude_squared, dsp_matmul_dtype(cfg)
    )
    mel_w = jnp.asarray(
        linear_to_mel_weight_matrix(
            cfg.num_mel_bins,
            fft_length_for(window) // 2 + 1,
            cfg.sample_rate,
            cfg.lower_edge_hertz,
            cfg.upper_edge_hertz,
        )
    )
    mel = jnp.einsum("...fk,km->...fm", spec, mel_w, preferred_element_type=jnp.float32)
    return jnp.log(mel + 1e-6)


def mfcc(audio: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """[..., N] -> [..., F, num_mfccs] MFCCs (preprocessors.py:182-194).

    Power spectrum -> mel -> log -> scaled DCT-II, first num_mfccs kept.
    """
    log_mel = log_mel_spectrogram(audio, cfg, magnitude_squared=True)
    dct_w = jnp.asarray(dct_ii_matrix(cfg.num_mel_bins, cfg.num_mfccs))
    return jnp.einsum(
        "...fm,mc->...fc", log_mel, dct_w, preferred_element_type=jnp.float32
    )


def preprocess(audio: jnp.ndarray, cfg: AudioConfig, mesh=None) -> jnp.ndarray:
    """Front-end dispatch: [..., N] wavs -> [..., H, W, 1] features.

    The single entry point used by train, eval, and AOT serving alike
    (reference had divergent train/deploy paths; see module docstring).
    """
    if cfg.preprocess_method in ("mfcc", "log_mel_spectrogram"):
        backend = getattr(cfg, "dsp_backend", "xla")
        # "auto": the XLA framing path wins below ~2k rows but degrades
        # with batch (1.04 -> 1.56 us/utt from 1024 to 4096 on v5e: its
        # materialized [B, F, W] frame gather is HBM-bound); the fused
        # kernel stays ~flat (1.06 -> 1.33), so large batches use it.
        # Only on TPU — Mosaic lowering is TPU-only and CPU jit would
        # hit interpret-less lowering errors.
        if backend == "auto":
            from tcresnet_tpu.utils.platform import default_platform

            platform = default_platform()
            backend = (
                "pallas"
                if (platform == "tpu" and audio.ndim == 2 and audio.shape[0] >= 2048)
                else "xla"
            )
        if backend == "pallas" and audio.ndim == 2:
            # one fused kernel serves both spectral features (the tail
            # differs by magnitude-vs-power and the DCT matmul —
            # ops/pallas/mfcc.mfcc_plan)
            from tcresnet_tpu.ops.pallas.mfcc import fused_mfcc

            feats = fused_mfcc(audio, cfg, mesh=mesh)
        elif cfg.preprocess_method == "mfcc":
            feats = mfcc(audio, cfg)
        else:
            feats = log_mel_spectrogram(audio, cfg, magnitude_squared=False)
    elif cfg.preprocess_method == "no_preprocessing":
        feats = audio[..., :, None]
    else:
        raise ValueError(f"Unknown preprocess_method {cfg.preprocess_method!r}")
    return feats[..., None]
