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
def radix4_dft_matrices(fft_length: int):
    """Stage-2 matrices (M0, M1, M2) of the radix-4 DIF factored rDFT.

    Cooley-Tukey decimation-in-frequency with N = fft_length, L = N/4:
    split n = L*n1 + n2 (four CONTIGUOUS blocks b_n1 — on TPU these are
    lane-tile-aligned slices when L % 128 == 0), k = k1 + 4*k2. The
    4-point butterfly over n1 is pure adds (VPU):

        u0 = b0+b1+b2+b3            (real,  k1=0)
        u1 = (b0-b2) + i(b3-b1)     (complex, k1=1; k1=3 is conj(u1))
        u2 = b0-b1+b2-b3            (real,  k1=2)

    and the per-branch twiddle e^{-2pi i n2 k1 / N} is FOLDED into the
    stage-2 DFT-L matrices, so X[k1+4k2] = sum_n2 u_k1[n2] *
    e^{-2pi i n2 (4k2+k1) / N} becomes three matmuls:

        out0 = u0 @ M0 [L, 2L]   (columns: Re(k2=0..L/2) | Im, rest 0)
        out1 = [u1re | u1im] @ M1 [2L, 2L]  (all k2: upper half carries
                the k1=3 bins via X[N-k] = conj(X[k]))
        out2 = u2 @ M2 [L, 2L]   (k2 < L/2, rest 0)

    MXU cost for the 30/10 ms config (N=512, L=128): 8 K-by-N 128-chunk
    passes vs the dense windowed-DFT matmul's 20 — 2.5x fewer MACs. The
    output bins land PERMUTED across branches; the permutation is folded
    into the mel matrix rows (radix4_mel_matrix), never materialized.

    Parity vs the dense matrix path is reassociation-level (~1e-4 atol
    on features): identical math, different add order.
    """
    length = fft_length // 4
    n2 = np.arange(length, dtype=np.float64)[:, None]
    j = np.arange(length, dtype=np.float64)[None, :]

    def cos_sin(k1: float):
        theta = 2.0 * np.pi * n2 * (4.0 * j + k1) / fft_length
        return np.cos(theta), np.sin(theta)

    c0, s0 = cos_sin(0.0)
    c1, s1 = cos_sin(1.0)
    c2, s2 = cos_sin(2.0)
    keep0 = (np.arange(length) <= length // 2)[None, :]
    keep2 = (np.arange(length) < length // 2)[None, :]
    m0 = np.concatenate([c0 * keep0, -s0 * keep0], axis=1)
    m1 = np.block([[c1, -s1], [s1, c1]])
    m2 = np.concatenate([c2 * keep2, -s2 * keep2], axis=1)
    return (m0.astype(np.float32), m1.astype(np.float32),
            m2.astype(np.float32))


@functools.lru_cache(maxsize=None)
def radix4_bin_map(fft_length: int) -> np.ndarray:
    """[3L] FFT-bin index of each permuted radix-4 power row (-1 = dead).

    Rows [0,L) = branch k1=0 (bin 4*r, valid r <= L/2); rows [L,2L) =
    branch k1=1 for k2 < ~L/2 and the k1=3 bins via conjugate symmetry
    (bin N - (1+4*k2)) above; rows [2L,3L) = branch k1=2 (k2 < L/2).
    Every bin 0..N/2 appears exactly once.
    """
    length = fft_length // 4
    half = fft_length // 2
    bins = np.full(3 * length, -1, np.int64)
    for r in range(length // 2 + 1):
        bins[r] = 4 * r
    for j in range(length):
        k = 1 + 4 * j
        bins[length + j] = k if k <= half else fft_length - k
    for j in range(length // 2):
        bins[2 * length + j] = 2 + 4 * j
    used = bins[bins >= 0]
    assert len(used) == half + 1 and len(set(used.tolist())) == half + 1
    return bins


@functools.lru_cache(maxsize=None)
def radix4_mel_matrix(
    num_mel_bins: int,
    fft_length: int,
    sample_rate: int,
    lower_edge_hertz: float,
    upper_edge_hertz: float,
) -> np.ndarray:
    """[3L, M] mel filterbank with rows permuted to the radix-4 power
    layout (dead rows zero) — the branch->bin permutation rides the mel
    matmul for free instead of a lane interleave."""
    mel = linear_to_mel_weight_matrix(
        num_mel_bins, fft_length // 2 + 1, sample_rate,
        lower_edge_hertz, upper_edge_hertz,
    )
    bins = radix4_bin_map(fft_length)
    out = np.zeros((bins.shape[0], num_mel_bins), np.float32)
    valid = bins >= 0
    out[valid] = mel[bins[valid]]
    return out


@functools.lru_cache(maxsize=None)
def radix4_window(window_size: int, fft_length: int) -> np.ndarray:
    """[fft_length] periodic Hann zero-padded to the FFT length (the
    explicit window multiply the factored path needs — the dense path
    folds the window into its DFT matrix instead)."""
    out = np.zeros(fft_length, np.float32)
    out[:window_size] = hann_window(window_size)
    return out


def radix4_butterfly(fr: jnp.ndarray, fft_length: int):
    """[..., fft] WINDOWED frames -> (u0, u1, u2) radix-4 DIF butterfly.

    u1 is [..., 2L] (re | im). Pure adds on lane-tile-aligned slices;
    shared by the XLA path and the Pallas kernel tails (slicing instead
    of a minor-dim reshape keeps it Mosaic-legal).
    """
    length = fft_length // 4
    b0 = fr[..., 0:length]
    b1 = fr[..., length:2 * length]
    b2 = fr[..., 2 * length:3 * length]
    b3 = fr[..., 3 * length:4 * length]
    u0 = b0 + b1 + b2 + b3
    u1 = jnp.concatenate([b0 - b2, b3 - b1], axis=-1)
    u2 = b0 - b1 + b2 - b3
    return u0, u1, u2


def _power_radix4(
    audio: jnp.ndarray, window: int, hop: int, matmul_dtype=jnp.float32
) -> jnp.ndarray:
    """[..., N] -> [..., F, 3L] branch-permuted power spectrum via the
    radix-4 factored rDFT (see radix4_dft_matrices)."""
    fft_length = fft_length_for(window)
    length = fft_length // 4
    frames = frame_signal(audio.astype(jnp.float32), window, hop)
    fr = frames * jnp.asarray(hann_window(window))
    pad = [(0, 0)] * (fr.ndim - 1) + [(0, fft_length - window)]
    fr = jnp.pad(fr, pad).astype(matmul_dtype)
    u0, u1, u2 = radix4_butterfly(fr, fft_length)
    mats = [
        jnp.asarray(m).astype(matmul_dtype)
        for m in radix4_dft_matrices(fft_length)
    ]
    outs = [
        jnp.einsum("...l,lk->...k", u, m, preferred_element_type=jnp.float32)
        for u, m in zip((u0, u1, u2), mats)
    ]
    return jnp.concatenate(
        [o[..., :length] ** 2 + o[..., length:] ** 2 for o in outs], axis=-1
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
    """[..., N] -> [..., F, M] log-mel features (preprocessors.py:64-96).

    cfg.dft_variant == "radix4" routes the XLA path through the factored
    rDFT (radix4_dft_matrices): same math to reassociation level (~1e-4
    on features), ~2.5x fewer DFT MACs; the branch permutation is folded
    into the mel matrix so the downstream tail is unchanged.
    """
    window = cfg.window_size_samples
    hop = cfg.window_stride_samples
    if getattr(cfg, "dft_variant", "auto") == "radix4":
        power = _power_radix4(audio, window, hop, dsp_matmul_dtype(cfg))
        spec = power if magnitude_squared else jnp.sqrt(power)
        mel_w = jnp.asarray(
            radix4_mel_matrix(
                cfg.num_mel_bins,
                fft_length_for(window),
                cfg.sample_rate,
                cfg.lower_edge_hertz,
                cfg.upper_edge_hertz,
            )
        )
    else:
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
