"""Fused Pallas MFCC kernel: wav -> MFCC entirely in VMEM.

The BASELINE.json north star: the reference's multi-op C++ front end
(contrib_audio.audio_spectrogram/mfcc + tf.signal stft/mel/DCT,
/root/reference/datasets/preprocessors.py:64-124) becomes ONE TPU kernel.

Per batch tile (grid over batch), everything stays in VMEM:

    audio[TB, N] --reshape--> hops[TB*n_hops, hop]
      --MXU--> partial[TB*n_hops, k*2K]        (windowed real-DFT blocks)
      --shifted adds--> reim[TB, F, 2K]        (hop decomposition)
      --VPU--> power[TB, F, K]                 (re^2 + im^2)
      --MXU--> mel --VPU--> log(mel + 1e-6)
      --MXU--> mfcc[TB, F, C]                  (scaled DCT-II)

Only the [TB, N] audio read and [TB, F, C] feature write touch HBM —
~13x less HBM traffic than the unfused XLA path, which materializes the
[B, F, window] frame gather and each intermediate.

Numerics match ops/dsp.py (same constant matrices); parity is tested in
tests/test_pallas.py (interpret mode) and on hardware in the verify
drive. Gradients: the front end has no trainable parameters and nothing
upstream needs cotangents (augmentation is data preprocessing), so the
kernel is forward-only.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tcresnet_tpu.config import AudioConfig
from tcresnet_tpu.ops import dsp

_LANES = 128


def vmem_params(*buffer_elems):
    """Raise the 16 MB scoped-vmem soft cap when a kernel geometry's
    per-grid-step live buffers (f32 elements, pre-headroom) exceed it —
    e.g. a 60 ms window's [tb*n_hops, k*two_k] hop-matmul output alone
    is ~20 MB at tb=8, and batch tiles tb>8 grow every intermediate
    (both cases compile-error on v5e without this). Returns None under
    the cap so flagship-geometry compiles stay byte-identical. Shared by
    the fused-MFCC kernel and the single-kernel frontend."""
    from jax.experimental.pallas import tpu as pltpu

    est = int(4 * sum(buffer_elems) * 1.5)
    if est <= 16 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=min(est, 100 * 1024 * 1024))


def fused_mfcc_available(cfg: AudioConfig, num_samples: Optional[int] = None) -> bool:
    """The kernel supports hop-decomposable geometry (both ref configs)
    for BOTH spectral features — the reference treats mfcc and log-mel
    symmetrically (preprocessors.py:161-194); the kernel tail differs by
    magnitude-vs-power and the DCT matmul (mfcc_plan)."""
    n = num_samples or cfg.desired_samples
    window, hop = cfg.window_size_samples, cfg.window_stride_samples
    return (
        cfg.preprocess_method in ("mfcc", "log_mel_spectrogram")
        and window % hop == 0
        and n % hop == 0
        and n >= window
    )


def mel_log_dct(power, mel_w, dct_w, *, tb, frames, magnitude=False):
    """[tb, frames, K] POWER rows -> [tb, frames, out_width].

    The shared power -> (sqrt) -> mel -> log [-> DCT] epilogue of every
    DFT variant and both features: MFCC uses the POWER spectrum + DCT
    (preprocessors.py:183-194), log-mel the MAGNITUDE spectrum and NO
    DCT (:161-170). K is whatever row layout `mel_w` expects (the
    radix-4 variant feeds branch-permuted power with a row-permuted mel
    matrix). For log-mel, `dct_w` is a dummy identity that keeps one ref
    layout for every kernel but is NOT multiplied through — on TPU an
    MXU matmul at default precision is bf16-pass arithmetic, and an
    identity matmul would round log-scale values (|log(mel+1e-6)| up to
    ~14) by ~1e-2 for nothing.
    Pure jnp on values — callable from inside any Pallas kernel body."""
    spec = jnp.sqrt(power) if magnitude else power
    mel = jnp.dot(
        spec.reshape(tb * frames, power.shape[-1]),
        mel_w,
        preferred_element_type=jnp.float32,
    )
    log_mel = jnp.log(mel + 1e-6)
    if magnitude:
        return log_mel.reshape(tb, frames, -1)
    out = jnp.dot(log_mel, dct_w, preferred_element_type=jnp.float32)
    return out.reshape(tb, frames, -1)


def mfcc_from_reim(reim, mel_w, dct_w, *, tb, frames, num_bins,
                   magnitude=False):
    """[tb, frames, 2K] (Re|Im) spectra -> [tb, frames, out_width]
    (see mel_log_dct). Pure jnp on values."""
    re = reim[:, :, :num_bins]
    im = reim[:, :, num_bins:]
    return mel_log_dct(re * re + im * im, mel_w, dct_w, tb=tb,
                       frames=frames, magnitude=magnitude)


def mfcc_tail(
    hops, dft, mel_w, dct_w, *, tb, n_hops, k, num_bins, frames,
    matmul_dtype=jnp.float32, magnitude=False,
):
    """[tb*n_hops, hop] hop rows -> [tb, frames, n_mfccs] MFCCs.

    The "hops" variant of the in-kernel MFCC matmul tail
    (windowed-DFT partials -> hop-decomposition shifted adds -> power ->
    mel -> log -> DCT), shared by this module's kernel and the fused
    frontend/inference kernels (ops/pallas/frontend.py,
    ops/pallas/infer.py). Pure jnp on values — callable from inside any
    Pallas kernel body."""
    two_k = 2 * num_bins
    partial = jnp.dot(
        hops.astype(matmul_dtype), dft, preferred_element_type=jnp.float32
    )
    partial = partial.reshape(tb, n_hops, k * two_k)

    # hop decomposition: reim[f] = sum_j partial[f + j, block j]
    reim = partial[:, 0:frames, 0:two_k]
    for j in range(1, k):
        reim = reim + partial[:, j : j + frames, j * two_k : (j + 1) * two_k]

    return mfcc_from_reim(reim, mel_w, dct_w, tb=tb, frames=frames,
                          num_bins=num_bins, magnitude=magnitude)


def _strided_rows_128(x2, stride: int, offset: int, frames: int):
    """[R, 128] lane-major samples -> [frames, 128] rows, row f holding
    positions [offset + stride*f, offset + stride*f + 128).

    Mosaic-legal assembly (the ONLY pattern the hardware compiler
    accepts for this re-framing — minor concats at non-tile offsets,
    pads, rolls, and dynamic_update_slice are all unimplemented, probed
    on v5e in tools/probe_mosaic_assembly.py): 3D slice -> leading 2D
    reshape -> narrow minor concat, vectorized over lcm(stride, 128)
    superblocks with a leading-SHIFTED blocks view for segs that cross
    a superblock boundary (leading slices keep tile offsets at 0).
    Frames past the superblock bulk are assembled one by one; their
    reads are CLAMPED to the buffer (the substituted samples are always
    in the Hann window's zero tail, so the caller's window multiply
    erases them). The per-frame path is INTERPRET-ONLY: with a leading
    dim of 1 the sliced segs keep their source sublane offsets and the
    minor concat is Mosaic-illegal on hardware ("result/input offset
    mismatch on non-concat dimension", probed v5e) — hardware callers
    must append zero rows so the bulk covers every frame
    (mfcc_tail_radix4 does).
    """
    rows, lanes = x2.shape
    assert lanes == _LANES
    per = (stride * lanes) // math.gcd(stride, lanes)  # lcm
    rpp = per // lanes
    orp = per // stride
    nb = rows // rpp
    out = []

    def segs_for(pos: int, end: int, cur, nxt, base_rows: int):
        segs = []
        while pos < end:
            ir, lane = pos // lanes, pos % lanes
            width = min(lanes - lane, end - pos)
            if ir >= base_rows + (rpp if nxt is not None else 0):
                # beyond the buffer: any in-bounds garbage — these
                # positions sit in the window's zero tail
                ir, lane = base_rows - 1, 0
                src = cur
            elif nxt is not None and ir >= rpp:
                src, ir = nxt, ir - rpp
            else:
                src = cur
            seg = src[:, ir : ir + 1, lane : lane + width]
            segs.append(seg.reshape(seg.shape[0], width))
            pos += width
        return jnp.concatenate(segs, axis=-1) if len(segs) > 1 else segs[0]

    bulk = min(frames, max(nb - 1, 0) * orp)
    if bulk:
        blocks = x2[: nb * rpp].reshape(nb, rpp, lanes)
        cur, nxt = blocks[:-1], blocks[1:]
        res = []
        for r in range(orp):
            row = segs_for(offset + stride * r, offset + stride * r + lanes,
                           cur, nxt, rpp)
            res.append(row.reshape(nb - 1, 1, lanes))
        out.append(
            jnp.concatenate(res, axis=1).reshape((nb - 1) * orp, lanes)[:bulk]
        )
    if bulk < frames:
        x3 = x2.reshape(1, rows, lanes)
        for f in range(bulk, frames):
            pos = offset + stride * f
            row = segs_for(pos, pos + lanes, x3, None, rows)
            out.append(row.reshape(1, lanes))
    return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]


def mfcc_tail_radix4(
    x3, m0, m1, m2, wins, mel_w, dct_w, *, tb, hop, fft_length, frames,
    matmul_dtype=jnp.float32, magnitude=False,
):
    """[tb, R, 128] lane-major samples -> [tb, frames, out] features via
    the radix-4 factored rDFT (dsp.radix4_dft_matrices: ~1.9x fewer DFT
    MACs than the dense hop-blocked matmul — measured DFT-bound in the
    kernel, docs/ROUND4_NOTES.md).

    The fft-length frame is NEVER materialized (minor concats at hop
    boundaries are Mosaic-illegal): the four L-wide butterfly blocks are
    assembled directly as [frames, 128] strided rows
    (_strided_rows_128), window-multiplied per block, butterflied with
    VPU adds, and pushed through the three stage-2 matmuls; the
    branch-permuted power then feeds the row-permuted mel matrix
    (dsp.radix4_mel_matrix), so the bin interleave rides the mel matmul.
    `wins` is the Hann window as fft/128 SEPARATE [1, 128] chunks — a
    lane slice of one [1, fft] window has a vreg-offset layout Mosaic
    cannot broadcast ("Invalid input layout"), whole small refs are
    canonical. Pure jnp on values — callable from inside any Pallas
    kernel body."""
    length = fft_length // 4
    tb_, rows, lanes = x3.shape
    assert tb_ == tb and length % lanes == 0
    assert len(wins) == fft_length // lanes
    # Append zero rows until _strided_rows_128's SUPERBLOCK BULK covers
    # every frame: its per-frame tail path is Mosaic-illegal on hardware
    # (see its docstring). Middle-axis concat of zeros is legal; the
    # appended samples sit past the last frame's window tail (or under
    # Hann zeros), so values are unchanged.
    per = (hop * lanes) // math.gcd(hop, lanes)
    rpp, orp = per // lanes, per // hop
    need = (-(-frames // orp) + 1) * rpp
    if rows < need:
        x3 = jnp.concatenate(
            [x3, jnp.zeros((tb, need - rows, lanes), x3.dtype)], axis=1
        )
    bs = []
    for i in range(4):
        subs = []
        for j in range(length // lanes):
            off = length * i + lanes * j
            per_t = [
                _strided_rows_128(x3[t], hop, off, frames) for t in range(tb)
            ]
            sub = jnp.concatenate(per_t, axis=0) if tb > 1 else per_t[0]
            subs.append(sub * wins[off // lanes])
        b = jnp.concatenate(subs, axis=-1) if len(subs) > 1 else subs[0]
        bs.append(b.astype(matmul_dtype))
    b0, b1, b2, b3 = bs
    u0 = b0 + b1 + b2 + b3
    u1 = jnp.concatenate([b0 - b2, b3 - b1], axis=-1)
    u2 = b0 - b1 + b2 - b3
    outs = [
        jnp.dot(u, m, preferred_element_type=jnp.float32)
        for u, m in ((u0, m0), (u1, m1), (u2, m2))
    ]
    power = jnp.concatenate(
        [o[:, :length] ** 2 + o[:, length:] ** 2 for o in outs], axis=-1
    )
    # rows are per-utterance contiguous: [tb*frames, 3L] -> [tb, frames, 3L]
    return mel_log_dct(
        power.reshape(tb, frames, 3 * length), mel_w, dct_w,
        tb=tb, frames=frames, magnitude=magnitude,
    )


def radix4_kernel_available(
    cfg: AudioConfig, num_samples: Optional[int] = None
) -> bool:
    """The in-kernel radix-4 tail needs lane-tile-aligned butterfly
    blocks — fft/4 % 128 == 0 (true for both reference windows: 480 ->
    512 -> L=128; 640 -> 1024 -> L=256) — a whole number of lane-major
    [R, 128] sample rows (n % 128 == 0), and a window short enough that
    _strided_rows_128's one-superblock lookahead only ever clamps reads
    inside the Hann window's zero tail: window <= lcm(hop, 128) + hop
    (positions further than one superblock past a row's start block are
    substituted with garbage that MUST be erased by the window
    multiply; 480 <= 640+160 and 640 <= 1280+320 hold, a 60 ms/10 ms
    window would not — measured 0.147 feature deviation if allowed)."""
    n = num_samples or cfg.desired_samples
    window = cfg.window_size_samples
    hop = cfg.window_stride_samples
    fft_length = dsp.fft_length_for(window)
    lcm = (hop * _LANES) // math.gcd(hop, _LANES)
    return (
        fft_length % 4 == 0
        and (fft_length // 4) % _LANES == 0
        and n % _LANES == 0
        and window <= lcm + hop
    )


@functools.lru_cache(maxsize=None)
def phase_dft_plan(window: int, hop: int, n: int, fft_length: int):
    """Static plan for the phase-decomposed windowed DFT over the
    lane-major [R = n/128, 128] sample layout.

    Frames are grouped by phase p = f mod P where P = lcm(hop, 128)/hop:
    within a phase, every frame starts at the same offset o_p inside a
    128-sample lane row, so its window covers rows_p consecutive full
    lane rows, and the DFT becomes ONE canonical matmul per phase,

        reim_p[q] = concat_j(x[S*q + c_p + j]) @ W_p,   W_p[o_p:o_p+window] = dft

    with q the superblock index (S = lcm/128 rows per superblock). No
    per-frame slice assembly, no K-dim padding waste (K = rows_p*128
    exactly), no shifted-add epilogue — the frame interleave happens on
    matmul OUTPUTS (canonical layouts) as a middle-axis stack + leading
    merge, which Mosaic supports.

    Returns (P, S, nsb, frames, phases) with phases a tuple of
    (c_p, rows_p, frames_p, W_p[rows_p*128, 2K] np.float32).
    """
    lanes = _LANES
    # explicit raises, not asserts: phase_dft_available gates geometry
    # support by catching this, and python -O strips assert statements
    if n % lanes:
        raise ValueError(f"clip length {n} not lane-aligned")
    lcm = hop * lanes // math.gcd(hop, lanes)
    if n % lcm:
        raise ValueError(f"clip length {n} not divisible by lcm {lcm}")
    num_p = lcm // hop
    s_rows = lcm // lanes
    nsb = n // lcm
    frames = 1 + (n - window) // hop
    num_bins = fft_length // 2 + 1
    dft = dsp.windowed_rdft_matrix(window, fft_length)  # [window, 2K]
    phases = []
    for p in range(num_p):
        start = hop * p
        c, o = divmod(start, lanes)
        rows_p = -(-(o + window) // lanes)
        frames_p = max(0, -(-(frames - p) // num_p))
        # sample at stacked-lhs position j*128 + l is window index
        # w = j*128 + l - o, so W rows [o, o+window) carry the DFT matrix
        w = np.zeros((rows_p * lanes, 2 * num_bins), np.float32)
        w[o : o + window] = dft
        # last frame of the phase must not read past the signal
        if s_rows * (frames_p - 1) + c + rows_p > s_rows * nsb:
            raise ValueError(
                f"phase {p} would read past the signal "
                f"(window {window}, hop {hop}, n {n})"
            )
        phases.append((c, rows_p, frames_p, w))
    return num_p, s_rows, nsb, frames, tuple(phases)


def phase_dft_available(cfg: AudioConfig, num_samples: Optional[int] = None) -> bool:
    """Whether the phase-decomposed DFT applies (lane-aligned clips).

    phase_dft_plan's own raises are the single source of geometry truth
    (lane alignment, lcm divisibility, signal-bounds) — re-stating its
    rules here would be double maintenance."""
    n = num_samples or cfg.desired_samples
    window, hop = cfg.window_size_samples, cfg.window_stride_samples
    if (
        cfg.preprocess_method not in ("mfcc", "log_mel_spectrogram")
        or n < window
    ):
        return False
    try:
        phase_dft_plan(window, hop, n, dsp.fft_length_for(window))
    except ValueError:
        return False
    return True


def mfcc_tail_phases(
    x3, dft_ws, mel_w, dct_w, *, plan, tb, num_bins, matmul_dtype=jnp.float32,
    magnitude=False,
):
    """[tb, R, 128] lane-major samples -> [tb, frames, n_mfccs] MFCCs.

    The "phases" variant of the MFCC tail (see phase_dft_plan). `dft_ws`
    is one [rows_p*128, 2K] matrix per phase. Pure jnp on values."""
    num_p, s_rows, nsb, frames, phases = plan
    two_k = 2 * num_bins
    x4 = x3.reshape(tb, nsb, s_rows, _LANES)
    outs = []
    for p, (c, rows_p, frames_p, _) in enumerate(phases):
        if frames_p == 0:
            outs.append(jnp.zeros((tb, nsb, two_k), jnp.float32))
            continue
        parts = []
        for j in range(rows_p):
            bs, ri = divmod(c + j, s_rows)
            part = x4[:, bs : bs + frames_p, ri, :]  # [tb, frames_p, 128]
            parts.append(part.reshape(tb * frames_p, _LANES))
        lhs = jnp.concatenate(parts, axis=-1).astype(matmul_dtype)
        reim_p = jnp.dot(lhs, dft_ws[p], preferred_element_type=jnp.float32)
        reim_p = reim_p.reshape(tb, frames_p, two_k)
        if frames_p < nsb:
            reim_p = jnp.pad(reim_p, ((0, 0), (0, nsb - frames_p), (0, 0)))
        outs.append(reim_p)
    # interleave phases: [tb, nsb, P, 2K] -> [tb, nsb*P, 2K] (middle-axis
    # stack + leading merge; minor dim untouched)
    reim = jnp.stack(outs, axis=2).reshape(tb, nsb * num_p, two_k)
    reim = reim[:, :frames]
    return mfcc_from_reim(reim, mel_w, dct_w, tb=tb, frames=frames,
                          num_bins=num_bins, magnitude=magnitude)


def _kernel(audio_ref, dft_ref, mel_ref, dct_ref, out_ref, *, n_hops, hop, k, num_bins, frames, matmul_dtype, magnitude):
    # audio_ref: [TB, n_hops, hop] (hop reshape done outside the kernel —
    # Mosaic only supports leading-dim reshapes, minor dim must not change)
    tb = audio_ref.shape[0]
    out_ref[:] = mfcc_tail(
        audio_ref[:].reshape(tb * n_hops, hop),
        dft_ref[:], mel_ref[:], dct_ref[:],
        tb=tb, n_hops=n_hops, k=k, num_bins=num_bins,
        frames=frames, matmul_dtype=matmul_dtype, magnitude=magnitude,
    )


def _kernel_radix4(
    audio_ref, m0_ref, m1_ref, m2_ref, *refs,
    hop, fft_length, frames, matmul_dtype, magnitude,
):
    # audio_ref: [TB, R, 128] lane-major (reshape done outside, like
    # the phases variant); refs = fft/128 window chunks + mel + dct + out
    win_refs = refs[: fft_length // _LANES]
    mel_ref, dct_ref, out_ref = refs[fft_length // _LANES :]
    out_ref[:] = mfcc_tail_radix4(
        audio_ref[:], m0_ref[:], m1_ref[:], m2_ref[:],
        [w[:] for w in win_refs], mel_ref[:], dct_ref[:],
        tb=audio_ref.shape[0], hop=hop, fft_length=fft_length,
        frames=frames, matmul_dtype=matmul_dtype, magnitude=magnitude,
    )


def _kernel_phases(audio_ref, *refs, plan, num_bins, matmul_dtype, magnitude):
    # audio_ref: [TB, R, 128] lane-major samples (reshape done outside)
    num_p = plan[0]
    dft_refs = refs[:num_p]
    mel_ref, dct_ref, out_ref = refs[num_p : num_p + 3]
    tb = audio_ref.shape[0]
    out_ref[:] = mfcc_tail_phases(
        audio_ref[:], [r[:] for r in dft_refs], mel_ref[:], dct_ref[:],
        plan=plan, tb=tb, num_bins=num_bins, matmul_dtype=matmul_dtype,
        magnitude=magnitude,
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _fused_mfcc_impl(audio, cfg: AudioConfig, interpret: bool, tb: int = 8,
                     variant: str = "hops"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tcresnet_tpu.ops.dsp import feature_width

    batch, n = audio.shape
    # shared geometry/constants construction (mfcc_plan): the fused
    # frontend consumes the same helper, so the two paths cannot drift
    (window, hop, fft_length, num_bins, k, n_hops, frames), dft_ws, mel, \
        dct, matmul_dtype, plan = mfcc_plan(cfg, n, variant)
    two_k = 2 * num_bins
    out_w = feature_width(cfg)
    magnitude = cfg.preprocess_method == "log_mel_spectrogram"
    pad = (-batch) % tb
    if pad:
        audio = jnp.pad(audio, ((0, pad), (0, 0)))
    padded = audio.shape[0]

    tail_flops = (frames * num_bins * cfg.num_mel_bins
                  + frames * cfg.num_mel_bins * out_w)

    def cost_for(dft_flops_per_row):
        return pl.CostEstimate(
            flops=2 * padded * (dft_flops_per_row + tail_flops),
            bytes_accessed=padded * (n + frames * out_w) * 4,
            transcendentals=padded * frames * cfg.num_mel_bins,
        )

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (tb, frames, out_w), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((padded, frames, out_w), jnp.float32)

    if variant == "radix4":
        audio = audio.astype(jnp.float32).reshape(padded, n // _LANES, _LANES)
        kernel = functools.partial(
            _kernel_radix4, hop=hop,
            fft_length=fft_length, frames=frames,
            matmul_dtype=matmul_dtype, magnitude=magnitude,
        )
        length = fft_length // 4
        radix4_flops = frames * (
            length * 2 * length + 2 * length * 2 * length
            + length * 2 * length
        )
        out = pl.pallas_call(
            kernel,
            grid=(padded // tb,),
            in_specs=[
                pl.BlockSpec((tb, n // _LANES, _LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            + [const_spec(w.shape) for w in dft_ws]
            + [const_spec(mel.shape), const_spec(dct.shape)],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=cost_for(radix4_flops),
            compiler_params=vmem_params(
                tb * n,                              # input block
                tb * frames * (3 * fft_length + 2 * two_k),  # butterflies
                tb * frames * (cfg.num_mel_bins + out_w),
                sum(w.size for w in dft_ws),         # M0/M1/M2 + window
            ),
        )(audio, *dft_ws, jnp.asarray(mel), jnp.asarray(dct))
    elif variant == "phases":
        audio = audio.astype(jnp.float32).reshape(padded, n // _LANES, _LANES)
        kernel = functools.partial(
            _kernel_phases, plan=plan, num_bins=num_bins,
            matmul_dtype=matmul_dtype, magnitude=magnitude,
        )
        # per-phase canonical matmuls: [frames_p, rows_p*128] @ [., 2K]
        phases_flops = sum(
            f_p * r_p * _LANES * two_k for _, r_p, f_p, _ in plan[4]
        )
        out = pl.pallas_call(
            kernel,
            grid=(padded // tb,),
            in_specs=[
                pl.BlockSpec((tb, n // _LANES, _LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            + [const_spec(w.shape) for w in dft_ws]
            + [const_spec(mel.shape), const_spec(dct.shape)],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=cost_for(phases_flops),
            compiler_params=vmem_params(
                tb * n,                               # input block
                tb * frames * 2 * two_k,              # per-phase + gathered
                tb * frames * (cfg.num_mel_bins + out_w),
                sum(w.size for w in dft_ws),          # per-phase DFT consts
            ),
        )(audio, *dft_ws, jnp.asarray(mel), jnp.asarray(dct))
    else:
        audio = audio.astype(jnp.float32).reshape(padded, n_hops, hop)
        kernel = functools.partial(
            _kernel, n_hops=n_hops, hop=hop, k=k, num_bins=num_bins,
            frames=frames, matmul_dtype=matmul_dtype, magnitude=magnitude,
        )
        out = pl.pallas_call(
            kernel,
            grid=(padded // tb,),
            in_specs=[
                pl.BlockSpec((tb, n_hops, hop), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                const_spec((hop, k * two_k)),
                const_spec(mel.shape),
                const_spec(dct.shape),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=cost_for(n_hops * hop * k * two_k),
            compiler_params=vmem_params(
                tb * n_hops * (hop + k * two_k),   # input + hop-matmul out
                tb * frames * (2 * two_k + cfg.num_mel_bins + out_w),
                hop * k * two_k + num_bins * cfg.num_mel_bins,  # constants
            ),
        )(audio, dft_ws[0], jnp.asarray(mel), jnp.asarray(dct))
    if pad:
        out = out[:batch]
    return out


def mfcc_plan(cfg: AudioConfig, n: int, variant: str):
    """Shared MFCC geometry + kernel constants for a clip length `n`.

    Returns ((window, hop, fft_length, num_bins, k, n_hops, frames),
    dft_ws [list of device arrays in matmul_dtype], mel, dct,
    matmul_dtype, phase_plan|None). The ONE construction consumed by
    both the fused-MFCC kernel (_fused_mfcc_impl) and the single-kernel
    frontend (frontend._impl) — the two paths must never drift.

    For log-mel configs `dct` is the [M, M] identity (the tail keeps one
    matmul/ref layout for every kernel; the magnitude-vs-power switch is
    the static `magnitude` kwarg of the tail fns)."""
    window = cfg.window_size_samples
    hop = cfg.window_stride_samples
    fft_length = dsp.fft_length_for(window)
    num_bins = fft_length // 2 + 1
    k = window // hop
    n_hops = n // hop
    frames = n_hops - k + 1
    mel = dsp.linear_to_mel_weight_matrix(
        cfg.num_mel_bins, num_bins, cfg.sample_rate,
        cfg.lower_edge_hertz, cfg.upper_edge_hertz,
    )
    if cfg.preprocess_method == "log_mel_spectrogram":
        dct = np.eye(cfg.num_mel_bins, dtype=np.float32)
    else:
        dct = dsp.dct_ii_matrix(cfg.num_mel_bins, cfg.num_mfccs)
    matmul_dtype = dsp.dsp_matmul_dtype(cfg)
    if variant == "phases":
        phase_plan = phase_dft_plan(window, hop, n, fft_length)
        dft_ws = [
            jnp.asarray(w).astype(matmul_dtype) for *_, w in phase_plan[4]
        ]
    elif variant == "radix4":
        # factored-DFT constants: stage-2 matrices + the explicit window
        # (f32, CHUNKED into [1, 128] refs — see mfcc_tail_radix4; the
        # window multiply precedes the matmul cast), and the
        # branch-PERMUTED mel matrix replacing the dense-layout one
        phase_plan = None
        mel = dsp.radix4_mel_matrix(
            cfg.num_mel_bins, fft_length, cfg.sample_rate,
            cfg.lower_edge_hertz, cfg.upper_edge_hertz,
        )
        wwin = dsp.radix4_window(window, fft_length)
        dft_ws = [
            jnp.asarray(m).astype(matmul_dtype)
            for m in dsp.radix4_dft_matrices(fft_length)
        ] + [
            jnp.asarray(wwin[c : c + _LANES])[None, :]
            for c in range(0, fft_length, _LANES)
        ]
    else:
        phase_plan = None
        dft_ws = [
            jnp.asarray(
                dsp.dft_hop_blocks(window, hop, fft_length)
            ).astype(matmul_dtype)
        ]
    geom = (window, hop, fft_length, num_bins, k, n_hops, frames)
    return geom, dft_ws, mel, dct, matmul_dtype, phase_plan


def resolve_dft_variant(cfg: AudioConfig, num_samples: int) -> str:
    """Resolve cfg.dft_variant ("auto" -> measured winner) with a
    geometry-availability fallback to "hops"."""
    variant = getattr(cfg, "dft_variant", "auto")
    if variant not in ("auto", "hops", "phases", "radix4"):
        # an unknown string would otherwise silently select the hops
        # path — the user benchmarks/trains the wrong kernel with no
        # error (same policy as augment's method validation)
        raise ValueError(
            f"dft_variant must be 'auto', 'hops', 'phases', or "
            f"'radix4'; got {variant!r}"
        )
    if variant == "auto":
        # measured on v5e (tools/profile_r4.py E, batch 1536/4096): hops
        # wins — 1.16/1.19 us/utt vs phases 1.56 (r3) and radix4 1.71/1.76
        # (r4). The kernel is data-movement-bound, not DFT-MXU-bound:
        # radix4 cuts DFT MACs 2.5x yet loses 1.5x because its
        # strided-row frame assembly (_strided_rows_128) spends more VPU
        # time than the dense hop-matmul spends MXU time; see
        # docs/BENCH_RESULTS.md "DFT variants".
        variant = "hops"
    if variant == "radix4" and not radix4_kernel_available(cfg, num_samples):
        variant = "hops"
    if variant == "phases" and not phase_dft_available(cfg, num_samples):
        variant = "hops"
    return variant


def fused_mfcc(
    audio: jnp.ndarray,
    cfg: AudioConfig,
    interpret: bool = False,
    tb: int = 8,
    mesh=None,
    variant: Optional[str] = None,
) -> jnp.ndarray:
    """[B, N] wavs -> [B, F, num_mfccs] MFCCs via the fused kernel.

    Falls back to the XLA path when geometry is unsupported. `tb` is the
    batch tile per grid step (VMEM use and DFT-matmul M dim scale with it).
    With a multi-device `mesh`, the kernel runs per-shard under shard_map
    (a custom call cannot be partitioned by plain jit) with the batch
    sharded over the `data` axis. `variant` overrides cfg.dft_variant
    ("hops" | "phases" | "radix4" | "auto" — see phase_dft_plan and
    mfcc_tail_radix4).
    """
    if not fused_mfcc_available(cfg, audio.shape[-1]):
        # fall back to the matching XLA feature — NOT unconditionally
        # MFCC: a log-mel config with unsupported geometry must still
        # get log-mel (magnitude spectrum, no DCT, width num_mel_bins)
        if cfg.preprocess_method == "log_mel_spectrogram":
            return dsp.log_mel_spectrogram(audio, cfg, magnitude_squared=False)
        return dsp.mfcc(audio, cfg)
    if variant is not None and variant not in (
        "auto", "hops", "phases", "radix4"
    ):
        raise ValueError(
            f"variant must be 'auto', 'hops', 'phases', or 'radix4'; "
            f"got {variant!r}"
        )
    if variant is None or variant == "auto":
        variant = resolve_dft_variant(cfg, audio.shape[-1])
    elif variant == "phases" and not phase_dft_available(cfg, audio.shape[-1]):
        variant = "hops"
    elif variant == "radix4" and not radix4_kernel_available(cfg, audio.shape[-1]):
        variant = "hops"
    from jax.sharding import PartitionSpec as P

    from tcresnet_tpu.parallel.mesh import maybe_shard_map

    sharded = maybe_shard_map(
        lambda a: _fused_mfcc_impl(a, cfg, interpret, tb, variant),
        mesh, in_specs=(P("data"),), batch=audio.shape[0], tile=tb,
    )
    if sharded is not None:
        return sharded(audio)
    return _fused_mfcc_impl(audio, cfg, interpret, tb, variant)
