"""Fully fused input front end: gather + decode + augment + MFCC, ONE kernel.

Reference parity: this kernel fuses the behaviors of the reference's
per-element tf.data augmentation pipeline
(/root/reference/datasets/augmentation_factory.py:30-158 — decode_wav,
anchored_slice_or_pad[_with_shift], background mix, clip) and the
training-path MFCC front end
(/root/reference/datasets/preprocessors.py:64-124 — stft, power, mel,
log, DCT) into one TPU kernel; the individual semantics live in
ops/augment.py and ops/dsp.py and are reproduced exactly (same draws,
same constant matrices).

The end state of the input-pipeline fusion line (SURVEY.md 2.9.2/2.9.3):
per training batch row, this kernel

    DMAs the int16 dataset row by prefetched batch index  (v5 augment)
    decodes to float, time-shifts, mixes background noise, clips
    re-frames the result into DFT hops IN REGISTERS
    windowed real-DFT -> power -> mel -> log -> DCT      (fused MFCC)

and writes ONLY the [TB, frames, n_mfccs] features to HBM. Per row of a
16 kHz/1 s batch that is a 32 KB int16 read + ~68 KB noise-crop read +
15.7 KB feature write — the augmented waveform never exists in HBM. The
two-kernel path (ops/pallas/augment.py -> ops/pallas/mfcc.py) pays two
extra relayout round trips between them ([B,128,128] <-> [B,16000] <->
[B,100,160], ~1 GB of HBM traffic at batch 4096).

The blocker this solves: Mosaic reshapes cannot change the minor (lane)
dimension, so a flat [16000] row laid out as [125, 128] cannot be
reshaped to [100, 160] hops in-kernel. But over the LCM(hop=160,
lanes=128) = 640-sample superblock the re-framing IS expressible as
static lane slices + minor-dim concatenations (4 hop rows from 5 lane
rows), which Mosaic supports — see _hops_from_lanes.

Numerics: same draws and same math as fused_gather_augment -> fused_mfcc
with the same key; agreement is ULP-level (|diff| <= ~4e-6 — the augment
chain fuses into the DFT matmul here, so FMA contraction may round
differently than the standalone augment kernel), tested in
tests/test_pallas_frontend.py. The two-kernel constituents are
themselves bit-exact vs the XLA paths.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from tcresnet_tpu.config import AudioConfig, AugmentConfig
from tcresnet_tpu.ops import dsp
from tcresnet_tpu.ops.pallas.augment import (
    _LANES,
    _TB,
    _draw_scalars,
    _next_pow2,
    _noise_bank_2d,
    augment_block_rows,
    crop_scalar_prep,
    gather_fusable,
    gather_wav_spec,
    pad_batch_scalars,
)
from tcresnet_tpu.ops.pallas.mfcc import (
    fused_mfcc_available,
    mfcc_plan,
    mfcc_tail,
    mfcc_tail_phases,
    mfcc_tail_radix4,
    resolve_dft_variant,
    vmem_params,
)


def _hops_from_lanes(x2, hop: int):
    """[R, 128] lane-major samples -> [R*128/hop, hop] DFT hops.

    Static re-framing via lane slices + minor concat over the
    LCM(hop, 128) superblock; every slice width is a multiple of
    gcd(hop, 128). No minor-dim reshape involved.
    """
    rows, lanes = x2.shape
    assert lanes == _LANES
    total = rows * lanes
    assert total % hop == 0
    per = (hop * lanes) // math.gcd(hop, lanes)  # lcm
    in_rows_per = per // lanes
    out_rows_per = per // hop
    assert rows % in_rows_per == 0
    nb = rows // in_rows_per
    blocks = x2.reshape(nb, in_rows_per, lanes)

    out_rows = []
    for r in range(out_rows_per):
        segs = []
        pos = r * hop
        while pos < (r + 1) * hop:
            ir, lane = pos // lanes, pos % lanes
            width = min(lanes - lane, (r + 1) * hop - pos)
            seg = blocks[:, ir : ir + 1, lane : lane + width]  # [nb, 1, w]
            segs.append(seg.reshape(nb, width))
            pos += width
        out_rows.append(jnp.concatenate(segs, axis=-1).reshape(nb, 1, hop))
    return jnp.concatenate(out_rows, axis=1).reshape(nb * out_rows_per, hop)


def _kernel(
    *refs,
    p: int,
    n: int,
    win_rows: int,
    crop_rolls: bool,
    scale: float,
    n_hops: int,
    hop: int,
    k: int,
    num_bins: int,
    frames: int,
    matmul_dtype,
    magnitude: bool = False,
    phase_plan=None,
    variant: str = "hops",
    fft_length: int = 0,
    tb: int = _TB,
):
    """Ref layout: 6 scalar-prefetch ([B] shift/srow/rem/vol/keep/idx),
    tb index-mapped wav blocks [1, A, 128] int16, noise bank (ANY),
    DFT matrices (1 for the hops variant, P for phases, 4 for radix4:
    M0/M1/M2 + window), mel [K, M], dct [M, C], out [tb, frames, C],
    tb crop scratches + DMA sem [tb]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if variant == "phases":
        num_dft = phase_plan[0]
    elif variant == "radix4":
        num_dft = 3 + fft_length // _LANES  # M0/M1/M2 + window chunks
    else:
        num_dft = 1
    shift_ref, srow_ref, rem_ref, vol_ref, keep_ref, _idx_ref = refs[:6]
    wav_refs = refs[6 : 6 + tb]
    noise_ref = refs[6 + tb]
    dft_refs = refs[7 + tb : 7 + tb + num_dft]
    mel_ref = refs[7 + tb + num_dft]
    dct_ref = refs[8 + tb + num_dft]
    out_ref = refs[9 + tb + num_dft]
    scratches = refs[10 + tb + num_dft : 10 + 2 * tb + num_dft]
    sem = refs[10 + 2 * tb + num_dft]

    i = pl.program_id(0)

    # --- augment phase: the shared DMA/shift/mix orchestration from
    # ops/pallas/augment (results stay in registers/VMEM values) ---
    rows = augment_block_rows(
        i, lambda r: wav_refs[r][:].astype(jnp.float32) * scale,
        shift_ref, srow_ref, rem_ref, vol_ref, keep_ref,
        noise_ref, scratches, sem, p, win_rows, crop_rolls, pl, pltpu,
        tb=tb,
    )
    n_rows = n // _LANES  # rows holding real samples (n % 128 == 0)
    aug_rows = [a[:, :n_rows, :] for a in rows]  # [1, n_rows, 128] each

    if phase_plan is not None:
        # --- phase-decomposed DFT tail: consumes the lane-major layout
        # directly, no per-frame hop assembly (ops/pallas/mfcc) ---
        x3 = jnp.concatenate(aug_rows, axis=0)  # [tb, n_rows, 128]
        out_ref[:] = mfcc_tail_phases(
            x3, [d[:] for d in dft_refs], mel_ref[:], dct_ref[:],
            plan=phase_plan, tb=tb, num_bins=num_bins,
            matmul_dtype=matmul_dtype, magnitude=magnitude,
        )
        return

    if variant == "radix4":
        # --- factored-DFT tail (ops/pallas/mfcc.mfcc_tail_radix4):
        # consumes the lane-major layout directly, like phases ---
        x3 = jnp.concatenate(aug_rows, axis=0)  # [tb, n_rows, 128]
        out_ref[:] = mfcc_tail_radix4(
            x3, dft_refs[0][:], dft_refs[1][:], dft_refs[2][:],
            [w[:] for w in dft_refs[3:]], mel_ref[:], dct_ref[:],
            tb=tb, hop=hop, fft_length=fft_length,
            frames=frames, matmul_dtype=matmul_dtype, magnitude=magnitude,
        )
        return

    hops_rows = [
        _hops_from_lanes(a.reshape(n_rows, _LANES), hop) for a in aug_rows
    ]
    hops = jnp.concatenate(hops_rows, axis=0)  # [tb*n_hops, hop]

    # --- shared MFCC/log-mel matmul tail (ops/pallas/mfcc.mfcc_tail) ---
    out_ref[:] = mfcc_tail(
        hops, dft_refs[0][:], mel_ref[:], dct_ref[:],
        tb=tb, n_hops=n_hops, k=k, num_bins=num_bins,
        frames=frames, matmul_dtype=matmul_dtype, magnitude=magnitude,
    )


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def _impl(wavs3d, idx, scalars, noise_bank, n, cfg, interpret, quantize_crops,
          variant="hops", tb=_TB):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shifts, clips, offs, vols, keeps = scalars
    _, a_rows, lanes = wavs3d.shape
    p = a_rows * _LANES
    batch = idx.shape[0]

    idx, (shifts, clips, offs, vols, keeps) = pad_batch_scalars(
        idx, (shifts, clips, offs, vols, keeps), tb
    )
    padded_b = idx.shape[0]

    noise2d, stride, win_rows = _noise_bank_2d(noise_bank, n)
    scratch_rows = _next_pow2(max(win_rows, a_rows))
    rems, start_rows = crop_scalar_prep(offs, clips, stride, quantize_crops)

    # MFCC/log-mel geometry + constants: the SHARED construction with the
    # fused MFCC kernel (mfcc.mfcc_plan) — the one-kernel and two-kernel
    # paths must never drift
    from tcresnet_tpu.ops.dsp import feature_width

    (window, hop, fft_length, num_bins, k, n_hops, frames), dft_ws, mel, \
        dct, matmul_dtype, phase_plan = mfcc_plan(cfg, n, variant)
    two_k = 2 * num_bins
    out_w = feature_width(cfg)
    magnitude = cfg.preprocess_method == "log_mel_spectrogram"

    def const_spec(shape):
        return pl.BlockSpec(
            shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(padded_b // tb,),
        in_specs=[gather_wav_spec(r, a_rows, pl, pltpu, tb) for r in range(tb)]
        + [pl.BlockSpec(memory_space=pl.ANY)]
        + [const_spec(w.shape) for w in dft_ws]
        + [
            const_spec(mel.shape),
            const_spec(dct.shape),
        ],
        out_specs=pl.BlockSpec(
            (tb, frames, out_w), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((scratch_rows, _LANES), jnp.float32) for _ in range(tb)
        ]
        + [pltpu.SemaphoreType.DMA((tb,))],
    )
    # cost estimate for XLA's latency-hiding scheduler (the sibling MFCC
    # kernel ships one; this kernel subsumes it plus the augment work):
    # DFT + mel + DCT MXU flops, augment roll/mix VPU work, and the
    # int16 row reads + noise-crop DMAs + feature writes
    if phase_plan is not None:
        dft_flops = sum(
            f_p * r_p * _LANES * two_k for _, r_p, f_p, _ in phase_plan[4]
        )
    elif variant == "radix4":
        length = fft_length // 4
        dft_flops = frames * 8 * length * length
    else:
        dft_flops = n_hops * hop * k * two_k
    tail_flops = (frames * num_bins * cfg.num_mel_bins
                  + frames * cfg.num_mel_bins * out_w)
    cost = pl.CostEstimate(
        flops=2 * padded_b * (dft_flops + tail_flops) + 8 * padded_b * p,
        bytes_accessed=padded_b * (
            p * 2 + win_rows * _LANES * 4 + frames * out_w * 4
        ),
        transcendentals=padded_b * frames * cfg.num_mel_bins,
    )
    # per-grid-step live buffers (f32 elems): tb wav blocks (int16 counts
    # as half an element) + augmented rows + crop scratches + the DFT
    # intermediates (variant-specific, mirroring _fused_mfcc_impl's own
    # estimates) + frame assembly + mel/dct stages + constants
    if phase_plan is not None:
        dft_mid = tb * frames * 2 * two_k          # per-phase + gathered
    elif variant == "radix4":
        # 4 strided-row butterfly blocks + stage-2 matmul outs
        dft_mid = tb * frames * (3 * fft_length + 2 * two_k)
    else:
        dft_mid = tb * n_hops * (hop + k * two_k)  # hops + DFT partials
    compiler_params = vmem_params(
        tb * a_rows * _LANES // 2,                 # int16 wav blocks
        tb * a_rows * _LANES,                      # augmented f32 rows
        tb * scratch_rows * _LANES,                # crop scratches
        dft_mid,
        tb * frames * (2 * two_k + cfg.num_mel_bins + out_w),
        sum(w.size for w in dft_ws) + num_bins * cfg.num_mel_bins,
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            p=p,
            n=n,
            win_rows=win_rows,
            crop_rolls=not quantize_crops,
            scale=1.0 / 32768.0,
            n_hops=n_hops,
            hop=hop,
            k=k,
            num_bins=num_bins,
            frames=frames,
            matmul_dtype=matmul_dtype,
            magnitude=magnitude,
            phase_plan=phase_plan,
            variant=variant,
            fft_length=fft_length,
            tb=tb,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (padded_b, frames, out_w), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=compiler_params,
    )(
        shifts.astype(jnp.int32),
        start_rows,
        rems,
        vols.astype(jnp.float32),
        keeps.astype(jnp.float32),
        idx.astype(jnp.int32),
        *([wavs3d] * tb),
        noise2d,
        *dft_ws,
        jnp.asarray(mel),
        jnp.asarray(dct),
    )
    return out[:batch]


def frontend_fusable(
    wavs3d,
    aug_cfg: AugmentConfig,
    audio_cfg: AudioConfig,
    noise_bank,
    n: int,
) -> bool:
    """Whether the single-kernel gather+augment+features path applies
    (MFCC or log-mel — fused_mfcc_available covers both tails)."""
    return (
        gather_fusable(wavs3d, aug_cfg, noise_bank, n)
        and fused_mfcc_available(audio_cfg, n)
        and n % _LANES == 0
    )


def fused_gather_augment_mfcc(
    wavs3d: jnp.ndarray,
    idx: jnp.ndarray,
    is_silent: jnp.ndarray,
    key: jax.Array,
    aug_cfg: AugmentConfig,
    audio_cfg: AudioConfig,
    noise_bank: jnp.ndarray,
    is_training: bool,
    n: int,
    interpret: bool = False,
    mesh=None,
    tb: int = _TB,
) -> jnp.ndarray:
    """[N,P/128,128] int16 dataset + idx[B] -> [B, frames, n_mfccs] f32.

    Callers must check frontend_fusable() first. With a multi-device
    mesh, runs per-shard under shard_map (randomness drawn here on the
    global batch, so shards never correlate). `tb` is the kernel batch
    tile (rows per grid step; larger tiles grow the DFT matmul's M dim
    and the per-step VMEM footprint)."""
    if not frontend_fusable(wavs3d, aug_cfg, audio_cfg, noise_bank, n):
        # raise, not assert (python -O strips asserts)
        raise ValueError(
            "fused_gather_augment_mfcc requires frontend_fusable(); "
            "callers must check it and fall back"
        )
    scalars = _draw_scalars(key, is_silent, aug_cfg, noise_bank, n, is_training)
    quantize = bool(getattr(aug_cfg, "noise_crop_quantize", False))
    variant = resolve_dft_variant(audio_cfg, n)
    from jax.sharding import PartitionSpec as P

    from tcresnet_tpu.parallel.mesh import maybe_shard_map

    sharded = maybe_shard_map(
        lambda w, i, s, nb: _impl(
            w, i, s, nb, n, audio_cfg, interpret, quantize, variant, tb
        ),
        mesh,
        in_specs=(P(), P("data"), (P("data"),) * 5, P()),
        batch=idx.shape[0],
        tile=tb,
    )
    if sharded is not None:
        return sharded(wavs3d, idx, scalars, noise_bank)
    return _impl(
        wavs3d, idx, scalars, noise_bank, n, audio_cfg, interpret, quantize,
        variant, tb,
    )
