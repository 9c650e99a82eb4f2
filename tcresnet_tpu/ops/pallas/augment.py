"""Fused Pallas augmentation kernel: shift + background mix + clip.

Why: profiled on v5e, the augmentation dominated the train step (~18.6 ms
of a 22 ms batch-2048 step, 85%) because XLA lowers per-row shifts/crops
to slow forms (vmapped roll ~8 ms; lane gathers ~700 ms). The reference
semantics (augmentation_factory.py: pad+slice shift, random noise crop,
volume gate, clip) are per-row *contiguous window reads at dynamic
offsets* — on TPU these map to vector rotates and dynamic-offset DMA,
no gathers at all.

Kernel evolution (all variants bit-exact vs the XLA path given the same
per-row draws; numbers per 2048x16000 batch):
  v2  per-row 1D rolls on [1, 16384] vectors + remainder-rolled DMA crops
      (~5 ms — single-sublane VPU ops)
  v3  batched [TB, n] epilogue + optional tile-quantized crop offsets
      (2.2-3.6 ms)
  v4  (this) all rotates decomposed over a [A, 128] 2D view: a flat roll
      by s = q*128 + r becomes sublane-roll(q) / sublane-roll(q+1), a
      lane-roll(r) of each, and a lane-index select — every op uses the
      full 8x128 VPU instead of one sublane.

Hardware constraints honored (discovered empirically on v5e):
  - dynamic-shift pltpu.roll is only correct for power-of-two axis sizes
    -> rows are zero-padded to the next pow2 and viewed as
    [P/128, 128] (both dims pow2);
  - Mosaic in-kernel reshapes cannot change the minor dim -> all
    [B, P] <-> [B, P/128, 128] reshapes happen OUTSIDE in XLA (free);
  - 2D HBM DMA slices need 8-row (1024-sample) aligned offsets/sizes ->
    the noise bank is a [rows, 128] matrix and crop windows are DMA'd at
    8-row granularity, with the sub-tile remainder handled by the same
    2D roll decomposition — the sample-exact default (and fastest,
    kernel v4; docs/BENCH_RESULTS.md). AugmentConfig.noise_crop_quantize
    (default False) skips the remainder roll for 1024-sample-quantized
    crop offsets.

All randomness (shift, clip index, offset, volume, gate, silence) is
drawn OUTSIDE with jax.random on [B] arrays and enters through scalar
prefetch, so the augmentation distribution is identical to
ops/augment.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tcresnet_tpu.config import AugmentConfig

_TB = 8  # rows per grid step (sublane-aligned)
_LANES = 128
_ALIGN = 8 * _LANES  # DMA tiling granularity in samples


from tcresnet_tpu.utils import next_pow2 as _next_pow2  # shared pow2 law


def _roll_flat_2d(x, s, pltpu):
    """Roll the row-major flattening of x[1, A, 128] right by s (traced).

    Requires A and 128 to be powers of two (pltpu.roll correctness).
    out[., a, b] = x_flat[(a*128 + b - s) mod A*128] decomposed as two
    sublane rolls, two lane rolls, and a lane-index select. Rank-3
    throughout (Mosaic rejects rank-changing slices/casts in VMEM).
    """
    a_rows = x.shape[1]
    q = jax.lax.div(s, _LANES) % a_rows
    q1 = jax.lax.rem(q + 1, a_rows)
    r = jax.lax.rem(s, _LANES)
    y = pltpu.roll(x, shift=q, axis=1)
    z = pltpu.roll(x, shift=q1, axis=1)
    ly = pltpu.roll(y, shift=r, axis=2)
    lz = pltpu.roll(z, shift=r, axis=2)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    return jnp.where(b_idx >= r, ly, lz)


def sample_positions(a_rows: int):
    """Flat sample position of each [1, A, 128] element."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (1, a_rows, _LANES), 1) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (1, a_rows, _LANES), 2)
    )


def shift_row(wav3, s_signed, keep, pos, p: int, pltpu):
    """Shift one [1, A, 128] row: rotate by the signed sample shift, mask
    the wrapped/shifted-out region, zero silence rows (keep=0). Pure jnp
    on values — the SINGLE implementation of the augment shift phase,
    shared by every kernel that fuses it (this module's v4/v5 kernels and
    ops/pallas/frontend.py)."""
    s = jax.lax.rem(s_signed + p, p)  # [0, p)
    rolled = _roll_flat_2d(wav3, s, pltpu)
    valid = (pos >= s_signed) & (pos < p + s_signed)
    return rolled * valid.astype(jnp.float32) * keep


def mix_crop_row(shifted3, scratch, rem, vol, a_rows: int, crop_rolls: bool, pltpu):
    """Mix the DMA'd noise crop into one shifted [1, A, 128] row at
    volume `vol` (remainder-rolling the 8-row-aligned window in exact
    mode) and clip to [-1, 1]. The single implementation of the augment
    mix phase (see shift_row)."""
    sc3 = scratch[:, :].reshape(1, *scratch.shape)
    if crop_rolls:
        total = scratch.shape[0] * _LANES
        sc3 = _roll_flat_2d(sc3, jax.lax.rem(-rem + total, total), pltpu)
    crop = sc3[:, :a_rows, :]
    return jnp.clip(shifted3 + vol * crop, -1.0, 1.0)


def augment_block_rows(
    i, get_wav3, shift_ref, srow_ref, rem_ref, vol_ref, keep_ref,
    noise_ref, scratches, sem, p: int, win_rows: int, crop_rolls: bool,
    pl, pltpu, tb: int = _TB,
):
    """One grid step of the fused augment phase: start all `tb` crop DMAs,
    shift rows while they fly, then mix+clip; returns the tb augmented
    [1, A, 128] f32 rows as values. `get_wav3(r)` supplies the r-th wav
    block (pre-decoded f32 for v4; int16-decode-on-read for v5 and the
    single-kernel frontend). The SINGLE implementation of the
    DMA/shift/mix orchestration shared by _kernel, _kernel_gather, and
    frontend._kernel — the three must never drift."""
    a_rows = p // _LANES

    def crop_dma(r):
        start = pl.multiple_of(srow_ref[i * tb + r], 8)
        return pltpu.make_async_copy(
            noise_ref.at[pl.ds(start, win_rows)],
            scratches[r].at[pl.ds(0, win_rows)],
            sem.at[r],
        )

    for r in range(tb):
        crop_dma(r).start()

    pos = sample_positions(a_rows)
    shifted = []
    for r in range(tb):
        b = i * tb + r
        shifted.append(
            shift_row(get_wav3(r), shift_ref[b], keep_ref[b], pos, p, pltpu)
        )

    rows = []
    for r in range(tb):
        b = i * tb + r
        crop_dma(r).wait()
        rows.append(
            mix_crop_row(
                shifted[r], scratches[r], rem_ref[b], vol_ref[b],
                a_rows, crop_rolls, pltpu,
            )
        )
    return rows


def _kernel(
    shift_ref,  # [B] int32   (scalar prefetch; signed sample shift)
    srow_ref,   # [B] int32   (crop start row in the 2D bank, 8-aligned)
    rem_ref,    # [B] int32   (crop offset % 1024, samples)
    vol_ref,    # [B] f32
    keep_ref,   # [B] f32     (0.0 for silence rows)
    wav_ref,    # [TB, A, 128] f32 block (A = pow2 P / 128)
    noise_ref,  # [rows, 128] f32 bank in HBM/ANY
    out_ref,    # [TB, A, 128] f32 block (caller slices flat [:n])
    *scratches_and_sem,  # TB x [WR, 128] crop scratches, sem array
    p: int,          # padded row length (pow2)
    win_rows: int,   # DMA window height (multiple of 8)
    crop_rolls: bool,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    scratches = scratches_and_sem[:_TB]
    sem = scratches_and_sem[_TB]
    i = pl.program_id(0)

    rows = augment_block_rows(
        i, lambda r: wav_ref[r : r + 1, :, :],
        shift_ref, srow_ref, rem_ref, vol_ref, keep_ref,
        noise_ref, scratches, sem, p, win_rows, crop_rolls, pl, pltpu,
    )
    for r in range(_TB):
        out_ref[r : r + 1] = rows[r]


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _fused_augment_impl(wavs, scalars, noise_bank, n, interpret, quantize_crops=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shifts, clips, offs, vols, keeps = scalars
    batch = wavs.shape[0]
    pad_b = (-batch) % _TB
    if pad_b:
        wavs = jnp.pad(wavs, ((0, pad_b), (0, 0)))
        shifts, clips, offs, vols, keeps = (
            jnp.pad(a, (0, pad_b)) for a in (shifts, clips, offs, vols, keeps)
        )
    padded_b = wavs.shape[0]
    if n % _LANES:
        # raise, not assert: python -O strips asserts and a misaligned
        # clip would corrupt the row layout silently
        raise ValueError(f"clip length {n} must be lane-aligned ({_LANES})")
    p = _next_pow2(n)
    if p > n:
        wavs = jnp.pad(wavs, ((0, 0), (0, p - n)))
    a_rows = p // _LANES
    wavs3 = wavs.astype(jnp.float32).reshape(padded_b, a_rows, _LANES)

    # 2D noise bank [rows, 128]; crop windows are DMA'd at 8-row
    # (1024-sample) granularity. Scratch rows = pow2 >= window rows so the
    # remainder roll (exact mode) can use the 2D decomposition.
    noise2d, stride, win_rows = _noise_bank_2d(noise_bank, n)
    scratch_rows = _next_pow2(win_rows)
    rems, start_rows = crop_scalar_prep(offs, clips, stride, quantize_crops)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(padded_b // _TB,),
        in_specs=[
            pl.BlockSpec(
                (_TB, a_rows, _LANES), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (_TB, a_rows, _LANES), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((scratch_rows, _LANES), jnp.float32) for _ in range(_TB)
        ]
        + [pltpu.SemaphoreType.DMA((_TB,))],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, p=p, win_rows=win_rows, crop_rolls=not quantize_crops
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((padded_b, a_rows, _LANES), jnp.float32),
        interpret=interpret,
    )(
        shifts.astype(jnp.int32),
        start_rows,
        rems,
        vols.astype(jnp.float32),
        keeps.astype(jnp.float32),
        wavs3,
        noise2d,
    )
    return out.reshape(padded_b, p)[:batch, :n]


def _kernel_gather(
    *refs,
    p: int,          # padded row length (pow2)
    win_rows: int,   # DMA window height (multiple of 8)
    crop_rolls: bool,
    scale: float,    # int16 -> [-1, 1) decode scale
):
    """v5 body. Ref layout (TB rows per grid step):

    refs[0:6]   scalar prefetch: shift/srow/rem/vol/keep [B] + idx[B]
                (idx is consumed by the wav BlockSpec index maps — the
                dataset-row gather rides the pipelined block fetch, no
                materialized batch array)
    refs[6:6+TB]      TB wav blocks [1, A, 128] int16, row idx[i*TB+r]
                      (one index-mapped spec per row, each independently
                      double-buffered by the Pallas pipeline)
    refs[6+TB]        noise bank [rows, 128] f32 in HBM/ANY
    refs[7+TB]        out block [TB, A, 128] f32
    refs[8+TB:]       TB crop scratches [WR, 128] f32 + DMA sem [TB]
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shift_ref, srow_ref, rem_ref, vol_ref, keep_ref, _idx_ref = refs[:6]
    wav_refs = refs[6 : 6 + _TB]
    noise_ref = refs[6 + _TB]
    out_ref = refs[7 + _TB]
    scratches = refs[8 + _TB : 8 + 2 * _TB]
    sem = refs[8 + 2 * _TB]

    i = pl.program_id(0)

    rows = augment_block_rows(
        i, lambda r: wav_refs[r][:].astype(jnp.float32) * scale,
        shift_ref, srow_ref, rem_ref, vol_ref, keep_ref,
        noise_ref, scratches, sem, p, win_rows, crop_rolls, pl, pltpu,
    )
    for r in range(_TB):
        out_ref[r : r + 1] = rows[r]


def pad_batch_scalars(idx, scalars, tb: int = _TB):
    """Pad idx + the per-row scalar draws to a multiple of `tb`.

    Padded rows read dataset row idx=0 with keep=0 and are sliced off by
    every caller ([:batch]). Shared by _fused_gather_augment_impl and
    the single-kernel frontend (frontend._impl)."""
    batch = idx.shape[0]
    pad_b = (-batch) % tb
    if pad_b:
        idx = jnp.pad(idx, (0, pad_b))
        scalars = tuple(jnp.pad(a, (0, pad_b)) for a in scalars)
    return idx, tuple(scalars)


def gather_wav_spec(r: int, a_rows: int, pl, pltpu, tb: int = _TB):
    """Index-mapped [1, A, 128] dataset-row BlockSpec: the index map
    reads the prefetched batch indices (the LAST scalar-prefetch
    operand), so the dataset-row gather IS the pipelined block fetch —
    no materialized batch array. This trick is load-bearing for the v5
    gather kernel AND the single-kernel frontend; it lives once here."""
    return pl.BlockSpec(
        (1, a_rows, _LANES),
        lambda i, *prefetch: (prefetch[-1][i * tb + r], 0, 0),
        memory_space=pltpu.VMEM,
    )


def crop_scalar_prep(offs, clips, stride, quantize_crops: bool):
    """Per-row noise-crop scalars -> (rems, start_rows).

    start_rows: 8-row-aligned DMA start row inside the 2D noise bank
    (clip row base + aligned offset); rems: the sub-align remainder the
    in-kernel roll removes (zeroed in quantized mode). The ONE
    implementation shared by fused_augment, fused_gather_augment, and
    the single-kernel frontend (ops/pallas/frontend.py) — the three must
    never drift (same scalars feed the same kernel bodies)."""
    off_aligned = (offs // _ALIGN) * _ALIGN
    if quantize_crops:
        rems = jnp.zeros_like(off_aligned, jnp.int32)
    else:
        rems = (offs - off_aligned).astype(jnp.int32)
    start_rows = ((clips * stride + off_aligned) // _LANES).astype(jnp.int32)
    return rems, start_rows


def _noise_bank_2d(noise_bank, n):
    """[K, L] noise bank -> ([rows, 128] matrix, row stride) for 8-row DMA.

    stride covers exactly the maximum DMA extent: the largest aligned
    crop offset is align_down(clip_len - n) and each DMA reads `window`
    samples, so align_up(clip_len - n + window) suffices — a bleed past
    one clip's stride can only land in crop positions >= n, which every
    consumer discards ([:n] slices).

    NOTE this pad+reshape runs inside the jitted step (the bank is a
    traced argument); XLA's while-loop LICM is expected to hoist it out
    of the scan body. If a hardware profile ever shows the per-step
    copy, precompute the 2D layout once at bank-upload time instead.
    """
    k_clips, clip_len = noise_bank.shape
    window = ((n + _ALIGN) + _ALIGN - 1) // _ALIGN * _ALIGN
    win_rows = window // _LANES
    stride = clip_len - n + window
    stride += (-stride) % _ALIGN
    noise2d = (
        jnp.pad(noise_bank, ((0, 0), (0, stride - clip_len))).reshape(-1, _LANES)
    )
    return noise2d, stride, win_rows


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _fused_gather_augment_impl(
    wavs3d, idx, scalars, noise_bank, n, interpret, quantize_crops=False
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shifts, clips, offs, vols, keeps = scalars
    batch = idx.shape[0]
    _, a_rows, lanes = wavs3d.shape
    p = a_rows * _LANES
    if lanes != _LANES or p != _next_pow2(p):
        # raise, not assert (python -O): a non-pow2/non-lane layout
        # breaks the in-kernel roll decomposition silently
        raise ValueError(
            f"dataset rows must be pow2-padded [N, P/{_LANES}, {_LANES}]; "
            f"got lanes={lanes}, P={p}"
        )

    idx, (shifts, clips, offs, vols, keeps) = pad_batch_scalars(
        idx, (shifts, clips, offs, vols, keeps)
    )
    padded_b = idx.shape[0]

    noise2d, stride, win_rows = _noise_bank_2d(noise_bank, n)
    scratch_rows = _next_pow2(max(win_rows, a_rows))
    rems, start_rows = crop_scalar_prep(offs, clips, stride, quantize_crops)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(padded_b // _TB,),
        in_specs=[gather_wav_spec(r, a_rows, pl, pltpu) for r in range(_TB)]
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (_TB, a_rows, _LANES), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((scratch_rows, _LANES), jnp.float32) for _ in range(_TB)
        ]
        + [pltpu.SemaphoreType.DMA((_TB,))],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_gather,
            p=p,
            win_rows=win_rows,
            crop_rolls=not quantize_crops,
            scale=1.0 / 32768.0,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((padded_b, a_rows, _LANES), jnp.float32),
        interpret=interpret,
    )(
        shifts.astype(jnp.int32),
        start_rows,
        rems,
        vols.astype(jnp.float32),
        keeps.astype(jnp.float32),
        idx.astype(jnp.int32),
        *([wavs3d] * _TB),
        noise2d,
    )
    return out.reshape(padded_b, p)[:batch, :n]


def _draw_scalars(key, is_silent, cfg, noise_bank, n, is_training):
    """Per-row augmentation draws shared by both fused kernels."""
    batch = is_silent.shape[0]
    k_shift, k_idx, k_off, k_vol = jax.random.split(key, 4)
    max_shift = int(n * cfg.shift_ratio)
    if cfg.method == "anchored_slice_or_pad_with_shift" and max_shift > 0:
        shifts = jax.random.randint(k_shift, (batch,), -max_shift, max_shift)
    else:
        shifts = jnp.zeros((batch,), jnp.int32)

    k_clips, clip_len = noise_bank.shape
    clips = jax.random.randint(k_idx, (batch,), 0, k_clips)
    offs = jax.random.randint(k_off, (batch,), 0, clip_len - n + 1)
    from tcresnet_tpu.ops.augment import draw_background_volumes

    vols = draw_background_volumes(k_vol, is_silent, cfg, is_training)
    keeps = jnp.where(is_silent, 0.0, 1.0).astype(jnp.float32)
    return shifts, clips, offs, vols, keeps


def gather_fusable(
    wavs3d: jnp.ndarray,
    cfg: AugmentConfig,
    noise_bank: Optional[jnp.ndarray],
    n: int,
) -> bool:
    """Whether fused_gather_augment supports this dataset/config."""
    if wavs3d.ndim != 3 or wavs3d.dtype != jnp.int16:
        return False
    _, a_rows, lanes = wavs3d.shape
    p = a_rows * lanes
    return (
        # ONLY the two anchored methods: an unknown method must fall
        # through to the XLA path, which raises ValueError — silently
        # treating a typo'd method as anchored_slice_or_pad here would
        # train with wrong augmentation on TPU while CPU errors
        cfg.method in (
            "anchored_slice_or_pad", "anchored_slice_or_pad_with_shift"
        )
        and noise_bank is not None
        and noise_bank.shape[0] > 0
        # crops need clip_len >= n: randint(0, clip_len - n + 1) with an
        # empty range would produce out-of-bounds DMA row offsets
        and noise_bank.shape[1] >= n
        and n % _LANES == 0
        and lanes == _LANES
        and p == _next_pow2(p)
        and a_rows % 16 == 0  # int16 VMEM tiling needs 16-row blocks
    )


def fused_gather_augment(
    wavs3d: jnp.ndarray,
    idx: jnp.ndarray,
    is_silent: jnp.ndarray,
    key: jax.Array,
    cfg: AugmentConfig,
    noise_bank: jnp.ndarray,
    is_training: bool,
    n: int,
    interpret: bool = False,
    mesh=None,
) -> jnp.ndarray:
    """Gather + decode + shift + background mix + clip in ONE kernel pass.

    `wavs3d` is the HBM-resident dataset as [N, p/128, 128] int16 with p a
    power of two (DeviceDataset's storage layout); `idx[B]` selects the
    batch rows. The row fetch rides the kernel's pipelined block DMA (the
    BlockSpec index map reads the prefetched idx), so the batch is never
    materialized as a separate [B, n] array — the v4 path required an XLA
    gather (HBM read + write) plus a kernel read; this reads each dataset
    row from HBM exactly once. Callers must check gather_fusable() first
    (ops/augment.augment_gathered does, with an XLA fallback).

    Bit-exact vs gathering rows and calling fused_augment/augment_batch
    with the same key (tests/test_pallas_augment.py
    test_gather_fused_matches_gather_then_augment).
    """
    if not gather_fusable(wavs3d, cfg, noise_bank, n):
        # raise, not assert (python -O): an unfusable geometry reaching
        # the kernel means out-of-bounds noise DMAs or a wrong layout
        raise ValueError(
            "fused_gather_augment requires gather_fusable(); callers "
            "must check it and fall back (ops/augment.augment_gathered)"
        )
    scalars = _draw_scalars(key, is_silent, cfg, noise_bank, n, is_training)
    quantize = bool(getattr(cfg, "noise_crop_quantize", False))
    # shard_map policy lives in parallel/mesh.maybe_shard_map (kernels
    # run per-shard on local shapes — a custom call cannot be split by
    # plain jit). Randomness is drawn ABOVE on the global batch, so
    # shards never correlate: dataset + noise replicated, rows sharded.
    from jax.sharding import PartitionSpec as P

    from tcresnet_tpu.parallel.mesh import maybe_shard_map

    sharded = maybe_shard_map(
        lambda w, i, s, nb: _fused_gather_augment_impl(
            w, i, s, nb, n, interpret, quantize
        ),
        mesh,
        in_specs=(P(), P("data"), (P("data"),) * 5, P()),
        batch=idx.shape[0],
        tile=_TB,
    )
    if sharded is not None:
        return sharded(wavs3d, idx, scalars, noise_bank)
    return _fused_gather_augment_impl(
        wavs3d, idx, scalars, noise_bank, n, interpret, quantize
    )


def fused_augment(
    wavs: jnp.ndarray,
    is_silent: jnp.ndarray,
    key: jax.Array,
    cfg: AugmentConfig,
    noise_bank: Optional[jnp.ndarray],
    is_training: bool,
    interpret: bool = False,
    mesh=None,
) -> jnp.ndarray:
    """Drop-in fused equivalent of ops/augment.augment_batch.

    With a multi-device `mesh`, the kernel runs per-shard under
    shard_map like its siblings (parallel/mesh.maybe_shard_map) — this
    is also augment_gathered's fallback when gather_fusable rejects the
    dataset, so without it a multi-chip step would silently replicate
    the full-batch augmentation on every chip."""
    batch, n = wavs.shape
    if (
        # ONLY the two anchored methods (see gather_fusable): unknown
        # methods must reach the XLA path's ValueError, and
        # no_augmentation_audio is pure silence-zeroing
        cfg.method not in (
            "anchored_slice_or_pad", "anchored_slice_or_pad_with_shift"
        )
        or noise_bank is None
        or noise_bank.shape[0] == 0
        # crops need clip_len >= n (same guard as gather_fusable):
        # randint(0, clip_len - n + 1) over an empty range is
        # unspecified — current JAX clamps to offset 0 (silently
        # non-random crops), and anything else would be an
        # out-of-bounds noise DMA
        or noise_bank.shape[1] < n
        or n % _LANES != 0
    ):
        from tcresnet_tpu.ops import augment as xla_augment

        return xla_augment.augment_batch(
            wavs, is_silent, key, cfg, noise_bank, is_training
        )

    scalars = _draw_scalars(key, is_silent, cfg, noise_bank, n, is_training)
    quantize = bool(getattr(cfg, "noise_crop_quantize", False))
    from jax.sharding import PartitionSpec as P

    from tcresnet_tpu.parallel.mesh import maybe_shard_map

    sharded = maybe_shard_map(
        lambda w, s, nb: _fused_augment_impl(w, s, nb, n, interpret, quantize),
        mesh,
        in_specs=(P("data"), (P("data"),) * 5, P()),
        batch=batch,
        tile=_TB,
    )
    if sharded is not None:
        return sharded(wavs.astype(jnp.float32), scalars, noise_bank)
    return _fused_augment_impl(
        wavs.astype(jnp.float32), scalars, noise_bank, n, interpret, quantize
    )
