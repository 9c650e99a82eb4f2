"""Fused Pallas augmentation kernel: shift + background mix + clip.

Why: profiled on v5e, the augmentation dominated the train step (~18.6 ms
of a 22 ms batch-2048 step, 85%) because XLA lowers per-row shifts/crops
to slow forms (vmapped roll ~8 ms; lane gathers ~700 ms). The reference
semantics (augmentation_factory.py: pad+slice shift, random noise crop,
volume gate, clip) are per-row *contiguous window reads at dynamic
offsets* — on TPU these map to `tpu.DynamicRotate` (pltpu.roll with a
dynamic shift) and dynamic-offset DMA, no gathers at all.

Hardware constraints honored (discovered empirically on v5e):
  - dynamic-shift pltpu.roll is only correct for power-of-two vector
    widths -> rows are zero-padded to the next pow2 (16000 -> 16384);
    the validity mask already covers the circular wrap exactly;
  - dynamic lane offsets in slices must be 128-aligned -> the noise crop
    DMAs a 128-aligned window from HBM and rolls by the remainder
    (< 128) in VMEM. The noise bank therefore lives in HBM, so
    real-length background clips (minutes of audio) are supported.

Kernel, per row r of an 8-row block:
    shifted = mask(roll(wav_r * keep_r, s_r))                # pow2 roll
    crop    = roll(DMA(noise[clip_r, align(off_r) : +n+128]), rem_r)[:n]
    out_r   = clamp(shifted[:n] + vol_r * crop, -1, 1)

All randomness (shift, clip index, offset, volume, gate, silence) is
drawn OUTSIDE with jax.random on [B] arrays and enters through scalar
prefetch, so the augmentation distribution is identical to
ops/augment.py (tested exactly equal given the same per-row draws).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tcresnet_tpu.config import AugmentConfig

_TB = 8  # rows per grid step (sublane-aligned)
_LANES = 128


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _kernel(
    shift_ref,  # [B] int32   (scalar prefetch)
    start_ref,  # [B] int32   (flat 1024-aligned crop start: clip*L' + align(off))
    rem_ref,    # [B] int32   (crop offset % 1024)
    vol_ref,    # [B] f32
    keep_ref,   # [B] f32     (0.0 for silence rows)
    wav_ref,    # [TB, P] f32 block (P = pow2 >= n)
    noise_ref,  # [K*L'] f32 flat bank in HBM/ANY (L' lane-aligned)
    out_ref,    # [TB, n] f32 block
    *scratches_and_sem,  # TB x [W] crop scratches, 2 x [TB, n] bufs, sem
    n: int,
    window: int,  # 1024-aligned, >= n + rem_max, <= W
    crop_rolls: bool,  # False when offsets pre-quantized to the DMA tile
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    scratches = scratches_and_sem[:_TB]
    shifted_buf = scratches_and_sem[_TB]
    crop_buf = scratches_and_sem[_TB + 1]
    sem = scratches_and_sem[_TB + 2]
    i = pl.program_id(0)

    def crop_dma(r):
        # 1024-aligned flat DMA of row r's crop window; alignment holds by
        # construction (stride and off_aligned are 1024 multiples)
        start = pl.multiple_of(start_ref[i * _TB + r], 8 * 128)
        return pltpu.make_async_copy(
            noise_ref.at[pl.ds(start, window)],
            scratches[r].at[pl.ds(0, window)],
            sem.at[r],
        )

    # launch ALL crop DMAs up front so they overlap the roll compute
    for r in range(_TB):
        crop_dma(r).start()

    w = scratches[0].shape[0]
    # per-row rotates (the only truly per-row work)...
    for r in range(_TB):
        b = i * _TB + r
        shifted_buf[r : r + 1, :] = pltpu.roll(
            wav_ref[r : r + 1, :], shift=shift_ref[b], axis=1
        )[:, :n]
        crop_dma(r).wait()
        if crop_rolls:
            crop2d = scratches[r][:].reshape(1, w)
            crop_buf[r : r + 1, :] = pltpu.roll(
                crop2d, shift=-rem_ref[b], axis=1
            )[:, :n]
        else:
            # offsets pre-quantized to the DMA tile: remainder is 0
            crop_buf[r : r + 1, :] = scratches[r][:].reshape(1, w)[:, :n]

    # ...then one batched epilogue over the whole [TB, n] block:
    # silence zeroing, shift-wrap masking, volume mix, clip
    tile0 = i * _TB
    svec = jnp.stack([shift_ref[tile0 + r] for r in range(_TB)])[:, None]
    vvec = jnp.stack([vol_ref[tile0 + r] for r in range(_TB)])[:, None]
    kvec = jnp.stack([keep_ref[tile0 + r] for r in range(_TB)])[:, None]
    pos = jax.lax.broadcasted_iota(jnp.int32, (_TB, n), 1)
    valid = (pos >= svec) & (pos < n + svec)
    shifted = shifted_buf[:, :] * valid.astype(jnp.float32) * kvec
    out_ref[:, :] = jnp.clip(shifted + vvec * crop_buf[:, :], -1.0, 1.0)


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
    p = _next_pow2(n)
    if p > n:
        wavs = jnp.pad(wavs, ((0, 0), (0, p - n)))
    assert n % _LANES == 0, "pad the batch to lane-aligned clip lengths"

    # 1D HBM arrays are tiled at 8*128=1024; DMA starts/sizes must be
    # 1024-aligned, so the crop window is 1024-aligned with the remainder
    # (< 1024) handled by an in-VMEM roll.
    align = 8 * _LANES
    # both the DMA offset AND size must be 1024-aligned
    window = ((n + align) + align - 1) // align * align
    w = _next_pow2(window)
    k_clips, clip_len = noise_bank.shape
    stride = clip_len + align + window
    stride += (-stride) % align
    noise_flat = jnp.pad(
        noise_bank, ((0, 0), (0, stride - clip_len))
    ).reshape(-1)

    off_aligned = (offs // align) * align
    if quantize_crops:
        # crop starts quantized to the DMA tile: no remainder rotate
        rems = jnp.zeros_like(off_aligned, jnp.int32)
    else:
        rems = (offs - off_aligned).astype(jnp.int32)
    starts = (clips * stride + off_aligned).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(padded_b // _TB,),
        in_specs=[
            pl.BlockSpec((_TB, p), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (_TB, n), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((w,), jnp.float32) for _ in range(_TB)]
        + [
            pltpu.VMEM((_TB, n), jnp.float32),
            pltpu.VMEM((_TB, n), jnp.float32),
            pltpu.SemaphoreType.DMA((_TB,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, n=n, window=window, crop_rolls=not quantize_crops
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((padded_b, n), jnp.float32),
        interpret=interpret,
    )(
        shifts.astype(jnp.int32),
        starts,
        rems,
        vols.astype(jnp.float32),
        keeps.astype(jnp.float32),
        wavs.astype(jnp.float32),
        noise_flat,
    )
    return out[:batch]


def fused_augment(
    wavs: jnp.ndarray,
    is_silent: jnp.ndarray,
    key: jax.Array,
    cfg: AugmentConfig,
    noise_bank: Optional[jnp.ndarray],
    is_training: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fused equivalent of ops/augment.augment_batch."""
    batch, n = wavs.shape
    if (
        cfg.method == "no_augmentation_audio"
        or noise_bank is None
        or noise_bank.shape[0] == 0
        or n % _LANES != 0
    ):
        from tcresnet_tpu.ops import augment as xla_augment

        return xla_augment.augment_batch(
            wavs, is_silent, key, cfg, noise_bank, is_training
        )

    k_shift, k_idx, k_off, k_gate, k_vol = jax.random.split(key, 5)
    max_shift = int(n * cfg.shift_ratio)
    if cfg.method == "anchored_slice_or_pad_with_shift" and max_shift > 0:
        shifts = jax.random.randint(k_shift, (batch,), -max_shift, max_shift)
    else:
        shifts = jnp.zeros((batch,), jnp.int32)

    k_clips, clip_len = noise_bank.shape
    clips = jax.random.randint(k_idx, (batch,), 0, k_clips)
    offs = jax.random.randint(k_off, (batch,), 0, clip_len - n + 1)
    if is_training:
        gate = jax.random.uniform(k_gate, (batch,)) < cfg.background_frequency
        vols = jnp.where(
            gate,
            jax.random.uniform(k_vol, (batch,)) * cfg.background_max_volume,
            0.0,
        )
    else:
        vols = jnp.zeros((batch,), jnp.float32)
    keeps = jnp.where(is_silent, 0.0, 1.0).astype(jnp.float32)

    scalars = (shifts, clips, offs, vols, keeps)
    return _fused_augment_impl(
        wavs.astype(jnp.float32),
        scalars,
        noise_bank,
        n,
        interpret,
        bool(getattr(cfg, "noise_crop_quantize", False)),
    )
