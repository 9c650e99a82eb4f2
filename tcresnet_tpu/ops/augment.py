"""Device-side audio augmentation, executed inside the jitted train step.

The reference ran augmentation per-element on host CPU threads inside
tf.data (/root/reference/datasets/augmentation_factory.py); here the whole
batch is augmented on the TPU with keyed randomness — this is what keeps
the steady-state train loop free of host work (SURVEY.md section 7.1).

Distributional parity with the reference (exact RNG parity is impossible
across frameworks and not required — SURVEY.md 7.4.4):
  - time shift: uniform integer in [-W*ratio, W*ratio)
    (augmentation_factory.py:104-143, tf.random.uniform maxval exclusive)
  - background mix ("naive version", :69-79): with prob background_frequency
    mix a uniformly chosen random crop of a random noise clip at volume
    U[0, background_max_volume); eval uses volume 0
  - silence samples are all-zero foregrounds (:26-27,178-184); under the
    naive version they still receive background mixing like other samples
  - final clip to [-1, 1] (:99)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tcresnet_tpu.config import AugmentConfig


def time_shift(wavs: jnp.ndarray, key: jax.Array, shift_ratio: float) -> jnp.ndarray:
    """Randomly shift each wav in time, zero-padding the gap.

    Equivalent to the reference's pad+slice (_shift_audio,
    augmentation_factory.py:104-143): shift amount s ~ U[-T, T) where
    T = int(N * shift_ratio); s > 0 delays the audio (zeros in front),
    s < 0 advances it (zeros at the end). Implemented as a batched roll
    plus wraparound masking — one fused VPU pass, no gathers.
    """
    batch, num_samples = wavs.shape
    max_shift = int(num_samples * shift_ratio)
    if max_shift == 0:
        return wavs
    shifts = jax.random.randint(key, (batch,), -max_shift, max_shift)

    pos = jnp.arange(num_samples)[None, :]
    s = shifts[:, None]
    # roll right by s (negative s rolls left); mask the wrapped region.
    rolled = jax.vmap(jnp.roll)(wavs, shifts)
    valid = jnp.where(s >= 0, pos >= s, pos < num_samples + s)
    return jnp.where(valid, rolled, 0.0)


def mix_background(
    wavs: jnp.ndarray,
    is_silent: jnp.ndarray,
    noise_bank: jnp.ndarray,
    key: jax.Array,
    background_frequency: float,
    background_max_volume: float,
    is_training: bool,
) -> jnp.ndarray:
    """Mix random background-noise crops into a batch of wavs.

    Matches _mix_background (naive version, augmentation_factory.py:30-101):
    silence rows get a zero foreground; each row independently draws a
    noise clip index, a crop offset, and (training only, with prob
    background_frequency) a volume in U[0, max_volume); output clipped.

    noise_bank: [num_clips, clip_len] float32, clip_len >= num_samples.
    Lives in HBM once; crops are dynamic slices on device.
    """
    batch, num_samples = wavs.shape
    num_clips, clip_len = noise_bank.shape
    k_idx, k_off, k_gate, k_vol = jax.random.split(key, 4)

    foreground = jnp.where(is_silent[:, None], 0.0, wavs)

    idx = jax.random.randint(k_idx, (batch,), 0, num_clips)
    # tf.random_crop: offset uniform in [0, clip_len - num_samples].
    offsets = jax.random.randint(k_off, (batch,), 0, clip_len - num_samples + 1)
    crops = jax.vmap(
        lambda i, o: jax.lax.dynamic_slice(noise_bank[i], (o,), (num_samples,))
    )(idx, offsets)

    if is_training:
        gate = jax.random.uniform(k_gate, (batch,)) < background_frequency
        volume = jnp.where(
            gate, jax.random.uniform(k_vol, (batch,)) * background_max_volume, 0.0
        )
    else:
        volume = jnp.zeros((batch,))

    mixed = foreground + volume[:, None] * crops
    return jnp.clip(mixed, -1.0, 1.0)


def augment_batch(
    wavs: jnp.ndarray,
    is_silent: jnp.ndarray,
    key: jax.Array,
    cfg: AugmentConfig,
    noise_bank: Optional[jnp.ndarray],
    is_training: bool,
) -> jnp.ndarray:
    """Full augmentation dispatch, mirroring augmentation_factory.py:161-211.

    method:
      no_augmentation_audio        -> silence zeroing only
      anchored_slice_or_pad        -> silence zeroing + background mix
      anchored_slice_or_pad_with_shift -> + random time shift first
    """
    wavs = wavs.astype(jnp.float32)
    if cfg.method == "no_augmentation_audio":
        return jnp.where(is_silent[:, None], 0.0, wavs)
    if cfg.method not in ("anchored_slice_or_pad", "anchored_slice_or_pad_with_shift"):
        raise ValueError(f"Unknown augmentation method {cfg.method!r}")

    k_shift, k_bg = jax.random.split(key)
    if cfg.method == "anchored_slice_or_pad_with_shift":
        # Reference shifts before silence zeroing, but shifting zeros is a
        # no-op, so order is equivalent for silence rows.
        wavs = time_shift(wavs, k_shift, cfg.shift_ratio)

    if noise_bank is None or noise_bank.shape[0] == 0:
        return jnp.where(is_silent[:, None], 0.0, wavs)

    return mix_background(
        wavs,
        is_silent,
        noise_bank,
        k_bg,
        cfg.background_frequency,
        cfg.background_max_volume,
        is_training,
    )
