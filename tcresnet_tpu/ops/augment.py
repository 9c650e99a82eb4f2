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

_LANES = 128


def dynamic_window_rows(
    padded: jnp.ndarray, start: jnp.ndarray, out_len: int
) -> jnp.ndarray:
    """Batched contiguous window read at per-row dynamic offsets, TPU-fast.

    Returns y with y[b, t] = padded[b, start[b] + t] for t < out_len.
    Requires padded.shape[-1] % 128 == 0, out_len % 128 == 0, and
    0 <= start[b] <= padded.shape[-1] - out_len.

    Why not a gather: lane-dimension gathers (take_along_axis on the minor
    axis) measure ~700 ms for a [2048, 16000] read on v5e, and vmapped
    roll/dynamic_slice ~8 ms. This formulation decomposes the offset as
    start = q*128 + r: the q part is a SUBLANE gather (fast on TPU), and
    the r part is a batched 128x128 one-hot matmul with a carry term
    (MXU work, ~17 GFLOP at batch 2048) — exact, no distribution change.
    """
    batch, total = padded.shape
    assert total % _LANES == 0 and out_len % _LANES == 0
    j = out_len // _LANES
    x = padded.reshape(batch, total // _LANES, _LANES)

    q = start // _LANES
    r = start % _LANES

    # sublane gather of the J+1 rows covering the window (+1 for carry).
    # The carry row index can exceed the last row only when r == 0, where
    # its matmul coefficient is identically zero — clip (NOT the default
    # NaN fill: NaN * 0 would poison the output).
    subidx = q[:, None] + jnp.arange(j + 1)[None, :]
    y = jnp.take_along_axis(x, subidx[:, :, None], axis=1, mode="clip")

    # lane remainder via one-hot matmuls:
    #   out[b, j, l] = y[b, j, l + r]            (l + r < 128)
    #                + y[b, j+1, l + r - 128]    (l + r >= 128)
    lanes = jnp.arange(_LANES)
    lp = lanes[None, :, None]  # l' (source lane)
    lo = lanes[None, None, :]  # l  (output lane)
    rr = r[:, None, None]
    a = (lp == lo + rr).astype(padded.dtype)  # [B, 128, 128]
    c = (lp + _LANES == lo + rr).astype(padded.dtype)
    out = jnp.einsum(
        "bjk,bkl->bjl", y[:, :j], a, preferred_element_type=jnp.float32
    ) + jnp.einsum(
        "bjk,bkl->bjl", y[:, 1 : j + 1], c, preferred_element_type=jnp.float32
    )
    return out.reshape(batch, out_len)


def _pad_to_lanes(n: int) -> int:
    return (-n) % _LANES


def time_shift(wavs: jnp.ndarray, key: jax.Array, shift_ratio: float) -> jnp.ndarray:
    """Randomly shift each wav in time, zero-padding the gap.

    Equivalent to the reference's pad+slice (_shift_audio,
    augmentation_factory.py:104-143): shift amount s ~ U[-T, T) where
    T = int(N * shift_ratio); s > 0 delays the audio (zeros in front),
    s < 0 advances it (zeros at the end). Implemented as a padded
    dynamic-window read (see dynamic_window_rows) — exact semantics,
    sublane-gather + MXU matmul instead of gathers/rolls.
    """
    batch, num_samples = wavs.shape
    max_shift = int(num_samples * shift_ratio)
    if max_shift == 0:
        return wavs
    shifts = jax.random.randint(key, (batch,), -max_shift, max_shift)

    out_len = num_samples + _pad_to_lanes(num_samples)
    left = max_shift
    total = left + out_len + max_shift
    total += _pad_to_lanes(total)
    padded = jnp.zeros((batch, total), wavs.dtype)
    padded = jax.lax.dynamic_update_slice(padded, wavs, (0, left))
    # out[t] = wav[t - s]  ->  window start = left - s
    out = dynamic_window_rows(padded, left - shifts, out_len)
    return out[:, :num_samples]


def draw_background_volumes(
    key: jax.Array,
    is_silent: jnp.ndarray,
    cfg: AugmentConfig,
    is_training: bool,
) -> jnp.ndarray:
    """Per-row background-mix volumes, both reference versions.

    naive / v1 (augmentation_factory.py:69-79, the default per :38):
    training rows get volume U[0, max_volume) with prob
    background_frequency, else 0; eval rows always 0.

    v2 (:81-95, from tensorflow/examples/speech_commands input_data.py):
    silence rows get volume U[0, 1) — training AND eval — while
    non-silence rows behave as in v1.

    Shared by the XLA path and the fused Pallas kernel (which takes the
    volumes via scalar prefetch), so both backends expose both versions.
    """
    batch = is_silent.shape[0]
    k_gate, k_vol, k_sil = jax.random.split(key, 3)
    if is_training:
        gate = jax.random.uniform(k_gate, (batch,)) < cfg.background_frequency
        fore = jnp.where(
            gate,
            jax.random.uniform(k_vol, (batch,)) * cfg.background_max_volume,
            0.0,
        )
    else:
        fore = jnp.zeros((batch,), jnp.float32)
    if getattr(cfg, "naive_background_mix", True):
        return fore
    sil = jax.random.uniform(k_sil, (batch,))
    return jnp.where(is_silent, sil, fore)


def mix_background(
    wavs: jnp.ndarray,
    is_silent: jnp.ndarray,
    noise_bank: jnp.ndarray,
    key: jax.Array,
    background_frequency: float,
    background_max_volume: float,
    is_training: bool,
    volumes: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mix random background-noise crops into a batch of wavs.

    Matches _mix_background (naive version, augmentation_factory.py:30-101):
    silence rows get a zero foreground; each row independently draws a
    noise clip index, a crop offset, and (training only, with prob
    background_frequency) a volume in U[0, max_volume); output clipped.

    `volumes=None` draws v1/naive volumes inline; v2 (silence rows get
    their own U[0,1) volume) callers must pass
    draw_background_volumes(...) — augment() dispatches on
    cfg.naive_background_mix and does exactly that.

    noise_bank: [num_clips, clip_len] float32, clip_len >= num_samples.
    Lives in HBM once; crops are dynamic slices on device.
    """
    batch, num_samples = wavs.shape
    num_clips, clip_len = noise_bank.shape
    if clip_len < num_samples:
        # tf.random_crop's own requirement: a crop of the wav length must
        # exist. randint(0, clip_len - num_samples + 1) over the empty
        # range would silently produce non-random (or OOB) crops, so fail
        # loudly; load_noise_bank drops short clips at load time.
        raise ValueError(
            f"noise clips ({clip_len} samples) shorter than wavs "
            f"({num_samples}); crops require clip_len >= num_samples"
        )
    k_idx, k_off, k_gate, k_vol = jax.random.split(key, 4)

    foreground = jnp.where(is_silent[:, None], 0.0, wavs)

    idx = jax.random.randint(k_idx, (batch,), 0, num_clips)
    # tf.random_crop: offset uniform in [0, clip_len - num_samples].
    offsets = jax.random.randint(k_off, (batch,), 0, clip_len - num_samples + 1)
    # per-row clip rows (tiny K: a plain row gather), then the fast
    # dynamic-window read for the crop offsets
    out_len = num_samples + _pad_to_lanes(num_samples)
    # bank must be lane-aligned and cover max_offset + out_len
    target = max(clip_len, (clip_len - num_samples) + out_len)
    target += _pad_to_lanes(target)
    bank = jnp.pad(noise_bank, ((0, 0), (0, target - clip_len)))
    rows = bank[idx]  # [B, clip_len + pad]
    crops = dynamic_window_rows(rows, offsets, out_len)[:, :num_samples]

    if volumes is not None:
        volume = volumes
    elif is_training:
        gate = jax.random.uniform(k_gate, (batch,)) < background_frequency
        volume = jnp.where(
            gate, jax.random.uniform(k_vol, (batch,)) * background_max_volume, 0.0
        )
    else:
        volume = jnp.zeros((batch,))

    mixed = foreground + volume[:, None] * crops
    return jnp.clip(mixed, -1.0, 1.0)


def augment(
    wavs: jnp.ndarray,
    is_silent: jnp.ndarray,
    key: jax.Array,
    cfg: AugmentConfig,
    noise_bank: Optional[jnp.ndarray],
    is_training: bool,
    platform: Optional[str] = None,
    mesh=None,
) -> jnp.ndarray:
    """Backend-dispatching augmentation entry point.

    backend "auto" uses the fused Pallas kernel on TPU (profiled 3.7x
    faster than this module's XLA formulation; bit-identical results
    given the same per-row draws) and the XLA path elsewhere.

    `platform` names the platform this call will actually execute on
    (e.g. the mesh's device platform); it defaults to the effective
    default platform (utils.platform.default_platform, which honors a
    jax_default_device pin under registered plugins) but MUST be passed
    when jitting over a mesh whose platform differs from the process
    default — e.g. a CPU mesh in a process where a TPU plugin is
    registered.
    """
    backend = getattr(cfg, "backend", "auto")
    if platform is None:
        from tcresnet_tpu.utils.platform import default_platform

        platform = default_platform()
    use_pallas = backend == "pallas" or (backend == "auto" and platform == "tpu")
    if use_pallas:
        from tcresnet_tpu.ops.pallas.augment import fused_augment

        return fused_augment(
            wavs, is_silent, key, cfg, noise_bank, is_training, mesh=mesh
        )
    return augment_batch(wavs, is_silent, key, cfg, noise_bank, is_training)


def augment_gathered(
    wavs3d: jnp.ndarray,
    idx: jnp.ndarray,
    is_silent: jnp.ndarray,
    key: jax.Array,
    cfg: AugmentConfig,
    noise_bank: Optional[jnp.ndarray],
    is_training: bool,
    clip_len: int,
    platform: Optional[str] = None,
    mesh=None,
) -> jnp.ndarray:
    """Backend-dispatching gather+augment over the HBM-resident dataset.

    `wavs3d` is DeviceDataset's [N, P/128, 128] int16 storage and `idx[B]`
    the batch row indices. On TPU (backend "auto"/"pallas", geometry
    permitting) the row gather, int16 decode, and the full augmentation
    run in one Pallas kernel pass — the batch never round-trips through
    HBM as a separate array. Elsewhere (or when the geometry is
    unsupported) the rows are gathered by XLA and fed to augment_batch —
    bit-identical results either way given the same key.
    """
    if platform is None:
        from tcresnet_tpu.utils.platform import default_platform

        platform = default_platform()
    backend = getattr(cfg, "backend", "auto")
    use_pallas = backend == "pallas" or (backend == "auto" and platform == "tpu")
    if use_pallas:
        from tcresnet_tpu.ops.pallas.augment import (
            fused_gather_augment,
            gather_fusable,
        )

        if gather_fusable(wavs3d, cfg, noise_bank, clip_len):
            return fused_gather_augment(
                wavs3d, idx, is_silent, key, cfg, noise_bank,
                is_training, clip_len, mesh=mesh,
            )
    # single home for the [N, P/128, 128] int16 -> float32 decode
    # contract (lazy import: data layer sits above ops in the module DAG)
    from tcresnet_tpu.data.device_data import DeviceDataset

    wavs = DeviceDataset.decode_rows(wavs3d, idx, clip_len)
    # the mesh travels with the fallback: fused_augment must still run
    # per-shard on a multi-chip mesh (a replicated pallas_call would
    # silently erase the DP speedup on the input path)
    return augment(
        wavs, is_silent, key, cfg, noise_bank, is_training,
        platform=platform, mesh=mesh,
    )


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

    k_mix, k_vols = jax.random.split(k_bg)
    return mix_background(
        wavs,
        is_silent,
        noise_bank,
        k_mix,
        cfg.background_frequency,
        cfg.background_max_volume,
        is_training,
        volumes=draw_background_volumes(k_vols, is_silent, cfg, is_training),
    )
