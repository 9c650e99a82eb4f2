"""Fused augmentation kernel: exact parity with the XLA path given the
same per-row random draws, and distributional parity end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcresnet_tpu.config import AugmentConfig
from tcresnet_tpu.ops.pallas.augment import _fused_augment_impl, fused_augment


def test_kernel_semantics_exact(rng):
    """Deterministic scalars -> output must equal the hand-computed result."""
    n, max_shift = 512, 50
    wavs = jnp.asarray(rng.uniform(-0.5, 0.5, (4, n)).astype(np.float32))
    noise = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 2 * n)).astype(np.float32))
    shifts = jnp.asarray([5, -7, 0, 49], jnp.int32)
    clips = jnp.asarray([0, 2, 1, 0], jnp.int32)
    offs = jnp.asarray([10, 0, 2 * n - n, 137], jnp.int32)
    vols = jnp.asarray([0.1, 0.0, 0.05, 1.0], jnp.float32)
    keeps = jnp.asarray([1.0, 1.0, 0.0, 1.0], jnp.float32)

    out = np.asarray(
        _fused_augment_impl(
            wavs, (shifts, clips, offs, vols, keeps), noise, n, True
        )
    )

    w = np.asarray(wavs)
    nz = np.asarray(noise)
    for b in range(4):
        padded = np.zeros(n + 2 * max_shift, np.float32)
        padded[max_shift : max_shift + n] = w[b] * float(keeps[b])
        start = max_shift - int(shifts[b])
        shifted = padded[start : start + n]
        crop = nz[int(clips[b]), int(offs[b]) : int(offs[b]) + n]
        want = np.clip(shifted + float(vols[b]) * crop, -1, 1)
        np.testing.assert_allclose(out[b], want, atol=1e-6, err_msg=f"row {b}")


def test_distribution_matches_xla_path(rng):
    """Same config, different RNG streams: distributions must agree."""
    from tcresnet_tpu.ops import augment as xla_augment

    cfg = AugmentConfig(background_frequency=0.7, background_max_volume=0.2)
    batch, n = 2048, 256
    wavs = jnp.zeros((batch, n), jnp.float32)
    silent = jnp.zeros((batch,), bool)
    noise = jnp.ones((2, 3 * n), jnp.float32)

    a = np.asarray(
        fused_augment(wavs, silent, jax.random.key(0), cfg, noise, True, interpret=True)
    )
    b = np.asarray(
        xla_augment.augment_batch(wavs, silent, jax.random.key(1), cfg, noise, True)
    )
    # fraction of rows mixed and mean volume must match closely
    assert abs((a[:, 0] > 0).mean() - (b[:, 0] > 0).mean()) < 0.05
    assert abs(a[:, 0].mean() - b[:, 0].mean()) < 0.01


def test_quantized_crops_are_tile_aligned_noise_windows(rng):
    """Default mode quantizes crop starts to the 1024 DMA tile: every
    output row must equal wav + vol * noise[clip, q*1024 : q*1024+n] for
    some tile q."""
    from tcresnet_tpu.ops.pallas.augment import _fused_augment_impl

    n = 2048
    wavs = jnp.zeros((8, n), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(2, 4 * n)).astype(np.float32) * 0.1)
    shifts = jnp.zeros((8,), jnp.int32)
    clips = jnp.asarray(rng.integers(0, 2, 8), jnp.int32)
    offs = jnp.asarray(rng.integers(0, 4 * n - n + 1, 8), jnp.int32)
    vols = jnp.ones((8,), jnp.float32)
    keeps = jnp.ones((8,), jnp.float32)
    out = np.asarray(
        _fused_augment_impl(
            wavs, (shifts, clips, offs, vols, keeps), noise, n, True, True
        )
    )
    nz = np.asarray(noise)
    for b in range(8):
        q = (int(offs[b]) // 1024) * 1024
        want = np.clip(nz[int(clips[b]), q : q + n], -1, 1)
        np.testing.assert_allclose(out[b], want, atol=1e-6, err_msg=f"row {b}")


def test_eval_mode_no_noise(rng):
    cfg = AugmentConfig(method="anchored_slice_or_pad")
    wavs = jnp.asarray(rng.uniform(-0.5, 0.5, (8, 256)).astype(np.float32))
    silent = jnp.asarray([True] + [False] * 7)
    noise = jnp.ones((2, 600), jnp.float32)
    out = np.asarray(
        fused_augment(wavs, silent, jax.random.key(0), cfg, noise, False, interpret=True)
    )
    assert (out[0] == 0).all()
    np.testing.assert_allclose(out[1:], np.asarray(wavs)[1:], atol=1e-6)


def test_fallback_paths(rng):
    cfg = AugmentConfig(method="no_augmentation_audio")
    wavs = jnp.ones((4, 128), jnp.float32)
    silent = jnp.asarray([True, False, False, False])
    out = np.asarray(fused_augment(wavs, silent, jax.random.key(0), cfg, None, True))
    assert (out[0] == 0).all() and (out[1:] == 1).all()


def _gather_fused_case(rng, n, p, batch=16, num_rows=32):
    """Build an int16 [N, p/128, 128] dataset + draws for the v5 kernel."""
    data = np.zeros((num_rows, p), np.int16)
    data[:, :n] = rng.integers(-32768, 32768, (num_rows, n)).astype(np.int16)
    wavs3d = jnp.asarray(data.reshape(num_rows, p // 128, 128))
    idx = jnp.asarray(rng.integers(0, num_rows, batch), jnp.int32)
    silent = jnp.asarray(rng.integers(0, 4, batch) == 0)
    noise = jnp.asarray(rng.normal(size=(3, 3 * n)).astype(np.float32) * 0.1)
    decoded = jnp.asarray(
        data[np.asarray(idx), :n].astype(np.float32) / 32768.0
    )
    return wavs3d, idx, silent, noise, decoded


def test_gather_fused_matches_gather_then_augment(rng):
    """v5 (gather+decode+augment in-kernel) must be bit-exact vs gathering
    the rows and running the v4 kernel with the same key."""
    from tcresnet_tpu.ops.pallas.augment import fused_gather_augment, gather_fusable

    cfg = AugmentConfig(background_frequency=0.8, background_max_volume=0.3)
    n = 2048
    wavs3d, idx, silent, noise, decoded = _gather_fused_case(rng, n, p=n)
    assert gather_fusable(wavs3d, cfg, noise, n)
    key = jax.random.key(42)
    got = np.asarray(
        fused_gather_augment(
            wavs3d, idx, silent, key, cfg, noise, True, n, interpret=True
        )
    )
    want = np.asarray(
        fused_augment(decoded, silent, key, cfg, noise, True, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_gather_fused_padded_rows(rng):
    """Clip length below the pow2 row padding (n=2176 in p=4096 rows)."""
    from tcresnet_tpu.ops.pallas.augment import fused_gather_augment, gather_fusable

    cfg = AugmentConfig(background_frequency=1.0, background_max_volume=0.2)
    n = 2176
    wavs3d, idx, silent, noise, decoded = _gather_fused_case(rng, n, p=4096)
    assert gather_fusable(wavs3d, cfg, noise, n)
    key = jax.random.key(7)
    got = np.asarray(
        fused_gather_augment(
            wavs3d, idx, silent, key, cfg, noise, True, n, interpret=True
        )
    )
    want = np.asarray(
        fused_augment(decoded, silent, key, cfg, noise, True, interpret=True)
    )
    assert got.shape == (16, n)
    np.testing.assert_array_equal(got, want)


def test_augment_gathered_dispatch_fallback(rng):
    """ops.augment.augment_gathered on a non-TPU platform must equal
    decoding the rows and calling the XLA augment path."""
    from tcresnet_tpu.ops import augment as xla_augment

    cfg = AugmentConfig(background_frequency=0.5, background_max_volume=0.1)
    n = 2048
    wavs3d, idx, silent, noise, decoded = _gather_fused_case(rng, n, p=n)
    key = jax.random.key(3)
    got = np.asarray(
        xla_augment.augment_gathered(
            wavs3d, idx, silent, key, cfg, noise, True, n, platform="cpu"
        )
    )
    want = np.asarray(
        xla_augment.augment_batch(decoded, silent, key, cfg, noise, True)
    )
    np.testing.assert_array_equal(got, want)


def test_unknown_method_rejected_on_fused_paths():
    """A typo'd augmentation method must raise everywhere — the fused
    paths used to silently treat it as anchored_slice_or_pad (shift
    dropped), training with wrong augmentation on TPU while CPU raised."""
    import dataclasses

    from tcresnet_tpu.ops.pallas.augment import fused_augment, gather_fusable

    bad = dataclasses.replace(
        AugmentConfig(), method="anchored_slice_or_pad_shift"  # typo
    )
    wavs3d = jnp.zeros((4, 2, 128), jnp.int16)
    noise = jnp.ones((2, 400), jnp.float32)
    assert not gather_fusable(wavs3d, bad, noise, 256)
    with pytest.raises(ValueError, match="Unknown augmentation method"):
        fused_augment(
            jnp.zeros((4, 256), jnp.float32), jnp.zeros((4,), bool),
            jax.random.key(0), bad, noise, True, interpret=True,
        )
