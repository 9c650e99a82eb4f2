"""Tests for device-side augmentation distributions and semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcresnet_tpu.config import AugmentConfig
from tcresnet_tpu.ops import augment


def test_dynamic_window_rows_exact(rng):
    """The sublane-gather + carry-matmul window read is exact."""
    batch, total, out_len = 16, 512, 256
    x = jnp.asarray(rng.uniform(-1, 1, (batch, total)).astype(np.float32))
    starts = jnp.asarray(rng.integers(0, total - out_len + 1, batch), jnp.int32)
    got = np.asarray(augment.dynamic_window_rows(x, starts, out_len))
    xn = np.asarray(x)
    for b in range(batch):
        np.testing.assert_allclose(
            got[b],
            xn[b, int(starts[b]) : int(starts[b]) + out_len],
            rtol=0,
            atol=1e-6,
        )


def test_time_shift_matches_reference_semantics(rng):
    """Cross-check vs an independent pad+slice oracle (the reference's
    _shift_audio semantics) for known shifts."""
    wavs = jnp.asarray(rng.uniform(-1, 1, (8, 1000)).astype(np.float32))
    # monkeypatch randint to fixed shifts
    shifts = np.asarray([0, 1, -1, 99, -99, 50, -50, 7])
    orig = jax.random.randint
    try:
        jax.random.randint = lambda *a, **k: jnp.asarray(shifts, jnp.int32)
        out = np.asarray(augment.time_shift(wavs, jax.random.key(0), 0.1))
    finally:
        jax.random.randint = orig
    w = np.asarray(wavs)
    for b, s in enumerate(shifts):
        want = np.zeros(1000, np.float32)
        if s >= 0:
            want[s:] = w[b, : 1000 - s]
        else:
            want[: 1000 + s] = w[b, -s:]
        np.testing.assert_allclose(out[b], want, atol=1e-6, err_msg=f"shift {s}")


def test_time_shift_pads_with_zeros(rng):
    wavs = jnp.asarray(rng.uniform(0.5, 1.0, size=(64, 1000)).astype(np.float32))
    out = np.asarray(augment.time_shift(wavs, jax.random.key(0), 0.1))
    assert out.shape == wavs.shape
    # Each row: a contiguous zero block at one end, values elsewhere.
    for row in out[:8]:
        zeros = row == 0
        n0 = zeros.sum()
        assert n0 <= 100  # |shift| <= 1000*0.1 (minval inclusive)
        if n0:
            assert zeros[:n0].all() or zeros[-n0:].all()
    # Energy preserved up to the dropped samples.
    assert np.abs(out).sum() <= np.abs(np.asarray(wavs)).sum()


def test_time_shift_distribution():
    wavs = jnp.ones((4096, 100), jnp.float32)
    out = np.asarray(augment.time_shift(wavs, jax.random.key(1), 0.1))
    shifts = (out == 0).sum(axis=1)  # |shift| per row
    assert shifts.max() <= 10
    # uniform over [-10, 10): mean |shift| ~ 5
    assert 4.0 < shifts.mean() < 6.0


def test_mix_background_training_stats():
    batch, n = 8192, 100
    wavs = jnp.zeros((batch, n), jnp.float32)
    silent = jnp.zeros((batch,), bool)
    noise = jnp.ones((3, 400), jnp.float32)
    out = np.asarray(
        augment.mix_background(
            wavs, silent, noise, jax.random.key(2),
            background_frequency=0.8, background_max_volume=0.1, is_training=True,
        )
    )
    vols = out[:, 0]
    frac_mixed = (vols > 0).mean()
    assert 0.75 < frac_mixed < 0.85  # ~background_frequency
    assert vols.max() <= 0.1 + 1e-6
    mixed = vols[vols > 0]
    assert 0.04 < mixed.mean() < 0.06  # U[0, 0.1) mean ~0.05


def test_background_mix_version2_stats():
    """v2 (augmentation_factory.py:81-95): silence rows mixed at U[0,1)
    even at eval; non-silence rows behave as naive."""
    batch = 8192
    silent = jnp.asarray(np.arange(batch) % 2 == 0)
    cfg = AugmentConfig(
        background_frequency=0.8, background_max_volume=0.1,
        naive_background_mix=False,
    )
    vols = np.asarray(
        augment.draw_background_volumes(jax.random.key(5), silent, cfg, True)
    )
    s = np.asarray(silent)
    # silence rows: U[0,1) -> mean ~0.5, max near 1
    assert 0.47 < vols[s].mean() < 0.53
    assert vols[s].max() > 0.99
    # non-silence rows: naive stats
    fore = vols[~s]
    assert 0.75 < (fore > 0).mean() < 0.85
    assert fore.max() <= 0.1 + 1e-6

    # eval: silence rows STILL mixed, non-silence rows zero
    vols_eval = np.asarray(
        augment.draw_background_volumes(jax.random.key(6), silent, cfg, False)
    )
    assert 0.45 < vols_eval[s].mean() < 0.55
    assert (vols_eval[~s] == 0).all()

    # naive config: eval volumes all zero regardless of silence
    naive = AugmentConfig(background_frequency=0.8, background_max_volume=0.1)
    vols_naive = np.asarray(
        augment.draw_background_volumes(jax.random.key(7), silent, naive, False)
    )
    assert (vols_naive == 0).all()


def test_version2_end_to_end_silence_rows_get_noise():
    """Through augment_batch, v2 silence rows contain scaled noise."""
    batch, n = 64, 256
    wavs = jnp.ones((batch, n), jnp.float32) * 0.5
    silent = jnp.asarray([True] * 32 + [False] * 32)
    noise = jnp.ones((2, 3 * n), jnp.float32)
    cfg = AugmentConfig(
        method="anchored_slice_or_pad", background_frequency=0.8,
        background_max_volume=0.1, naive_background_mix=False,
    )
    out = np.asarray(
        augment.augment_batch(wavs, silent, jax.random.key(8), cfg, noise, True)
    )
    # silence rows = volume * 1.0 noise, mostly nonzero and up to ~1
    sil = out[:32]
    assert (np.abs(sil).max(axis=1) > 0).mean() > 0.9
    assert sil.max() > 0.8
    # non-silence rows keep the 0.5 foreground plus <=0.1 noise
    fore = out[32:]
    assert fore.min() >= 0.5 - 1e-6 and fore.max() <= 0.6 + 1e-6


def test_mix_background_eval_is_identity():
    wavs = jnp.asarray(np.random.default_rng(0).normal(size=(16, 100)).astype(np.float32))
    wavs = jnp.clip(wavs, -1, 1)
    silent = jnp.zeros((16,), bool)
    noise = jnp.ones((2, 200), jnp.float32)
    out = augment.mix_background(
        wavs, silent, noise, jax.random.key(3),
        background_frequency=0.0, background_max_volume=0.1, is_training=False,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(wavs), atol=1e-7)


def test_silence_rows_are_zero_foreground():
    wavs = jnp.ones((4, 100), jnp.float32)
    silent = jnp.asarray([True, False, True, False])
    cfg = AugmentConfig(method="anchored_slice_or_pad", background_frequency=0.0)
    out = np.asarray(
        augment.augment_batch(wavs, silent, jax.random.key(4), cfg, None, True)
    )
    assert (out[0] == 0).all() and (out[2] == 0).all()
    assert (out[1] == 1).all() and (out[3] == 1).all()


def test_augment_batch_is_jittable():
    cfg = AugmentConfig()
    noise = jnp.ones((2, 200), jnp.float32)

    @jax.jit
    def fn(w, s, k):
        return augment.augment_batch(w, s, k, cfg, noise, True)

    out = fn(jnp.ones((8, 100)), jnp.zeros((8,), bool), jax.random.key(5))
    assert out.shape == (8, 100)
    assert np.isfinite(np.asarray(out)).all()


def test_clipping():
    wavs = jnp.ones((256, 50), jnp.float32)  # already at +1
    silent = jnp.zeros((256,), bool)
    noise = jnp.ones((1, 100), jnp.float32)
    out = np.asarray(
        augment.mix_background(
            wavs, silent, noise, jax.random.key(6),
            background_frequency=1.0, background_max_volume=1.0, is_training=True,
        )
    )
    assert out.max() <= 1.0


def test_short_noise_bank_rejected():
    """Noise clips shorter than the wav length cannot yield a valid crop
    (tf.random_crop requirement); the empty-range randint would silently
    produce non-random crops, so mix_background fails loudly — through
    every entry point (XLA direct, augment_batch, fused_augment's
    fallback)."""
    wavs = jnp.ones((4, 300), jnp.float32)
    silent = jnp.zeros((4,), bool)
    short = jnp.ones((2, 200), jnp.float32)  # 200 < 300
    with pytest.raises(ValueError, match="shorter than wavs"):
        augment.mix_background(
            wavs, silent, short, jax.random.key(0),
            background_frequency=0.5, background_max_volume=0.1,
            is_training=True,
        )
    cfg = AugmentConfig(method="anchored_slice_or_pad")
    with pytest.raises(ValueError, match="shorter than wavs"):
        augment.augment_batch(wavs, silent, jax.random.key(0), cfg, short, True)

    from tcresnet_tpu.ops.pallas.augment import fused_augment

    # lane-aligned n so only the bank-length guard forces the fallback
    wavs128 = jnp.ones((4, 256), jnp.float32)
    with pytest.raises(ValueError, match="shorter than wavs"):
        fused_augment(
            wavs128, silent, jax.random.key(0), cfg,
            jnp.ones((2, 200), jnp.float32), True, interpret=True,
        )
