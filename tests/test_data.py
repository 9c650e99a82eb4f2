"""Data-layer tests: wav decode, discovery, silence injection, device sampling."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcresnet_tpu import const
from tcresnet_tpu.data import wav as wavlib
from tcresnet_tpu.data.device_data import DeviceDataset
from tcresnet_tpu.data.speech_commands import (
    discover_labels,
    load_speech_commands,
    oversample,
)
from tcresnet_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def wav_tree(tmp_path_factory):
    """Tiny on-disk GSC-format tree: train/<label>/*.wav + noise dir."""
    root = tmp_path_factory.mktemp("gsc")
    rng = np.random.default_rng(0)
    for label, freq in [("yes", 400), ("no", 800)]:
        for i in range(3):
            t = np.arange(16000) / 16000
            sig = 0.5 * np.sin(2 * np.pi * freq * t + i)
            wavlib.write_wav_pcm16(root / "train" / label / f"{i}.wav", sig)
    # short + long clips to exercise pad/crop
    wavlib.write_wav_pcm16(root / "train" / "yes" / "short.wav", rng.uniform(-0.5, 0.5, 8000))
    wavlib.write_wav_pcm16(root / "train" / "no" / "long.wav", rng.uniform(-0.5, 0.5, 24000))
    # background noise (one long, one too-short that must be dropped)
    noise_dir = root / "train" / const.BACKGROUND_NOISE_DIR_NAME
    wavlib.write_wav_pcm16(noise_dir / "noise1.wav", rng.uniform(-0.3, 0.3, 40000))
    wavlib.write_wav_pcm16(noise_dir / "tiny.wav", rng.uniform(-0.3, 0.3, 1000))
    return root


def test_wav_roundtrip(tmp_path):
    sig = np.sin(np.linspace(0, 20, 16000)).astype(np.float32) * 0.7
    path = tmp_path / "x.wav"
    wavlib.write_wav_pcm16(path, sig, 16000)
    got, rate = wavlib.decode_wav_float32(path)
    assert rate == 16000
    np.testing.assert_allclose(got, sig, atol=1.0 / 32768)


def test_wav_crop_and_pad(tmp_path):
    sig = np.ones(1000, np.float32) * 0.5
    path = tmp_path / "x.wav"
    wavlib.write_wav_pcm16(path, sig)
    cropped, _ = wavlib.decode_wav_int16(path, desired_samples=500)
    assert cropped.shape == (500,)
    padded, _ = wavlib.decode_wav_int16(path, desired_samples=2000)
    assert padded.shape == (2000,)
    assert (padded[1000:] == 0).all()


def test_discovery_and_silence(wav_tree):
    labels = discover_labels(wav_tree / "train")
    assert labels[0] == const.NULL_CLASS_LABEL
    assert labels == (const.NULL_CLASS_LABEL, "no", "yes")

    ds = load_speech_commands(str(wav_tree), "train", num_silent=4)
    # 8 wav files + 4 silent
    assert ds.num_samples == 12
    assert (ds.labels[-4:] == 0).all()
    assert ds.is_silent[-4:].all() and not ds.is_silent[:-4].any()
    assert (ds.wavs[-1] == 0).all()
    assert ds.wavs.dtype == np.int16
    # noise bank: too-short clip dropped
    assert ds.noise_bank is not None and ds.noise_bank.shape[0] == 1


def test_auto_num_silent(wav_tree):
    ds = load_speech_commands(str(wav_tree), "train", num_silent=-1)
    # 8 files // 3 labels = 2 silent samples (audio_data_wrapper.py:164-174)
    assert int(ds.is_silent.sum()) == 2


def test_decode_cache(wav_tree, tmp_path):
    cache = tmp_path / "cache"
    ds1 = load_speech_commands(str(wav_tree), "train", cache_dir=str(cache))
    files = list(cache.glob("*.npy"))
    assert len(files) == 1
    ds2 = load_speech_commands(str(wav_tree), "train", cache_dir=str(cache))
    np.testing.assert_array_equal(np.asarray(ds1.wavs), np.asarray(ds2.wavs))


def test_oversample_balances():
    files = [f"a{i}" for i in range(100)] + ["b0", "b1"]
    labels = [0] * 100 + [1] * 2
    of, ol = oversample(files, labels, oversampling_ratio=0.5)
    counts = {lb: ol.count(lb) for lb in set(ol)}
    # literal reference formula (data_wrapper_base.py:236-246):
    # min_needed = 50; label 0: ratio=int(max(0.5,1)*5+0.5)=5 -> 100*5;
    # label 1: ratio=int(25*5+0.5)=125 -> 2*125
    assert counts[0] == 500
    assert counts[1] == 250
    # relative balance achieved: label 1 is at least min_needed
    assert counts[1] >= 50


def test_device_dataset_sampling():
    host = make_synthetic_dataset(num_samples=64, num_classes=4, desired_samples=800)
    dd = DeviceDataset(host)
    # int16 rows stored pow2-padded as [N, P/128, 128] for the fused
    # gather+augment kernel; decode recovers the exact original samples
    assert dd.clip_len == 800
    assert dd.wavs.shape == (64, 1024 // 128, 128) and dd.wavs.dtype == np.int16
    dec = DeviceDataset.decode_rows(dd.arrays[0], jnp.arange(64), 800)
    np.testing.assert_array_equal(
        np.asarray(dec), host.wavs.astype(np.float32) / 32768.0
    )
    wavs, labels, silent = DeviceDataset.sample_batch(
        dd.arrays, jax.random.key(0), 16, clip_len=800
    )
    assert wavs.shape == (16, 800) and wavs.dtype == np.float32
    assert labels.shape == (16,) and silent.shape == (16,)
    w = np.asarray(wavs)
    assert np.abs(w).max() <= 1.0
    # silence rows must be all zero
    s = np.asarray(silent)
    if s.any():
        assert (w[s] == 0).all()


def test_eval_index_batches_cover_once():
    host = make_synthetic_dataset(num_samples=37, num_classes=3, desired_samples=100)
    dd = DeviceDataset(host)
    seen = []
    for idx, mask in dd.eval_index_batches(batch_size=16):
        assert idx.shape == (16,) and mask.shape == (16,)
        seen.extend(idx[mask].tolist())
    assert sorted(seen) == list(range(37))


def test_synthetic_classes_distinct():
    host = make_synthetic_dataset(num_samples=32, num_classes=4, desired_samples=4000)
    w = host.wavs.astype(np.float32) / 32768
    # tone classes have energy, silence class doesn't
    for i in range(32):
        e = (w[i] ** 2).mean()
        if host.labels[i] == 0:
            assert e < 1e-4
        else:
            assert e > 1e-2


def test_wrong_sample_rate_rejected(tmp_path):
    """expected_rate rejects wrong-rate wavs at decode time: 8 kHz audio
    fed to a 16 kHz-fixed frontend would otherwise silently produce
    wrong time/frequency geometry (numpy path AND native path)."""
    p = tmp_path / "slow.wav"
    wavlib.write_wav_pcm16(p, np.zeros(1000, np.float32), sample_rate=8000)
    with pytest.raises(ValueError, match="8000 != expected 16000"):
        wavlib.decode_wav_int16(p, 1000, expected_rate=16000)
    # unchecked decode still works and reports the true rate
    _, rate = wavlib.decode_wav_int16(p, 1000)
    assert rate == 8000

    from tcresnet_tpu.data import native_loader

    if native_loader.available():
        with pytest.raises(ValueError, match="rc=-4"):
            native_loader.decode_batch([str(p)], 1000, expected_rate=16000)
        assert native_loader.decode_batch([str(p)], 1000) is not None


def test_loader_validates_sample_rate(tmp_path):
    root = tmp_path / "gsc"
    wavlib.write_wav_pcm16(
        root / "train" / "yes" / "a.wav", np.zeros(500, np.float32),
        sample_rate=22050,
    )
    with pytest.raises(ValueError):
        load_speech_commands(
            str(root), "train", 1000, num_silent=0, sample_rate=16000
        )
    # matching rate passes
    ds = load_speech_commands(
        str(root), "train", 1000, num_silent=0, sample_rate=22050
    )
    assert ds.num_samples == 1


def test_noise_bank_from_all_roots(tmp_path):
    """Sub-dataset support: `_background_noise_` is collected from EVERY
    root, like the reference's prepare_silent_data loop over
    dataset_paths (audio_data_wrapper.py:146-162) — including when only
    a LATER root has a noise dir."""
    rng = np.random.default_rng(0)
    sig = rng.uniform(-0.4, 0.4, 3000).astype(np.float32)
    for root in ("a", "b"):
        d = tmp_path / root / "train"
        wavlib.write_wav_pcm16(d / "yes" / "x.wav", sig[:1000])
    wavlib.write_wav_pcm16(
        tmp_path / "a" / "train" / const.BACKGROUND_NOISE_DIR_NAME / "n1.wav",
        sig,
    )
    wavlib.write_wav_pcm16(
        tmp_path / "b" / "train" / const.BACKGROUND_NOISE_DIR_NAME / "n2.wav",
        sig,
    )
    ds = load_speech_commands(
        [tmp_path / "a", tmp_path / "b"], "train", 1000, num_silent=0
    )
    assert ds.noise_bank is not None and ds.noise_bank.shape[0] == 2

    # noise dir ONLY in the second root: must still be found
    ds_b_only = load_speech_commands(
        [tmp_path / "b", tmp_path / "a"], "train", 1000, num_silent=0
    )
    assert ds_b_only.noise_bank is not None


def test_sample_row_distribution():
    """Oversampling's logical->physical map: sample_indices draws over
    the logical axis, so duplicated entries are sampled proportionally
    more often while wav rows stay unique."""
    host = make_synthetic_dataset(num_samples=8, num_classes=2, desired_samples=256)
    # row 0 duplicated 9x: ~9/17 of draws should land on it
    host = type(host)(
        wavs=host.wavs,
        labels=host.labels,
        is_silent=host.is_silent,
        label_names=host.label_names,
        noise_bank=host.noise_bank,
        split=host.split,
        sample_row=np.array([0] * 9 + list(range(8)), np.int32),
    )
    assert host.num_samples == 8 and host.num_logical_samples == 17
    dd = DeviceDataset(host)
    assert dd.sample_row is not None
    idx, labels, silent = DeviceDataset.sample_indices(
        dd.arrays, jax.random.key(0), 4096, sample_row=dd.sample_row
    )
    idx = np.asarray(idx)
    assert idx.min() >= 0 and idx.max() < 8
    frac0 = (idx == 0).mean()
    assert 0.45 < frac0 < 0.61  # expect ~10/17 = 0.588
    # labels/silence follow the PHYSICAL row
    np.testing.assert_array_equal(
        np.asarray(labels), np.asarray(host.labels)[idx]
    )


def test_synthetic_silence_class_guard():
    with pytest.raises(ValueError, match="silence_class"):
        make_synthetic_dataset(num_samples=8, silence_class=3)


def test_decode_cache_atomic_write(wav_tree, tmp_path):
    """Cache writes go through a tmp file + rename; no tmp litter on
    success and the final file loads."""
    cache = tmp_path / "cache"
    load_speech_commands(str(wav_tree), "train", cache_dir=str(cache))
    assert not list(cache.glob("*.tmp.npy"))
    assert len(list(cache.glob("*.npy"))) == 1
