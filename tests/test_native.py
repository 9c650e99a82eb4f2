"""C++ batch decoder: build, parity vs numpy decode, error handling."""

import numpy as np
import pytest

from tcresnet_tpu.data import native_loader
from tcresnet_tpu.data import wav as wavlib


@pytest.fixture(scope="module")
def wav_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths = []
    for i, n in enumerate([16000, 8000, 24000]):  # exact, short, long
        sig = rng.uniform(-0.9, 0.9, n).astype(np.float32)
        p = root / f"{i}.wav"
        wavlib.write_wav_pcm16(p, sig)
        paths.append(str(p))
    return paths


def test_native_lib_builds():
    assert native_loader.available(), "C++ decoder failed to build/load"


def test_decode_batch_matches_numpy(wav_files):
    got = native_loader.decode_batch(wav_files, 16000)
    assert got is not None and got.shape == (3, 16000) and got.dtype == np.int16
    for i, p in enumerate(wav_files):
        want, _ = wavlib.decode_wav_int16(p, 16000)
        np.testing.assert_array_equal(got[i], want)


def test_decode_bad_file_raises(tmp_path, wav_files):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"this is not a wav file at all...")
    with pytest.raises(ValueError, match="failed to decode"):
        native_loader.decode_batch([wav_files[0], str(bad)], 16000)


def test_odd_fmt_chunk_pad_byte(tmp_path):
    """RIFF chunks are 2-aligned: an odd-sized fmt chunk carries a pad
    byte that must be skipped, or every later chunk header is read one
    byte off and the data chunk is never found (Python's chunk.py — the
    numpy oracle — honors the pad)."""
    import struct

    samples = np.arange(-50, 50, dtype=np.int16)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16) + b"\x07"  # 17B
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"\x00"  # pad
        + b"data" + struct.pack("<I", len(data)) + data
    )
    p = tmp_path / "oddfmt.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)

    from tcresnet_tpu.data import wav as wavlib

    oracle, rate = wavlib.decode_wav_int16(str(p), 100)
    assert rate == 16000 and oracle.shape == (100,)
    got = native_loader.decode_batch([str(p)], 100)
    if got is not None:  # native lib available
        np.testing.assert_array_equal(got[0], oracle)


def test_decode_all_propagates_bad_data(tmp_path, wav_files):
    """_decode_all must surface the native decoder's bad-file diagnosis
    instead of swallowing it and re-decoding the split via numpy."""
    from tcresnet_tpu.data.speech_commands import _decode_all

    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"junk" * 8)
    with pytest.raises((ValueError, EOFError)):
        _decode_all([wav_files[0], str(bad)], 16000)


def test_wav_num_samples(wav_files):
    assert native_loader.wav_num_samples(wav_files[0]) == 16000
    assert native_loader.wav_num_samples(wav_files[1]) == 8000
    assert native_loader.wav_num_samples("/nonexistent.wav") is None


def test_stereo_first_channel(tmp_path):
    # hand-build a stereo PCM16 wav; decoder must take channel 0
    import struct, wave

    p = tmp_path / "stereo.wav"
    left = (np.arange(100) * 100).astype(np.int16)
    right = np.full(100, -7, np.int16)
    inter = np.empty(200, np.int16)
    inter[0::2], inter[1::2] = left, right
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(inter.tobytes())
    got = native_loader.decode_batch([str(p)], 100)
    if got is not None:
        np.testing.assert_array_equal(got[0], left)


def test_malformed_wavs_rejected_cleanly(tmp_path):
    """Malformed/truncated/garbage files must come back as per-file error
    statuses (ValueError at the Python boundary), never a crash in the
    ctypes call — a segfault there would kill the training process."""
    if not native_loader.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    blobs = {
        "empty": b"",
        "short": b"RIFF",
        "riff_only": b"RIFF\x00\x00\x00\x00WAVE",
        "huge_fmt": (b"RIFF$\x00\x00\x00WAVEfmt "
                     + (0xFFFFFFF0).to_bytes(4, "little")
                     + b"\x01\x00\x01\x00"),
        "zero_chunks": (b"RIFF" + (100).to_bytes(4, "little") + b"WAVE"
                        + b"junk\x00\x00\x00\x00" * 10),
    }
    for i in range(8):
        blobs[f"rand{i}"] = rng.bytes(int(rng.integers(10, 3000)))
    for name, blob in blobs.items():
        p = tmp_path / f"{name}.wav"
        p.write_bytes(blob)
        with pytest.raises(ValueError):
            native_loader.decode_batch([str(p)], 1000)
