"""Host-side WAV decoding (PCM16), numpy implementation.

TPU-native replacement for the reference's in-graph C++
`contrib_audio.decode_wav` (/root/reference/datasets/augmentation_factory.py:146-158):
wav decode happens once at cache-build time on the host, the decoded
int16 samples then live in HBM for the whole run (SURVEY.md 2.9.2).

Semantics matched:
  - PCM16 samples normalized to [-1, 1) by /32768 (decode_wav behavior);
    we defer the normalization to the device (int16 storage, float32
    scale-on-gather) to halve HBM/memory traffic.
  - desired_samples: crop or zero-pad to the requested length.
  - desired_channels=1: first channel taken.

A C++ batch decoder (csrc/) accelerates cache builds; this numpy path is
the always-available fallback and the correctness oracle.
"""

from __future__ import annotations

import wave
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def decode_wav_int16(
    path, desired_samples: Optional[int] = None,
    expected_rate: Optional[int] = None,
) -> Tuple[np.ndarray, int]:
    """Decode a PCM16 WAV file to int16 samples (first channel).

    Returns (samples[int16], sample_rate). Crops or zero-pads to
    `desired_samples` when given (decode_wav's desired_samples semantics).
    `expected_rate` (when given) rejects files whose header rate differs:
    wrong-rate audio fed to a fixed-rate frontend silently yields wrong
    time/frequency geometry, so it must fail at decode time.
    """
    with wave.open(str(path), "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        rate = w.getframerate()
        n_frames = w.getnframes()
        if sampwidth != 2:
            raise ValueError(f"{path}: only PCM16 wavs supported, got width {sampwidth}")
        if expected_rate is not None and rate != expected_rate:
            raise ValueError(
                f"{path}: sample rate {rate} != expected {expected_rate}"
            )
        raw = w.readframes(n_frames)

    samples = np.frombuffer(raw, dtype="<i2")
    if n_channels > 1:
        samples = samples[::n_channels]

    if desired_samples is not None and desired_samples >= 0:
        if samples.shape[0] >= desired_samples:
            samples = samples[:desired_samples]
        else:
            samples = np.pad(samples, (0, desired_samples - samples.shape[0]))
    return np.ascontiguousarray(samples), rate


def decode_wav_float32(
    path, desired_samples: Optional[int] = None,
    expected_rate: Optional[int] = None,
) -> Tuple[np.ndarray, int]:
    """decode_wav parity: float32 in [-1, 1) via /32768."""
    samples, rate = decode_wav_int16(path, desired_samples, expected_rate)
    return samples.astype(np.float32) / 32768.0, rate


def write_wav_pcm16(path, samples: np.ndarray, sample_rate: int = 16000) -> None:
    """Write mono PCM16 WAV (test fixtures / synthetic data)."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        samples = np.clip(samples, -1.0, 1.0 - 1.0 / 32768)
        samples = (samples * 32768.0).astype(np.int16)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
