"""Speech Commands dataset discovery + host decode cache.

Reference behaviors reproduced (datasets/data_wrapper_base.py and
audio_data_wrapper.py):
  - label discovery: sorted label dirs, `_`-prefixed skipped, `__null__`
    prepended at index 0 (data_wrapper_base.py:114-145);
  - per-split file/label listing in label-major order (:147-191);
  - silence injection: `num_silent` empty samples labeled `__null__`
    (auto = num_samples // num_labels) (audio_data_wrapper.py:164-174);
  - background-noise bank loaded whole from `_background_noise_` of
    EVERY sub-dataset root (audio_data_wrapper.py:146-162 iterates
    dataset_paths);
  - optional oversampling by label (data_wrapper_base.py:219-248).

TPU-first difference: instead of a filename-based tf.data pipeline, all
wavs are decoded ONCE into an int16 cache array [N, desired_samples]
(memmap-backed on disk) that is then uploaded to HBM; see device_data.py.
Oversampling therefore duplicates no wav rows: each unique file is
decoded/cached/uploaded once and the duplication lives in `sample_row`,
a logical->physical index vector the train sampler draws through (the
reference duplicated filename list entries; the sampled distribution is
identical).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from tcresnet_tpu import const
from tcresnet_tpu.data import wav as wavlib
from tcresnet_tpu.utils import get_logger

log = get_logger("data")


@dataclass
class HostDataset:
    """Decoded, host-resident split: everything device_data needs."""

    wavs: np.ndarray  # [N, S] int16 (silence rows all-zero)
    labels: np.ndarray  # [N] int32
    is_silent: np.ndarray  # [N] bool
    label_names: Tuple[str, ...]
    noise_bank: Optional[np.ndarray]  # [K, L] float32 in [-1,1), or None
    split: str = ""
    # Logical->physical row map from oversampling: [M] int32 with M >= N,
    # or None (identity). Train sampling draws uniformly over the LOGICAL
    # axis; eval always visits each physical row exactly once.
    sample_row: Optional[np.ndarray] = None

    @property
    def num_samples(self) -> int:
        """Physical (unique) row count — the eval universe."""
        return int(self.wavs.shape[0])

    @property
    def num_logical_samples(self) -> int:
        """Sampling-universe size: inflated by oversampling duplicates."""
        if self.sample_row is not None:
            return int(self.sample_row.shape[0])
        return self.num_samples

    @property
    def num_classes(self) -> int:
        return len(self.label_names)


def discover_labels(split_dir: Path, add_null_class: bool = True) -> Tuple[str, ...]:
    """Sorted label dirs, `_`-prefixed skipped, null class at index 0."""
    names: List[str] = []
    if add_null_class:
        names.append(const.NULL_CLASS_LABEL)
    for p in sorted(split_dir.glob("*")):
        if p.is_dir() and not p.name.startswith("_"):
            names.append(p.name)
    if not names:
        raise FileNotFoundError(f"No label directories under {split_dir}")
    return tuple(names)


def list_files(
    split_dir: Path, label_names: Sequence[str]
) -> Tuple[List[str], List[int]]:
    """Label-major (filename, label-idx) listing; null class has no files."""
    filenames, labels = [], []
    for idx, name in enumerate(label_names):
        label_dir = split_dir / name
        if not label_dir.is_dir():
            continue
        for f in sorted(label_dir.glob("*.wav")):
            filenames.append(str(f))
            labels.append(idx)
    if not filenames:
        raise FileNotFoundError(f"No wav files under {split_dir}")
    return filenames, labels


def oversample(
    filenames: List[str], labels: List[int], oversampling_ratio: float
) -> Tuple[List[str], List[int]]:
    """Label-balancing oversampling, literal reference semantics
    (data_wrapper_base.py:219-248).

    ratio = int(max(min_needed/count, 1.0) * 5 + 0.5) and each label's
    samples are appended (ratio - 1) extra times, i.e. the label ends up
    with count * ratio entries. NOTE the reference's n=5 "approximation"
    scale is applied to the repetition count itself, so even balanced
    labels are inflated ~5x (ratio = 5 whenever min_needed <= count).
    This quirk is reproduced verbatim; the feature is off by default.
    """
    by_label = defaultdict(list)
    for fn, lb in zip(filenames, labels):
        by_label[lb].append(fn)
    counts = {lb: len(v) for lb, v in by_label.items()}
    max_count = max(counts.values())
    min_needed = int(max_count * oversampling_ratio)
    out_f, out_l = list(filenames), list(labels)
    n = 5
    for lb, cnt in sorted(counts.items()):
        ratio = int(max(min_needed / cnt, 1.0) * n + 0.5)
        log.info(f"oversampling label {lb}: {cnt} x {ratio} => {cnt * ratio}")
        for _ in range(ratio - 1):
            out_f.extend(by_label[lb])
            out_l.extend(lb for _ in range(cnt))
    return out_f, out_l


def _decode_all(
    filenames: Sequence[str],
    desired_samples: int,
    expected_rate: Optional[int] = None,
) -> np.ndarray:
    """Decode wavs to an int16 matrix, preferring the C++ batch decoder.

    `expected_rate` (when given) rejects files whose header sample rate
    differs — a wrong-rate wav would otherwise silently produce features
    with the wrong time/frequency geometry.
    """
    try:
        from tcresnet_tpu.data import native_loader

        arr = native_loader.decode_batch(
            filenames, desired_samples, expected_rate=expected_rate or 0
        )
        if arr is not None:
            return arr
    except ValueError:
        # bad DATA (decode_batch names the undecodable files): fail
        # loudly with that diagnosis instead of silently re-decoding the
        # whole split through the slow numpy path only to fail again
        raise
    except Exception:  # pragma: no cover - native lib unavailable/broken
        pass
    out = np.zeros((len(filenames), desired_samples), np.int16)
    for i, fn in enumerate(filenames):
        out[i], _ = wavlib.decode_wav_int16(
            fn, desired_samples, expected_rate=expected_rate
        )
    return out


def _cache_key(filenames: Sequence[str], desired_samples: int) -> str:
    """Cache key over names AND file stat (size + mtime), so re-recorded
    wavs invalidate the decode cache instead of serving stale features."""
    import os

    h = hashlib.sha256()
    h.update(str(desired_samples).encode())
    stats = {}
    for fn in filenames:
        if fn not in stats:
            try:
                st = os.stat(fn)
                stats[fn] = f"{st.st_size}:{st.st_mtime_ns}"
            except OSError:
                stats[fn] = "?"
        h.update(fn.encode())
        h.update(stats[fn].encode())
    return h.hexdigest()[:16]


def load_noise_bank(
    split_dirs, min_len: int, expected_rate: Optional[int] = None
) -> Optional[np.ndarray]:
    """Load `_background_noise_` wavs into a padded [K, L] float32 bank.

    `split_dirs` is one split directory or a list of them: noise is
    collected from EVERY sub-dataset root, like the reference's
    prepare_silent_data loop over dataset_paths
    (audio_data_wrapper.py:146-162).

    Clips shorter than `min_len` are dropped (a crop of desired length
    must exist, matching tf.random_crop's requirement); clips are
    right-padded to the longest remaining clip. Padding with zeros
    slightly biases crops near the end of shorter clips toward silence —
    an accepted deviation documented here (the reference keeps ragged
    clips as separate graph constants, augmentation_factory.py:62-67).
    """
    if isinstance(split_dirs, (str, Path)):
        split_dirs = [split_dirs]
    clips = []
    for split_dir in split_dirs:
        noise_dir = Path(split_dir) / const.BACKGROUND_NOISE_DIR_NAME
        if not noise_dir.is_dir():
            continue
        for f in sorted(noise_dir.glob("*.wav")):
            samples, _ = wavlib.decode_wav_float32(
                f, expected_rate=expected_rate
            )
            if samples.shape[0] >= min_len:
                clips.append(samples)
    if not clips:
        return None
    max_len = max(c.shape[0] for c in clips)
    bank = np.zeros((len(clips), max_len), np.float32)
    for i, c in enumerate(clips):
        bank[i, : c.shape[0]] = c
    log.info(f"{len(clips)} background noise clips loaded (bank {bank.shape})")
    return bank


def load_speech_commands(
    dataset_root,
    split: str,
    desired_samples: int = 16000,
    num_silent: int = -1,
    cache_dir: Optional[str] = None,
    add_null_class: bool = True,
    oversampling_ratio: Optional[float] = None,
    sample_rate: Optional[int] = None,
) -> HostDataset:
    """Load one split of a `<root>/<split>/<label>/*.wav` tree.

    `dataset_root` may be a single root or a list of roots (sub-dataset
    support, reference --has_sub_dataset: data_wrapper_base.py:108-112 —
    label sets must agree across roots, :140). Decode results are cached
    as `<cache_dir>/<split>-<hash>.npy` so subsequent runs start
    instantly. `sample_rate` (when given) validates every wav header at
    decode time — wrong-rate audio fails loudly instead of silently
    producing wrong feature geometry.
    """
    roots = (
        [dataset_root]
        if isinstance(dataset_root, (str, Path))
        else list(dataset_root)
    )
    split_dirs = [Path(r) / split for r in roots]
    label_sets = [discover_labels(d, add_null_class) for d in split_dirs]
    if len(set(label_sets)) != 1:
        raise ValueError(f"Different labels across sub-datasets: {label_sets}")
    label_names = label_sets[0]
    filenames, labels = [], []
    for d in split_dirs:
        f, l = list_files(d, label_names)
        filenames.extend(f)
        labels.extend(l)
    # None AND 0/0.0 both mean "off" (DataConfig documents 0 = off; a
    # literal ratio of 0 would otherwise inflate every label x5 through
    # oversample()'s max(ratio, 1.0) floor). Oversampling duplicates
    # INDEX entries, not wav rows: unique files are decoded/cached/
    # uploaded once and the duplication lives in sample_row.
    sample_row = None
    if oversampling_ratio:
        sample_idx, _ = oversample(
            list(range(len(filenames))), labels, oversampling_ratio
        )
        sample_row = np.asarray(sample_idx, np.int32)
    n_logical = len(sample_row) if sample_row is not None else len(filenames)

    wavs = None
    if cache_dir:
        key = _cache_key(filenames, desired_samples)
        cache_path = Path(cache_dir) / f"{split}-{key}.npy"
        if cache_path.exists():
            wavs = np.load(cache_path, mmap_mode="r")
            log.info(f"Loaded decode cache {cache_path}")
    if wavs is None:
        wavs = _decode_all(filenames, desired_samples, sample_rate)
        if cache_dir:
            Path(cache_dir).mkdir(parents=True, exist_ok=True)
            # atomic write: a process killed mid-np.save must not leave
            # a truncated file at the final keyed path (the key match
            # would trust it on the next run)
            tmp_path = cache_path.parent / (cache_path.name + ".tmp.npy")
            np.save(tmp_path, wavs)
            tmp_path.replace(cache_path)
            log.info(f"Wrote decode cache {cache_path}")

    wavs = np.asarray(wavs)
    labels = np.asarray(labels, np.int32)
    is_silent = np.zeros(len(labels), bool)

    # Silence injection (audio_data_wrapper.py:164-174). Auto count uses
    # the LOGICAL (post-oversampling) sample count, like the reference's
    # num_samples // num_labels after list inflation.
    if add_null_class:
        if num_silent < 0:
            num_silent = n_logical // len(label_names)
        if num_silent > 0:
            null_idx = label_names.index(const.NULL_CLASS_LABEL)
            n_physical = wavs.shape[0]
            wavs = np.concatenate(
                [wavs, np.zeros((num_silent, desired_samples), np.int16)]
            )
            labels = np.concatenate(
                [labels, np.full(num_silent, null_idx, np.int32)]
            )
            is_silent = np.concatenate([is_silent, np.ones(num_silent, bool)])
            if sample_row is not None:
                sample_row = np.concatenate([
                    sample_row,
                    np.arange(
                        n_physical, n_physical + num_silent, dtype=np.int32
                    ),
                ])
            log.info(f"{num_silent} silent samples added")

    noise_bank = load_noise_bank(split_dirs, desired_samples, sample_rate)
    log.info(
        f"split={split}: {len(labels)} samples, {len(label_names)} classes"
    )
    return HostDataset(
        wavs=wavs,
        labels=labels,
        is_silent=is_silent,
        label_names=label_names,
        noise_bank=noise_bank,
        split=split,
        sample_row=sample_row,
    )
