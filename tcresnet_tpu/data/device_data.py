"""HBM-resident datasets: the TPU-native replacement for tf.data.

The reference streamed filenames through a threaded tf.data pipeline
(datasets/data_wrapper_base.py:59-100); here the entire decoded split is
uploaded to HBM once as int16 (GSC v1 train incl. silence: ~0.8 GB) and
every train step gathers its batch ON DEVICE from a jax.random index draw
— the steady-state input pipeline costs zero host work and zero
host->device transfers (SURVEY.md 7.1 throughput plan).

Sampling semantics: uniform with replacement per step, which matches the
reference's shuffle(num_samples).repeat(-1) stream statistically
(documented deviation: no epoch boundaries; LR boundaries are in steps).
Eval streams are deterministic index ranges with a pad+mask final batch
so every sample is evaluated exactly once (deviation from the reference's
split-size-dividing batch sizes, SURVEY.md 7.4.7).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tcresnet_tpu.data.speech_commands import HostDataset
from tcresnet_tpu.parallel import mesh as meshlib


def _next_pow2(x: int) -> int:
    from tcresnet_tpu.utils import next_pow2

    return next_pow2(x, floor=128)  # minimum one lane row; shared law


class DeviceDataset:
    """Device-resident split with in-jit batch sampling.

    Wavs are stored as [N, P/128, 128] int16 with P = next power of two
    >= the clip length: the layout the fused gather+augment kernel
    (ops/pallas/augment.fused_gather_augment) DMAs rows from directly, so
    a train batch is never materialized as a separate array. `clip_len`
    records the true sample count; trailing P-clip_len samples are zero.
    """

    def __init__(self, host: HostDataset, mesh: Optional[Mesh] = None):
        self.label_names = host.label_names
        self.num_samples = host.num_samples
        self.num_logical_samples = host.num_logical_samples
        self.num_classes = host.num_classes
        self.split = host.split
        self.mesh = mesh

        if mesh is not None:
            # device_put the HOST numpy array directly with the target
            # sharding — materializing via jnp.asarray first would place
            # it on the process default device, which may be a different
            # platform than the mesh (e.g. a registered TPU plugin while
            # building a CPU mesh).
            repl = meshlib.replicated_sharding(mesh)
            put = lambda x: jax.device_put(np.asarray(x), repl)  # noqa: E731
        else:
            put = jnp.asarray

        n, self.clip_len = host.wavs.shape[0], host.wavs.shape[1]
        p = _next_pow2(self.clip_len)
        padded = np.zeros((n, p), np.int16)
        padded[:, : self.clip_len] = host.wavs
        self.wavs = put(padded.reshape(n, p // 128, 128))  # [N, P/128, 128] int16
        self.labels = put(host.labels)  # [N] int32
        self.is_silent = put(host.is_silent)  # [N] bool
        self.noise_bank = (
            put(host.noise_bank) if host.noise_bank is not None else None
        )
        # logical->physical oversampling map ([M] int32, or None): the
        # train sampler draws uniformly over M and maps through it, so
        # duplicated samples cost no extra HBM (speech_commands.py).
        self.sample_row = (
            put(host.sample_row) if host.sample_row is not None else None
        )

    # -- functional accessors used inside jitted steps ---------------------

    @property
    def arrays(self) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        return self.wavs, self.labels, self.is_silent

    @staticmethod
    def decode_rows(
        wavs3d: jnp.ndarray, idx: jnp.ndarray, clip_len: Optional[int] = None
    ) -> jnp.ndarray:
        """[N, P/128, 128] int16 rows -> [B, clip_len] float32 in [-1, 1)."""
        rows = wavs3d[idx]
        p = rows.shape[1] * rows.shape[2]
        flat = rows.reshape(rows.shape[0], p)
        if clip_len is not None and clip_len != p:
            flat = flat[:, :clip_len]
        return flat.astype(jnp.float32) * (1.0 / 32768.0)

    @staticmethod
    def sample_indices(
        arrays: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        key: jax.Array,
        batch_size: int,
        mesh: Optional[Mesh] = None,
        sample_row: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Draw uniform-with-replacement batch INDICES on device.

        Returns (idx[B] int32, labels[B] int32, is_silent[B] bool) —
        wav rows stay in the HBM dataset; the fused gather+augment kernel
        reads them directly by index. With `sample_row` (oversampling),
        the draw is uniform over the LOGICAL axis and mapped to physical
        rows, reproducing the reference's duplicated-list distribution
        without duplicating data. Pure function — call inside jit.
        """
        wavs, labels, is_silent = arrays
        if sample_row is not None:
            li = jax.random.randint(key, (batch_size,), 0, sample_row.shape[0])
            idx = sample_row[li]
        else:
            idx = jax.random.randint(key, (batch_size,), 0, wavs.shape[0])
        batch = (idx, labels[idx], is_silent[idx])
        if mesh is not None:
            batch = meshlib.shard_batch(mesh, batch)
        return batch

    @staticmethod
    def sample_batch(
        arrays: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        key: jax.Array,
        batch_size: int,
        mesh: Optional[Mesh] = None,
        clip_len: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Draw a uniform-with-replacement batch ON DEVICE.

        Returns (wavs[B,clip_len] float32 in [-1,1), labels[B] int32,
        is_silent[B] bool). Pure function — call inside jit. Prefer
        sample_indices + the fused gather+augment kernel on TPU; this
        materializes the decoded batch.
        """
        idx, lab, sil = DeviceDataset.sample_indices(
            arrays, key, batch_size, mesh
        )
        return DeviceDataset.decode_rows(arrays[0], idx, clip_len), lab, sil

    @staticmethod
    def gather_batch(
        arrays: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        idx: jnp.ndarray,
        mesh: Optional[Mesh] = None,
        clip_len: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Gather an explicit index batch (deterministic eval)."""
        wavs, labels, is_silent = arrays
        batch = (
            DeviceDataset.decode_rows(wavs, idx, clip_len),
            labels[idx],
            is_silent[idx],
        )
        if mesh is not None:
            batch = meshlib.shard_batch(mesh, batch)
        return batch

    # -- deterministic eval iteration --------------------------------------

    def eval_index_batches(
        self, batch_size: int
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (indices[B], valid_mask[B]) covering each sample once.

        The final batch is padded by repeating index 0 with mask False;
        metric aggregation must honor the mask.
        """
        n = self.num_samples
        for start in range(0, n, batch_size):
            stop = min(start + batch_size, n)
            idx = np.arange(start, start + batch_size)
            mask = idx < stop
            idx = np.where(mask, np.minimum(idx, n - 1), 0)
            yield idx.astype(np.int32), mask
