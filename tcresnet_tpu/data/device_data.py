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


class DeviceDataset:
    """Device-resident split with in-jit batch sampling."""

    def __init__(self, host: HostDataset, mesh: Optional[Mesh] = None):
        self.label_names = host.label_names
        self.num_samples = host.num_samples
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

        self.wavs = put(host.wavs)  # [N, S] int16
        self.labels = put(host.labels)  # [N] int32
        self.is_silent = put(host.is_silent)  # [N] bool
        self.noise_bank = (
            put(host.noise_bank) if host.noise_bank is not None else None
        )

    # -- functional accessors used inside jitted steps ---------------------

    @property
    def arrays(self) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        return self.wavs, self.labels, self.is_silent

    @staticmethod
    def sample_batch(
        arrays: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        key: jax.Array,
        batch_size: int,
        mesh: Optional[Mesh] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Draw a uniform-with-replacement batch ON DEVICE.

        Returns (wavs[B,S] float32 in [-1,1), labels[B] int32,
        is_silent[B] bool). Pure function — call inside jit.
        """
        wavs, labels, is_silent = arrays
        n = wavs.shape[0]
        idx = jax.random.randint(key, (batch_size,), 0, n)
        batch = (
            wavs[idx].astype(jnp.float32) * (1.0 / 32768.0),
            labels[idx],
            is_silent[idx],
        )
        if mesh is not None:
            batch = meshlib.shard_batch(mesh, batch)
        return batch

    @staticmethod
    def gather_batch(
        arrays: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        idx: jnp.ndarray,
        mesh: Optional[Mesh] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Gather an explicit index batch (deterministic eval)."""
        wavs, labels, is_silent = arrays
        batch = (
            wavs[idx].astype(jnp.float32) * (1.0 / 32768.0),
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
