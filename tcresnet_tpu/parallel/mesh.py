"""Device-mesh construction and canonical shardings.

The reference is strictly single-device (const.py:4-7 pins one GPU;
SURVEY.md 2.10). The rebuild scales over a jax.sharding.Mesh with axes:

  data  — batch (DP) axis; gradients are all-reduced over ICI by XLA
          (the psum is emitted automatically from the jit shardings).
  model — reserved tensor-parallel axis, size 1 by default: these models
          are <=500k params so TP is a no-op capability axis, present so
          the API supports it (SURVEY.md 2.10 table).

All state (params/opt/batch-stats) is replicated; batches are sharded on
`data`. The full dataset is also replicated in HBM (GSC v1 is ~0.8 GB as
int16) so per-step gathers are communication-free.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tcresnet_tpu.config import MeshConfig


def make_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a (data, model) mesh over `devices` (default: all)."""
    cfg = cfg or MeshConfig()
    if devices is None:
        # honor an explicit jax_default_device pin: a registered
        # higher-priority plugin (the axon TPU tunnel registers itself
        # regardless of JAX_PLATFORMS) must not leak into a mesh built
        # for a process whose computation was pinned elsewhere — CLI
        # tests pin CPU but jax.devices() would still lead with the TPU
        if jax.config.jax_default_device is not None:
            from tcresnet_tpu.utils.platform import default_platform

            devices = jax.devices(default_platform())
        else:
            devices = jax.devices()
    devices = list(devices)
    model = max(cfg.model, 1)
    if cfg.data > 0:
        # explicit (data, model): truncate to exactly data*model devices
        # — divisibility of the FULL device count is irrelevant here
        # (e.g. data=2, model=3 on 8 devices is a legal 2x3 mesh over 6)
        data = cfg.data
        if data * model > len(devices):
            raise ValueError(
                f"mesh ({data=}, {model=}) needs {data * model} devices, "
                f"have {len(devices)}"
            )
        devices = devices[: data * model]
    else:
        if len(devices) % model != 0:
            raise ValueError(
                f"model axis {model} does not divide device count "
                f"{len(devices)}"
            )
        data = len(devices) // model
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x):
    """Constrain a batch pytree to data-axis sharding inside jit."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data"))
    )


def maybe_shard_map(fn, mesh, in_specs, batch: int, tile: int = 1,
                    out_specs=P("data")):
    """shard_map `fn` over the data axis, or None when not applicable.

    Single home for the kernel-sharding policy every Pallas wrapper
    shares (a pallas_call is a custom call the SPMD partitioner cannot
    split under plain jit — on a real multi-chip mesh it would force
    replication, so kernels run per-shard on local shapes): requires a
    >1-device mesh and a batch that divides into data-axis shards of
    whole `tile`-row blocks. Returns the wrapped fn, or None — the
    caller falls back to the single-device call.
    """
    if mesh is None or mesh.devices.size <= 1:
        return None
    if batch % (mesh.shape["data"] * max(tile, 1)) != 0:
        return None
    from jax import shard_map

    return shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
