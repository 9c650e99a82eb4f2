"""Fused Pallas MFCC kernel: wav -> MFCC entirely in VMEM.

The BASELINE.json north star: the reference's multi-op C++ front end
(contrib_audio.audio_spectrogram/mfcc + tf.signal stft/mel/DCT,
/root/reference/datasets/preprocessors.py:64-124) becomes ONE TPU kernel.

Per batch tile (grid over batch), everything stays in VMEM:

    audio[TB, N] --reshape--> hops[TB*n_hops, hop]
      --MXU--> partial[TB*n_hops, k*2K]        (windowed real-DFT blocks)
      --shifted adds--> reim[TB, F, 2K]        (hop decomposition)
      --VPU--> power[TB, F, K]                 (re^2 + im^2)
      --MXU--> mel --VPU--> log(mel + 1e-6)
      --MXU--> mfcc[TB, F, C]                  (scaled DCT-II)

Only the [TB, N] audio read and [TB, F, C] feature write touch HBM —
~13x less HBM traffic than the unfused XLA path, which materializes the
[B, F, window] frame gather and each intermediate.

Numerics match ops/dsp.py (same constant matrices); parity is tested in
tests/test_pallas.py (interpret mode) and on hardware in the verify
drive. Gradients: the front end has no trainable parameters and nothing
upstream needs cotangents (augmentation is data preprocessing), so the
kernel is forward-only.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tcresnet_tpu.config import AudioConfig
from tcresnet_tpu.ops import dsp


def fused_mfcc_available(cfg: AudioConfig, num_samples: Optional[int] = None) -> bool:
    """The kernel supports hop-decomposable geometry (both ref configs)."""
    n = num_samples or cfg.desired_samples
    window, hop = cfg.window_size_samples, cfg.window_stride_samples
    return (
        cfg.preprocess_method == "mfcc"
        and window % hop == 0
        and n % hop == 0
        and n >= window
    )


def mfcc_tail(
    hops, dft, mel_w, dct_w, *, tb, n_hops, hop, k, num_bins, frames,
    matmul_dtype=jnp.float32,
):
    """[tb*n_hops, hop] hop rows -> [tb, frames, n_mfccs] MFCCs.

    The SINGLE implementation of the in-kernel MFCC matmul tail
    (windowed-DFT partials -> hop-decomposition shifted adds -> power ->
    mel -> log -> DCT), shared by this module's kernel and the fused
    frontend/inference kernels (ops/pallas/frontend.py,
    ops/pallas/infer.py). Pure jnp on values — callable from inside any
    Pallas kernel body."""
    two_k = 2 * num_bins
    partial = jnp.dot(
        hops.astype(matmul_dtype), dft, preferred_element_type=jnp.float32
    )
    partial = partial.reshape(tb, n_hops, k * two_k)

    # hop decomposition: reim[f] = sum_j partial[f + j, block j]
    reim = partial[:, 0:frames, 0:two_k]
    for j in range(1, k):
        reim = reim + partial[:, j : j + frames, j * two_k : (j + 1) * two_k]

    re = reim[:, :, :num_bins]
    im = reim[:, :, num_bins:]
    power = re * re + im * im

    mel = jnp.dot(
        power.reshape(tb * frames, num_bins),
        mel_w,
        preferred_element_type=jnp.float32,
    )
    log_mel = jnp.log(mel + 1e-6)
    mfcc = jnp.dot(log_mel, dct_w, preferred_element_type=jnp.float32)
    return mfcc.reshape(tb, frames, -1)


def _kernel(audio_ref, dft_ref, mel_ref, dct_ref, out_ref, *, n_hops, hop, k, num_bins, frames, matmul_dtype):
    # audio_ref: [TB, n_hops, hop] (hop reshape done outside the kernel —
    # Mosaic only supports leading-dim reshapes, minor dim must not change)
    tb = audio_ref.shape[0]
    out_ref[:] = mfcc_tail(
        audio_ref[:].reshape(tb * n_hops, hop),
        dft_ref[:], mel_ref[:], dct_ref[:],
        tb=tb, n_hops=n_hops, hop=hop, k=k, num_bins=num_bins,
        frames=frames, matmul_dtype=matmul_dtype,
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _fused_mfcc_impl(audio, cfg: AudioConfig, interpret: bool, tb: int = 8):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, n = audio.shape
    window = cfg.window_size_samples
    hop = cfg.window_stride_samples
    fft_length = dsp.fft_length_for(window)
    num_bins = fft_length // 2 + 1
    k = window // hop
    n_hops = n // hop
    frames = n_hops - k + 1

    dft = dsp.windowed_rdft_matrix(window, fft_length)  # [window, 2K]
    two_k = 2 * num_bins
    dft_blocks = np.concatenate(
        [dft[j * hop : (j + 1) * hop] for j in range(k)], axis=1
    )  # [hop, k*2K]
    mel = dsp.linear_to_mel_weight_matrix(
        cfg.num_mel_bins, num_bins, cfg.sample_rate,
        cfg.lower_edge_hertz, cfg.upper_edge_hertz,
    )
    dct = dsp.dct_ii_matrix(cfg.num_mel_bins, cfg.num_mfccs)

    matmul_dtype = dsp.dsp_matmul_dtype(cfg)
    pad = (-batch) % tb
    if pad:
        audio = jnp.pad(audio, ((0, pad), (0, 0)))
    padded = audio.shape[0]
    audio = audio.astype(jnp.float32).reshape(padded, n_hops, hop)

    kernel = functools.partial(
        _kernel, n_hops=n_hops, hop=hop, k=k, num_bins=num_bins,
        frames=frames, matmul_dtype=matmul_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(padded // tb,),
        in_specs=[
            pl.BlockSpec((tb, n_hops, hop), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, k * two_k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins, cfg.num_mel_bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.num_mel_bins, cfg.num_mfccs), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tb, frames, cfg.num_mfccs), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded, frames, cfg.num_mfccs), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * padded * (n_hops * hop * k * two_k
                                + frames * num_bins * cfg.num_mel_bins
                                + frames * cfg.num_mel_bins * cfg.num_mfccs),
            bytes_accessed=padded * (n + frames * cfg.num_mfccs) * 4,
            transcendentals=padded * frames * cfg.num_mel_bins,
        ),
    )(
        audio,
        jnp.asarray(dft_blocks).astype(matmul_dtype),
        jnp.asarray(mel),
        jnp.asarray(dct),
    )
    if pad:
        out = out[:batch]
    return out


def fused_mfcc(
    audio: jnp.ndarray,
    cfg: AudioConfig,
    interpret: bool = False,
    tb: int = 8,
    mesh=None,
) -> jnp.ndarray:
    """[B, N] wavs -> [B, F, num_mfccs] MFCCs via the fused kernel.

    Falls back to the XLA path when geometry is unsupported. `tb` is the
    batch tile per grid step (VMEM use and DFT-matmul M dim scale with it).
    With a multi-device `mesh`, the kernel runs per-shard under shard_map
    (a custom call cannot be partitioned by plain jit) with the batch
    sharded over the `data` axis.
    """
    if not fused_mfcc_available(cfg, audio.shape[-1]):
        return dsp.mfcc(audio, cfg)
    if mesh is not None and mesh.devices.size > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n_data = mesh.shape["data"]
        if audio.shape[0] % (n_data * tb) == 0:
            return shard_map(
                lambda a: _fused_mfcc_impl(a, cfg, interpret, tb),
                mesh=mesh,
                in_specs=(P("data"),),
                out_specs=P("data"),
                check_vma=False,
            )(audio)
    return _fused_mfcc_impl(audio, cfg, interpret, tb)
