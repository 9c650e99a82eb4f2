"""Pallas temporal (k x 1) convolution — forward AND backward kernels.

BASELINE.json north star: "audio_nets/tc_resnet.py's temporal (kx1)
Conv2D residual blocks are reimplemented as JAX/Pallas convolutions for
both forward and backward passes". This module provides that capability:
a TF-SAME k x 1 conv over [B, T, C] activations as Pallas kernels with a
jax.custom_vjp wiring all three passes:

  forward : y = conv(x, w)          — k shifted middle-dim slices of the
            batch tile, each MXU-matmul'd against its [Cin, Cout] weight
            block (the ops/pallas/infer.py formulation, shared code)
  dx      : transposed conv — dy zero-stuffed by the stride (a
            leading-dim reshape; the minor dim never changes), then a
            stride-1 conv against the j-flipped, transposed weight
  dw      : per-shift slice^T @ dy matmuls, accumulated across the
            sequential batch-tile grid into a VMEM-resident [k*Cin, Cout]
            output block

Numerics match jax.lax / flax nn.Conv to ULP level (value and grads,
tests/test_pallas_tconv.py). Enable per-model with
ModelConfig.conv_backend="pallas" (models/layers.py slim_conv). The
default stays "xla", with measurements to justify it: end-to-end train
throughput is 55.4k utt/s with per-conv Pallas kernels vs 586k with XLA
convs (batch 1024, docs/BENCH_RESULTS.md) — each pallas_call is a custom
call XLA cannot fuse BN/ReLU epilogues into, and the kernels run true
f32 where XLA's default precision rounds through bf16. The lesson is the
repo's design thesis: on TPU, op-for-op kernel replacement loses to the
compiler; hand-written kernels win at PIPELINE granularity
(ops/pallas/frontend.py: the whole input path; ops/pallas/infer.py: the
whole inference program), where they eliminate HBM round trips and
launch overhead the compiler cannot.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tcresnet_tpu.ops.pallas.infer import (
    _conv_step,
    same_padded_input,
    tap_slice,
)

_TB = 8


def _pad_cfg(t: int, k: int, stride: int) -> Tuple[int, int]:
    """TF-SAME output length and left pad."""
    to = -(-t // stride)
    total = max((to - 1) * stride + k - t, 0)
    return to, total // 2


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, w_ref, o_ref, *, k, stride):
    zero_bias = jnp.zeros((1, o_ref.shape[-1]), jnp.float32)
    o_ref[:] = _conv_step(x_ref[:], w_ref[:], zero_bias, k, stride, relu=False)


def _dx_kernel(dy_ref, wflip_ref, o_ref, *, k, stride, lo, t):
    dy = dy_ref[:]
    tb, to, co = dy.shape
    if stride > 1:
        # zero-stuff between rows: stack zeros on a NEW middle axis, then
        # merge [TB, To, s, C] -> [TB, To*s, C] — the minor dim never
        # changes, so the reshape is Mosaic-legal
        z = jnp.zeros_like(dy)
        dy = jnp.stack([dy] + [z] * (stride - 1), axis=2).reshape(
            tb, to * stride, co
        )
        dy = dy[:, : stride * (to - 1) + 1]
    # dx[t] = sum_j dy_stuffed[t + lo - (k-1) + j'] @ W_{k-1-j'}^T — a
    # stride-1 SAME-style conv with left pad (k-1-lo) against the
    # flipped/transposed weight; emit exactly t rows.
    pad_l = k - 1 - lo
    span = dy.shape[1]
    pad_r = max(t + k - 1 - pad_l - span, 0)
    dyp = jnp.pad(dy, ((0, 0), (pad_l, pad_r), (0, 0)))
    acc = None
    for j in range(k):
        sl = jax.lax.slice_in_dim(dyp, j, j + t, axis=1)
        part = jnp.dot(
            sl.reshape(tb * t, co),
            jax.lax.slice_in_dim(wflip_ref[:], j * co, (j + 1) * co, axis=0),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    o_ref[:] = acc.reshape(tb, t, -1)


def _dw_kernel(x_ref, dy_ref, o_ref, *, k, stride):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    x = x_ref[:]
    dy = dy_ref[:]
    tb, t, ci = x.shape
    to = dy.shape[1]
    # shared TF-SAME pad + tap-decimation geometry with the forward conv
    # (infer.same_padded_input / tap_slice): dw MUST read exactly the
    # input rows each forward tap consumed
    xpad, _, span = same_padded_input(x, k, stride)
    parts = []
    for j in range(k):
        sl = tap_slice(xpad, j, span, stride)
        parts.append(
            jax.lax.dot_general(
                sl.reshape(tb * to, ci),
                dy.reshape(tb * to, -1),
                (((0,), (0,)), ((), ())),  # contract the row dim: sl^T @ dy
                preferred_element_type=jnp.float32,
            )
        )
    contrib = jnp.concatenate(parts, axis=0)  # [k*Ci, Co]

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += contrib


# ---------------------------------------------------------------------------
# pallas_call wrappers (batch padded to the TB tile; grid over tiles)
# ---------------------------------------------------------------------------


def _call(kernel, in_arrays, in_shapes, out_shape, out_spec, grid, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    specs = []
    for shape, mapped in in_shapes:
        if mapped:
            specs.append(
                pl.BlockSpec(shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            )
        else:
            specs.append(
                pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
    return pl.pallas_call(
        kernel, grid=(grid,), in_specs=specs, out_specs=out_spec,
        out_shape=out_shape, interpret=interpret,
    )(*in_arrays)


def _pad_batch(x, tb):
    b = x.shape[0]
    pad = (-b) % tb
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, b


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def temporal_conv(x, w2, stride: int, tb: int, interpret: bool):
    """[B, T, Cin] f32 x [k*Cin, Cout] -> [B, To, Cout], TF-SAME."""
    return _fwd(x, w2, stride, tb, interpret)


def _fwd(x, w2, stride, tb, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, ci = x.shape
    tb = min(tb, b)  # small batches don't pad up to a full default tile
    k = w2.shape[0] // ci
    co = w2.shape[1]
    to, _ = _pad_cfg(t, k, stride)
    xp, b0 = _pad_batch(x, tb)
    grid = xp.shape[0] // tb
    out = _call(
        functools.partial(_fwd_kernel, k=k, stride=stride),
        (xp, w2),
        (((tb, t, ci), True), ((k * ci, co), False)),
        jax.ShapeDtypeStruct((xp.shape[0], to, co), jnp.float32),
        pl.BlockSpec((tb, to, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        grid, interpret,
    )
    return out[:b0]


def _fwd_vjp(x, w2, stride, tb, interpret):
    return _fwd(x, w2, stride, tb, interpret), (x, w2)


def _bwd_vjp(stride, tb, interpret, res, dy):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x, w2 = res
    b, t, ci = x.shape
    tb = min(tb, b)  # mirror _fwd's tile shrink for small batches
    k = w2.shape[0] // ci
    co = w2.shape[1]
    to, lo = _pad_cfg(t, k, stride)
    dy = dy.astype(jnp.float32)

    # dx: conv of zero-stuffed dy against the j-flipped transposed weight
    wflip = jnp.concatenate(
        [
            jax.lax.slice_in_dim(w2, (k - 1 - j) * ci, (k - j) * ci, axis=0).T
            for j in range(k)
        ],
        axis=0,
    )  # [k*Co, Ci]
    dyp, b0 = _pad_batch(dy, tb)
    grid = dyp.shape[0] // tb
    dx = _call(
        functools.partial(_dx_kernel, k=k, stride=stride, lo=lo, t=t),
        (dyp, wflip),
        (((tb, to, co), True), ((k * co, ci), False)),
        jax.ShapeDtypeStruct((dyp.shape[0], t, ci), jnp.float32),
        pl.BlockSpec((tb, t, ci), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        grid, interpret,
    )[:b0]

    # dw: accumulate per-tile [k*Ci, Co] contributions across the grid
    xp, _ = _pad_batch(x, tb)
    dw = _call(
        functools.partial(_dw_kernel, k=k, stride=stride),
        (xp, dyp),
        (((tb, t, ci), True), ((tb, to, co), True)),
        jax.ShapeDtypeStruct((k * ci, co), jnp.float32),
        pl.BlockSpec((k * ci, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        grid, interpret,
    )
    return dx.astype(x.dtype), dw.astype(w2.dtype)


temporal_conv.defvjp(_fwd_vjp, _bwd_vjp)


def pallas_temporal_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int = 1,
    tb: int = _TB,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for nn.Conv on [B, T, 1, C] with a [k, 1, Cin, Cout] kernel.

    Computes in f32 (accumulation is f32 either way; the XLA path's
    default TPU matmul precision rounds operands to bf16 — this kernel
    is the more precise of the two)."""
    b, t, one, ci = x.shape
    assert one == 1, "temporal layout expected"
    k, kw, ci2, co = kernel.shape
    assert kw == 1 and ci2 == ci
    w2 = kernel.astype(jnp.float32).reshape(k * ci, co)
    y = temporal_conv(x.astype(jnp.float32).reshape(b, t, ci), w2, stride, tb, interpret)
    return y.reshape(b, y.shape[1], 1, co)
