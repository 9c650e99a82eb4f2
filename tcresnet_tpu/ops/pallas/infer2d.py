"""Single-kernel 2D-CNN inference: features -> logits in ONE Pallas call.

Extends the whole-model fused-inference capability (ops/pallas/infer.py,
TC-ResNet temporal family) to every 2D-feature-map family of the
reference model zoo:

  - ResNet2D8 / ResNet2D8Pool   (audio_nets/tc_resnet.py:73-99)
  - Res8 / Res8Narrow / Res15 / Res15Narrow (audio_nets/res.py:6-123)
  - DSCNNS / DSCNNM / DSCNNL    (audio_nets/ds_cnn.py:9-101)

TPU-native replacement for the reference's per-model deploy path
(freeze.py -> .tflite -> TF-Lite interpreter benchmarked per model in
tflite_tools/run_benchmark.sh:42-49): the entire CNN — every 2D conv /
depthwise conv / BN / ReLU / residual add / avg-pool / classifier — runs
inside one kernel launch with all weights VMEM-resident, eliminating the
XLA per-op dispatch floor (~250-640 us for these models at batch 1,
docs/BENCH_RESULTS.md).

Design (Mosaic-legal by construction):
  - Activations live as [TB, T, F, C] with channels on the lane (minor)
    dim. Both spatial axes are MIDDLE dims, so TF-SAME/VALID padding,
    k x k tap slicing, dilation (Res15's 2^(i//3) rates) and stride-2
    selection (split-a-leading-dim reshape + index) never touch the
    minor dim — the Mosaic reshape rule (CLAUDE.md) is respected
    everywhere.
  - A k x k conv is k*k shifted-slice MXU matmuls: each tap slice
    [TB,To,Fo,Ci] is a merge-of-leading-dims reshape away from a
    [TB*To*Fo, Ci] x [Ci, Co] matmul.
  - Ci==1 convs (the first layer everywhere) and depthwise convs
    (DS-CNN) are per-tap VPU broadcast-multiply accumulations — a
    degenerate matmul would waste the MXU.
  - Eval-mode BN folds into the preceding conv (scale/bias on the
    output channel) EXCEPT the Res family, whose stat-only BN sits
    after the ReLU / after the residual add (res.py:42-54) — those are
    standalone per-channel affine ops in the op list.

The model is flattened host-side into a static op list (conv / dwconv /
affine / pool / save / addsc) plus a flat list of folded weight arrays;
the kernel replays the list. Numerics: folding is algebraically exact;
agreement with the XLA inference path is <=1e-5 on softmax outputs
(tests/test_pallas_infer2d.py), the BASELINE.md AOT-parity gate.

The wav->features front end runs in the existing fused MFCC kernel
(ops/pallas/mfcc.py) — a second, tiny launch. Two Pallas launches total;
still 10-100x under the XLA path's launch floor.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tcresnet_tpu.config import AudioConfig, ModelConfig
from tcresnet_tpu.ops import dsp

_BN_EPS = 1e-3  # slim.batch_norm default (models/layers.py)

# Per-family VMEM-driven batch tile: 98x40 maps pad channels to 128
# lanes (~2 MB/sample/buffer); DS-CNN maps are tiny after conv_1.
_FAMILY_TB = {
    "ResNet2D8": 1,
    "ResNet2D8Pool": 1,
    "Res8": 1,
    "Res8Narrow": 1,
    "Res15": 1,
    "Res15Narrow": 1,
    "DSCNNS": 8,
    "DSCNNM": 4,
    "DSCNNL": 4,
}


def fused_infer2d_available(model_cfg: ModelConfig, audio_cfg: AudioConfig) -> bool:
    """Whole-model 2D kernel supports the map families on MFCC features."""
    from tcresnet_tpu.ops.pallas.mfcc import fused_mfcc_available

    return model_cfg.name in _FAMILY_TB and fused_mfcc_available(audio_cfg)


# ---------------------------------------------------------------------------
# host-side weight folding -> op list
# ---------------------------------------------------------------------------


def _fold_conv_bn_2d(params, stats, conv_name: str, bn_name: str):
    """conv kernel [kh,kw,Ci,Co] (+opt bias) + BN -> (w [kh*kw,Ci,Co], b).

    Handles every BN parameterization in the zoo: center+scale
    (TC-ResNet 2D), center-only (DS-CNN, scale=False -> gamma=1).
    """
    kern = np.asarray(params[conv_name]["kernel"], np.float32)
    kh, kw, ci, co = kern.shape
    bias = np.asarray(
        params[conv_name].get("bias", np.zeros(co)), np.float32
    )
    bn_p = params.get(bn_name, {})
    gamma = np.asarray(bn_p.get("scale", np.ones(co)), np.float32)
    beta = np.asarray(bn_p.get("bias", np.zeros(co)), np.float32)
    mean = np.asarray(stats[bn_name]["mean"], np.float32)
    var = np.asarray(stats[bn_name]["var"], np.float32)
    s = gamma / np.sqrt(var + _BN_EPS)
    w = (kern * s).reshape(kh * kw, ci, co)
    b = ((bias - mean) * s + beta).reshape(1, co)
    return w, b


def _raw_conv(params, conv_name: str):
    """Unfolded conv (Res family: BN is NOT adjacent) -> (w, b=bias|0)."""
    kern = np.asarray(params[conv_name]["kernel"], np.float32)
    kh, kw, ci, co = kern.shape
    bias = np.asarray(params[conv_name].get("bias", np.zeros(co)), np.float32)
    return kern.reshape(kh * kw, ci, co), bias.reshape(1, co)


def _stat_affine(stats, bn_name: str):
    """Stat-only BN (res.py:106-112) -> [2, C] (row 0 scale, row 1 shift)."""
    mean = np.asarray(stats[bn_name]["mean"], np.float32)
    var = np.asarray(stats[bn_name]["var"], np.float32)
    s = 1.0 / np.sqrt(var + _BN_EPS)
    return np.stack([s, -mean * s])


def _squeeze_ci1(w: np.ndarray) -> np.ndarray:
    """[kh*kw, 1, Co] -> [kh*kw, 1, Co] kept 3D; kernel broadcasts."""
    return w  # mode "c1" uses w[tap] as [1, Co] directly


class _OpListBuilder:
    def __init__(self):
        self.ops: List[Tuple] = []
        self.weights: List[np.ndarray] = []

    def conv(self, w, b, kh, kw, sh, sw, dil, relu, padding, role="main"):
        ci = w.shape[1]
        mode = "c1" if ci == 1 else "full"
        self.ops.append(("conv", kh, kw, sh, sw, dil, relu, padding, mode, role))
        self.weights += [w, b]

    def dwconv(self, w, b, kh, kw, sh, sw, relu):
        # w [kh*kw, 1, C] (flax grouped-conv kernel [kh,kw,1,C])
        self.ops.append(("conv", kh, kw, sh, sw, 1, relu, "SAME", "dw", "main"))
        self.weights += [w, b]

    def affine(self, a):
        self.ops.append(("affine",))
        self.weights.append(a)

    def pool(self, ph, pw, sh, sw):
        self.ops.append(("pool", ph, pw, sh, sw))

    def save(self):
        self.ops.append(("save",))

    def addsc(self, relu: bool):
        self.ops.append(("addsc", relu))


def _build_tc2d(model_cfg: ModelConfig, params, stats) -> _OpListBuilder:
    """ResNet2D8[Pool]: 2D TC-ResNet debug variants (tc_resnet.py:73-99)."""
    b = _OpListBuilder()
    w, bb = _fold_conv_bn_2d(params, stats, "conv0_conv", "conv0_bn")
    b.conv(w, bb, 3, 3, 1, 1, 1, True, "SAME")
    if model_cfg.name.endswith("Pool"):
        b.pool(4, 4, 4, 4)
    i = 0
    while f"block{i}_conv0_conv" in params:
        has_down = f"block{i}_down_conv" in params
        stride = 2 if has_down else 1
        if has_down:
            dw, db = _fold_conv_bn_2d(
                params, stats, f"block{i}_down_conv", f"block{i}_down_bn"
            )
            b.conv(dw, db, 1, 1, 2, 2, 1, True, "SAME", role="down")
        w0, b0 = _fold_conv_bn_2d(
            params, stats, f"block{i}_conv0_conv", f"block{i}_conv0_bn"
        )
        b.conv(w0, b0, 3, 3, stride, stride, 1, True, "SAME", role="block0")
        w1, b1 = _fold_conv_bn_2d(
            params, stats, f"block{i}_conv1_conv", f"block{i}_conv1_bn"
        )
        b.conv(w1, b1, 3, 3, 1, 1, 1, False, "SAME", role="block1")
        b.addsc(relu=True)
        i += 1
    return b


def _build_res(model_cfg: ModelConfig, params, stats) -> _OpListBuilder:
    """Res8/15[Narrow] (res.py): conv-relu then stat-only BN; BN after add."""
    b = _OpListBuilder()
    w, bb = _raw_conv(params, "f_conv")
    b.conv(w, bb, 3, 3, 1, 1, 1, True, "SAME")
    is_res8 = "8" in model_cfg.name
    if is_res8:
        b.pool(4, 3, 1, 1)
    num_layers = 6 if is_res8 else 13
    use_dilation = not is_res8

    def rate(idx):
        return 2 ** (idx // 3) if use_dilation else 1

    idx = 0
    for i in range(num_layers // 2):
        b.save()
        w0, b0 = _raw_conv(params, f"conv{idx}")
        b.conv(w0, b0, 3, 3, 1, 1, rate(idx), True, "SAME")
        b.affine(_stat_affine(stats, f"conv{idx}_bn"))
        idx += 1
        w1, b1 = _raw_conv(params, f"conv{idx}")
        b.conv(w1, b1, 3, 3, 1, 1, rate(idx), True, "SAME")
        idx += 1
        b.addsc(relu=False)
        b.affine(_stat_affine(stats, f"conv{2 * i + 1}_bn"))
    if num_layers % 2 != 0:
        w2, b2 = _raw_conv(params, f"conv{idx}")
        b.conv(w2, b2, 3, 3, 1, 1, rate(idx), True, "SAME")
        b.affine(_stat_affine(stats, f"conv{idx}_bn"))
    return b


def _build_dscnn(model_cfg: ModelConfig, params, stats) -> _OpListBuilder:
    """DS-CNN S/M/L (ds_cnn.py): conv/BN-relu then separable blocks."""
    from tcresnet_tpu.models.ds_cnn import L_NET_DEF, M_NET_DEF, S_NET_DEF

    net_def = {"DSCNNS": S_NET_DEF, "DSCNNM": M_NET_DEF, "DSCNNL": L_NET_DEF}[
        model_cfg.name
    ]
    b = _OpListBuilder()
    for block in net_def:
        kh, kw = block.kernel
        sh, sw = block.stride
        if block.type == "conv":
            w, bb = _fold_conv_bn_2d(
                params, stats, block.name, f"{block.name}_bn"
            )
            b.conv(w, bb, kh, kw, sh, sw, 1, True, "SAME")
        else:  # separable: depthwise + BN-relu, pointwise + BN-relu
            w, bb = _fold_conv_bn_2d(
                params, stats, f"{block.name}_dw", f"{block.name}_dw_bn"
            )
            b.dwconv(w, bb, kh, kw, sh, sw, True)
            w, bb = _fold_conv_bn_2d(
                params, stats, f"{block.name}_pw", f"{block.name}_pw_bn"
            )
            b.conv(w, bb, 1, 1, 1, 1, 1, True, "SAME")
    return b


def build_op_list(model_cfg: ModelConfig, params, stats):
    """-> (ops static tuple, weight arrays, fc kernel, fc bias|None)."""
    name = model_cfg.name
    if name.startswith("ResNet2D8"):
        b = _build_tc2d(model_cfg, params, stats)
        fc_name = "fc"
    elif name.startswith("Res"):
        b = _build_res(model_cfg, params, stats)
        fc_name = "fc"
    elif name.startswith("DSCNN"):
        b = _build_dscnn(model_cfg, params, stats)
        fc_name = "fc1"
    else:
        raise ValueError(f"unsupported model {name!r}")
    fc = np.asarray(params[fc_name]["kernel"], np.float32)
    fcb = (
        np.asarray(params[fc_name]["bias"], np.float32).reshape(1, -1)
        if "bias" in params[fc_name]
        else None
    )
    return tuple(b.ops), b.weights, fc, fcb


# ---------------------------------------------------------------------------
# in-kernel ops (pure jnp on values — Mosaic-legal slicing/reshapes only)
# ---------------------------------------------------------------------------


def _stride_select(x, axis: int, stride: int, out_len: int):
    """Take every `stride`-th row along a MIDDLE axis via a leading-dim
    split reshape (the minor dim is untouched)."""
    if stride == 1:
        return x
    rows = x.shape[axis]
    pad_r = (-rows) % stride
    if pad_r:
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, pad_r)
        x = jnp.pad(x, pads)
    new_shape = x.shape[:axis] + (x.shape[axis] // stride, stride) + x.shape[axis + 1:]
    x = x.reshape(new_shape)
    idx = (slice(None),) * (axis + 1) + (0,)
    return x[idx]


def _conv2d_step(x, w, b, kh, kw, sh, sw, dil, relu, padding, mode):
    """[TB, T, F, Ci] -> [TB, To, Fo, Co] TF-SAME/VALID k x k conv.

    mode: "full" (MXU matmul per tap), "c1" (Ci==1 broadcast-multiply),
    "dw" (depthwise broadcast-multiply).
    """
    tb, t, f, ci = x.shape
    keh = (kh - 1) * dil + 1
    kew = (kw - 1) * dil + 1
    if padding == "SAME":
        to = -(-t // sh)
        fo = -(-f // sw)
        pt = max((to - 1) * sh + keh - t, 0)
        pf = max((fo - 1) * sw + kew - f, 0)
    else:  # VALID
        to = (t - keh) // sh + 1
        fo = (f - kew) // sw + 1
        pt = pf = 0
    plo_t, plo_f = pt // 2, pf // 2
    span_t = sh * (to - 1) + 1
    span_f = sw * (fo - 1) + 1
    hi_t = max(span_t + keh - 1 - (t + plo_t), 0)
    hi_f = max(span_f + kew - 1 - (f + plo_f), 0)
    if plo_t or hi_t or plo_f or hi_f:
        x = jnp.pad(x, ((0, 0), (plo_t, hi_t), (plo_f, hi_f), (0, 0)))

    acc = None
    for i in range(kh):
        sl_t = jax.lax.slice_in_dim(x, i * dil, i * dil + span_t, axis=1)
        sl_t = _stride_select(sl_t, 1, sh, to)
        for j in range(kw):
            sl = jax.lax.slice_in_dim(sl_t, j * dil, j * dil + span_f, axis=2)
            sl = _stride_select(sl, 2, sw, fo)
            tap = i * kw + j
            if mode == "full":
                part = jnp.dot(
                    sl.reshape(tb * to * fo, ci),
                    w[tap],
                    preferred_element_type=jnp.float32,
                )
            else:  # "c1": [tb,to,fo,1]*[1,Co]; "dw": [tb,to,fo,C]*[1,C]
                part = sl * w[tap]
            acc = part if acc is None else acc + part
    y = acc.reshape(tb, to, fo, -1) if mode == "full" else acc
    y = y + b
    return jnp.maximum(y, 0.0) if relu else y


def _pool2d_step(x, ph, pw, sh, sw):
    """VALID average pool (slim.avg_pool2d default)."""
    tb, t, f, ci = x.shape
    to = (t - ph) // sh + 1
    fo = (f - pw) // sw + 1
    span_t = sh * (to - 1) + 1
    span_f = sw * (fo - 1) + 1
    acc = None
    for i in range(ph):
        sl_t = jax.lax.slice_in_dim(x, i, i + span_t, axis=1)
        sl_t = _stride_select(sl_t, 1, sh, to)
        for j in range(pw):
            sl = jax.lax.slice_in_dim(sl_t, j, j + span_f, axis=2)
            sl = _stride_select(sl, 2, sw, fo)
            acc = sl if acc is None else acc + sl
    return acc * (1.0 / (ph * pw))


def _kernel2d(*refs, tb: int, ops: Tuple[Tuple, ...], has_fc_bias: bool):
    """Ref order: feats [TB,T,F,1], per-op weights, fc, (fcb), out."""
    x = refs[0][:].astype(jnp.float32)
    n_out = 2 if has_fc_bias else 1
    wrefs = refs[1:-(n_out + 1)] if has_fc_bias else refs[1:-2]
    fc_ref = refs[-3] if has_fc_bias else refs[-2]
    fcb_ref = refs[-2] if has_fc_bias else None
    out_ref = refs[-1]

    shortcut = None
    wi = 0
    for op in ops:
        kind = op[0]
        if kind == "conv":
            _, kh, kw, sh, sw, dil, relu, padding, mode, role = op
            w = wrefs[wi][:]
            b = wrefs[wi + 1][:]
            wi += 2
            y = _conv2d_step(x, w, b, kh, kw, sh, sw, dil, relu, padding, mode)
            if role == "down":
                shortcut = y  # x unchanged
            elif role == "block0":
                if shortcut is None:
                    shortcut = x
                x = y
            else:  # main / block1
                x = y
        elif kind == "affine":
            a = wrefs[wi][:]
            wi += 1
            x = x * a[0:1, :] + a[1:2, :]
        elif kind == "pool":
            _, ph, pw, sh, sw = op
            x = _pool2d_step(x, ph, pw, sh, sw)
        elif kind == "save":
            shortcut = x
        elif kind == "addsc":
            x = x + shortcut
            if op[1]:
                x = jnp.maximum(x, 0.0)
            shortcut = None

    pooled = jnp.mean(x, axis=(1, 2))  # global avg pool [TB, C]
    logits = jnp.dot(pooled, fc_ref[:], preferred_element_type=jnp.float32)
    if has_fc_bias:
        logits = logits + fcb_ref[:]
    out_ref[:] = logits


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def build_fused_infer2d(
    model_cfg: ModelConfig,
    audio_cfg: AudioConfig,
    params,
    batch_stats,
    tb: int = 0,
    interpret: bool = False,
    mesh=None,
):
    """-> infer(wavs [B, N] f32) -> logits [B, num_classes] f32.

    Front end: the fused MFCC kernel (ops/pallas/mfcc.py) produces
    [B, frames, n_mfcc]; the CNN kernel consumes [TB, T, F, 1] blocks.
    Weights are folded once here and baked in as VMEM-resident
    constants. With a multi-device `mesh` the CNN kernel runs per-shard
    under shard_map with the batch on the `data` axis when it divides
    evenly (custom calls cannot be partitioned by plain jit).
    """
    assert fused_infer2d_available(model_cfg, audio_cfg)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tcresnet_tpu.ops.pallas.mfcc import _fused_mfcc_impl

    tb = tb or _FAMILY_TB[model_cfg.name]
    n = audio_cfg.desired_samples
    t_dim, f_dim, _ = dsp.feature_shape(audio_cfg)
    ncls = model_cfg.num_classes

    ops, weights, fc, fcb = build_op_list(model_cfg, params, batch_stats)
    weights = [jnp.asarray(w) for w in weights]
    has_fc_bias = fcb is not None

    const_map2 = lambda i: (0, 0)
    const_map3 = lambda i: (0, 0, 0)
    weight_specs = [
        pl.BlockSpec(
            w.shape,
            const_map3 if w.ndim == 3 else const_map2,
            memory_space=pltpu.VMEM,
        )
        for w in weights
    ]
    tail = [pl.BlockSpec(fc.shape, const_map2, memory_space=pltpu.VMEM)]
    tail_args = [jnp.asarray(fc)]
    if has_fc_bias:
        tail.append(pl.BlockSpec(fcb.shape, const_map2, memory_space=pltpu.VMEM))
        tail_args.append(jnp.asarray(fcb))

    def _infer_local(wavs: jnp.ndarray) -> jnp.ndarray:
        batch = wavs.shape[0]
        assert wavs.shape[1] == n
        feats = _fused_mfcc_impl(
            wavs.astype(jnp.float32), audio_cfg, interpret, min(8, batch)
        )  # [B, T, F]
        tb_eff = min(tb, batch)
        pad_b = (-batch) % tb_eff
        if pad_b:
            feats = jnp.pad(feats, ((0, pad_b), (0, 0), (0, 0)))
        padded_b = feats.shape[0]
        x4 = feats[..., None]  # [B, T, F, 1] (XLA-level reshape)

        kernel = functools.partial(
            _kernel2d, tb=tb_eff, ops=ops, has_fc_bias=has_fc_bias
        )
        out = pl.pallas_call(
            kernel,
            grid=(padded_b // tb_eff,),
            in_specs=[
                pl.BlockSpec(
                    (tb_eff, t_dim, f_dim, 1),
                    lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            + weight_specs
            + tail,
            out_specs=pl.BlockSpec(
                (tb_eff, ncls), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((padded_b, ncls), jnp.float32),
            interpret=interpret,
        )(x4, *weights, *tail_args)
        return out[:batch]

    @jax.jit
    def infer(wavs: jnp.ndarray) -> jnp.ndarray:
        if mesh is not None and mesh.devices.size > 1:
            n_data = mesh.shape["data"]
            if wavs.shape[0] % (n_data * tb) == 0:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                return shard_map(
                    _infer_local,
                    mesh=mesh,
                    in_specs=(P("data"),),
                    out_specs=P("data"),
                    check_vma=False,
                )(wavs)
        return _infer_local(wavs)

    return infer
