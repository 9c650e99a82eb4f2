"""Single-kernel 2D-CNN inference: features -> logits in ONE Pallas call.

Extends the whole-model fused-inference capability (ops/pallas/infer.py,
TC-ResNet temporal family) to every 2D-feature-map family of the
reference model zoo:

  - ResNet2D8 / ResNet2D8Pool   (audio_nets/tc_resnet.py:73-99)
  - Res8 / Res8Narrow / Res15 / Res15Narrow (audio_nets/res.py:6-123)
  - DSCNNS / DSCNNM / DSCNNL    (audio_nets/ds_cnn.py:9-101)
  - all 7 Google-KWS baselines  (audio_nets/kws.py:15-63), incl. the
    SVDF (training-path forward, kws.py:583-625); flatten+Dense heads
    are batched dot_generals over the spatial dims (no minor-dim
    reshape), full-height VALID convs contract the whole time axis

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
    "KWS": 8,
}

# All seven Google-KWS baselines (audio_nets/kws.py:15-63) have fused
# kernels; the SVDF runtime-streaming variant fuses its TRAINING-path
# forward (kws.py:583-625), like the reference's frozen deploy graph.
_KWS_ARCHS = (
    "single_fc", "conv", "low_latency_conv", "one_fstride4",
    "trad_fpool3", "low_latency_svdf", "tiny_conv",
)


def fused_infer2d_available(model_cfg: ModelConfig, audio_cfg: AudioConfig) -> bool:
    """Whole-model 2D kernel supports the map families on MFCC features."""
    from tcresnet_tpu.ops.pallas.mfcc import fused_mfcc_available

    if model_cfg.name == "KWS" and model_cfg.kws_architecture not in _KWS_ARCHS:
        return False
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

    def maxpool(self, ph, pw, sh, sw, padding):
        self.ops.append(("maxpool", ph, pw, sh, sw, padding))

    def save(self):
        self.ops.append(("save",))

    def addsc(self, relu: bool):
        self.ops.append(("addsc", relu))

    def gap(self):
        self.ops.append(("gap",))

    def dense(self, w, b, relu=False):
        # w [K, U]; b [1, U] or None
        self.ops.append(("dense", relu, b is not None))
        self.weights.append(w)
        if b is not None:
            self.weights.append(b)

    def flatten_dense(self, w, b, relu=False):
        # w [T, F, C, U] (4D input) or [T, F, U] (3D input); b [1, U]|None.
        # Replaces reshape(b, -1) + Dense without a minor-dim reshape:
        # a batched dot_general over the spatial dims, summed after.
        self.ops.append(("flatten_dense", relu, b is not None))
        self.weights.append(w)
        if b is not None:
            self.weights.append(b)

    def tconv_full(self, w, b, sw, relu):
        # Full-height VALID conv (kernel (T, kw), To == 1; the
        # one_fstride4 / low_latency_conv first layer, kws.py:293-487):
        # per f-tap, contraction over the WHOLE time axis — a dot_general
        # instead of kh unrolled taps. w [kw, T, U]; b [1, U] or None.
        self.ops.append(("tconv_full", w.shape[0], sw, relu, b is not None))
        self.weights.append(w)
        if b is not None:
            self.weights.append(b)

    def svdf(self, w_freq, w_time, bias, rank):
        # w_freq [F, K], w_time [K, T], bias [1, units], K = units*rank
        # with k = u*rank + r (kws.py:583-625 unit-major layout). The
        # rank sum is done by HOST-side weight splitting: per rank
        # component r, w_freq[:, r::rank] / w_time[r::rank].T are [F|T,
        # units] slices whose per-r (freq-proj, time-dot) partials sum to
        # the units — the in-kernel alternatives are a minor-dim reshape
        # (illegal in Mosaic) or a [K, units] one-hot matmul (13 MB of
        # VMEM zeros for low_latency_svdf).
        self.ops.append(("svdf", rank))
        for r in range(rank):
            self.weights.append(np.ascontiguousarray(w_freq[:, r::rank]))
        for r in range(rank):
            self.weights.append(np.ascontiguousarray(w_time[r::rank].T))
        self.weights.append(bias)


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


def _dense_bias(params, name):
    p = params[name]
    if "bias" not in p:
        return None
    return np.asarray(p["bias"], np.float32).reshape(1, -1)


def _dense_wb(params, name):
    w = np.asarray(params[name]["kernel"], np.float32)
    return w, _dense_bias(params, name)


def _flat_w(params, name, spatial, channels=None):
    """Dense kernel [prod(spatial)*C, U] -> [T, F, (C,) U] for
    flatten_dense (flax flatten order is channel-fastest)."""
    w = np.asarray(params[name]["kernel"], np.float32)
    t, f = spatial
    if channels is None:
        return w.reshape(t, f, -1)
    return w.reshape(t, f, channels, -1)


def _build_kws(model_cfg: ModelConfig, params, feature_shape) -> Tuple[_OpListBuilder, int]:
    """Google-KWS baselines (audio_nets/kws.py; our models/kws.py).

    Returns (builder, input_rank): conv-style archs consume 4D
    [TB,T,F,1]; single_fc / svdf consume 3D [TB,T,F] (their first op
    contracts the mel axis directly — no spatial conv ever happens, and
    3D avoids a minor-dim squeeze).
    """
    arch = model_cfg.kws_architecture
    t_in, f_in, _ = feature_shape
    b = _OpListBuilder()

    if arch == "single_fc":
        w, bias = _dense_wb(params, "fc")
        b.flatten_dense(w.reshape(t_in, f_in, -1), bias)
        return b, 3

    if arch == "low_latency_svdf":
        rank = 2
        w_freq = np.asarray(params["weights_frequency"], np.float32)  # [F, K]
        w_time = np.asarray(params["weights_time"], np.float32)  # [K, T]
        bias = np.asarray(params["bias"], np.float32).reshape(1, -1)
        b.svdf(w_freq, w_time, bias, rank)
        # The only nonlinearity is relu(units + bias) inside the svdf op;
        # the fc chain is plain matmul+bias (kws.py:649-668, models/kws.py).
        for name in ("fc1", "fc2", "fc3"):
            w, bb = _dense_wb(params, name)
            b.dense(w, bb)
        return b, 3

    if arch == "conv":
        w, bias = _raw_conv(params, "conv1")
        b.conv(w, bias, 20, 8, 1, 1, 1, True, "SAME")
        b.maxpool(2, 2, 2, 2, "SAME")
        w, bias = _raw_conv(params, "conv2")
        b.conv(w, bias, 10, 4, 1, 1, 1, True, "SAME")
        to, fo = -(-t_in // 2), -(-f_in // 2)
        b.flatten_dense(_flat_w(params, "fc", (to, fo), 64),
                        _dense_bias(params, "fc"))
        return b, 4

    if arch == "tiny_conv":
        w, bias = _raw_conv(params, "conv1")
        b.conv(w, bias, 10, 8, 2, 2, 1, True, "SAME")
        to, fo = -(-t_in // 2), -(-f_in // 2)
        b.flatten_dense(_flat_w(params, "fc", (to, fo), 8),
                        _dense_bias(params, "fc"))
        return b, 4

    if arch == "trad_fpool3":
        w, bias = _raw_conv(params, "conv1")
        b.conv(w, bias, 20, 8, 1, 1, 1, True, "VALID")
        t1, f1 = t_in - 19, f_in - 7
        b.maxpool(1, 3, 1, 3, "VALID")
        f2 = (f1 - 3) // 3 + 1
        w, bias = _raw_conv(params, "conv2")
        b.conv(w, bias, 10, 4, 1, 1, 1, True, "VALID")
        t3, f3 = t1 - 9, f2 - 3
        b.flatten_dense(_flat_w(params, "lin", (t3, f3), 64), None)
        for name in ("fc1", "fc2"):
            w, bb = _dense_wb(params, name)
            b.dense(w, bb)
        return b, 4

    if arch in ("low_latency_conv", "one_fstride4"):
        stride_f = 4 if arch == "one_fstride4" else 1
        kern = np.asarray(params["conv1"]["kernel"], np.float32)  # [T,8,1,U]
        w_full = np.transpose(kern[:, :, 0, :], (1, 0, 2)).copy()  # [8,T,U]
        bias = (
            np.asarray(params["conv1"]["bias"], np.float32).reshape(1, -1)
            if "bias" in params["conv1"]
            else None
        )
        b.tconv_full(w_full, bias, stride_f, True)
        fo = (f_in - 8) // stride_f + 1
        u = kern.shape[-1]
        if arch == "one_fstride4":
            b.flatten_dense(
                np.asarray(params["lin"]["kernel"], np.float32).reshape(fo, u, -1),
                None,
            )
            for name in ("fc1", "fc2", "fc3"):
                w, bb = _dense_wb(params, name)
                b.dense(w, bb)
        else:
            b.flatten_dense(
                np.asarray(params["fc1"]["kernel"], np.float32).reshape(fo, u, -1),
                np.asarray(params["fc1"]["bias"], np.float32).reshape(1, -1),
            )
            for name in ("fc2", "fc3"):
                w, bb = _dense_wb(params, name)
                b.dense(w, bb)
        return b, 4

    raise ValueError(f"unsupported KWS architecture {arch!r}")


def build_op_list(model_cfg: ModelConfig, params, stats, feature_shape):
    """-> (ops static tuple, weight arrays, input_rank 3|4).

    The op list is the COMPLETE network including the classifier tail
    (gap + dense for the CNN families; arch-specific for KWS)."""
    name = model_cfg.name
    input_rank = 4
    if name.startswith("ResNet2D8"):
        b = _build_tc2d(model_cfg, params, stats)
        b.gap()
        b.dense(*_dense_wb(params, "fc"))
    elif name.startswith("Res"):
        b = _build_res(model_cfg, params, stats)
        b.gap()
        b.dense(*_dense_wb(params, "fc"))
    elif name.startswith("DSCNN"):
        b = _build_dscnn(model_cfg, params, stats)
        b.gap()
        b.dense(*_dense_wb(params, "fc1"))
    elif name == "KWS":
        b, input_rank = _build_kws(model_cfg, params, feature_shape)
    else:
        raise ValueError(f"unsupported model {name!r}")
    return tuple(b.ops), b.weights, input_rank


# ---------------------------------------------------------------------------
# in-kernel ops (pure jnp on values — Mosaic-legal slicing/reshapes only)
# ---------------------------------------------------------------------------


def _stride_select(x, axis: int, stride: int):
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


def _window_geometry(t, f, keh, kew, sh, sw, padding):
    """Shared TF-SAME/VALID window math for conv and maxpool: returns
    (to, fo, span_t, span_f, pads) with pads the ((lo,hi),(lo,hi))
    T/F padding (TF-SAME's asymmetric pad_lo = total//2 convention)."""
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
    return to, fo, span_t, span_f, ((plo_t, hi_t), (plo_f, hi_f))


def _conv2d_step(x, w, b, kh, kw, sh, sw, dil, relu, padding, mode):
    """[TB, T, F, Ci] -> [TB, To, Fo, Co] TF-SAME/VALID k x k conv.

    mode: "full" (MXU matmul per tap), "c1" (Ci==1 broadcast-multiply),
    "dw" (depthwise broadcast-multiply).
    """
    tb, t, f, ci = x.shape
    keh = (kh - 1) * dil + 1
    kew = (kw - 1) * dil + 1
    to, fo, span_t, span_f, (pad_t, pad_f) = _window_geometry(
        t, f, keh, kew, sh, sw, padding
    )
    if any(pad_t) or any(pad_f):
        x = jnp.pad(x, ((0, 0), pad_t, pad_f, (0, 0)))

    acc = None
    for i in range(kh):
        sl_t = jax.lax.slice_in_dim(x, i * dil, i * dil + span_t, axis=1)
        sl_t = _stride_select(sl_t, 1, sh)
        for j in range(kw):
            sl = jax.lax.slice_in_dim(sl_t, j * dil, j * dil + span_f, axis=2)
            sl = _stride_select(sl, 2, sw)
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
        sl_t = _stride_select(sl_t, 1, sh)
        for j in range(pw):
            sl = jax.lax.slice_in_dim(sl_t, j, j + span_f, axis=2)
            sl = _stride_select(sl, 2, sw)
            acc = sl if acc is None else acc + sl
    return acc * (1.0 / (ph * pw))


def _maxpool2d_step(x, ph, pw, sh, sw, padding):
    """TF-SAME/VALID max pool (SAME pads with -inf)."""
    tb, t, f, ci = x.shape
    to, fo, span_t, span_f, (pad_t, pad_f) = _window_geometry(
        t, f, ph, pw, sh, sw, padding
    )
    if any(pad_t) or any(pad_f):
        x = jnp.pad(
            x, ((0, 0), pad_t, pad_f, (0, 0)),
            constant_values=-np.inf,
        )
    acc = None
    for i in range(ph):
        sl_t = jax.lax.slice_in_dim(x, i, i + span_t, axis=1)
        sl_t = _stride_select(sl_t, 1, sh)
        for j in range(pw):
            sl = jax.lax.slice_in_dim(sl_t, j, j + span_f, axis=2)
            sl = _stride_select(sl, 2, sw)
            acc = sl if acc is None else jnp.maximum(acc, sl)
    return acc


def _flatten_dense_step(x, w, b, relu):
    """reshape(b, -1) + Dense WITHOUT a minor-dim reshape: batched
    dot_general over the spatial dims, summed after.

    4D x [TB,T,F,C] with w [T,F,C,U]: batch (t,f), contract c.
    3D x [TB,T,F]  with w [T,F,U]:   batch t,     contract f (minor).
    """
    # Mosaic's batched matmul wants the batch dim LEADING on both
    # operands ("batch dims must be equal") — transpose the batch axes
    # to the front (non-minor transpose, legal) and keep ONE batch dim.
    if x.ndim == 4:
        t, f, c, u = w.shape
        xt = jnp.transpose(x, (1, 2, 0, 3))  # [T, F, TB, C]
        xt = xt.reshape(t * f, x.shape[0], c)  # merge leading dims
        wt = w.reshape(t * f, c, u)
        parts = jax.lax.dot_general(
            xt, wt,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [T*F, TB, U]
        y = jnp.sum(parts, axis=0)
    else:
        xt = jnp.transpose(x, (1, 0, 2))  # [T, TB, F]
        parts = jax.lax.dot_general(
            xt, w,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [T, TB, U]
        y = jnp.sum(parts, axis=0)
    if b is not None:
        y = y + b
    return jnp.maximum(y, 0.0) if relu else y


def _tconv_full_step(x, w, b, kw, sw, relu):
    """Full-height VALID conv (kernel (T, kw), output [TB, Fo, U]).

    x [TB, T, F, 1]; w [kw, T, U]. Per f-tap: contract the whole time
    axis with a dot_general (kws.py:293-487 first layers have kernel
    height == num frames, so To == 1 and the 'conv' is a per-window
    projection)."""
    tb, t, f, _ = x.shape
    fo = (f - (kw - 1) - 1) // sw + 1
    span_f = sw * (fo - 1) + 1
    acc = None
    for j in range(kw):
        sl = jax.lax.slice_in_dim(x, j, j + span_f, axis=2)
        sl = _stride_select(sl, 2, sw)  # [TB, T, Fo, 1]
        part = jax.lax.dot_general(
            sl, w[j],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TB, Fo, 1, U]
        part = part[:, :, 0, :]  # squeeze middle dim -> [TB, Fo, U]
        acc = part if acc is None else acc + part
    if b is not None:
        acc = acc + b
    return jnp.maximum(acc, 0.0) if relu else acc


def _svdf_step(x, w_freqs, w_time_ts, bias):
    """SVDF forward (kws.py:583-625): freq projection, per-filter time
    dot, unit-major rank sum, relu(units + bias). x [TB, T, F].

    The rank sum arrives pre-split: w_freqs[r] [F, units] and
    w_time_ts[r] [T, units] are the r-th rank component's weight slices
    (builder svdf()), so summing the per-r partials IS the unit-major
    rank sum — no [K, units] one-hot matmul, no minor-dim reshape."""
    tb, t, f = x.shape
    x2 = x.reshape(tb * t, f)
    acc = None
    for w_freq_r, w_time_r in zip(w_freqs, w_time_ts):
        acts = jnp.dot(
            x2, w_freq_r, preferred_element_type=jnp.float32
        ).reshape(tb, t, -1)
        part = jnp.sum(acts * w_time_r[None], axis=1)  # [TB, units]
        acc = part if acc is None else acc + part
    return jnp.maximum(acc + bias, 0.0)


def _mask_cols(x, vf: int):
    """Zero out F columns >= vf (x is [TB, T, Fpad, C], Fpad >= vf).

    Built from an in-kernel iota — a closure-captured numpy constant
    would be rejected by pallas_call ("captures constants")."""
    if vf >= x.shape[2]:
        return x
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    return jnp.where(idx < vf, x, 0.0)


def _kernel2d(*refs, ops: Tuple[Tuple, ...]):
    """Ref order: feats [TB,T,F,1] or [TB,T,F], per-op weights, out.

    A pure interpreter over the static op list; the final op leaves a
    2D [TB, num_classes] logits value.

    F-axis sublane alignment: a stride-1 VALID pool (Res8's front 4x3
    pool, res.py:78) leaves an F width that is not a multiple of 8
    (98x40 -> 95x38); every later tap matmul's merge-reshape then forces
    a Mosaic relayout (measured 235 us vs Res15's 97 us for HALF the
    convs). Instead we zero-pad F back to the next multiple of 8 and
    carry the valid width `vf`: a stride-1 SAME conv on the padded map
    computes the exact width-vf SAME result in columns [0, vf) because
    the pad columns are kept zero (re-masked after every bias/affine,
    which would otherwise leak ReLU(bias) into them)."""
    x = refs[0][:].astype(jnp.float32)
    wrefs = refs[1:-1]
    out_ref = refs[-1]

    shortcut = None
    vf = None  # valid F width when the F axis carries zero padding
    wi = 0
    for op in ops:
        kind = op[0]
        if kind == "conv":
            _, kh, kw, sh, sw, dil, relu, padding, mode, role = op
            w = wrefs[wi][:]
            b = wrefs[wi + 1][:]
            wi += 2
            if vf is not None and not (
                sh == 1 and sw == 1 and padding == "SAME"
            ):
                # padded-F mode is only exact for stride-1 SAME convs;
                # raise (not assert — python -O strips asserts and the
                # kernel would silently compute over the pad columns)
                raise ValueError(f"padded-F conv must be stride-1 SAME: {op}")
            y = _conv2d_step(x, w, b, kh, kw, sh, sw, dil, relu, padding, mode)
            if vf is not None:
                y = _mask_cols(y, vf)
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
            if vf is not None:
                x = _mask_cols(x, vf)
        elif kind == "pool":
            _, ph, pw, sh, sw = op
            # pad columns are zero: an avg window spanning them would be
            # silently wrong (conv handles vf via re-zeroing; pools don't)
            if vf is not None:
                raise ValueError("avg pool after F-padding is unsupported")
            x = _pool2d_step(x, ph, pw, sh, sw)
            if sh == 1 and sw == 1 and x.shape[2] % 8:
                vf = x.shape[2]
                x = jnp.pad(
                    x, ((0, 0), (0, 0), (0, (-vf) % 8), (0, 0))
                )
        elif kind == "maxpool":
            _, ph, pw, sh, sw, padding = op
            if vf is not None:
                raise ValueError("max pool after F-padding is unsupported")
            x = _maxpool2d_step(x, ph, pw, sh, sw, padding)
        elif kind == "save":
            shortcut = x
        elif kind == "addsc":
            x = x + shortcut
            if op[1]:
                x = jnp.maximum(x, 0.0)
            shortcut = None
        elif kind == "gap":
            if vf is not None:
                # pad columns are zero, so sum is exact; divide by the
                # VALID element count, not the padded one
                x = jnp.sum(x, axis=(1, 2)) * (1.0 / (x.shape[1] * vf))
                vf = None
            else:
                x = jnp.mean(x, axis=(1, 2))  # [TB, C]
        elif kind == "dense":
            _, relu, has_bias = op
            w = wrefs[wi][:]
            wi += 1
            b = None
            if has_bias:
                b = wrefs[wi][:]
                wi += 1
            x = jnp.dot(x, w, preferred_element_type=jnp.float32)
            if b is not None:
                x = x + b
            if relu:
                x = jnp.maximum(x, 0.0)
        elif kind == "flatten_dense":
            _, relu, has_bias = op
            w = wrefs[wi][:]
            wi += 1
            b = None
            if has_bias:
                b = wrefs[wi][:]
                wi += 1
            x = _flatten_dense_step(x, w, b, relu)
        elif kind == "tconv_full":
            _, kw, sw, relu, has_bias = op
            w = wrefs[wi][:]
            wi += 1
            b = None
            if has_bias:
                b = wrefs[wi][:]
                wi += 1
            x = _tconv_full_step(x, w, b, kw, sw, relu)
        elif kind == "svdf":
            rank = op[1]
            w_freqs = [wrefs[wi + r][:] for r in range(rank)]
            w_time_ts = [wrefs[wi + rank + r][:] for r in range(rank)]
            bias = wrefs[wi + 2 * rank][:]
            wi += 2 * rank + 1
            x = _svdf_step(x, w_freqs, w_time_ts, bias)
        else:
            # an unhandled kind would silently desynchronize the weight
            # index and produce garbage logits — fail at trace time
            raise ValueError(f"unknown op kind {kind!r}")

    # out block is [1, TB, ncls] (leading grid dim); the (TB, ncls) ->
    # (1, TB, ncls) reshape is a leading-dim split, legal in Mosaic.
    out_ref[:] = x.reshape(out_ref.shape)


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

    from tcresnet_tpu.ops.pallas.mfcc import (
        _fused_mfcc_impl,
        resolve_dft_variant,
    )

    tb = tb or _FAMILY_TB[model_cfg.name]
    n = audio_cfg.desired_samples
    feature_shape = dsp.feature_shape(audio_cfg)
    t_dim, f_dim, _ = feature_shape
    ncls = model_cfg.num_classes

    ops, weights, input_rank = build_op_list(
        model_cfg, params, batch_stats, feature_shape
    )
    weights = [jnp.asarray(w) for w in weights]

    weight_specs = [
        pl.BlockSpec(
            w.shape, (lambda nd: lambda i: (0,) * nd)(w.ndim),
            memory_space=pltpu.VMEM,
        )
        for w in weights
    ]

    def _infer_local(wavs: jnp.ndarray) -> jnp.ndarray:
        batch = wavs.shape[0]
        assert wavs.shape[1] == n
        feats = _fused_mfcc_impl(
            wavs.astype(jnp.float32), audio_cfg, interpret, min(8, batch),
            resolve_dft_variant(audio_cfg, n),  # honor cfg.dft_variant
        )  # [B, T, F]
        tb_eff = min(tb, batch)
        pad_b = (-batch) % tb_eff
        if pad_b:
            feats = jnp.pad(feats, ((0, pad_b), (0, 0), (0, 0)))
        padded_b = feats.shape[0]
        if input_rank == 4:
            x_in = feats[..., None]  # [B, T, F, 1] (XLA-level reshape)
            in0 = pl.BlockSpec(
                (tb_eff, t_dim, f_dim, 1), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            x_in = feats  # [B, T, F] (single_fc / svdf: no spatial conv)
            in0 = pl.BlockSpec(
                (tb_eff, t_dim, f_dim), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )

        kernel = functools.partial(_kernel2d, ops=ops)
        n_blocks = padded_b // tb_eff
        # Output is [n_blocks, tb, ncls], block [1, tb, ncls]: a 2D
        # [padded_b, ncls] output with block [tb, ncls] is Mosaic-illegal
        # whenever tb < padded_b and tb % 8 != 0 (the second-to-last
        # block dim must be sublane-divisible or span the array) — the
        # grid rides a leading dim instead, merged back below.
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[in0] + weight_specs,
            out_specs=pl.BlockSpec(
                (1, tb_eff, ncls), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_blocks, tb_eff, ncls), jnp.float32
            ),
            interpret=interpret,
            # 98x40 maps pad channels to 128 lanes (~2 MB per live f32
            # buffer); the default 16 MB scoped-vmem cap is a soft
            # compiler limit, not the physical VMEM size — raise it for
            # the map families (measured need: ~18-40 MB at TB=1).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(x_in, *weights)
        return out.reshape(padded_b, ncls)[:batch]

    @jax.jit
    def infer(wavs: jnp.ndarray) -> jnp.ndarray:
        from jax.sharding import PartitionSpec as P

        from tcresnet_tpu.parallel.mesh import maybe_shard_map

        sharded = maybe_shard_map(
            _infer_local, mesh, in_specs=(P("data"),),
            batch=wavs.shape[0], tile=tb,
        )
        if sharded is not None:
            return sharded(wavs)
        return _infer_local(wavs)

    return infer
