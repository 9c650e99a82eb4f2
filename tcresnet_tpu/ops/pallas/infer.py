"""Single-kernel TC-ResNet inference: wav -> logits in ONE Pallas call.

TPU-native replacement for the reference's deploy path (freeze.py ->
.tflite -> TF-Lite interpreter, one C++ kernel dispatch per op): here the
ENTIRE inference program — MFCC front end (windowed real-DFT, mel, log,
DCT as MXU matmuls) and every temporal conv / BN / ReLU / residual add /
pool / classifier of audio_nets/tc_resnet.py — runs inside one kernel
launch, with all weights (~65k params, ~260 KB) resident in VMEM and no
intermediate activation ever touching HBM.

Eval-mode BatchNorm makes whole-model fusion legal: the running-stat
affine folds into each conv's weights at build time (scale = gamma /
sqrt(var + 1e-3), reference slim.batch_norm epsilon), so a conv+BN+ReLU
triple becomes shifted-slice MXU matmuls + bias + max. Temporal k x 1
convs (tc_resnet.py:28-41) are computed as k shifted middle-dim slices of
the [TB, T, C] activation, each matmul'd against the corresponding
[C_in, C_out] weight block — TF-SAME padding and stride-2 downsampling
(even-row selection via a leading-dim reshape; the minor dim never
changes, respecting Mosaic's reshape rule) are exact.

Numerics: BN folding is algebraically exact; agreement with the XLA
inference path (serve/export.build_inference_fn) is ULP-level — softmax
outputs match to <=1e-5, the BASELINE.md AOT-parity gate
(tests/test_pallas_infer.py).

Supported: TCResNet8 / TCResNet14 (any width multiplier), MFCC features,
hop-decomposable geometry. Other families use the XLA path.
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

_TC_CHANNELS = {
    "TCResNet8": (16, 24, 32, 48),
    "TCResNet14": (16, 24, 24, 32, 32, 48, 48),
}


def fused_infer_available(model_cfg: ModelConfig, audio_cfg: AudioConfig) -> bool:
    """Whole-model kernel supports the temporal TC-ResNet family on the
    spectral front ends (MFCC and log-mel — the in-kernel tail handles
    both, mfcc.mfcc_plan)."""
    from tcresnet_tpu.ops.pallas.mfcc import fused_mfcc_available

    return model_cfg.name in _TC_CHANNELS and fused_mfcc_available(audio_cfg)


# ---------------------------------------------------------------------------
# weight folding: conv kernel + BN running stats -> (W [k*Cin, Cout], b)
# ---------------------------------------------------------------------------


def _fold_conv_bn(params, stats, name: str) -> Tuple[np.ndarray, np.ndarray]:
    kern = np.asarray(params[f"{name}_conv"]["kernel"], np.float32)  # [k,1,Ci,Co]
    gamma = np.asarray(params[f"{name}_bn"]["scale"], np.float32)
    beta = np.asarray(params[f"{name}_bn"]["bias"], np.float32)
    mean = np.asarray(stats[f"{name}_bn"]["mean"], np.float32)
    var = np.asarray(stats[f"{name}_bn"]["var"], np.float32)
    s = gamma / np.sqrt(var + _BN_EPS)
    k, kw, ci, co = kern.shape
    assert kw == 1, "temporal conv expected"
    w = (kern[:, 0] * s).reshape(k * ci, co)  # scale broadcasts over Cout
    b = (beta - mean * s).reshape(1, co)
    return w, b


def build_layer_spec(
    model_cfg: ModelConfig, params, stats
) -> Tuple[List[Dict[str, Any]], np.ndarray]:
    """Flatten the TC-ResNet block structure into a conv list + fc kernel.

    Each entry: {name, w, b, k, stride, relu, role} where role is one of
    "conv0" | "down" | "block0" (first block conv) | "block1" (second,
    pre-add). The kernel interpreter below replays the residual dataflow
    of tc_resnet.py:28-48 from the roles.
    """
    channels = tuple(
        int(c * model_cfg.width_multiplier) for c in _TC_CHANNELS[model_cfg.name]
    )
    spec: List[Dict[str, Any]] = []
    spec.append(
        dict(role="conv0", k=3, stride=1, relu=True,
             wb=_fold_conv_bn(params, stats, "conv0"))
    )
    prev = channels[0]
    for i, n in enumerate(channels[1:]):
        stride = 2 if n != prev else 1
        if n != prev:
            spec.append(
                dict(role="down", k=1, stride=2, relu=True,
                     wb=_fold_conv_bn(params, stats, f"block{i}_down"))
            )
        spec.append(
            dict(role="block0", k=9, stride=stride, relu=True,
                 wb=_fold_conv_bn(params, stats, f"block{i}_conv0"))
        )
        spec.append(
            dict(role="block1", k=9, stride=1, relu=False,
                 wb=_fold_conv_bn(params, stats, f"block{i}_conv1"))
        )
        prev = n
    fc = np.asarray(params["fc"]["kernel"], np.float32)  # [C_last, ncls]
    return spec, fc


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def same_padded_input(x, k: int, stride: int):
    """TF-SAME padded input for a k x 1 temporal conv: (xpad, to, span).

    The ONE home of the TF-SAME pad geometry (lo = total // 2, right pad
    covering span + k - 1) shared by the whole-model inference conv and
    the tconv fwd/dw kernels (ops/pallas/tconv.py) — must never drift."""
    t = x.shape[1]
    to = -(-t // stride)
    total = max((to - 1) * stride + k - t, 0)
    lo = total // 2
    span = stride * (to - 1) + 1
    xpad = jnp.pad(x, ((0, 0), (lo, max(span + k - 1 - t - lo, 0)), (0, 0)))
    return xpad, to, span


def tap_slice(xpad, j: int, span: int, stride: int):
    """j-th stride-decimated tap slice of the SAME-padded input: rows
    j, j+stride, ... via a middle-axis split reshape (the minor dim is
    untouched — Mosaic-legal). Shared with ops/pallas/tconv.py."""
    sl = jax.lax.slice_in_dim(xpad, j, j + span, axis=1)
    if stride > 1:
        tb, rows, c = sl.shape
        pad_r = (-rows) % stride
        if pad_r:
            sl = jnp.pad(sl, ((0, 0), (0, pad_r), (0, 0)))
        sl = sl.reshape(tb, -1, stride, c)[:, :, 0, :]
    return sl


def _conv_step(x, w, b, k: int, stride: int, relu: bool):
    """[TB, T, Cin] -> [TB, To, Cout]: TF-SAME k x 1 conv as k shifted
    middle-dim slices, each MXU-matmul'd against its weight block."""
    tb, t, ci = x.shape
    co = w.shape[-1]
    xpad, to, span = same_padded_input(x, k, stride)
    acc = None
    for j in range(k):
        sl = tap_slice(xpad, j, span, stride)
        part = jnp.dot(
            sl.reshape(tb * to, ci),
            jax.lax.slice_in_dim(w, j * ci, (j + 1) * ci, axis=0),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    y = acc.reshape(tb, to, co) + b[None]
    return jnp.maximum(y, 0.0) if relu else y


def _kernel(
    *refs,
    tb: int,
    spec_static: Tuple[Tuple[str, int, int, bool], ...],
    n_hops: int,
    hop: int,
    k_dft: int,
    num_bins: int,
    frames: int,
    matmul_dtype,
    magnitude: bool = False,
):
    """Ref order: hops [TB, n_hops, hop], dft, mel, dct,
    (w, b) per conv in spec order, fc, out [TB, ncls]."""
    from tcresnet_tpu.ops.pallas.mfcc import mfcc_tail

    hops_ref, dft_ref, mel_ref, dct_ref = refs[:4]
    n_convs = len(spec_static)
    wrefs = refs[4 : 4 + 2 * n_convs]
    fc_ref = refs[4 + 2 * n_convs]
    out_ref = refs[5 + 2 * n_convs]

    # ---- shared MFCC matmul tail (ops/pallas/mfcc.mfcc_tail) ----
    # result [TB, T=frames, C=num_mfcc]: frequency-as-channels
    # (tc_resnet.py:17); matmul_dtype honors cfg.dsp_matmul_dtype so the
    # fused features match the XLA path (dsp.py) bit-for-policy
    x = mfcc_tail(
        hops_ref[:].reshape(tb * n_hops, hop),
        dft_ref[:], mel_ref[:], dct_ref[:],
        tb=tb, n_hops=n_hops, k=k_dft, num_bins=num_bins,
        frames=frames, matmul_dtype=matmul_dtype, magnitude=magnitude,
    )

    # ---- conv stack (tc_resnet.py:28-48, BN folded) ----
    shortcut = None
    for idx, (role, k, stride, relu) in enumerate(spec_static):
        w = wrefs[2 * idx][:]
        b = wrefs[2 * idx + 1][:]
        if role == "conv0":
            x = _conv_step(x, w, b, k, stride, relu)
        elif role == "down":
            shortcut = _conv_step(x, w, b, k, stride, relu)
        elif role == "block0":
            if shortcut is None:
                shortcut = x  # same-channel block: identity shortcut
            x = _conv_step(x, w, b, k, stride, relu)
        else:  # block1: conv (no relu) + residual add + relu
            x = _conv_step(x, w, b, k, stride, relu)
            x = jnp.maximum(x + shortcut, 0.0)
            shortcut = None

    pooled = jnp.mean(x, axis=1)  # global avg pool over time
    out_ref[:] = jnp.dot(pooled, fc_ref[:], preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def build_fused_infer(
    model_cfg: ModelConfig,
    audio_cfg: AudioConfig,
    params,
    batch_stats,
    tb: int = 8,
    interpret: bool = False,
    mesh=None,
):
    """-> infer(wavs [B, N] f32) -> logits [B, num_classes] f32.

    Weights are folded (BN -> scale/bias) once here and baked into the
    kernel as VMEM-resident constants; the returned callable is pure and
    jittable (tools/export.py exposes it via --fused-kernel). With a
    multi-device `mesh` the kernel runs per-shard under shard_map with
    the batch sharded over the `data` axis (custom calls cannot be
    partitioned by plain jit), when the batch divides evenly; otherwise
    it falls back to the single-device call.
    """
    assert fused_infer_available(model_cfg, audio_cfg)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tcresnet_tpu.ops.pallas.mfcc import mfcc_plan

    n = audio_cfg.desired_samples
    # shared geometry/constants with the MFCC/frontend kernels
    # (mfcc.mfcc_plan — the paths must never drift). This kernel embeds
    # the hops DFT tail: inference parity is defined against the XLA
    # path (dsp.preprocess), which dft_variant never affects.
    (window, hop, fft_length, num_bins, k_dft, n_hops, frames), dft_ws, \
        mel, dct, matmul_dtype, _ = mfcc_plan(audio_cfg, n, "hops")
    two_k = 2 * num_bins
    num_mel = audio_cfg.num_mel_bins
    out_w = dsp.feature_width(audio_cfg)
    magnitude = audio_cfg.preprocess_method == "log_mel_spectrogram"
    ncls = model_cfg.num_classes

    spec, fc = build_layer_spec(model_cfg, params, batch_stats)
    # cost estimate for XLA's latency-hiding scheduler, like the sibling
    # fused kernels: DFT + MFCC tail + the whole conv stack + fc
    dft_flops = n_hops * hop * k_dft * two_k
    tail_flops = frames * num_bins * num_mel + frames * num_mel * out_w
    conv_flops = 0
    t_cur = frames
    for e in spec:
        t_out = -(-t_cur // e["stride"])
        w_e, _ = e["wb"]
        conv_flops += t_out * w_e.shape[0] * w_e.shape[1]
        if e["role"] in ("conv0", "block0", "block1"):
            t_cur = t_out
    conv_flops += fc.shape[0] * fc.shape[1]
    spec_static = tuple((e["role"], e["k"], e["stride"], e["relu"]) for e in spec)
    weights = []
    for e in spec:
        w, b = e["wb"]
        weights += [jnp.asarray(w), jnp.asarray(b)]

    const_map = lambda i: (0, 0)
    weight_specs = [
        pl.BlockSpec(w.shape, const_map, memory_space=pltpu.VMEM)
        for w in weights
    ]

    def _infer_local(wavs: jnp.ndarray) -> jnp.ndarray:
        batch = wavs.shape[0]
        assert wavs.shape[1] == n
        tb_eff = min(tb, batch)  # batch-1 latency calls don't pad to tb
        pad_b = (-batch) % tb_eff
        if pad_b:
            wavs = jnp.pad(wavs, ((0, pad_b), (0, 0)))
        padded_b = wavs.shape[0]
        hops3 = wavs.astype(jnp.float32).reshape(padded_b, n_hops, hop)
        kernel = functools.partial(
            _kernel, tb=tb_eff, spec_static=spec_static, n_hops=n_hops,
            hop=hop, k_dft=k_dft, num_bins=num_bins, frames=frames,
            matmul_dtype=matmul_dtype, magnitude=magnitude,
        )

        out = pl.pallas_call(
            kernel,
            grid=(padded_b // tb_eff,),
            in_specs=[
                pl.BlockSpec((tb_eff, n_hops, hop), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hop, k_dft * two_k), const_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((num_bins, num_mel), const_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(dct.shape, const_map,
                             memory_space=pltpu.VMEM),
            ]
            + weight_specs
            + [pl.BlockSpec(fc.shape, const_map, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tb_eff, ncls), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((padded_b, ncls), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * padded_b * (dft_flops + tail_flops + conv_flops),
                bytes_accessed=padded_b * (n + ncls) * 4,
                transcendentals=padded_b * frames * num_mel,
            ),
        )(
            hops3,
            dft_ws[0],
            jnp.asarray(mel),
            jnp.asarray(dct),
            *weights,
            jnp.asarray(fc),
        )
        return out[:batch]

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
