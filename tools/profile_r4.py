#!/usr/bin/env python
"""Round-4 perf experiments (real TPU, fori_loop-diff protocol).

Three questions, each answered by direct measurement:

A. dft-ablate: is the windowed-DFT matmul the bottleneck of the MFCC
   front end?  Times the real pipelines against ABLATED twins whose DFT
   matmul does 1/4 of the MXU work (output columns trimmed, zero-padded
   back — wrong values, identical shapes/traffic).  If the ablated twin
   is barely faster, a factored (Cooley-Tukey) DFT cannot win and
   VERDICT r3 item 3 closes as a measured negative.

B. res-conv: can any XLA-expressible formulation of the Res family's
   3x3 45-channel convs beat lax.conv_general_dilated?  Times a single
   conv fwd and fwd+bwd as: lax.conv, explicit im2col (patch concat +
   K=9C matmul), and per-tap matmul accumulation.  Checks values match.

C. frontend-small: why does the fused frontend kernel lose to the XLA
   input path below 2048 rows?  Times the XLA MFCC path vs the fused
   kernel across batches, plus a lax.map-chunked XLA variant (four
   1024-row programs) at large batch to test whether XLA's small-batch
   program simply serially composes.

Usage: python tools/profile_r4.py A B C   (any subset)
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tcresnet_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def timed_loop(body, n1=10, n2=60):
    """seconds/iter of body(i, acc)->acc via the fori_loop-diff protocol."""

    @jax.jit
    def run(n):
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(jnp.int32(2)))  # compile + warm
    t0 = time.perf_counter()
    float(run(jnp.int32(n1)))
    t1 = time.perf_counter()
    float(run(jnp.int32(n2)))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def report(name, batch, sec):
    row = {
        "name": name,
        "batch": batch,
        "us_per_iter": round(sec * 1e6, 1),
        "us_per_utt": round(sec * 1e6 / batch, 4),
        "utt_per_s": round(batch / sec, 1),
    }
    print(json.dumps(row), flush=True)
    return row


# ---------------------------------------------------------------------------
# A. DFT FLOP ablation
# ---------------------------------------------------------------------------


def run_a(batches=(1024, 1536, 4096)):
    from tcresnet_tpu.config import get_preset
    from tcresnet_tpu.ops import dsp
    from tcresnet_tpu.ops.pallas import mfcc as pm

    cfg = get_preset("TCResNet8-1.0").audio
    window, hop = cfg.window_size_samples, cfg.window_stride_samples
    fftl = dsp.fft_length_for(window)
    num_bins = fftl // 2 + 1
    two_k = 2 * num_bins

    # --- XLA path: real vs DFT-output-trimmed (1/4 of N) ---
    def xla_mfcc(audio):
        return dsp.mfcc(audio, cfg)

    def xla_mfcc_ablated(audio):
        frames = dsp.frame_signal(audio.astype(jnp.float32), window, hop)
        dft = jnp.asarray(dsp.windowed_rdft_matrix(window, fftl))
        n4 = 128  # 2K=514 -> 128 columns: ~1/4 of the MXU work
        reim = jnp.einsum("...fw,wk->...fk", frames, dft[:, :n4],
                          preferred_element_type=jnp.float32)
        reim = jnp.pad(reim, ((0, 0), (0, 0), (0, two_k - n4)))
        re, im = reim[..., :num_bins], reim[..., num_bins:]
        spec = re * re + im * im
        mel_w = jnp.asarray(dsp.linear_to_mel_weight_matrix(
            cfg.num_mel_bins, num_bins, cfg.sample_rate,
            cfg.lower_edge_hertz, cfg.upper_edge_hertz))
        mel = jnp.einsum("...fk,km->...fm", spec, mel_w,
                         preferred_element_type=jnp.float32)
        log_mel = jnp.log(mel + 1e-6)
        dct_w = jnp.asarray(dsp.dct_ii_matrix(cfg.num_mel_bins, cfg.num_mfccs))
        return jnp.einsum("...fm,mc->...fc", log_mel, dct_w,
                          preferred_element_type=jnp.float32)

    # --- fused kernel: real vs ablated tail (same trim inside the kernel).
    # Fresh jit wrappers around the unjitted impl so the monkeypatched
    # tail is retraced (the module-level jit cache would mask it).
    impl = pm._fused_mfcc_impl.__wrapped__

    def fused_real(audio):
        return impl(audio, cfg, False, 8, "hops")

    real_tail = pm.mfcc_tail

    def ablated_tail(hops, dft, mel_w, dct_w, *, tb, n_hops, k, num_bins,
                     frames, matmul_dtype=jnp.float32, magnitude=False):
        two_k_ = 2 * num_bins
        n4 = (k * two_k_) // 4 // 128 * 128
        partial = jnp.dot(hops.astype(matmul_dtype), dft[:, :n4],
                          preferred_element_type=jnp.float32)
        partial = jnp.pad(partial, ((0, 0), (0, k * two_k_ - n4)))
        partial = partial.reshape(tb, n_hops, k * two_k_)
        reim = partial[:, 0:frames, 0:two_k_]
        for j in range(1, k):
            reim = reim + partial[:, j:j + frames, j * two_k_:(j + 1) * two_k_]
        return pm.mfcc_from_reim(reim, mel_w, dct_w, tb=tb, frames=frames,
                                 num_bins=num_bins, magnitude=magnitude)

    def fused_ablated(audio):
        pm.mfcc_tail = ablated_tail
        try:
            return impl(audio, cfg, False, 8, "hops")
        finally:
            pm.mfcc_tail = real_tail

    for batch in batches:
        key = jax.random.key(0)
        audio0 = jax.random.normal(key, (batch, 16000), jnp.float32)

        for name, fn in [
            ("xla_mfcc", xla_mfcc),
            ("xla_mfcc_dft_quarter", xla_mfcc_ablated),
            ("fused_mfcc", fused_real),
            ("fused_mfcc_dft_quarter", fused_ablated),
        ]:
            jfn = jax.jit(fn)

            def body(i, acc, jfn=jfn, audio0=audio0):
                a = audio0 + i.astype(jnp.float32)
                return acc + jnp.sum(jfn(a) ** 2)

            report(name, batch, timed_loop(body))


# ---------------------------------------------------------------------------
# B. Res conv formulations
# ---------------------------------------------------------------------------


def conv_lax(x, w, dil=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_im2col(x, w, dil=1):
    """Explicit im2col: 9 shifted slices -> minor concat -> K=9C matmul."""
    kh, kw, ci, co = w.shape
    b, h, ww, _ = x.shape
    span_h, span_w = (kh - 1) * dil, (kw - 1) * dil
    xp = jnp.pad(x, ((0, 0), (span_h // 2, span_h - span_h // 2),
                     (span_w // 2, span_w - span_w // 2), (0, 0)))
    parts = []
    for i in range(kh):
        for j in range(kw):
            parts.append(jax.lax.dynamic_slice(
                xp, (0, i * dil, j * dil, 0), (b, h, ww, ci)))
    patches = jnp.concatenate(parts, axis=-1)
    y = jnp.dot(patches.reshape(b * h * ww, kh * kw * ci),
                w.reshape(kh * kw * ci, co))
    return y.reshape(b, h, ww, co)


def conv_tapsum(x, w, dil=1):
    """Per-tap matmul accumulation (infer2d's skeleton, batched)."""
    kh, kw, ci, co = w.shape
    b, h, ww, _ = x.shape
    span_h, span_w = (kh - 1) * dil, (kw - 1) * dil
    xp = jnp.pad(x, ((0, 0), (span_h // 2, span_h - span_h // 2),
                     (span_w // 2, span_w - span_w // 2), (0, 0)))
    acc = None
    for i in range(kh):
        for j in range(kw):
            sl = jax.lax.dynamic_slice(xp, (0, i * dil, j * dil, 0),
                                       (b, h, ww, ci))
            part = jnp.dot(sl.reshape(b * h * ww, ci), w[i, j])
            acc = part if acc is None else acc + part
    return acc.reshape(b, h, ww, co)


def run_b(batches=(256, 1024), dtype=jnp.bfloat16):
    h, ww, c = 98, 40, 45
    key = jax.random.key(1)
    w0 = jax.random.normal(key, (3, 3, c, c), jnp.float32) * 0.1

    # value check (f32, CPU-comparable tolerance on TPU default precision)
    xs = jax.random.normal(jax.random.key(2), (2, h, ww, c), jnp.float32)
    ys = [np.asarray(f(xs, w0)) for f in (conv_lax, conv_im2col, conv_tapsum)]
    for name, y in zip(("im2col", "tapsum"), ys[1:]):
        err = np.abs(y - ys[0]).max()
        print(f"value check {name}: max|diff| vs lax.conv = {err:.2e}")

    for batch in batches:
        x0 = jax.random.normal(jax.random.key(3), (batch, h, ww, c), dtype)
        w = w0.astype(dtype)
        for name, f in [("conv_lax", conv_lax), ("conv_im2col", conv_im2col),
                        ("conv_tapsum", conv_tapsum)]:
            # cast the conv output back to the compute dtype so the
            # transpose conv in the bwd pass sees matching operand dtypes
            jfwd = jax.jit(
                lambda x, f=f: jnp.sum(f(x, w).astype(dtype)
                                       .astype(jnp.float32) ** 2))

            def body(i, acc, jfwd=jfwd, x0=x0):
                return acc + jfwd(x0 + i.astype(dtype))

            report(f"{name}_fwd", batch, timed_loop(body))

            jgrad = jax.jit(jax.grad(
                lambda x, f=f: jnp.sum(f(x, w).astype(dtype)
                                       .astype(jnp.float32) ** 2)))

            def gbody(i, acc, jgrad=jgrad, x0=x0):
                return acc + jnp.sum(jgrad(x0 + i.astype(dtype))
                                     .astype(jnp.float32) ** 2)

            report(f"{name}_fwdbwd", batch, timed_loop(gbody))

        # dilated (Res15 geometry, rate 4)
        for name, f in [("conv_lax_dil4", conv_lax),
                        ("conv_im2col_dil4", conv_im2col)]:
            jfwd = jax.jit(
                lambda x, f=f: jnp.sum(f(x, w, 4).astype(dtype)
                                       .astype(jnp.float32) ** 2))

            def body(i, acc, jfwd=jfwd, x0=x0):
                return acc + jfwd(x0 + i.astype(dtype))

            report(f"{name}_fwd", batch, timed_loop(body))

            jgrad = jax.jit(jax.grad(
                lambda x, f=f: jnp.sum(f(x, w, 4).astype(dtype)
                                       .astype(jnp.float32) ** 2)))

            def gbody(i, acc, jgrad=jgrad, x0=x0):
                return acc + jnp.sum(jgrad(x0 + i.astype(dtype))
                                     .astype(jnp.float32) ** 2)

            report(f"{name}_dil4_fwdbwd", batch, timed_loop(gbody))


# ---------------------------------------------------------------------------
# C. frontend small-batch: XLA vs fused kernel vs chunked XLA
# ---------------------------------------------------------------------------


def run_c(batches=(512, 1024, 1536, 2048, 4096)):
    from tcresnet_tpu.config import get_preset
    from tcresnet_tpu.ops import dsp
    from tcresnet_tpu.ops.pallas.mfcc import fused_mfcc

    cfg = get_preset("TCResNet8-1.0").audio

    def xla_path(a):
        return dsp.mfcc(a, cfg)

    def fused_path(a):
        return fused_mfcc(a, cfg)

    def chunked_xla(a, chunk=1024):
        b = a.shape[0]
        if b <= chunk:
            return dsp.mfcc(a, cfg)
        a3 = a.reshape(b // chunk, chunk, a.shape[-1])
        return jax.lax.map(lambda c: dsp.mfcc(c, cfg), a3).reshape(
            b, -1, cfg.num_mfccs)

    for batch in batches:
        audio0 = jax.random.normal(jax.random.key(0), (batch, 16000),
                                   jnp.float32)
        cases = [("mfcc_xla", xla_path), ("mfcc_fused", fused_path)]
        if batch > 1024 and batch % 1024 == 0:
            cases.append(("mfcc_xla_chunk1024", chunked_xla))
        for name, fn in cases:
            jfn = jax.jit(fn)

            def body(i, acc, jfn=jfn, audio0=audio0):
                return acc + jnp.sum(jfn(audio0 + i.astype(jnp.float32)) ** 2)

            report(name, batch, timed_loop(body))


# ---------------------------------------------------------------------------
# D. infer2d batch serving: TB sweep vs the XLA path (VERDICT r3 weak #6)
# ---------------------------------------------------------------------------


def run_d(models=("Res8", "DSCNNS", "TCResNet2D8-1.0", "KWSfpool3"),
          batches=(32, 128, 1024), tbs=(1, 2, 4)):
    from tcresnet_tpu.config import get_preset
    from tcresnet_tpu.models import build_model
    from tcresnet_tpu.ops import dsp
    from tcresnet_tpu.ops.pallas.infer2d import build_fused_infer2d
    from tcresnet_tpu.serve.export import build_inference_fn

    for name in models:
        cfg = get_preset(name)
        model = build_model(cfg.model, dsp.feature_shape(cfg.audio),
                            "float32")
        feats = jnp.zeros((1,) + dsp.feature_shape(cfg.audio), jnp.float32)
        variables = model.init(jax.random.key(0), feats, training=False)
        params = variables["params"]
        stats = variables.get("batch_stats", {})

        xla_fn = jax.jit(build_inference_fn(
            cfg, {"params": params, "batch_stats": stats}, backend="xla"))

        for batch in batches:
            wavs0 = jax.random.normal(
                jax.random.key(4), (batch, cfg.audio.desired_samples),
                jnp.float32)

            # Small batches run a few hundred µs/iter — diff enough
            # iterations to dwarf the ~30 ms tunnel sync jitter, and
            # take the median of 3 protocol runs.
            n1, n2 = (50, 300) if batch <= 128 else (10, 60)

            def med(body):
                return sorted(timed_loop(body, n1, n2) for _ in range(3))[1]

            def body_x(i, acc):
                return acc + jnp.sum(
                    xla_fn(wavs0 + i.astype(jnp.float32)) ** 2)

            report(f"{name}_xla", batch, med(body_x))

            for tb in tbs:
                if tb > batch:
                    continue
                fused = build_fused_infer2d(
                    cfg.model, cfg.audio, params, stats, tb=tb)

                def body_f(i, acc, fused=fused):
                    return acc + jnp.sum(
                        fused(wavs0 + i.astype(jnp.float32)) ** 2)

                report(f"{name}_fused_tb{tb}", batch, med(body_f))


# ---------------------------------------------------------------------------
# E. radix-4 factored DFT: measure vs dense (VERDICT r3 item 3)
# ---------------------------------------------------------------------------


def run_e(batches=(1024, 1536, 4096)):
    import dataclasses

    from tcresnet_tpu.config import get_preset
    from tcresnet_tpu.ops import dsp
    from tcresnet_tpu.ops.pallas.mfcc import fused_mfcc

    cfg = get_preset("TCResNet8-1.0").audio
    cfg_r4 = dataclasses.replace(cfg, dft_variant="radix4")

    cases = [
        ("xla_dense", lambda a: dsp.mfcc(a, cfg)),
        ("xla_radix4", lambda a: dsp.mfcc(a, cfg_r4)),
        ("fused_hops", lambda a: fused_mfcc(a, cfg, variant="hops")),
        ("fused_radix4", lambda a: fused_mfcc(a, cfg, variant="radix4")),
    ]
    for batch in batches:
        audio0 = jax.random.normal(jax.random.key(0), (batch, 16000),
                                   jnp.float32)
        for name, fn in cases:
            jfn = jax.jit(fn)

            def body(i, acc, jfn=jfn, audio0=audio0):
                return acc + jnp.sum(jfn(audio0 + i.astype(jnp.float32)) ** 2)

            report(name, batch, timed_loop(body))


# ---------------------------------------------------------------------------
# F. frontend kernel with radix4 tail, end to end vs hops
# ---------------------------------------------------------------------------


def run_f(batches=(1024, 1536, 2048, 4096)):
    import dataclasses

    from tcresnet_tpu.config import get_preset
    from tcresnet_tpu.data.device_data import DeviceDataset
    from tcresnet_tpu.data.synthetic import make_synthetic_dataset
    from tcresnet_tpu.ops.pallas.frontend import fused_gather_augment_mfcc

    cfg = get_preset("TCResNet8-1.0")
    host = make_synthetic_dataset(num_samples=24_100, num_classes=12,
                                  desired_samples=16000, seed=0)
    data = DeviceDataset(host, None)
    arrays, noise = data.arrays, data.noise_bank

    for batch in batches:
        for variant in ("hops", "radix4"):
            acfg = dataclasses.replace(cfg.audio, dft_variant=variant)

            @jax.jit
            def step(i, arrs, nz, acfg=acfg):
                key = jax.random.fold_in(jax.random.key(7), i)
                ks, ka = jax.random.split(key)
                idx, labels, silent = DeviceDataset.sample_indices(
                    arrs, ks, batch, None)
                feats = fused_gather_augment_mfcc(
                    arrs[0], idx, silent, ka, cfg.augment, acfg, nz,
                    True, 16000)
                return jnp.sum(feats ** 2)

            def body(i, acc, step=step):
                return acc + step(i, arrays, noise)

            report(f"frontend_{variant}", batch, timed_loop(body))


# ---------------------------------------------------------------------------
# G. Res8 train-step decomposition: where do 52 us/utt go?
# ---------------------------------------------------------------------------


def run_g(batches=(1024,)):
    """B showed a single 3x3 conv is ~1us/utt fwd (7 convs ~= 15us/utt
    fwd+bwd) yet Res8 trains at ~53us/utt. Time the model in ablated
    forms to find the dominator: full fwd+bwd, fwd only, BNs stripped,
    head only, and the f32-vs-bf16 axis."""
    import dataclasses

    import flax.linen as nn

    from tcresnet_tpu.config import get_preset
    from tcresnet_tpu.models import build_model
    from tcresnet_tpu.ops import dsp

    cfg = get_preset("Res8")
    shape = dsp.feature_shape(cfg.audio)

    class ResNoBN(nn.Module):
        """Res8 minus every BatchNorm (convs/relu/pool/head intact)."""
        inner: nn.Module

        @nn.compact
        def __call__(self, x, training=False):
            import tcresnet_tpu.models.res as res_mod
            from tcresnet_tpu.models import layers

            m = self.inner
            x = nn.relu(layers.slim_conv(
                x, m.num_channels, (3, 3), (1, 1), name="f_conv",
                dtype=m.dtype))
            if m.pool_size is not None:
                x = layers.avg_pool_valid(x, m.pool_size, (1, 1))
            idx = 0
            for i in range(m.num_layers // 2):
                shortcut = x
                y = nn.relu(layers.slim_conv(
                    y if False else x, m.num_channels, (3, 3), (1, 1),
                    name=f"conv{idx}", dtype=m.dtype))
                idx += 1
                y = nn.relu(layers.slim_conv(
                    y, m.num_channels, (3, 3), (1, 1),
                    name=f"conv{idx}", dtype=m.dtype))
                idx += 1
                x = y + shortcut
            x = layers.global_avg_pool(x)
            return nn.Dense(m.num_classes, use_bias=False,
                            name="fc")(x).astype(jnp.float32)

    for dtype_name in ("bfloat16", "float32"):
        model = build_model(cfg.model, shape, dtype_name)
        nobn = ResNoBN(inner=model)
        for batch in batches:
            x0 = jax.random.normal(jax.random.key(0), (batch,) + shape,
                                   jnp.float32)

            for name, m, training in [
                ("res8_fwd_eval", model, False),
                ("res8_fwd_train_stats", model, True),
                ("res8_nobn_fwd", nobn, False),
            ]:
                variables = m.init({"params": jax.random.key(0)}, x0[:2],
                                   training=False)

                if training:
                    def fwd(x, variables=variables, m=m):
                        out, _ = m.apply(variables, x, training=True,
                                         mutable=["batch_stats"])
                        return jnp.sum(out.astype(jnp.float32) ** 2)
                else:
                    def fwd(x, variables=variables, m=m):
                        return jnp.sum(
                            m.apply(variables, x, training=False)
                            .astype(jnp.float32) ** 2)

                jfwd = jax.jit(fwd)

                def body(i, acc, jfwd=jfwd, x0=x0):
                    return acc + jfwd(x0 + i.astype(jnp.float32))

                report(f"{name}_{dtype_name}", batch, timed_loop(body, 5, 25))

                # fwd+bwd wrt params (the training shape)
                params = variables["params"]
                rest = {k: v for k, v in variables.items() if k != "params"}

                if training:
                    def loss(p, x, m=m, rest=rest):
                        out, _ = m.apply({"params": p, **rest}, x,
                                         training=True,
                                         mutable=["batch_stats"])
                        return jnp.sum(out.astype(jnp.float32) ** 2)
                else:
                    def loss(p, x, m=m, rest=rest):
                        return jnp.sum(
                            m.apply({"params": p, **rest}, x,
                                    training=False)
                            .astype(jnp.float32) ** 2)

                jgrad = jax.jit(jax.grad(loss))

                def gbody(i, acc, jgrad=jgrad, x0=x0, params=params):
                    g = jgrad(params, x0 + i.astype(jnp.float32))
                    return acc + sum(
                        jnp.sum(l.astype(jnp.float32) ** 2)
                        for l in jax.tree_util.tree_leaves(g))

                report(f"{name}_bwd_{dtype_name}", batch,
                       timed_loop(gbody, 5, 25))


# ---------------------------------------------------------------------------
# H. does XLA's (8,128) buffer tiling inflate HBM traffic on C=45 maps?
# ---------------------------------------------------------------------------


def run_h(batches=(1024,)):
    """Times an identical elementwise chain (relu(x)+x, 4x) on
    [B,95,38,45] vs the same bytes reshaped so the minor dim is
    128-dense ([B,95,1710] and [B*95*38*45//128,128]). If the padded
    C=45 layout is slower, XLA stores map buffers (8,128)-tiled and
    elementwise passes pay 128/45 = 2.8x physical HBM traffic — the
    Res-family step-time dominator candidate. Also times stat-only BN
    (flax) on the map shape, fwd and fwd+bwd."""
    import flax.linen as nn

    h, w, c = 95, 38, 45
    n_el = h * w * c  # 162,450

    def chain(x):
        for _ in range(4):
            x = jax.nn.relu(x) + x
        return jnp.sum(x.astype(jnp.float32) ** 2)

    for dtype in (jnp.bfloat16, jnp.float32):
        dname = jnp.dtype(dtype).name
        for batch in batches:
            flat = jax.random.normal(jax.random.key(0), (batch, n_el), dtype)
            shapes = {
                "map45": (batch, h, w, c),
                "minor1710": (batch, h, w * c),
                "dense128": (batch * n_el // 128, 128),
            }
            for name, shp in shapes.items():
                x0 = flat.reshape(shp)
                jfn = jax.jit(chain)

                def body(i, acc, jfn=jfn, x0=x0):
                    return acc + jfn(x0 + i.astype(x0.dtype))

                report(f"elemwise_{name}_{dname}", batch,
                       timed_loop(body, 10, 60))

            # stat-only BN (the Res-family layer) on the map shape
            bn = nn.BatchNorm(use_running_average=False, momentum=0.997,
                              epsilon=1e-3, use_bias=False, use_scale=False,
                              dtype=dtype if dtype != jnp.float32 else None)
            x0 = flat.reshape(shapes["map45"])
            variables = bn.init(jax.random.key(0), x0[:2])

            @jax.jit
            def bn_fwd(x, variables=variables, bn=bn):
                y, _ = bn.apply(variables, x, mutable=["batch_stats"])
                return jnp.sum(y.astype(jnp.float32) ** 2)

            def body(i, acc, x0=x0):
                return acc + bn_fwd(x0 + i.astype(x0.dtype))

            report(f"bn_stat_map45_{dname}", batch, timed_loop(body, 10, 60))

            @jax.jit
            def bn_bwd(x, variables=variables, bn=bn):
                def f(x):
                    y, _ = bn.apply(variables, x, mutable=["batch_stats"])
                    return jnp.sum(y.astype(jnp.float32) ** 2)
                return jnp.sum(jax.grad(f)(x).astype(jnp.float32) ** 2)

            def gbody(i, acc, x0=x0):
                return acc + bn_bwd(x0 + i.astype(x0.dtype))

            report(f"bn_stat_fwdbwd_map45_{dname}", batch,
                   timed_loop(gbody, 10, 60))


# ---------------------------------------------------------------------------
# I. MFCC kernel batch-tile sweep (tb>8 unlocked by the scoped-vmem raise)
#    + frontend-kernel fixed-cost probe (VERDICT r3 weak #3)
# ---------------------------------------------------------------------------


def run_i(batches=(512, 1024, 1536, 2048, 4096)):
    """Two questions about the small-batch fused-frontend loss:
    (a) does a larger kernel batch tile (M = tb*n_hops rows per DFT
        matmul) lift the fused MFCC kernel? tb=16/32 were uncompilable
        before the per-kernel scoped-vmem raise;
    (b) what is the frontend kernel's per-CALL fixed cost? Sweep batch
        down to 128 and read the flat component off the curve."""
    from tcresnet_tpu.config import get_preset
    from tcresnet_tpu.data.device_data import DeviceDataset
    from tcresnet_tpu.data.synthetic import make_synthetic_dataset
    from tcresnet_tpu.ops.pallas.frontend import fused_gather_augment_mfcc
    from tcresnet_tpu.ops.pallas.mfcc import fused_mfcc

    cfg = get_preset("TCResNet8-1.0")
    acfg = cfg.audio

    for batch in batches:
        audio0 = jax.random.normal(jax.random.key(0), (batch, 16000),
                                   jnp.float32)
        for tb in (8, 16, 32, 64):
            if tb > batch:
                continue
            jfn = jax.jit(functools.partial(fused_mfcc, cfg=acfg, tb=tb))

            def body(i, acc, jfn=jfn, audio0=audio0):
                return acc + jnp.sum(jfn(audio0 + i.astype(jnp.float32)) ** 2)

            report(f"fused_mfcc_tb{tb}", batch, timed_loop(body))

    # frontend fixed-cost probe: small batches expose the per-call flat
    host = make_synthetic_dataset(num_samples=24_100, num_classes=12,
                                  desired_samples=16000, seed=0)
    data = DeviceDataset(host, None)
    arrays, noise = data.arrays, data.noise_bank
    for batch in (128, 256, 512, 1024, 1536, 2048):

        @jax.jit
        def step(i, arrs, nz):
            key = jax.random.fold_in(jax.random.key(7), i)
            ks, ka = jax.random.split(key)
            idx, labels, silent = DeviceDataset.sample_indices(
                arrs, ks, batch, None)
            feats = fused_gather_augment_mfcc(
                arrs[0], idx, silent, ka, cfg.augment, acfg, nz, True, 16000)
            return jnp.sum(feats ** 2)

        def body(i, acc, step=step):
            return acc + step(i, arrays, noise)

        report("frontend_kernel", batch, timed_loop(body))


if __name__ == "__main__":
    # args: part letters, optionally with batches ("A:1024,4096")
    import os

    parts = sys.argv[1:] or ["A", "B", "C"]
    print(f"devices: {jax.devices()}", flush=True)
    for part in parts:
        letter, _, bstr = part.partition(":")
        kw = {}
        if bstr:
            kw["batches"] = tuple(int(b) for b in bstr.split(","))
        {"A": run_a, "B": run_b, "C": run_c, "D": run_d,
         "E": run_e, "F": run_f, "G": run_g, "H": run_h,
         "I": run_i}[letter](**kw)
