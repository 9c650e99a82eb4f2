"""AOT inference export — the freeze.py / .pb / .tflite replacement.

Reference path (freeze.py:16-49 + factory/audio_nets.py:87-125): rebuild
an inference graph with a fixed placeholder, restore ckpt (optionally
EMA), constant-fold, write .pb, then convert to .tflite.

TPU-native path: close the trained params over a pure inference function
(optionally including the DSP front end — `include_preprocess` parity
with build_deployable_model), `jit(...).lower(...).compile()` for an AOT
executable, or `jax.export` for a portable serialized StableHLO artifact.
Softmax output parity with the training graph is the BASELINE.md <=1e-5
gate (tests/test_serve.py).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from tcresnet_tpu.config import ExperimentConfig
from tcresnet_tpu.models import build_model
from tcresnet_tpu.ops import dsp


# Measured fused-vs-XLA serving crossover per family (round 5:
# docs/profile_r5_D.jsonl; round 3 for the temporal TC-ResNets). The
# fused kernels' per-sample conv chains cost a near-constant µs/utt
# while the XLA path sits on a ~75-430 µs launch floor, so each
# family's crossover is its floor/per-utt ratio: Res ~44 µs/utt under a
# ~1490 µs floor@32 still wins at 32; DS-CNN ties at 8 (74.5 vs 76.0)
# and loses at 16; TCResNet2D (24 µs/utt) and KWS (30 µs/utt) lose by
# batch 8, win at 4. DSCNNM/L inherit DSCNNS's crossover (same map
# geometry, fused cost within 1.4x).
_AUTO_FUSED_MAX_BATCH = {
    "TCResNet8": 32, "TCResNet14": 32,
    "Res8": 32, "Res8Narrow": 32, "Res15": 32, "Res15Narrow": 32,
    "DSCNNS": 8, "DSCNNM": 8, "DSCNNL": 8,
    "ResNet2D8": 4, "ResNet2D8Pool": 8,
    "KWS": 4,
}


def auto_fused_max_batch(model_name: str) -> int:
    """Largest traced batch `backend="auto"` serves via the fused kernel."""
    return _AUTO_FUSED_MAX_BATCH.get(model_name, 32)


def _with_matmul_precision(fn, precision):
    """Wrap `fn` so its body traces under jax.default_matmul_precision.

    TPU f32 matmuls at DEFAULT precision are bf16-pass arithmetic (3-pass
    bf16) — fused-kernel vs XLA softmax agreement is only ~3e-3 on chip.
    precision="highest" restores true-f32 accumulation in BOTH paths:
    dot/conv/einsum precision=None resolves from this config at trace
    time, including the dot chains inside Pallas kernel bodies (the
    kernel jaxpr is traced within the dynamic extent). This is what makes
    the BASELINE.md <=1e-5 parity gate hold ON HARDWARE, not just in
    true-f32 CPU/interpret runs (tools/export.py --parity-precision)."""
    if precision is None:
        return fn

    def wrapped(x: jnp.ndarray) -> jnp.ndarray:
        with jax.default_matmul_precision(precision):
            return fn(x)

    return wrapped


def build_inference_fn(
    cfg: ExperimentConfig,
    variables,
    include_preprocess: bool = True,
    use_ema: bool = False,
    backend: str = "xla",
    precision: str | None = None,
    _interpret: bool = False,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Pure wav->softmax (or features->softmax) function, params folded in.

    `variables` is a TrainState or a {'params','batch_stats'} mapping.
    `include_preprocess=True` mirrors build_deployable_model's in-graph
    preprocessing variant (factory/audio_nets.py:87-104); False expects
    precomputed [B,H,W,1] features (:105-124).

    backend:
      "xla"   — preprocess + model.apply under jit (default; defines the
                BASELINE.md <=1e-5 AOT-parity gate vs the training graph).
      "fused" — the whole-model single-kernel path (ops/pallas/infer.py
                for the temporal TC-ResNets, ops/pallas/infer2d.py for
                the 2D/Res/DS-CNN/KWS families — ALL 15 presets):
                wav->logits in ONE Pallas call, BN folded, weights
                VMEM-resident. Requires include_preprocess; ~50-65x
                lower batch-1 device latency, and closer to the
                highest-precision reference than the XLA path's
                default-precision convs (docs/BENCH_RESULTS.md).
      "auto"  — on TPU with a supported model, pick per traced batch
                size: fused up to the family's measured crossover
                (auto_fused_max_batch: 32 temporal/Res, 8 DS-CNN,
                4-8 TCResNet2D, 4 KWS), XLA above (the fused kernel's
                per-sample conv chain doesn't batch its matmuls —
                912k vs 217k utt/s @1024); else "xla".

    precision: None (platform default; fastest — on TPU f32 matmuls are
      bf16-pass) or a jax.default_matmul_precision name ("highest" for
      true-f32 accumulation in every dot/conv of BOTH the XLA and fused
      paths — the mode under which the <=1e-5 parity gate holds on the
      chip itself, see _with_matmul_precision).
    """
    if hasattr(variables, "params"):
        params = variables.eval_params if use_ema else variables.params
        batch_stats = variables.batch_stats
    else:
        if use_ema:
            # never silently ship raw params when the caller asked for
            # EMA weights (wrong deployed accuracy with no error)
            params = variables.get("ema_params")
            if params is None:
                raise ValueError(
                    "use_ema=True but the variables mapping has no "
                    "'ema_params' (pass the TrainState or the full "
                    "checkpoint dict)"
                )
        else:
            params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

    if backend in ("fused", "auto"):
        from tcresnet_tpu.ops.pallas.infer import (
            build_fused_infer,
            fused_infer_available,
        )
        from tcresnet_tpu.ops.pallas.infer2d import (
            build_fused_infer2d,
            fused_infer2d_available,
        )

        is_temporal = fused_infer_available(cfg.model, cfg.audio)
        is_2d = fused_infer2d_available(cfg.model, cfg.audio)
        supported = include_preprocess and (is_temporal or is_2d)
        if backend == "fused" and not supported:
            raise ValueError(
                "backend='fused' needs include_preprocess and a supported "
                f"model/feature geometry (model={cfg.model.name})"
            )
        if backend == "auto":
            # Mosaic lowers on TPU only; honor a pinned default device
            # (hermeticity w.r.t. registered TPU plugins, CLAUDE.md).
            from tcresnet_tpu.utils.platform import default_platform

            supported = supported and default_platform() == "tpu"
        if supported:
            if is_temporal:
                fused = build_fused_infer(
                    cfg.model, cfg.audio, params, batch_stats,
                    interpret=_interpret,
                )
            else:
                fused = build_fused_infer2d(
                    cfg.model, cfg.audio, params, batch_stats,
                    interpret=_interpret,
                )

            if backend == "fused":
                def infer_fused(x: jnp.ndarray) -> jnp.ndarray:
                    return jax.nn.softmax(fused(x), axis=-1)

                return _with_matmul_precision(infer_fused, precision)

            # auto: the fused kernel is latency-optimal (6-16 us at batch
            # 1 vs ~380 us) but its per-sample conv chain doesn't batch
            # the matmuls, so the XLA path wins throughput at large batch
            # (912k vs 217k utt/s @1024 — docs/BENCH_RESULTS.md); the
            # crossover is per-FAMILY (measured, _AUTO_FUSED_MAX_BATCH).
            # Batch size is static under jit, so this picks per trace.
            max_fused = auto_fused_max_batch(cfg.model.name)
            xla_fn = _build_xla_infer(cfg, params, batch_stats, include_preprocess)

            def infer_auto(x: jnp.ndarray) -> jnp.ndarray:
                if x.shape[0] <= max_fused:
                    return jax.nn.softmax(fused(x), axis=-1)
                return xla_fn(x)

            return _with_matmul_precision(infer_auto, precision)

    return _with_matmul_precision(
        _build_xla_infer(cfg, params, batch_stats, include_preprocess),
        precision,
    )


def _build_xla_infer(cfg, params, batch_stats, include_preprocess):
    model = build_model(cfg.model, dsp.feature_shape(cfg.audio), cfg.train.compute_dtype)
    bound = {"params": params, "batch_stats": batch_stats}

    def infer(x: jnp.ndarray) -> jnp.ndarray:
        if include_preprocess:
            x = dsp.preprocess(x, cfg.audio)
        logits = model.apply(bound, x, training=False)
        return jax.nn.softmax(logits, axis=-1)

    return infer


def compile_inference(
    cfg: ExperimentConfig,
    variables,
    batch_size: int = 1,
    include_preprocess: bool = True,
    use_ema: bool = False,
):
    """AOT-compile the inference fn for a fixed batch size.

    Returns (compiled_executable, example_input_shape).
    """
    fn = build_inference_fn(cfg, variables, include_preprocess, use_ema)
    if include_preprocess:
        shape = (batch_size, cfg.audio.desired_samples)
    else:
        shape = (batch_size,) + dsp.feature_shape(cfg.audio)
    example = jnp.zeros(shape, jnp.float32)
    compiled = jax.jit(fn).lower(example).compile()
    return compiled, shape


def export_serialized(
    cfg: ExperimentConfig,
    variables,
    batch_size: int = 1,
    include_preprocess: bool = True,
    use_ema: bool = False,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
) -> bytes:
    """Portable serialized artifact (StableHLO via jax.export) — the
    .pb/.tflite analog; reload with `jax.export.deserialize`. Lowered for
    every platform in `platforms` so the artifact runs off-TPU too."""
    from jax import export as jexport

    fn = build_inference_fn(cfg, variables, include_preprocess, use_ema)
    if include_preprocess:
        shape = (batch_size, cfg.audio.desired_samples)
    else:
        shape = (batch_size,) + dsp.feature_shape(cfg.audio)
    example = jax.ShapeDtypeStruct(shape, jnp.float32)
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(example)
    return exported.serialize()


def load_serialized(data: bytes):
    """Deserialize an exported artifact; returns a callable."""
    from jax import export as jexport

    exported = jexport.deserialize(data)
    return lambda x: exported.call(x)
