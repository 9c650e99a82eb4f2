"""AOT export / serving parity tests (BASELINE.md <=1e-5 softmax gate)."""

import jax
import jax.numpy as jnp
import numpy as np

from tcresnet_tpu.config import AudioConfig, ExperimentConfig, ModelConfig
from tcresnet_tpu.models import build_model
from tcresnet_tpu.ops import dsp
from tcresnet_tpu.serve.benchmark import (
    benchmark_compiled,
    benchmark_on_device,
    format_report,
)
from tcresnet_tpu.serve.export import (
    build_inference_fn,
    compile_inference,
    export_serialized,
    load_serialized,
)


def small_cfg():
    return ExperimentConfig(
        audio=AudioConfig(clip_duration_ms=250, num_mfccs=20, num_mel_bins=32),
        model=ModelConfig(name="TCResNet8", num_classes=4),
    )


def init_variables(cfg):
    shape = dsp.feature_shape(cfg.audio)
    model = build_model(cfg.model, shape)
    x = jnp.zeros((1,) + shape, jnp.float32)
    v = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, training=True)
    return model, v


def test_aot_parity_with_training_graph():
    cfg = small_cfg()
    model, variables = init_variables(cfg)
    wavs = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (4, cfg.audio.desired_samples)).astype(np.float32)
    )
    # training-graph path (eval mode)
    feats = dsp.preprocess(wavs, cfg.audio)
    ref = jax.nn.softmax(model.apply(variables, feats, training=False))

    compiled, shape = compile_inference(cfg, variables, batch_size=4)
    assert shape == (4, cfg.audio.desired_samples)
    got = compiled(wavs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_use_ema_with_dict_variables():
    """A {'params',...} mapping + use_ema=True must use ema_params (or
    fail loudly), never silently ship raw params."""
    import pytest

    cfg = small_cfg()
    model, variables = init_variables(cfg)
    d = dict(variables)
    with pytest.raises(ValueError, match="ema_params"):
        build_inference_fn(cfg, d, use_ema=True)

    # with EMA weights present (here: zeros), they must actually be used
    ema = jax.tree_util.tree_map(jnp.zeros_like, variables["params"])
    fn = build_inference_fn(cfg, {**d, "ema_params": ema}, use_ema=True)
    wavs = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (2, cfg.audio.desired_samples)).astype(np.float32)
    )
    out = np.asarray(fn(wavs))
    # zero params -> uniform softmax
    np.testing.assert_allclose(out, 1.0 / out.shape[-1], atol=1e-5)


def test_features_only_inference():
    cfg = small_cfg()
    model, variables = init_variables(cfg)
    fn = build_inference_fn(cfg, variables, include_preprocess=False)
    shape = dsp.feature_shape(cfg.audio)
    feats = jnp.asarray(np.random.default_rng(1).normal(size=(2,) + shape).astype(np.float32))
    out = fn(feats)
    assert out.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)


def test_serialized_export_roundtrip():
    cfg = small_cfg()
    model, variables = init_variables(cfg)
    data = export_serialized(cfg, variables, batch_size=2)
    assert isinstance(data, (bytes, bytearray)) and len(data) > 1000

    loaded = load_serialized(data)
    wavs = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, (2, cfg.audio.desired_samples)).astype(np.float32)
    )
    fn = build_inference_fn(cfg, variables)
    np.testing.assert_allclose(
        np.asarray(loaded(wavs)), np.asarray(fn(wavs)), atol=1e-5
    )


def test_benchmark_protocol():
    cfg = small_cfg()
    model, variables = init_variables(cfg)
    compiled, _ = compile_inference(cfg, variables, batch_size=1)
    wav = jnp.zeros((1, cfg.audio.desired_samples), jnp.float32)
    stats = benchmark_compiled(compiled, wav, warmup_runs=3, num_runs=10)
    assert stats["count"] == 10
    assert stats["min"] <= stats["avg"] <= stats["max"]
    assert stats["min"] > 0
    report = format_report(stats)
    assert "avg=" in report and "count=10" in report


def test_benchmark_on_device_protocol():
    """The tunnel-free fori_loop protocol returns a sane positive latency
    and actually executes the inference fn (the carry forces it)."""
    cfg = small_cfg()
    model, variables = init_variables(cfg)
    fn = build_inference_fn(cfg, variables)
    wav = jnp.asarray(
        np.random.default_rng(3)
        .uniform(-1, 1, (1, cfg.audio.desired_samples))
        .astype(np.float32)
    )
    dev = benchmark_on_device(fn, wav, warmup_runs=2, num_runs=5, chain_factor=21)
    assert dev["count"] == 100
    assert np.isfinite(dev["avg"])
    # per-inference device time must be > 0 and far below a second
    assert 0 < dev["avg"] < 1e6


def test_precision_highest_parity():
    """precision='highest' (the on-hardware 1e-5 parity mode,
    serve/export._with_matmul_precision) must thread into both the XLA
    path and the fused kernel's dot chains: fused-interpret vs XLA at
    HIGHEST agree to <=1e-5 (measured 1.8e-7 on v5e silicon; here the
    kernel runs in interpret mode so the test holds on any platform),
    and the default-precision path is unchanged by the wrapper."""
    cfg = small_cfg()
    model, variables = init_variables(cfg)
    wavs = jnp.asarray(
        np.random.default_rng(7)
        .uniform(-1, 1, (4, cfg.audio.desired_samples))
        .astype(np.float32)
    )
    xla_hi = build_inference_fn(
        cfg, variables, backend="xla", precision="highest"
    )
    fused_hi = build_inference_fn(
        cfg, variables, backend="fused", precision="highest",
        _interpret=True,
    )
    err = np.abs(
        np.asarray(jax.jit(xla_hi)(wavs)) - np.asarray(jax.jit(fused_hi)(wavs))
    ).max()
    assert err <= 1e-5, f"HIGHEST-precision fused/XLA parity {err} > 1e-5"

    # precision=None must be byte-identical to the unwrapped default path
    plain = build_inference_fn(cfg, variables, backend="xla")
    wrapped = build_inference_fn(cfg, variables, backend="xla", precision=None)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(plain)(wavs)), np.asarray(jax.jit(wrapped)(wavs))
    )


def test_auto_fused_max_batch_per_family():
    """backend='auto' routes by the per-FAMILY measured crossover
    (docs/profile_r5_D.jsonl), not a blanket 32: each family's fused
    kernel costs a near-constant us/utt against the XLA path's
    launch floor, so the crossover is floor/per-utt and spans 4-32."""
    from tcresnet_tpu.serve.export import auto_fused_max_batch

    assert auto_fused_max_batch("TCResNet8") == 32
    assert auto_fused_max_batch("Res8") == 32
    assert auto_fused_max_batch("DSCNNS") == 8
    assert auto_fused_max_batch("ResNet2D8") == 4
    assert auto_fused_max_batch("KWS") == 4
    # unknown names fall back to the temporal default
    assert auto_fused_max_batch("nonesuch") == 32
