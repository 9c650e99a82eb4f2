"""Whole-model fused inference kernel vs the XLA inference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcresnet_tpu.config import AudioConfig, ModelConfig
from tcresnet_tpu.models import build_model
from tcresnet_tpu.ops import dsp
from tcresnet_tpu.ops.pallas.infer import (
    build_fused_infer,
    fused_infer_available,
)


def _setup(model_name, rng, n=2560, ncls=12, wm=1.0, preprocess="mfcc"):
    audio_cfg = AudioConfig(
        clip_duration_ms=n // 16, num_mfccs=20, num_mel_bins=32,
        preprocess_method=preprocess,
    )
    model_cfg = ModelConfig(name=model_name, num_classes=ncls, width_multiplier=wm)
    assert fused_infer_available(model_cfg, audio_cfg)
    feat_shape = dsp.feature_shape(audio_cfg)
    model = build_model(model_cfg, feat_shape, "float32")
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((2,) + feat_shape, jnp.float32),
        training=True,
    )
    # make running stats non-trivial so BN folding is actually exercised
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            rng.uniform(0.5, 1.5, x.shape).astype(np.float32)
        ),
        variables["batch_stats"],
    )
    wavs = jnp.asarray(rng.uniform(-1, 1, (5, n)).astype(np.float32))
    return model_cfg, audio_cfg, model, variables["params"], stats, wavs


def _xla_infer(model, params, stats, audio_cfg, wavs):
    feats = dsp.preprocess(wavs, audio_cfg)
    logits = model.apply(
        {"params": params, "batch_stats": stats}, feats, training=False
    )
    return np.asarray(logits)


@pytest.mark.parametrize("name,wm", [("TCResNet8", 1.0), ("TCResNet14", 1.5)])
def test_fused_infer_matches_xla_path(rng, name, wm):
    """wav->logits in ONE kernel must match preprocess+model.apply; softmax
    agreement within the BASELINE.md 1e-5 AOT-parity gate."""
    model_cfg, audio_cfg, model, params, stats, wavs = _setup(name, rng, wm=wm)
    infer = build_fused_infer(
        model_cfg, audio_cfg, params, stats, tb=4, interpret=True
    )
    got = np.asarray(infer(wavs))
    want = _xla_infer(model, params, stats, audio_cfg, wavs)
    assert got.shape == want.shape == (5, 12)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)
    sm_got = jax.nn.softmax(jnp.asarray(got), axis=-1)
    sm_want = jax.nn.softmax(jnp.asarray(want), axis=-1)
    np.testing.assert_allclose(np.asarray(sm_got), np.asarray(sm_want), atol=1e-5)


def test_fused_infer_log_mel(rng):
    """Log-mel front end through the whole-model kernel (magnitude tail +
    identity DCT) must match preprocess+model.apply (r4: the one
    reference capability that previously lived only in the slow path)."""
    model_cfg, audio_cfg, model, params, stats, wavs = _setup(
        "TCResNet8", rng, preprocess="log_mel_spectrogram"
    )
    infer = build_fused_infer(
        model_cfg, audio_cfg, params, stats, tb=4, interpret=True
    )
    got = np.asarray(infer(wavs))
    want = _xla_infer(model, params, stats, audio_cfg, wavs)
    assert got.shape == want.shape == (5, 12)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)
    sm_got = jax.nn.softmax(jnp.asarray(got), axis=-1)
    sm_want = jax.nn.softmax(jnp.asarray(want), axis=-1)
    np.testing.assert_allclose(np.asarray(sm_got), np.asarray(sm_want), atol=1e-5)


def test_fused_infer_batch_padding(rng):
    """Batch sizes that don't divide tb must round-trip unpadded."""
    model_cfg, audio_cfg, model, params, stats, wavs = _setup("TCResNet8", rng)
    infer = build_fused_infer(
        model_cfg, audio_cfg, params, stats, tb=8, interpret=True
    )
    got = np.asarray(infer(wavs[:3]))
    want = _xla_infer(model, params, stats, audio_cfg, wavs[:3])
    assert got.shape == (3, 12)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_build_inference_fn_fused_backend(rng):
    """serve.export backend='fused' (interpret) == the default XLA path;
    'auto' on a CPU default device must stay on XLA (Mosaic is TPU-only);
    'fused' on an unsupported model must raise."""
    from tcresnet_tpu.config import ExperimentConfig, TrainConfig
    from tcresnet_tpu.serve.export import build_inference_fn

    model_cfg, audio_cfg, model, params, stats, wavs = _setup("TCResNet8", rng)
    cfg = ExperimentConfig(model=model_cfg, audio=audio_cfg, train=TrainConfig())
    variables = {"params": params, "batch_stats": stats}

    fused = build_inference_fn(cfg, variables, backend="fused", _interpret=True)
    xla = build_inference_fn(cfg, variables, backend="xla")
    np.testing.assert_allclose(
        np.asarray(fused(wavs)), np.asarray(xla(wavs)), atol=1e-5
    )

    auto = build_inference_fn(cfg, variables, backend="auto")
    # on the CPU-pinned test platform auto must NOT return the fused path:
    # calling it works without interpret mode only if it's the XLA fn
    np.testing.assert_allclose(
        np.asarray(auto(wavs)), np.asarray(xla(wavs)), atol=0
    )

    import dataclasses

    # every model family has a fused kernel now (infer.py + infer2d.py)
    # and both spectral front ends fuse (log-mel since r4), so the
    # unsupported cases are feats-only export and a raw-waveform front
    # end — availability is checked before params are touched
    bad = dataclasses.replace(
        cfg,
        audio=dataclasses.replace(
            audio_cfg, preprocess_method="no_preprocessing"
        ),
    )
    with pytest.raises(ValueError):
        build_inference_fn(cfg, variables, include_preprocess=False, backend="fused")
    with pytest.raises(ValueError):
        build_inference_fn(bad, variables, backend="fused")


def test_fused_infer_availability_gates():
    import dataclasses

    good_audio = AudioConfig()
    assert fused_infer_available(ModelConfig(name="TCResNet8"), good_audio)
    assert not fused_infer_available(ModelConfig(name="Res8"), good_audio)
    assert not fused_infer_available(ModelConfig(name="ResNet2D8"), good_audio)
    assert not fused_infer_available(
        ModelConfig(name="TCResNet8"),
        dataclasses.replace(good_audio, window_size_ms=25.0),
    )


def test_fused_infer_honors_dsp_matmul_dtype(rng):
    """cfg.dsp_matmul_dtype=bfloat16 must apply to the fused kernel's DFT
    exactly as it does to the XLA path (dsp.preprocess), or the two
    deployable paths silently diverge beyond the AOT-parity gate."""
    import dataclasses

    model_cfg, audio_cfg, model, params, stats, wavs = _setup("TCResNet8", rng)
    bf16_cfg = dataclasses.replace(audio_cfg, dsp_matmul_dtype="bfloat16")
    infer = build_fused_infer(
        model_cfg, bf16_cfg, params, stats, tb=4, interpret=True
    )
    got = np.asarray(infer(wavs))
    want = _xla_infer(model, params, stats, bf16_cfg, wavs)
    # both paths round DFT operands to bf16 (f32 accumulation): residual
    # difference is accumulation-order only
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)
    assert (got.argmax(-1) == want.argmax(-1)).all()


def test_fused_infer_odd_num_classes(rng):
    """Non-lane-aligned class counts must stay exact (fc output padding)."""
    model_cfg, audio_cfg, model, params, stats, wavs = _setup(
        "TCResNet8", rng, ncls=7
    )
    infer = build_fused_infer(
        model_cfg, audio_cfg, params, stats, tb=4, interpret=True
    )
    got = np.asarray(infer(wavs))
    want = _xla_infer(model, params, stats, audio_cfg, wavs)
    assert got.shape == want.shape == (5, 7)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)
