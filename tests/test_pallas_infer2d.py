"""Whole-model 2D fused-inference kernel parity (ops/pallas/infer2d.py).

Each family's single-kernel wav->logits path must match the XLA
inference path to <=1e-5 on softmax outputs (the BASELINE.md AOT-parity
gate) in interpret mode. Default tier runs every family on a small
250 ms geometry (23x20 features — interpret mode on one CPU core is
~17x cheaper than the real 98x40); the `slow` tier (RUN_SLOW=1) repeats
representatives at the real preset geometry.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcresnet_tpu.config import AudioConfig, get_preset
from tcresnet_tpu.models import build_model
from tcresnet_tpu.ops import dsp
from tcresnet_tpu.ops.pallas.infer2d import (
    build_fused_infer2d,
    fused_infer2d_available,
)
from tcresnet_tpu.serve.export import build_inference_fn

SMALL_AUDIO = AudioConfig(clip_duration_ms=250, num_mfccs=20, num_mel_bins=32)


def _small_cfg(preset: str):
    cfg = get_preset(preset)
    return cfg.replace(
        audio=SMALL_AUDIO,
        train=dataclasses.replace(cfg.train, compute_dtype="float32"),
    )


def _variables(cfg, seed=0):
    shape = dsp.feature_shape(cfg.audio)
    model = build_model(cfg.model, shape, "float32")
    v = model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
        jnp.zeros((2,) + shape, jnp.float32),
        training=True,
    )
    # Push batch stats off their init values so BN folding/affine is
    # actually exercised (fresh stats are mean=0 var=1).
    stats = jax.tree_util.tree_map(
        lambda a: jnp.abs(a + 0.07), v.get("batch_stats", {})
    )
    return {"params": v["params"], "batch_stats": stats}


def _assert_parity(cfg, batch: int = 3, seed: int = 3):
    assert fused_infer2d_available(cfg.model, cfg.audio)
    variables = _variables(cfg)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(
        rng.uniform(-0.5, 0.5, (batch, cfg.audio.desired_samples)).astype(
            np.float32
        )
    )
    fused = build_fused_infer2d(
        cfg.model, cfg.audio, variables["params"], variables["batch_stats"],
        interpret=True,
    )
    soft_fused = np.asarray(jax.nn.softmax(fused(x), axis=-1))
    xla_fn = build_inference_fn(
        cfg, variables, include_preprocess=True, backend="xla"
    )
    soft_xla = np.asarray(xla_fn(x))
    assert soft_fused.shape == (batch, cfg.model.num_classes)
    np.testing.assert_allclose(soft_fused, soft_xla, atol=1e-5)


# --- default tier: every family, small geometry ---------------------------


@pytest.mark.parametrize(
    "preset",
    ["DSCNNS", "DSCNNL", "TCResNet2D8-1.0", "TCResNet2D8Pool-1.0",
     "Res8Narrow", "Res15", "Res15Narrow"],
)
def test_family_parity_small_geometry(preset):
    _assert_parity(_small_cfg(preset), batch=2)


@pytest.mark.parametrize(
    "arch",
    ["single_fc", "one_fstride4", "trad_fpool3", "low_latency_svdf",
     "tiny_conv"],
)
def test_kws_parity(arch):
    """All Google-KWS baselines have whole-model kernels; these use the
    real 49x40 geometry (trad_fpool3's VALID convs need >=29 frames) —
    the nets are small, so interpret mode stays cheap."""
    cfg = get_preset("KWSfpool3")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, kws_architecture=arch),
        train=dataclasses.replace(cfg.train, compute_dtype="float32"),
    )
    _assert_parity(cfg, batch=2)


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["conv", "low_latency_conv"])
def test_kws_parity_slow(arch):
    cfg = get_preset("KWSfpool3")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, kws_architecture=arch),
        train=dataclasses.replace(cfg.train, compute_dtype="float32"),
    )
    _assert_parity(cfg, batch=2)


def test_multiblock_tb_grid():
    """Explicit tb < batch (tb=2, batch=5): a three-block grid with a
    padded last block. The out rides a [n_blocks, tb, ncls] leading-dim
    layout — a 2D [batch, ncls] out with block (tb, ncls) is
    Mosaic-illegal for tb % 8 != 0 < batch (round-5 hardware finding:
    profile_r4.py run_d crashed on every batch-serving infer2d build)."""
    cfg = _small_cfg("DSCNNS")
    variables = _variables(cfg)
    x = jnp.asarray(
        np.random.default_rng(11)
        .uniform(-0.5, 0.5, (5, cfg.audio.desired_samples))
        .astype(np.float32)
    )
    fused = build_fused_infer2d(
        cfg.model, cfg.audio, variables["params"], variables["batch_stats"],
        tb=2, interpret=True,
    )
    soft_fused = np.asarray(jax.nn.softmax(fused(x), axis=-1))
    xla_fn = build_inference_fn(
        cfg, variables, include_preprocess=True, backend="xla"
    )
    np.testing.assert_allclose(soft_fused, np.asarray(xla_fn(x)), atol=1e-5)


def test_export_backend_routes_2d():
    """backend='fused' on a 2D family routes through infer2d and keeps
    the <=1e-5 parity gate (batch 3 exercises the tb padding path)."""
    cfg = _small_cfg("DSCNNS")
    variables = _variables(cfg)
    x = jnp.asarray(
        np.random.default_rng(5)
        .uniform(-0.5, 0.5, (3, cfg.audio.desired_samples))
        .astype(np.float32)
    )
    fused_fn = build_inference_fn(
        cfg, variables, include_preprocess=True, backend="fused",
        _interpret=True,
    )
    xla_fn = build_inference_fn(
        cfg, variables, include_preprocess=True, backend="xla"
    )
    np.testing.assert_allclose(
        np.asarray(fused_fn(x)), np.asarray(xla_fn(x)), atol=1e-5
    )


# --- slow tier: real preset geometry (98x40 / 49x10) ----------------------


@pytest.mark.slow
@pytest.mark.parametrize(
    "preset",
    ["DSCNNS", "DSCNNM", "DSCNNL", "TCResNet2D8-1.0", "TCResNet2D8Pool-1.0",
     "Res8", "Res8Narrow", "Res15", "Res15Narrow"],
)
def test_family_parity_real_geometry(preset):
    cfg = get_preset(preset)
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, compute_dtype="float32")
    )
    _assert_parity(cfg, batch=2)


@pytest.mark.parametrize(
    "preset,wm,ncls",
    [
        ("TCResNet2D8-1.0", 1.5, 12),
        ("TCResNet2D8-1.0", 0.5, 7),   # odd, non-lane-aligned class count
        ("DSCNNS", 1.0, 5),
        ("Res8Narrow", 1.0, 9),
    ],
)
def test_parity_nondefault_width_and_classes(preset, wm, ncls):
    """The op-list builder must stay exact at non-default widths and at
    class counts that don't align to lanes — fixed-geometry tests alone
    would hide width-dependent padding/tiling bugs."""
    cfg = _small_cfg(preset)
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, width_multiplier=wm, num_classes=ncls
        )
    )
    _assert_parity(cfg, batch=2)
