"""Pallas temporal conv (fwd + custom_vjp bwd) vs lax/flax convolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcresnet_tpu.ops.pallas.tconv import pallas_temporal_conv


def _xla_conv(x4, kernel, stride):
    # x4 [B, T, 1, C], kernel [k, 1, Cin, Cout] — flax nn.Conv semantics
    return jax.lax.conv_general_dilated(
        x4, kernel, window_strides=(stride, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


CASES = [
    (3, 1, 40, 16, 98),   # conv0
    (9, 1, 24, 24, 49),   # block conv, stride 1
    (9, 2, 16, 24, 98),   # block conv, stride 2 (odd T)
    (1, 2, 16, 24, 98),   # downsample shortcut
    (9, 2, 24, 32, 49),   # stride 2 from odd T
]


@pytest.mark.parametrize("k,stride,ci,co,t", CASES)
def test_forward_matches_xla(rng, k, stride, ci, co, t):
    x = jnp.asarray(rng.normal(size=(5, t, 1, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, 1, ci, co)).astype(np.float32) * 0.1)
    got = np.asarray(pallas_temporal_conv(x, w, stride, tb=4, interpret=True))
    want = np.asarray(_xla_conv(x, w, stride))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,stride,ci,co,t", CASES)
def test_gradients_match_xla(rng, k, stride, ci, co, t):
    """custom_vjp dx/dw vs XLA autodiff through the same loss."""
    x = jnp.asarray(rng.normal(size=(4, t, 1, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, 1, ci, co)).astype(np.float32) * 0.1)
    cot = jnp.asarray(
        rng.normal(size=_xla_conv(x, w, stride).shape).astype(np.float32)
    )

    def loss_pallas(x, w):
        return jnp.sum(pallas_temporal_conv(x, w, stride, tb=4, interpret=True) * cot)

    def loss_xla(x, w):
        return jnp.sum(_xla_conv(x, w, stride) * cot)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x), atol=2e-3, rtol=1e-4)


def test_batch_not_divisible_by_tile(rng):
    x = jnp.asarray(rng.normal(size=(3, 98, 1, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(9, 1, 16, 24)).astype(np.float32) * 0.1)
    got = np.asarray(pallas_temporal_conv(x, w, 2, tb=8, interpret=True))
    want = np.asarray(_xla_conv(x, w, 2))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_tcresnet_conv_backend_equivalence(rng):
    """TCResNet8 with conv_backend='pallas-interpret' must produce the
    same logits and parameter gradients as the XLA conv backend from the
    identical parameter tree (param names/shapes are interchangeable)."""
    from tcresnet_tpu.config import ModelConfig
    from tcresnet_tpu.models import build_model

    feat = (23, 20, 1)
    x = jnp.asarray(rng.normal(size=(4,) + feat).astype(np.float32))
    cfg_x = ModelConfig(name="TCResNet8", num_classes=4)
    cfg_p = ModelConfig(name="TCResNet8", num_classes=4,
                        conv_backend="pallas-interpret")
    m_x = build_model(cfg_x, feat, "float32")
    m_p = build_model(cfg_p, feat, "float32")
    v = m_x.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                 x, training=True)
    vp = m_p.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                  x, training=True)
    # identical trees: same param names, shapes, and init streams
    assert jax.tree_util.tree_structure(v["params"]) == \
        jax.tree_util.tree_structure(vp["params"])
    for a, b in zip(jax.tree_util.tree_leaves(v["params"]),
                    jax.tree_util.tree_leaves(vp["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(model, params):
        logits = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, training=False,
        )
        return jnp.sum(logits ** 2)

    lx, gx = jax.value_and_grad(lambda p: loss(m_x, p))(v["params"])
    lp, gp = jax.value_and_grad(lambda p: loss(m_p, p))(v["params"])
    np.testing.assert_allclose(float(lx), float(lp), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gx), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(gp), key=str),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-4,
            err_msg=str(ka),
        )


def test_trains_through_scan(rng):
    """The custom_vjp must compose with jit + scan (the fused train step
    shape): a few SGD steps on a toy regression must reduce the loss."""
    x = jnp.asarray(rng.normal(size=(8, 32, 1, 8)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(8, 32, 1, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 1, 8, 4)).astype(np.float32) * 0.1)

    def loss(w):
        y = pallas_temporal_conv(x, w, 1, tb=8, interpret=True)
        return jnp.mean((y - target) ** 2)

    @jax.jit
    def step(w, _):
        l, g = jax.value_and_grad(loss)(w)
        return w - 0.1 * g, l

    w2, losses = jax.lax.scan(step, w, None, length=10)
    assert float(losses[-1]) < float(losses[0])
