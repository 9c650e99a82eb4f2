"""Streaming SVDF vs batch-path consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from tcresnet_tpu.config import ModelConfig
from tcresnet_tpu.models import build_model
from tcresnet_tpu.serve import streaming


def _svdf_setup():
    cfg = ModelConfig(name="KWS", kws_architecture="low_latency_svdf", num_classes=12)
    shape = (49, 40, 1)
    model = build_model(cfg, shape)
    x = jnp.zeros((1,) + shape, jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, training=True
    )
    return model, variables, shape


def test_full_window_matches_batch_path():
    model, variables, shape = _svdf_setup()
    frames = jnp.asarray(
        np.random.default_rng(0).normal(size=shape[:2]).astype(np.float32)
    )
    batch_logits = model.apply(variables, frames[None, :, :, None], training=False)
    batch_probs = np.asarray(jax.nn.softmax(batch_logits[0]))

    mem = streaming.init_state(shape[0])
    probs, mem = streaming.streaming_step(variables["params"], mem, frames)
    np.testing.assert_allclose(np.asarray(probs), batch_probs, atol=1e-5)


def test_incremental_chunks_match_full_window():
    """Feeding T frames in chunks must equal feeding them at once, as long
    as a full window of frames has been streamed (memory warmed up)."""
    model, variables, shape = _svdf_setup()
    t = shape[0]
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.normal(size=(t, shape[1])).astype(np.float32))

    # all at once
    mem_a = streaming.init_state(t)
    probs_a, _ = streaming.streaming_step(variables["params"], mem_a, frames)

    # in chunks of 7 (49 = 7*7)
    mem_b = streaming.init_state(t)
    for i in range(0, t, 7):
        probs_b, mem_b = streaming.streaming_step(
            variables["params"], mem_b, frames[i : i + 7]
        )
    np.testing.assert_allclose(np.asarray(probs_b), np.asarray(probs_a), atol=1e-4)


def test_streaming_is_jittable():
    model, variables, shape = _svdf_setup()
    step = jax.jit(streaming.streaming_step)
    mem = streaming.init_state(shape[0])
    frames = jnp.ones((7, shape[1]), jnp.float32)
    probs, mem2 = step(variables["params"], mem, frames)
    assert probs.shape == (12,)
    assert mem2.shape == mem.shape
    np.testing.assert_allclose(float(probs.sum()), 1.0, atol=1e-5)
