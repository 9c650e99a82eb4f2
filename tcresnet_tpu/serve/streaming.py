"""Streaming SVDF inference with explicit functional state.

Reference: the low_latency_svdf runtime memory variable
(/root/reference/audio_nets/kws.py:557-605) — a [num_filters, 1, T]
non-trainable variable holding per-filter time activations; each
inference consumes only the NEW frames since the last call, shifts the
memory, and scores from the full window.

JAX is functional, so the memory is threaded explicitly: `init_state()`
-> repeated `streaming_step(params, state, new_frames)` -> (probs,
new_state). Feeding a full window into fresh state is exactly the batch
forward pass (tested in tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

SVDF_RANK = 2
SVDF_NUM_UNITS = 1280


def init_state(spectrogram_length: int, num_filters: int = SVDF_RANK * SVDF_NUM_UNITS):
    """Fresh (zero) streaming memory [num_filters, T]."""
    return jnp.zeros((num_filters, spectrogram_length), jnp.float32)


def streaming_step(
    params,
    memory: jnp.ndarray,
    new_frames: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming inference step.

    Args:
      params: the KWSNet(low_latency_svdf) 'params' tree.
      memory: [num_filters, T] activation history.
      new_frames: [num_new, F] feature frames newer than the last call.

    Returns (softmax probs [num_classes], updated memory).
    """
    w_freq = params["weights_frequency"]  # [F, num_filters]
    w_time = params["weights_time"]  # [num_filters, T]
    num_filters, t = w_time.shape
    num_new = new_frames.shape[0]

    # frequency filtering of the new frames (kws.py:583-596)
    acts = jnp.einsum(
        "nf,fk->kn", new_frames.astype(jnp.float32), w_freq,
        preferred_element_type=jnp.float32,
    )  # [num_filters, num_new]

    # shift out the oldest frames, append the new (kws.py:599-605)
    memory = jnp.concatenate([memory[:, num_new:], acts], axis=1)

    # time filtering over the full window (kws.py:607-616)
    out = jnp.sum(memory * w_time, axis=1)  # [num_filters]
    units = out.reshape(SVDF_NUM_UNITS, SVDF_RANK).sum(axis=1)
    x = jax.nn.relu(units + params["bias"])

    for name in ("fc1", "fc2", "fc3"):
        x = x @ params[name]["kernel"] + params[name]["bias"]
    return jax.nn.softmax(x), memory
