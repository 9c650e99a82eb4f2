"""Loss functions matching the reference's effective training loss.

Reference (factory/audio_nets.py:161-183): total = CE(label smoothing)
+ weight_decay * sum(l2(v)) over trainable vars excluding BatchNorm,
where tf.nn.l2_loss(v) = sum(v^2)/2. slim's REGULARIZATION_LOSSES
collection was populated but never applied — the explicit term below IS
the reference's effective weight decay (SURVEY.md 7.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def per_example_softmax_cross_entropy(
    logits: jnp.ndarray, onehot: jnp.ndarray, label_smoothing: float = 0.0
) -> jnp.ndarray:
    """Per-example CE with label smoothing: y = y*(1-s) + s/num_classes."""
    if label_smoothing > 0.0:
        num_classes = onehot.shape[-1]
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / num_classes
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.sum(onehot * log_probs, axis=-1)


def smoothed_softmax_cross_entropy(
    logits: jnp.ndarray, onehot: jnp.ndarray, label_smoothing: float = 0.0
) -> jnp.ndarray:
    """tf.losses.softmax_cross_entropy semantics, mean over batch."""
    return jnp.mean(
        per_example_softmax_cross_entropy(logits, onehot, label_smoothing)
    )


def _is_batch_norm_path(path) -> bool:
    """True if a param path belongs to a BatchNorm layer.

    Our BN modules are named `*_bn` (models/layers.slim_batch_norm call
    sites); the check mirrors the reference's name-based exclusion
    (factory/audio_nets.py:175-177).
    """
    for k in path:
        name = str(getattr(k, "key", k))
        if name.endswith("_bn") or name == "bn" or "BatchNorm" in name:
            return True
    return False


def l2_regularization(params, weight_decay: float) -> jnp.ndarray:
    """weight_decay * sum(sum(v^2)/2) over non-BatchNorm params."""
    if weight_decay == 0.0:
        return jnp.float32(0.0)
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    total = jnp.float32(0.0)
    for path, leaf in leaves:
        if not _is_batch_norm_path(path):
            total += 0.5 * jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return weight_decay * total
