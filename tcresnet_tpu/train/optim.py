"""Optimizer + LR-schedule construction from OptimConfig.

Reference parity (helper/trainer.py):
  - piecewise-constant LR over step boundaries (:107-137), with optional
    epoch-unit boundaries and relative shift on restore;
  - optimizers gd/adam/mom/rmsprop with TF-1.13 defaults (:171-197);
  - EMA of trainable params applied after each step (:199-222) — tracked
    in the train state (see state.py), decay semantics
    shadow = decay*shadow + (1-decay)*param.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import optax

from tcresnet_tpu.config import OptimConfig


def piecewise_constant(
    boundaries: Sequence[int], values: Sequence[float]
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """tf.train.piecewise_constant: values[i] while step <= boundaries[i-1]...

    TF semantics: lr = values[0] for step <= boundaries[0], values[i] for
    boundaries[i-1] < step <= boundaries[i], values[-1] after. Implemented
    as a searchsorted lookup (side='left' gives the <= behavior).
    """
    assert len(values) == len(boundaries) + 1, (boundaries, values)
    b = jnp.asarray(boundaries, jnp.int32)
    v = jnp.asarray(values, jnp.float32)

    def schedule(step):
        idx = jnp.searchsorted(b, jnp.asarray(step, jnp.int32), side="left")
        return v[idx]

    return schedule


def resolve_boundaries(
    cfg: OptimConfig,
    num_samples: Optional[int] = None,
    batch_size: Optional[int] = None,
    restore_step: int = 0,
    relative: bool = False,
) -> tuple:
    """Boundary resolution incl. epoch units and relative shift
    (helper/trainer.py:120-133).

    Epoch-unit boundaries are (b * num_samples) // batch_size, the
    reference's exact integer math (trainer.py:121) — NOT
    b * (num_samples // batch_size), which drops b * (N % B) // B steps
    and would shift LR changes earlier on long runs.
    """
    boundaries = list(cfg.boundaries)
    if cfg.boundaries_epoch:
        if not num_samples or not batch_size:
            raise ValueError(
                "boundaries_epoch requires num_samples and batch_size"
            )
        boundaries = [(b * num_samples) // batch_size for b in boundaries]
    if relative:
        boundaries = [restore_step + b for b in boundaries]
    return tuple(boundaries)


def trainable_mask(params, scopes: Sequence[str]):
    """Pytree of bools: True where the param path matches any scope regex
    (get_variables_to_train parity, common/tf_utils.py:19-37).

    Matching is PREFIX-ANCHORED (re.match), like the reference's
    tf.get_collection(scope) / var.op.name.startswith: a scope "fc" means
    paths starting with fc, not any path merely containing it — an
    unanchored search would silently unfreeze e.g. "block3/fc_proj".
    """
    import re

    import jax

    def match(path):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        return any(re.match(s, p) for s in scopes)

    return jax.tree_util.tree_map_with_path(lambda path, _: match(path), params)


def build_optimizer(
    cfg: OptimConfig,
    num_samples: Optional[int] = None,
    batch_size: Optional[int] = None,
    restore_step: int = 0,
    relative: bool = False,
    params=None,
):
    """Returns (optax.GradientTransformation, schedule_fn).

    The transformation is built with UNIT learning rate; the caller
    scales the returned updates by `schedule(global_step)` (see
    scale_updates). This makes the LR a pure function of the global
    step — exactly the reference's semantics (helper/trainer.py:107-137,
    lr = piecewise_constant(global_step, ...)) — so resume, warm-start
    with a kept step, and the relative boundary shift on restore
    (trainer.py:120-133) are all correct without any hidden
    schedule-count state in the optimizer.

    When cfg.trainable_scopes is non-empty, updates for non-matching
    params are zeroed (requires `params` for the mask structure).
    """
    boundaries = resolve_boundaries(
        cfg, num_samples, batch_size, restore_step, relative
    )
    schedule = piecewise_constant(boundaries, cfg.lr_list)

    if cfg.optimizer == "gd":
        tx = optax.sgd(learning_rate=1.0)
    elif cfg.optimizer == "mom":
        tx = optax.sgd(learning_rate=1.0, momentum=cfg.momentum)
    elif cfg.optimizer == "adam":
        tx = optax.adam(learning_rate=1.0, eps=cfg.adam_epsilon)
    elif cfg.optimizer == "rmsprop":
        tx = optax.rmsprop(
            learning_rate=1.0, decay=cfg.rmsprop_decay, eps=cfg.rmsprop_epsilon
        )
    else:
        raise ValueError(f"Unknown optimizer {cfg.optimizer!r}")

    if cfg.trainable_scopes:
        if params is None:
            raise ValueError("trainable_scopes requires params for the mask")
        mask = trainable_mask(params, cfg.trainable_scopes)
        import jax

        labels = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx, schedule


def scale_updates(updates, lr):
    """Scale unit-LR optimizer updates by the schedule value for this step.

    Equivalent to TF's optimizers applying `lr * accumulator` at each
    step: a boundary change re-scales the whole momentum/adam update
    immediately, matching tf.train.MomentumOptimizer/AdamOptimizer.
    """
    import jax

    return jax.tree_util.tree_map(lambda u: lr * u, updates)


def ema_update(ema_params, params, decay: float):
    """TF ExponentialMovingAverage.apply step."""
    import jax

    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )
