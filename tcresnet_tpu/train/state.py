"""Train state pytree.

Replaces the reference's TF Session graph state (global_step Variable +
optimizer slots + EMA shadow variables, helper/trainer.py:107-222) with a
single functional pytree carried through the jitted step.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray  # int32 scalar (global step)
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None  # EMA shadow params or None

    @property
    def eval_params(self):
        """Params to evaluate/export with (EMA if tracked)."""
        return self.ema_params if self.ema_params is not None else self.params


def create_train_state(model, tx, rng, sample_input, use_ema: bool = False) -> TrainState:
    """Initialize params/batch-stats/optimizer from a sample feature batch.

    `tx` is an optax GradientTransformation, OR a callable
    `params -> transformation` for optimizers that need the params to
    build (trainable_scopes masking) — this is the ONE init
    implementation; Trainer and the watcher's restore template both call
    it, so their state structures can never drift.
    """
    params_rng, dropout_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "dropout": dropout_rng}, sample_input, training=True
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if callable(tx) and not hasattr(tx, "init"):
        tx = tx(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if use_ema else None,
    )
