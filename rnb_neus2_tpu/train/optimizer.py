"""Optimizer chain: Adam + L2(matrix-only) + LR schedule + parameter EMA.

Reference chain (configs/nerf/base.json:4-28, tcnn optimizers):
  Ema(decay .95) → ExponentialDecay(start 20000, interval 10000, base .33)
      → Adam(lr 1e-3, β .9/.99, eps 1e-15, l2_reg 1e-6)

- l2_reg applies to MATRIX params only (MLP weights), not to the hash table
  or the variance scalar (tcnn adam.h optimize_matrix_params split);
- the Ema wrapper keeps a decayed copy of the params used for inference /
  rendering / final marching cubes (trainer.h inference params);
- component masks: --fractional-training freezes the RGB MLP after a given
  step (adam.h only_sdf_training); configs/normal/base.json-style component
  freezing maps to the same mask mechanism.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import OptimizerConfig


class OptState(NamedTuple):
    adam: Any
    ema_params: Any         # inference params (Ema wrapper)


def lr_schedule(cfg: OptimizerConfig):
    def schedule(step):
        over = jnp.maximum(step - cfg.decay_start, 0)
        n_decays = jnp.where(step >= cfg.decay_start,
                             over // cfg.decay_interval + 1, 0)
        return cfg.learning_rate * cfg.decay_base ** n_decays
    return schedule


def _l2_mask(params: Dict[str, Any]):
    """True for MLP weight matrices only."""
    return {
        "hash_table": False,
        "sdf_mlp": jax.tree_util.tree_map(lambda _: True, params["sdf_mlp"]),
        "rgb_mlp": jax.tree_util.tree_map(lambda _: True, params["rgb_mlp"]),
        "variance": False,
    }


def make_optimizer(cfg: OptimizerConfig, params: Dict[str, Any]):
    tx = optax.chain(
        optax.add_decayed_weights(cfg.l2_reg, mask=_l2_mask(params)),
        optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.epsilon),
        optax.scale_by_schedule(lr_schedule(cfg)),
        optax.scale(-1.0),
    )
    return tx


def init_state(cfg: OptimizerConfig, params) -> OptState:
    tx = make_optimizer(cfg, params)
    return OptState(adam=tx.init(params), ema_params=params)


def apply_updates(tx, cfg: OptimizerConfig, params, grads, state: OptState,
                  rgb_train_scale: jnp.ndarray,
                  update_scale: jnp.ndarray | float = 1.0) -> tuple:
    """One optimizer step; rgb_train_scale ∈ {0,1} gates the RGB MLP
    (fractional training / component masks). update_scale multiplies the
    FINAL update (a traced scalar — no recompile when it changes): the
    divergence guard's learning-rate backoff. Scaling updates, not
    gradients, because Adam is gradient-scale-invariant."""
    updates, adam_state = tx.update(grads, state.adam, params)
    updates = jax.tree_util.tree_map(lambda u: u * update_scale,
                                     dict(updates))
    updates["rgb_mlp"] = jax.tree_util.tree_map(
        lambda u: u * rgb_train_scale, updates["rgb_mlp"])
    new_params = optax.apply_updates(params, updates)
    d = cfg.ema_decay
    ema = jax.tree_util.tree_map(lambda e, p: d * e + (1.0 - d) * p,
                                 state.ema_params, new_params)
    return new_params, OptState(adam=adam_state, ema_params=ema)
