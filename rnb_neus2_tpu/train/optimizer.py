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


class SparseAdamState(NamedTuple):
    count: jnp.ndarray      # global step (matrix params' debias counter)
    mu: Any
    nu: Any
    steps: Any              # per-PARAM debias counters (int32, adam.h:188)


def scale_by_sparse_adam(b1: float, b2: float, eps: float, is_matrix):
    """tcnn-exact Adam scaling (adam.h:85-199 `adam_step`).

    Differences from `optax.scale_by_adam` that matter at full scale:

    - **Sparse skip** (adam.h:112-118): a non-matrix param (hash-table slot,
      variance) whose gradient is EXACTLY zero this step is not touched at
      all — moments are not decayed, its debias step is not incremented,
      and the update is zero. Dense Adam instead keeps applying the decayed
      first moment of a past kick every subsequent step; at β .9/.99 the
      tail sums to ~10x the initial step, movement the reference's frozen
      slots never make. At the 2048-res hash levels (slots touched
      sparsely), this is the reference's implicit per-kick displacement
      bound.
    - **Per-param debias** (adam.h:188-190): each param carries its own
      `param_steps` counter, so a freshly-touched slot's first update is
      `lr * sign(g)`-sized (debias factor sqrt(1-β2)/(1-β1) = 1 at s=1)
      regardless of how late in training the touch happens.
    - **Epsilon placement** (adam.h:193): update =
      sqrt(1-β2^s)/(1-β1^s) * mu / (sqrt(nu) + eps) — eps on the raw
      second moment, not the debiased one. Identical at eps=1e-15.

    `is_matrix`: pytree of bools matching params — matrix params (MLP
    weights) always update, with their step == the global count.
    """
    flags = is_matrix

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        steps = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.int32), params)
        return SparseAdamState(count=jnp.zeros([], jnp.int32),
                               mu=zeros,
                               nu=jax.tree_util.tree_map(jnp.zeros_like,
                                                         params),
                               steps=steps)

    def update(updates, state, params=None):
        del params
        count = state.count + 1

        def leaf(g, mu, nu, s, matrix):
            active = (jnp.ones(g.shape, bool) if matrix
                      else (g != 0.0))
            mu = jnp.where(active, b1 * mu + (1.0 - b1) * g, mu)
            nu = jnp.where(active, b2 * nu + (1.0 - b2) * g * g, nu)
            s = s + active.astype(jnp.int32)
            sf = jnp.maximum(s, 1).astype(jnp.float32)
            debias = (jnp.sqrt(1.0 - b2 ** sf) / (1.0 - b1 ** sf))
            upd = jnp.where(active,
                            debias * mu / (jnp.sqrt(nu) + eps),
                            0.0)
            return upd, mu, nu, s

        # flat unzip: params contain (W, b) tuples, so an is_leaf=tuple
        # unzip of a tuple-returning tree_map would stop at the pairs
        tu = jax.tree_util
        g_flat, tdef = tu.tree_flatten(updates)
        outs = [leaf(g, m, n, s, fl) for g, m, n, s, fl in
                zip(g_flat, tu.tree_leaves(state.mu),
                    tu.tree_leaves(state.nu), tu.tree_leaves(state.steps),
                    tu.tree_leaves(flags))]
        unz = [tdef.unflatten([o[i] for o in outs]) for i in range(4)]
        return unz[0], SparseAdamState(count=count, mu=unz[1], nu=unz[2],
                                       steps=unz[3])

    return optax.GradientTransformation(init, update)


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


def _matrix_mask(params: Dict[str, Any]):
    """Per-LEAF matrix/non-matrix flags (adam.h is_matrices_param): True
    for every MLP weight leaf, False for hash_table and variance."""
    return {
        k: jax.tree_util.tree_map(lambda _: k in ("sdf_mlp", "rgb_mlp"),
                                  params[k])
        for k in params
    }


def make_optimizer(cfg: OptimizerConfig, params: Dict[str, Any]):
    if getattr(cfg, "sparse_adam", False):
        adam = scale_by_sparse_adam(cfg.beta1, cfg.beta2, cfg.epsilon,
                                    is_matrix=_matrix_mask(params))
    else:
        adam = optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2,
                                   eps=cfg.epsilon)
    tx = optax.chain(
        optax.add_decayed_weights(cfg.l2_reg, mask=_l2_mask(params)),
        adam,
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
