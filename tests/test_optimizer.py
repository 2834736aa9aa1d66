"""Sparse (tcnn-exact) Adam semantics.

The reference's Adam kernel (neus2_tcnn adam.h:85-199) skips a non-matrix
param entirely when its gradient is exactly zero — no moment decay, no
per-param debias-step increment, no weight update (adam.h:112-118) — and
debiases with a PER-PARAM step counter (adam.h:188-190). These tests pin
that behavior and its restore compatibility.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnb_neus2_tpu.config import OptimizerConfig
from rnb_neus2_tpu.train import optimizer as opt


def _params():
    return {
        "hash_table": jnp.array([1.0, 2.0, 3.0, 4.0], jnp.float32),
        "sdf_mlp": [jnp.ones((2, 2), jnp.float32)],
        "rgb_mlp": [jnp.ones((2, 2), jnp.float32)],
        "variance": jnp.full((1,), 0.3, jnp.float32),
    }


def _grads(hash_g, mlp_g=0.01):
    return {
        "hash_table": jnp.asarray(hash_g, jnp.float32),
        "sdf_mlp": [jnp.full((2, 2), mlp_g, jnp.float32)],
        "rgb_mlp": [jnp.full((2, 2), mlp_g, jnp.float32)],
        "variance": jnp.zeros((1,), jnp.float32),
    }


def _cfg(**kw):
    return OptimizerConfig(l2_reg=0.0, **kw)


def _run(cfg, params, grads_seq):
    tx = opt.make_optimizer(cfg, params)
    state = opt.OptState(adam=tx.init(params), ema_params=params)
    hist = [params]
    for g in grads_seq:
        params, state = opt.apply_updates(tx, cfg, params, g, state,
                                          rgb_train_scale=1.0)
        hist.append(params)
    return hist, state


def test_zero_grad_slot_fully_frozen():
    """A hash slot with g==0 keeps its weight, moments, and step counter
    (adam.h:112-118 early return)."""
    cfg = _cfg(sparse_adam=True)
    params = _params()
    kick = _grads([0.0, 5.0, 0.0, 0.0])
    quiet = _grads([0.0, 0.0, 0.0, 0.0])
    hist, state = _run(cfg, params, [kick] + [quiet] * 5)
    h = np.asarray([np.asarray(p["hash_table"]) for p in hist])
    # slot 1 moves exactly once, then freezes; slots 0/2/3 never move
    assert np.all(h[1:, 1] == h[1, 1]) and h[1, 1] != h[0, 1]
    for s in (0, 2, 3):
        assert np.all(h[:, s] == h[0, s])
    steps = np.asarray(state.adam[1].steps["hash_table"])
    np.testing.assert_array_equal(steps, [0, 1, 0, 0])
    # variance had zero grads throughout: frozen too
    assert np.asarray(state.adam[1].steps["variance"])[0] == 0


def test_dense_adam_applies_momentum_tail():
    """Control: the dense optimizer keeps moving a kicked slot on
    subsequent zero-grad steps (the behavior sparse Adam removes)."""
    cfg = _cfg(sparse_adam=False)
    params = _params()
    kick = _grads([0.0, 5.0, 0.0, 0.0])
    quiet = _grads([0.0, 0.0, 0.0, 0.0])
    hist, _ = _run(cfg, params, [kick] + [quiet] * 5)
    h = np.asarray([np.asarray(p["hash_table"]) for p in hist])
    assert h[2, 1] != h[1, 1]  # tail keeps moving the slot
    # summed tail is several times the initial step at beta .9/.99
    assert abs(h[-1, 1] - h[0, 1]) > 2.0 * abs(h[1, 1] - h[0, 1])


def test_first_touch_is_lr_sized_regardless_of_when():
    """Per-param debias (adam.h:188-190): a slot first touched at global
    step 100 moves by ~lr, exactly like one touched at step 1."""
    cfg = _cfg(sparse_adam=True)
    params = _params()
    quiet = _grads([0.0, 0.0, 0.0, 0.0])
    kick = _grads([0.0, 0.0, 7.0, 0.0])
    hist, _ = _run(cfg, params, [quiet] * 100 + [kick])
    h = np.asarray([np.asarray(p["hash_table"]) for p in hist])
    move = h[-1, 2] - h[-2, 2]
    # s=1: debias = sqrt(1-b2)/(1-b1) = 1; update = lr * m/(sqrt(v)+eps)
    #     = lr * 0.1*7/(0.1*7+eps) = lr
    np.testing.assert_allclose(-move, cfg.learning_rate, rtol=1e-3)


def test_matrix_params_always_dense():
    """MLP weights update every step even when a gradient element is
    exactly zero (sparse skip is non-matrix only, adam.h:111)."""
    cfg = _cfg(sparse_adam=True)
    params = _params()
    kick = _grads([0.0] * 4, mlp_g=0.5)
    quiet = dataclasses.replace  # noqa: F841  (keep imports honest)
    zero_mlp = _grads([0.0] * 4, mlp_g=0.0)
    hist, state = _run(cfg, params, [kick, zero_mlp])
    w = np.asarray([np.asarray(p["sdf_mlp"][0]) for p in hist])
    assert np.all(w[2] != w[1])  # momentum tail applied on the zero step
    steps = np.asarray(state.adam[1].steps["sdf_mlp"][0])
    np.testing.assert_array_equal(steps, np.full((2, 2), 2))


def test_sparse_matches_dense_when_grads_always_nonzero():
    """With every gradient nonzero each step, sparse == dense Adam up to
    the eps placement (eps=1e-15 — indistinguishable)."""
    seq = [_grads(np.random.RandomState(i).randn(4) + 2.0, mlp_g=0.05)
           for i in range(6)]
    hist_s, _ = _run(_cfg(sparse_adam=True), _params(), seq)
    hist_d, _ = _run(_cfg(sparse_adam=False), _params(), seq)
    for a, b in zip(jax.tree_util.tree_leaves(hist_s[-1]["hash_table"]),
                    jax.tree_util.tree_leaves(hist_d[-1]["hash_table"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("old_sparse,new_sparse", [(False, True),
                                                   (True, False),
                                                   (True, True)])
def test_snapshot_restore_across_adam_kinds(tmp_path, old_sparse,
                                            new_sparse):
    """Old dense snapshots restore into the sparse optimizer (steps
    synthesized at the global count) and vice versa."""
    from rnb_neus2_tpu.train import snapshot as snap

    class _T:  # minimal trainer-shaped holder
        def __init__(self):
            from rnb_neus2_tpu.utils.meters import Ema
            self.loss_ema = Ema()
            self.ek_ema = Ema()
            self.mask_ema = Ema()
            self._guard_degraded_at = None
            self._guard_rearms_used = 0
            self._guard_ek_floor = None
            self._guard_ema_floor = None
            self._compiled = {}

        def seed_guard(self):
            pass

    cfg_old = _cfg(sparse_adam=old_sparse)
    params = _params()
    hist, state = _run(cfg_old, params,
                       [_grads(np.ones(4), mlp_g=0.1)] * 3)

    t = _T()
    t.params, t.opt_state, t.step, t.n_rays = hist[-1], state, 3, 4096
    t.key = jnp.zeros((2,), jnp.uint32)
    from rnb_neus2_tpu.config import TestbedConfig
    t.cfg = TestbedConfig()

    class _Occ:
        density = jnp.zeros((8,), jnp.float32)
        ema_step = jnp.zeros((), jnp.int32)
    t.occ = _Occ()
    path = str(tmp_path / "s.msgpack")
    snap.save_snapshot(path, t)

    cfg_new = _cfg(sparse_adam=new_sparse)
    t2 = _T()
    t2.params = _params()
    tx2 = opt.make_optimizer(cfg_new, t2.params)
    t2.opt_state = opt.OptState(adam=tx2.init(t2.params),
                                ema_params=t2.params)
    t2.cfg = TestbedConfig()
    t2.occ = _Occ()
    t2.step, t2.n_rays, t2.key = 0, 0, jnp.zeros((2,), jnp.uint32)
    snap.restore_trainer(t2, snap.load_snapshot(path))

    np.testing.assert_allclose(np.asarray(t2.params["hash_table"]),
                               np.asarray(t.params["hash_table"]))
    if new_sparse:
        steps = np.asarray(t2.opt_state.adam[1].steps["hash_table"])
        assert steps.shape == (4,)
        if not old_sparse:       # synthesized at the dense global count
            np.testing.assert_array_equal(steps, np.full((4,), 3))
    # both optimizers can take a step from the restored state
    g = _grads(np.ones(4), mlp_g=0.1)
    p3, _ = opt.apply_updates(tx2, cfg_new, t2.params, g, t2.opt_state,
                              rgb_train_scale=1.0)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(p3))
