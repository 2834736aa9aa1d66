"""DeltaNetwork: 6D rotation math + trainable rigid fit."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from rnb_neus2_tpu.models import delta_network as dn


def test_identity_init():
    d = dn.init_delta_params()
    R = dn.rotation_6d_to_matrix(d["rotation6d"])
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    o = jnp.array([[0.2, 0.3, 0.4]])
    v = jnp.array([[0.0, 0.0, 1.0]])
    o2, v2 = dn.apply_rigid(d, o, v)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-6)


def test_rotation_is_orthonormal():
    r6 = jax.random.normal(jax.random.PRNGKey(0), (6,))
    R = np.asarray(dn.rotation_6d_to_matrix(r6))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(R) - 1.0) < 1e-5


def test_compose_matches_sequential():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    d1 = {"rotation6d": jax.random.normal(k1, (6,)),
          "translation": jnp.array([0.1, -0.2, 0.3])}
    d2 = {"rotation6d": jax.random.normal(k2, (6,)),
          "translation": jnp.array([-0.3, 0.1, 0.05])}
    pts = jax.random.uniform(jax.random.PRNGKey(2), (32, 3))
    seq = dn.apply_rigid_points(d2, dn.apply_rigid_points(d1, pts))
    acc = dn.compose(d1, d2)
    np.testing.assert_allclose(np.asarray(dn.apply_rigid_points(acc, pts)),
                               np.asarray(seq), atol=1e-5)
    # inverse undoes
    back = dn.inverse_transform_points(acc, dn.apply_rigid_points(acc, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_trainable_rigid_fit():
    """Recover a known rigid motion by gradient descent (the globalmove
    optimizer path, configs/nerf/base.json 'globalmove')."""
    rng = np.random.default_rng(0)
    ang = 0.4
    R_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    t_true = np.array([0.1, -0.05, 0.2])
    src = rng.uniform(size=(256, 3)).astype(np.float32)
    dst = src @ R_true.T + t_true

    params = dn.init_delta_params()
    tx = optax.adam(5e-3, b1=0.9, b2=0.99)  # globalmove lr (base.json:106)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        def loss(pp):
            pred = dn.apply_rigid_points(pp, jnp.asarray(src))
            return jnp.mean((pred - jnp.asarray(dst)) ** 2)
        l, g = jax.value_and_grad(loss)(p)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    for _ in range(600):
        params, state, l = step(params, state)
    assert float(l) < 1e-5
    R = np.asarray(dn.rotation_6d_to_matrix(params["rotation6d"]))
    np.testing.assert_allclose(R, R_true, atol=5e-3)
    np.testing.assert_allclose(np.asarray(params["translation"]), t_true,
                               atol=5e-3)
