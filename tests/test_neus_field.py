"""NeusField structure, geometric init, gradient paths."""

import numpy as np
import jax
import jax.numpy as jnp

from rnb_neus2_tpu.config import HashGridConfig, NetworkConfig
from rnb_neus2_tpu.models import NeusField, init_params


def small_field():
    grid = HashGridConfig(n_levels=4, top_resolution=64)
    net = NetworkConfig()
    return NeusField(grid, net), init_params(jax.random.PRNGKey(0), grid, net)


def test_geometric_init_structure():
    grid = HashGridConfig()
    net = NetworkConfig()
    params = init_params(jax.random.PRNGKey(0), grid, net)
    w1 = np.asarray(params["sdf_mlp"][0])
    assert w1.shape == (64, 48)
    # hash-feature columns zeroed (matches utils/mlp_weights.txt structure)
    assert np.all(w1[:, 3:] == 0)
    assert np.std(w1[:, :3]) > 0.1
    w2 = np.asarray(params["sdf_mlp"][-1])
    assert w2.shape == (16, 64)
    # output weights clustered at sqrt(pi/64) ≈ 0.2216
    np.testing.assert_allclose(w2, (np.pi / 64) ** 0.5, atol=1e-3)
    assert np.asarray(params["variance"])[0] == np.float32(0.3)


def test_init_field_statistics():
    """The reference's geometric init (mlp_weights.txt through the 48→64→16
    MLP with sdf_bias −0.1) yields a nearly-flat POSITIVE field: sdf ≈ +0.95
    at the cube center, ≈ +1.0 near the edges, with modest gradients.
    Training carves the surface from this 'everything outside' state.
    Our SAL-procedure init must land in the same regime."""
    grid = HashGridConfig()
    net = NetworkConfig()
    field = NeusField(grid, net)
    params = init_params(jax.random.PRNGKey(3), grid, net)
    x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))
    sdf = np.asarray(field.sdf(params, x))
    assert 0.2 < float(sdf.mean()) < 2.0      # flat positive field
    # (exactly at cube corners the ReLU net can dip to sdf_bias = −0.1,
    # same as the reference weights at x=(0,0,0))
    assert float((sdf > 0).mean()) > 0.9
    assert float(sdf.std()) < 0.5
    _, g, _ = field.sdf_and_grad(params, x)
    gn = np.linalg.norm(np.asarray(g), axis=1)
    assert gn.mean() < 2.0


def test_grad_matches_finite_difference():
    field, params = small_field()
    x = jnp.array([[0.4, 0.5, 0.6], [0.52, 0.48, 0.51]])
    _, grad, _ = field.sdf_and_grad(params, x)
    eps = 1e-4
    for d in range(3):
        dx = jnp.zeros((1, 3)).at[0, d].set(eps)
        fd = (field.sdf(params, x + dx) - field.sdf(params, x - dx)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(grad[:, d]), np.asarray(fd),
                                   rtol=2e-2, atol=2e-3)


def test_full_apply_and_second_order():
    field, params = small_field()
    x = jax.random.uniform(jax.random.PRNGKey(2), (32, 3))
    out = field.apply(params, x)
    assert out["albedo_raw"].shape == (32, 3)
    assert out["sdf"].shape == (32,)
    assert out["grad"].shape == (32, 3)

    # loss using ∇sdf (eikonal + shading-like term) must be differentiable
    # wrt every parameter group — the reference's double-backward wiring.
    def loss(p):
        o = field.apply(p, x)
        ek = jnp.sum((jnp.linalg.norm(o["grad"], axis=1) - 1.0) ** 2)
        sh = jnp.sum(o["albedo_raw"] * o["grad"])
        return ek + sh + jnp.sum(o["sdf"]) + o["variance"]

    g = jax.grad(loss)(params)
    # At the geometric init the first-layer feature columns are zero, so the
    # hash table gets NO gradient yet (exactly like the reference: dL/dgrid
    # multiplies through those zero columns); it unblocks once W1's feature
    # columns move. Perturb W1 to check the table path is wired.
    assert float(jnp.abs(g["hash_table"]).sum()) == 0
    assert float(jnp.abs(g["sdf_mlp"][0][:, 3:]).sum()) > 0  # W1 feat cols train
    p2 = dict(params)
    p2["sdf_mlp"] = [params["sdf_mlp"][0]
                     + 0.01 * jax.random.normal(jax.random.PRNGKey(9),
                                                params["sdf_mlp"][0].shape)
                     ] + list(params["sdf_mlp"][1:])
    g2 = jax.grad(loss)(p2)
    assert float(jnp.abs(g2["hash_table"]).sum()) > 0
    assert float(jnp.abs(g["variance"]).sum()) > 0
    assert float(sum(jnp.abs(w).sum() for w in g["sdf_mlp"])) > 0
    assert float(sum(jnp.abs(w).sum() for w in g["rgb_mlp"])) > 0
    leaves = jax.tree_util.tree_leaves(g) + jax.tree_util.tree_leaves(g2)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_density_profile():
    """density = s·σ(s·sdf)(1−σ(s·sdf)) peaks (= s/4) at the zero level set
    and is ~0 at the init field's sdf ≈ +1 (common_operation.cuh:311-328).
    At init the occupancy grid still fills because the bitfield threshold is
    min(0.1, mean_density) = 0 with a strict '>' (testbed_nerf.cu:693-718)."""
    field, params = small_field()
    x = jax.random.uniform(jax.random.PRNGKey(5), (64, 3), minval=0.2,
                           maxval=0.8)
    d = np.asarray(field.density(params, x))
    assert np.all(d > 0) and np.all(d < 1e-3)  # far from surface: tiny
    # force sdf ≈ 0 by subtracting the field's own value via bias trick:
    s = float(np.exp(10 * np.asarray(params["variance"])[0]))
    sdf = np.asarray(field.sdf(params, x))
    sig = 1 / (1 + np.exp(-sdf * s))
    np.testing.assert_allclose(d, s * sig * (1 - sig), rtol=1e-4, atol=1e-7)
