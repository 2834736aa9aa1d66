"""NeusField structure, geometric init, gradient paths."""

import numpy as np
import pytest
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
    w_x, w_enc = params["sdf_mlp"][0]
    assert w_x.shape == (64, 3) and w_enc.shape == (64, 28)
    # hash-feature block zeroed (matches utils/mlp_weights.txt structure)
    assert np.all(np.asarray(w_enc) == 0)
    assert np.std(np.asarray(w_x)) > 0.1
    w2 = np.asarray(params["sdf_mlp"][-1])
    assert w2.shape == (16, 64)
    # output weights clustered at sqrt(pi/64) ≈ 0.2216
    np.testing.assert_allclose(w2, (np.pi / 64) ** 0.5, atol=1e-3)
    assert np.asarray(params["variance"])[0] == np.float32(0.3)


def test_init_field_is_sphere_sdf():
    """The reference's geometric init (mlp_weights.txt evaluated through the
    48→64→16 MLP on CENTERED xyz with sdf_bias −0.1) is a sphere SDF:
    sdf(x) ≈ 1.07·(‖x−0.5‖ − 0.093) — measured radial profile:
    r=0 → −0.100, r=0.1 → +0.007, r=0.3 → +0.222, r=0.5 → +0.437.
    Our SAL-procedure init must reproduce this sphere."""
    grid = HashGridConfig()
    net = NetworkConfig()
    field = NeusField(grid, net)
    params = init_params(jax.random.PRNGKey(3), grid, net)
    center = jnp.array([[0.5, 0.5, 0.5]])
    assert abs(float(field.sdf(params, center)[0]) - (-0.1)) < 1e-3
    # radial linearity and approximate slope
    rng = np.random.default_rng(0)
    d = rng.standard_normal((256, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    prof = []
    for r in [0.1, 0.2, 0.3, 0.4]:
        v = np.asarray(field.sdf(params, jnp.asarray(0.5 + r * d)))
        prof.append(v.mean())
    slopes = np.diff(prof) / 0.1
    assert np.all(slopes > 0.6) and np.all(slopes < 1.6)
    # zero crossing (init sphere radius) in (0.05, 0.2)
    assert prof[0] > -0.08 and prof[1] > 0
    _, g, _ = field.sdf_and_grad(params, jnp.asarray(0.5 + 0.3 * d))
    gn = np.linalg.norm(np.asarray(g), axis=1)
    assert 0.5 < gn.mean() < 1.8  # near-eikonal init gradients


@pytest.mark.slow  # compile-heavy grad graphs
def test_grad_matches_finite_difference():
    # fp32 compute: this validates the analytic-jacobian math against
    # central differences, which bf16 rounding would drown out
    grid = HashGridConfig(n_levels=4, top_resolution=64)
    net = NetworkConfig(compute_dtype="float32")
    field = NeusField(grid, net)
    params = init_params(jax.random.PRNGKey(0), grid, net)
    x = jnp.array([[0.4, 0.5, 0.6], [0.52, 0.48, 0.51]])
    _, grad, _ = field.sdf_and_grad(params, x)
    eps = 1e-4
    for d in range(3):
        dx = jnp.zeros((1, 3)).at[0, d].set(eps)
        fd = (field.sdf(params, x + dx) - field.sdf(params, x - dx)) / (2 * eps)
        # central differences straddle trilinear-cell kinks, so tolerance is
        # loose; the analytic gradient is exact within each cell
        np.testing.assert_allclose(np.asarray(grad[:, d]), np.asarray(fd),
                                   rtol=6e-2, atol=3e-3)


@pytest.mark.slow  # compile-heavy grad graphs
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
    # At the geometric init the first-layer feature block is zero, so the
    # hash table gets NO gradient yet (exactly like the reference: dL/dgrid
    # multiplies through those zero columns); it unblocks once the feature
    # block moves. Perturb it to check the table path is wired.
    assert float(jnp.abs(g["hash_table"]).sum()) == 0
    assert float(jnp.abs(g["sdf_mlp"][0][1]).sum()) > 0  # feat block trains
    p2 = dict(params)
    w_x, w_enc = params["sdf_mlp"][0]
    p2["sdf_mlp"] = [(w_x, w_enc + 0.01 * jax.random.normal(
        jax.random.PRNGKey(9), w_enc.shape))] + list(params["sdf_mlp"][1:])
    g2 = jax.grad(loss)(p2)
    assert float(jnp.abs(g2["hash_table"]).sum()) > 0
    assert float(jnp.abs(g["variance"]).sum()) > 0
    assert float(sum(jnp.abs(w).sum()
                     for w in jax.tree_util.tree_leaves(g["sdf_mlp"]))) > 0
    assert float(sum(jnp.abs(w).sum()
                     for w in jax.tree_util.tree_leaves(g["rgb_mlp"]))) > 0
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
    s = float(np.exp(10 * np.asarray(params["variance"])[0]))
    sdf = np.asarray(field.sdf(params, x))
    sig = 1 / (1 + np.exp(-sdf * s))
    np.testing.assert_allclose(d, s * sig * (1 - sig), rtol=1e-4, atol=1e-7)
    # far outside the init sphere (sdf > 0.3) the density is tiny; on the
    # zero level set it peaks at s/4 ≈ 5
    far = sdf > 0.3
    assert np.all(d[far] < 1e-1)
    assert abs(s / 4 - 5.02) < 0.2
