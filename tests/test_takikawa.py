"""Takikawa octree encoding: build, lookup, interpolation, training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnb_neus2_tpu.ops import takikawa
from tests.test_raycast_albedo import icosphere

pytestmark = pytest.mark.slow  # octree build + SDF training on 1-cpu host


@pytest.fixture(scope="module")
def sphere_octree():
    V, F = icosphere(0.3, (0.5, 0.5, 0.5), subdiv=2)
    tree = takikawa.build_triangle_octree(V, F, depth=6, starting_level=3)
    return V, F, tree


def test_octree_build_shapes(sphere_octree):
    V, F, tree = sphere_octree
    assert tree.n_levels == 3
    for lvl in range(tree.n_levels):
        keys = tree.cell_keys[lvl]
        octs = tree.octets[lvl]
        assert octs.shape == (len(keys), 8)
        assert np.all(np.diff(keys) > 0), "cell keys sorted & unique"
        res = 1 << (tree.starting_level + lvl)
        assert keys.min() >= 0 and keys.max() < res ** 3
    # shared corners are deduplicated: fewer vertices than 8 per cell
    n_cells = sum(len(k) for k in tree.cell_keys)
    assert 0 < tree.n_vertices < 8 * n_cells


def test_octree_covers_surface_not_empty_space(sphere_octree):
    V, F, tree = sphere_octree
    lvl = tree.n_levels - 1
    res = 1 << (tree.starting_level + lvl)
    keys = set(tree.cell_keys[lvl].tolist())

    def cell_of(p):
        c = np.clip((np.asarray(p) * res).astype(int), 0, res - 1)
        return c[0] + c[1] * res + c[2] * res * res

    # points on the sphere surface are in refined cells
    for v in V[::17]:
        assert cell_of(v) in keys
    # the center and a far corner are not
    assert cell_of([0.5, 0.5, 0.5]) not in keys
    assert cell_of([0.02, 0.02, 0.02]) not in keys


def test_encode_zero_outside_refinement(sphere_octree):
    V, F, tree = sphere_octree
    table = takikawa.init_takikawa_params(jax.random.PRNGKey(0), tree)
    pts = jnp.asarray([[0.5, 0.5, 0.5], [0.05, 0.05, 0.05]], jnp.float32)
    out = takikawa.encode(table, pts, tree)
    # coarse levels may be refined at the center's cell? no: center is
    # inside the sphere, surface cells only → all-zero rows
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=0)


def test_encode_trilinear_exact(sphere_octree):
    """Features set to a linear ramp of vertex position reproduce the
    ramp exactly inside a refined cell (trilinear interpolation)."""
    V, F, tree = sphere_octree
    # pick a refined cell at the finest level; fill features of all
    # levels' vertices with a ramp in their lattice x coordinate
    table = np.zeros((tree.n_vertices, 8), np.float32)
    lvl = tree.n_levels - 1
    res = 1 << (tree.starting_level + lvl)
    vres = res + 1
    key = int(tree.cell_keys[lvl][len(tree.cell_keys[lvl]) // 2])
    cx, cy, cz = key % res, (key // res) % res, key // (res * res)
    oct_ids = tree.octets[lvl][len(tree.cell_keys[lvl]) // 2]
    for i, vid in enumerate(oct_ids):
        corner = takikawa._CORNERS[i]
        table[vid, 0] = (cx + corner[0]) / res    # x coord of the vertex

    # interior points of that cell (away from faces so only this level's
    # cell features contribute via the ramp; other levels are zero)
    rng = np.random.default_rng(0)
    local = rng.uniform(0.2, 0.8, (32, 3))
    pts = (np.array([cx, cy, cz]) + local) / res
    out = takikawa.encode(jnp.asarray(table), jnp.asarray(pts, jnp.float32),
                          tree)
    got = np.asarray(out[:, lvl * 8 + 0])
    np.testing.assert_allclose(got, pts[:, 0], atol=1e-5)


def test_encode_smoothstep_differs_but_matches_at_corners(sphere_octree):
    V, F, tree = sphere_octree
    table = takikawa.init_takikawa_params(jax.random.PRNGKey(1), tree)
    lvl = tree.n_levels - 1
    res = 1 << (tree.starting_level + lvl)
    key = int(tree.cell_keys[lvl][0])
    cx, cy, cz = key % res, (key // res) % res, key // (res * res)
    mid = (np.array([[cx, cy, cz]]) + 0.3) / res
    corner = (np.array([[cx, cy, cz]]) + 1e-6) / res
    lin_m = takikawa.encode(table, jnp.asarray(mid, jnp.float32), tree)
    smo_m = takikawa.encode(table, jnp.asarray(mid, jnp.float32), tree,
                            interpolation="smoothstep")
    assert not np.allclose(np.asarray(lin_m), np.asarray(smo_m))
    lin_c = takikawa.encode(table, jnp.asarray(corner, jnp.float32), tree)
    smo_c = takikawa.encode(table, jnp.asarray(corner, jnp.float32), tree,
                            interpolation="smoothstep")
    np.testing.assert_allclose(np.asarray(lin_c), np.asarray(smo_c),
                               atol=1e-4)


def test_gradients_flow_to_touched_vertices_only(sphere_octree):
    V, F, tree = sphere_octree
    table = takikawa.init_takikawa_params(jax.random.PRNGKey(2), tree)
    pts = jnp.asarray(V[:8], jnp.float32)     # on-surface points

    g = jax.grad(lambda t: jnp.sum(takikawa.encode(t, pts, tree)))(table)
    g = np.asarray(g)
    assert np.abs(g).sum() > 0
    touched = np.abs(g).sum(axis=1) > 0
    # a small fraction of vertices receives gradient
    assert 0 < touched.sum() < tree.n_vertices // 2


def test_sdf_field_with_takikawa_encoding_trains():
    from rnb_neus2_tpu.models.extra_modes import SdfField

    V, F = icosphere(0.3, (0.5, 0.5, 0.5), subdiv=2)
    f = SdfField(encoding="takikawa", octree_depth=6,
                 octree_starting_level=3)
    f.fit(V, F, n_steps=150, batch=1 << 11, seed=0)
    iou = f.calculate_iou(n_samples=1 << 13)
    assert iou > 0.5, iou


def test_occupied_cells_conservative_for_boundary_sliver():
    """A thin triangle straddling a cell boundary must mark BOTH cells
    (the reference's exact tri/AABB octree build would; point sampling
    could miss one)."""
    from rnb_neus2_tpu.ops.takikawa import _occupied_cells
    res = 4
    # triangle crossing the x = 0.5 cell boundary at y,z ~ 0.6
    tri = np.array([[[0.49, 0.6, 0.6],
                     [0.51, 0.6, 0.6],
                     [0.50, 0.62, 0.6]]], np.float64)
    cells = _occupied_cells(tri, res)
    x_cells = sorted(set(int(c) % res for c in cells))
    assert 1 in x_cells and 2 in x_cells, x_cells
