"""march_flat: derived dt/valid/ray_id fields equal the directly
scattered ones (the single-scatter compaction rewrite)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnb_neus2_tpu.config import MIN_CONE_STEPSIZE, MAX_CONE_STEPSIZE
from rnb_neus2_tpu.ops import ray_march


def _reference_flat(ray_o, ray_d, bitfield, u_start, n_ladder, n_slots,
                    cone_angle):
    """Direct NumPy restatement of the compaction contract."""
    t, dt, valid, n_valid, _ = ray_march._ladder_valid(
        ray_o, ray_d, bitfield, u_start, n_ladder, cone_angle)
    t, dt, valid, n_valid = map(np.asarray, (t, dt, valid, n_valid))
    R = ray_o.shape[0]
    out_t = np.zeros(n_slots, np.float32)
    out_dt = np.full(n_slots, MIN_CONE_STEPSIZE, np.float32)
    out_rid = np.full(n_slots, R, np.int32)
    out_valid = np.zeros(n_slots, bool)
    s = 0
    kept = np.zeros(R, bool)
    reserved = 0   # the reference's atomicAdd counter advances even for
    for r in range(R):   # dropped rays (testbed_nerf.cu:1352-1356)
        reserved += int(n_valid[r])
        if reserved > n_slots:
            continue  # whole-ray drop; counter stays advanced
        kept[r] = True
        for k in range(t.shape[1]):
            if valid[r, k]:
                out_t[s] = t[r, k]
                out_dt[s] = dt[r, k]
                out_rid[s] = r
                out_valid[s] = True
                s += 1
    return out_t, out_dt, out_rid, out_valid, kept


@pytest.mark.parametrize("cone_angle", [0.0, 1.0 / 256])
@pytest.mark.parametrize("seed", [0, 3])
def test_flat_fields_match_reference_compaction(cone_angle, seed):
    rng = np.random.default_rng(seed)
    R, K, n_slots = 64, 128, 512
    g = 16
    # random blocky occupancy so rays cross occupied and empty space
    bit = jnp.asarray(rng.random(g ** 3) < 0.3)
    o = rng.uniform(0.1, 0.9, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    u = rng.random(R).astype(np.float32)

    fs = ray_march.march_flat(jnp.asarray(o), jnp.asarray(d), bit,
                              jnp.asarray(u), K, n_slots, cone_angle)
    rt, rdt, rrid, rvalid, rkept = _reference_flat(
        jnp.asarray(o), jnp.asarray(d), bit, jnp.asarray(u), K, n_slots,
        cone_angle)

    np.testing.assert_array_equal(np.asarray(fs.valid), rvalid)
    np.testing.assert_array_equal(np.asarray(fs.ray_kept), rkept)
    np.testing.assert_array_equal(np.asarray(fs.ray_id), rrid)
    np.testing.assert_allclose(np.asarray(fs.t), rt, rtol=1e-6)
    # derived dt must equal the ladder's dt wherever a sample exists
    np.testing.assert_allclose(np.asarray(fs.dt)[rvalid], rdt[rvalid],
                               rtol=1e-6)
    assert np.asarray(fs.dt).min() >= MIN_CONE_STEPSIZE - 1e-9
    assert np.asarray(fs.dt).max() <= MAX_CONE_STEPSIZE + 1e-9


@pytest.mark.slow
def test_flat_budget_overflow_drops_whole_rays():
    rng = np.random.default_rng(1)
    R, K, n_slots = 32, 64, 40   # tiny budget forces drops
    g = 8
    bit = jnp.ones((g ** 3,), bool)
    o = rng.uniform(0.3, 0.7, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    u = jnp.zeros((R,))
    fs = ray_march.march_flat(jnp.asarray(o), jnp.asarray(d), bit, u,
                              K, n_slots, 0.0)
    kept = np.asarray(fs.ray_kept)
    nv = np.asarray(fs.n_valid)
    assert kept.sum() < R                     # something was dropped
    assert nv[kept].sum() <= n_slots          # budget respected
    rid = np.asarray(fs.ray_id)
    valid = np.asarray(fs.valid)
    assert valid.sum() == nv[kept].sum()
    # every valid slot belongs to a kept ray, ids nondecreasing
    assert np.all(kept[rid[valid]])
    assert np.all(np.diff(rid[valid]) >= 0)


# --------------------------------------------- subsampled occupancy refresh

def test_occupancy_subsampled_update_decays_unsampled():
    from rnb_neus2_tpu.grid import occupancy

    st = occupancy.init_state(8)
    n = 8 ** 3
    st = occupancy.update(st, jnp.full((n,), 2.0), decay=0.95)
    idx = jnp.asarray([0, 1, 1, 5])
    dens = jnp.asarray([3.0, 0.5, 4.0, 1.0])
    st2 = occupancy.update_sampled(st, idx, dens, decay=0.95)
    d = np.asarray(st2.density)
    assert d[0] == pytest.approx(3.0)          # new max wins
    assert d[1] == pytest.approx(4.0)          # max over duplicate splats
    assert d[5] == pytest.approx(2.0 * 0.95)   # decay beats 1.0
    assert d[7] == pytest.approx(2.0 * 0.95)   # unsampled decays


def test_occupancy_nonuniform_sampling_biases_to_occupied():
    from rnb_neus2_tpu.grid import occupancy

    g = 16
    st = occupancy.init_state(g)
    n = g ** 3
    occupied = np.zeros(n, np.float32)
    occupied[:n // 20] = 5.0                  # 5% of cells occupied
    st = occupancy.update(st, jnp.asarray(occupied), decay=0.95)
    nq = n // 4
    pos, idx = occupancy.sample_update_cells(
        jax.random.PRNGKey(0), st, g, nq, nq)
    assert pos.shape == (2 * nq, 3) and idx.shape == (2 * nq,)
    assert float(pos.min()) >= 0.0 and float(pos.max()) <= 1.0
    d = np.asarray(st.density)
    frac_uniform = (d[np.asarray(idx[:nq])] > 0.1).mean()
    frac_biased = (d[np.asarray(idx[nq:])] > 0.1).mean()
    # 10 tries at 5% occupancy → expected hit rate 1 − 0.95¹⁰ ≈ 0.40
    # (the reference's rejection loop gives up after 10, :595-600)
    expect = 1.0 - 0.95 ** 10
    assert abs(frac_biased - expect) < 0.08, (frac_biased, expect)
    assert frac_uniform < 0.1 < frac_biased


def test_occ_refresh_level_cap():
    """TrainConfig.occ_refresh_levels statically caps the encode levels
    used by refresh density evals (TPU perf knob; None/cap >= L is
    bit-identical to the reference-exact full-level refresh)."""
    from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig,
                                      TestbedConfig, TrainConfig)
    from rnb_neus2_tpu.testing.synthetic import sphere_dataset
    from rnb_neus2_tpu.train.trainer import Trainer

    ds = sphere_dataset(n_views=2, width=16, height=16, radius=0.2)

    def make(cap):
        cfg = TestbedConfig(
            grid=HashGridConfig(n_levels=4, top_resolution=64),
            train=TrainConfig(target_batch_size=1 << 9,
                              initial_rays_per_batch=64, occ_grid_size=16,
                              seed=0, occ_refresh_levels=cap),
            march=MarchConfig(n_ladder=64, cone_angle=1.0 / 256.0))
        return Trainer(ds, cfg)

    tr_full = make(None)
    assert tr_full._occ_n_active(4) == 4
    tr_same = make(8)          # cap above L = no-op
    assert tr_same._occ_n_active(4) == 4
    tr_cap = make(2)
    assert tr_cap._occ_n_active(4) == 2

    key = jax.random.PRNGKey(7)
    step = jnp.asarray(600, jnp.int32)   # steady state: all levels active
    occ_full = tr_full._occ_update_fn(4, subsampled=True)(
        tr_full.params, tr_full.occ, key, step)
    occ_same = tr_same._occ_update_fn(4, subsampled=True)(
        tr_full.params, tr_full.occ, key, step)
    np.testing.assert_array_equal(np.asarray(occ_full.density),
                                  np.asarray(occ_same.density))
    occ_cap = tr_cap._occ_update_fn(4, subsampled=True)(
        tr_full.params, tr_full.occ, key, step)
    # same machinery, same shapes; density values differ only through the
    # truncated top-level features
    assert occ_cap.density.shape == occ_full.density.shape
    assert bool(jnp.all(jnp.isfinite(occ_cap.density)))


# ---------------------------------------------------------------------------
# multi-cascade occupancy (aabb_scale > 1)
# ---------------------------------------------------------------------------

def test_mip_from_pos_matches_reference_frexp():
    from rnb_neus2_tpu.grid.occupancy import mip_from_pos
    import math
    pts = np.array([[0.5, 0.5, 0.5], [0.6, 0.5, 0.5], [0.9, 0.5, 0.5],
                    [1.4, 0.5, 0.5], [2.4, 0.5, 0.5], [-1.3, 0.5, 0.5]],
                   np.float32)
    got = np.asarray(mip_from_pos(jnp.asarray(pts), 7))

    def ref(p):
        maxval = max(abs(c - 0.5) for c in p)
        if maxval == 0:
            return 0
        _, e = math.frexp(maxval)
        return min(7, max(0, e + 1))

    want = [ref(p) for p in pts]
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_cascaded_march_samples_beyond_unit_cube():
    """aabb_scale=4 scene: a ray through an occupied region outside the
    unit cube must produce samples there (reference cascade DDA,
    testbed_nerf.cu:755-790)."""
    from rnb_neus2_tpu.grid import occupancy
    from rnb_neus2_tpu.ops import ray_march

    g, C = 32, 3          # cascades cover side 1, 2, 4
    state = occupancy.init_state_cascaded(g, C)
    # occupy everything in every cascade
    dens = jnp.ones((C, g ** 3), jnp.float32)
    state = occupancy.update_cascaded(state, dens, g)
    assert bool(state.bitfield.all())

    # ray starting outside the unit cube traversing x at y=z=1.2 (only
    # inside the aabb_scale=4 box)
    o = jnp.asarray([[-1.2, 1.2, 1.2]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    m = ray_march.march(o, d, state.bitfield, jnp.asarray([0.5]),
                        n_ladder=512, max_samples=256, cone_angle=1e-2,
                        aabb_scale=4.0)
    assert int(m.n_valid[0]) > 50
    pos = np.asarray(o[0] + m.t[0][:, None] * d[0])[np.asarray(m.valid[0])]
    # every sample lies outside the unit cube (x < 0 at the march start,
    # y = 1.2 throughout) yet inside the aabb_scale=4 box
    assert (pos[:, 0] < 0.0).any()
    assert np.allclose(pos[:, 1], 1.2)
    assert (np.abs(pos - 0.5) <= 2.0).all()


def test_cascade_maxpool_propagates_fine_occupancy():
    from rnb_neus2_tpu.grid import occupancy
    g, C = 16, 2
    state = occupancy.init_state_cascaded(g, C)
    dens = np.zeros((C, g ** 3), np.float32)
    # occupy one fine cell at the center region of mip 0
    ix = (g // 2) + g * ((g // 2) + g * (g // 2))
    dens[0, ix] = 10.0
    state = occupancy.update_cascaded(state, jnp.asarray(dens), g)
    b0 = np.asarray(state.bitfield[0])
    b1 = np.asarray(state.bitfield[1]).reshape(g, g, g)
    assert b0[ix]
    # the pooled bit lands in mip 1's central eighth
    q = g // 4
    assert b1[q:3 * q + g // 4, q:, q:].any()
    # specifically at (g/4 + g/4, ...) = pooled coords
    px = q + (g // 2) // 2
    assert b1[px, px, px]


def test_effective_ladder_trim_is_bit_exact():
    """Shrinking the internal (R,K) ladder to the static coverage bound
    (effective_ladder_points) must be invisible in every march_flat
    output — points past the cube exit are masked and carry nothing.
    Includes the analytic worst case: entry at t=0 along the diagonal."""
    import jax

    from rnb_neus2_tpu.ops import ray_march as rm

    assert rm.effective_ladder_points(1024, 1.0 / 256.0) == 620
    assert rm.effective_ladder_points(1024, 0.0) == 1024      # cone 0: no cut
    assert rm.effective_ladder_points(512, 1.0 / 256.0) == 512

    key = jax.random.PRNGKey(0)
    R = 255
    o = jax.random.uniform(key, (R, 3)) * 3 - 1
    d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    # worst-case ray: origin ON the cube corner, along the main diagonal
    o = jnp.concatenate([o, jnp.zeros((1, 3))])
    d = jnp.concatenate([d, jnp.full((1, 3), 1.0 / np.sqrt(3.0))])
    u = jax.random.uniform(jax.random.PRNGKey(2), (R + 1,))
    bf = jax.random.uniform(jax.random.PRNGKey(3), (128 ** 3,)) < 0.5

    new = rm.march_flat(o, d, bf, u, 1024, 8192, 1.0 / 256.0)
    orig = rm.effective_ladder_points
    try:
        rm.effective_ladder_points = lambda n, c, a=1.0: n
        old = rm.march_flat(o, d, bf, u, 1024, 8192, 1.0 / 256.0)
    finally:
        rm.effective_ladder_points = orig
    for f in new._fields:
        assert np.array_equal(np.asarray(getattr(new, f)),
                              np.asarray(getattr(old, f))), f
    # the worst-case ray's occupied count stays below the trimmed K
    assert int(old.n_valid[-1]) <= rm.effective_ladder_points(
        1024, 1.0 / 256.0)


@pytest.mark.parametrize("grid,occ_frac", [(32, 0.3), (128, 0.05),
                                           (128, 0.5)])
def test_blocked_march_bitwise_exact(grid, occ_frac):
    """The two-phase coarse-block march (round-5 perf: the per-point
    occupancy gather was 272 of 549 ms/step at the production steady
    state) must be BITWISE identical to the single-phase ladder whenever
    the block budget covers every block (NB == K/8, guaranteed for
    R <= 8192): the dilated coarse probe is a proven superset
    (_coarse_dilated docstring), so no fine-occupied point is ever
    missed."""
    rng = np.random.default_rng(hash((grid, int(occ_frac * 10))) % 2**31)
    R, K, S = 256, 512, 1 << 13
    bf = jnp.asarray(rng.random(grid ** 3) < occ_frac)
    ro = jnp.asarray(0.5 + 0.02 * rng.standard_normal((R, 3))
                     + np.array([0, 0, -1.3]), jnp.float32)
    rd = np.array([0, 0, 1.0]) + 0.4 * rng.standard_normal((R, 3))
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=1, keepdims=True),
                     jnp.float32)
    u0 = jnp.asarray(rng.random(R), jnp.float32)
    a = ray_march.march_flat(ro, rd, bf, u0, K, S, 0.0, blocked=False)
    b = ray_march.march_flat(ro, rd, bf, u0, K, S, 0.0, blocked=True)
    for f in a._fields:
        x, y = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        if f in ("t", "dt"):
            assert np.allclose(x, y, atol=1e-6), f
        else:
            assert np.array_equal(x, y), f


def test_blocked_march_auto_selection():
    """march_flat auto-routes: cone=0 single-cascade -> blocked path;
    cone>0 -> the exact single-phase ladder (geometric blocks break the
    midpoint-coverage proof)."""
    rng = np.random.default_rng(3)
    R, K, S = 64, 512, 1 << 12
    bf = jnp.asarray(rng.random(32 ** 3) < 0.3)
    ro = jnp.asarray(np.tile([[0.5, 0.5, -1.2]], (R, 1)), jnp.float32)
    rd = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (R, 1)), jnp.float32)
    u0 = jnp.asarray(rng.random(R), jnp.float32)
    auto = ray_march.march_flat(ro, rd, bf, u0, K, S, 0.0)
    forced = ray_march.march_flat(ro, rd, bf, u0, K, S, 0.0, blocked=True)
    assert np.array_equal(np.asarray(auto.n_valid),
                          np.asarray(forced.n_valid))
    # cone>0 still works through the exact path
    g = ray_march.march_flat(ro, rd, bf, u0, K, S, 1.0 / 256.0)
    assert int(np.asarray(g.n_valid).sum()) > 0
