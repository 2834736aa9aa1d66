"""Hash-grid encoding: shape/structure golden tests + numpy oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rnb_neus2_tpu.config import HashGridConfig
from rnb_neus2_tpu.ops import hash_encoding as he


def numpy_encode(table, x, static):
    """Straight-line numpy re-derivation of grid.h semantics (oracle)."""
    cfg = static.cfg
    out = np.zeros((x.shape[0], cfg.n_levels * cfg.n_features_per_level),
                   np.float32)
    table = np.asarray(table)
    for lvl in range(cfg.n_levels):
        scale = static.scales[lvl]
        res = int(static.resolutions[lvl])
        tsize = int(static.table_sizes[lvl])
        off = int(static.offsets[lvl])
        hashed = bool(static.hashed[lvl])
        p = x * scale + 0.5
        p0 = np.floor(p).astype(np.int64)
        f = (p - p0).astype(np.float32)
        acc = 0.0
        for c in range(8):
            cx, cy, cz = c & 1, (c >> 1) & 1, (c >> 2) & 1
            g = p0 + np.array([cx, cy, cz])
            if hashed:
                idx = (g[:, 0].astype(np.uint32)
                       ^ (g[:, 1].astype(np.uint32) * np.uint32(2654435761))
                       ^ (g[:, 2].astype(np.uint32) * np.uint32(805459861)))
                idx = idx % np.uint32(tsize)
            else:
                idx = (g[:, 0] + g[:, 1] * res + g[:, 2] * res * res) % tsize
            w = np.prod(np.where(np.array([cx, cy, cz]) > 0, f, 1.0 - f),
                        axis=1)
            acc = acc + table[off + idx.astype(np.int64)] * w[:, None]
        out[:, lvl * 2:(lvl + 1) * 2] = acc
    return out


def test_level_tables_match_reference_structure():
    cfg = HashGridConfig()
    assert abs(cfg.per_level_scale - 128.0 ** (1 / 13)) < 1e-12
    res = cfg.level_resolutions()
    # top level: exp2f(13·log2(1.45242f))·16−1 = 2047.0007 in float32 →
    # ceil+1 = 2049, exactly like the reference's grid.h:980 computation.
    assert res[0] == 16 and res[-1] == 2049
    sizes = cfg.level_table_sizes()
    assert sizes[0] == 16 ** 3
    assert sizes[-1] == 1 << 19
    # dense levels then hashed levels, monotone switch
    static = he.HashGridStatic(cfg)
    switch = list(static.hashed)
    assert switch == sorted(switch)


def test_encode_matches_numpy_oracle():
    cfg = HashGridConfig(n_levels=6, top_resolution=256)
    static = he.HashGridStatic(cfg)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (static.n_entries, 2), jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
    got = np.asarray(he.encode(table, x, static))
    want = numpy_encode(table, np.asarray(x), static)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_encode_columns_matches_encode():
    """encode_columns (the forward-only fast layout used by occupancy
    refresh / mesh extraction) is the same math as encode, including
    progressive masking and static level truncation."""
    cfg = HashGridConfig(n_levels=6, top_resolution=256)
    static = he.HashGridStatic(cfg)
    table = jax.random.normal(jax.random.PRNGKey(0),
                              (static.n_entries, 2), jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
    np.testing.assert_allclose(
        np.asarray(he.encode_columns(table, x, static)),
        np.asarray(he.encode(table, x, static)), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(he.encode_columns(table, x, static, valid_level=3)),
        np.asarray(he.encode(table, x, static, valid_level=3)),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(he.encode_columns(table, x, static, valid_level=3,
                                     n_active=4)),
        np.asarray(he.encode(table, x, static, valid_level=3, n_active=4)),
        rtol=1e-5, atol=1e-6)


def test_progressive_level_mask():
    cfg = HashGridConfig()
    static = he.HashGridStatic(cfg)
    table = he.init_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))
    out = he.encode(table, x, static, valid_level=3)
    out = np.asarray(out).reshape(16, cfg.n_levels, 2)
    assert np.all(out[:, 3:, :] == 0)
    assert np.any(out[:, :3, :] != 0)
    # unlocking schedule (grid.h:1430-1436): starts at ceil(0.2*14)=3,
    # +0.02 levels/step after step 100 → all 14 unlocked at step 660
    assert cfg.valid_levels(1) == 3
    assert cfg.valid_levels(100) == 3
    assert cfg.valid_levels(660) == 14
    assert cfg.valid_levels(659) == 14  # ceil(2.8 + 0.02*559) = ceil(13.98)
    assert cfg.valid_levels(0) == 14    # step<=0 → all levels (grid.h:1432)


@pytest.mark.slow  # compile-heavy grad graphs
def test_second_order_grad_exists():
    """grad-of-grad through the encoding (the reference's hand-written
    backward_backward path, grid.h:557-859) must work natively."""
    cfg = HashGridConfig(n_levels=4, top_resolution=64)
    static = he.HashGridStatic(cfg)
    table = jax.random.normal(jax.random.PRNGKey(0), (static.n_entries, 2))

    def f(tab, x):
        # scalar function of position gradient — mimics eikonal
        def s(xx):
            return he.encode(tab, xx[None], static).sum()
        g = jax.grad(s)(x)
        return jnp.sum((jnp.linalg.norm(g) - 1.0) ** 2)

    x = jnp.array([0.3, 0.5, 0.7])
    gtab = jax.grad(f)(table, x)
    assert np.isfinite(np.asarray(gtab)).all()
    assert np.abs(np.asarray(gtab)).sum() > 0


def _bwd_oracle_vs_mode(mode, monkeypatch, n=257):
    """Gradient of a scalar loss through the custom-VJP encode must be
    identical (up to summation order) across scatter formulations."""
    cfg = HashGridConfig(n_levels=6, top_resolution=128,
                         log2_hashmap_size=14)
    static = he.HashGridStatic(cfg)
    key = jax.random.PRNGKey(3)
    table = he.init_table(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (n, 3))
    cot_f = jax.random.normal(jax.random.PRNGKey(5),
                              (n, cfg.output_dim))
    cot_j = tuple(jax.random.normal(jax.random.PRNGKey(6 + d),
                                    (n, cfg.output_dim)) for d in range(3))

    def grad_for(mode_name):
        monkeypatch.setattr(he, "_SCATTER_MODE", mode_name)
        he_fn = he.make_encode_with_jacobian_cv(static)

        def loss(t):
            f, j = he_fn(t, x)
            return jnp.vdot(f, cot_f) + sum(
                jnp.vdot(j[d], cot_j[d]) for d in range(3))
        return jax.grad(loss)(table)

    g_ref = grad_for("width1")
    g_new = grad_for(mode)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.slow  # compile-heavy grad graphs
def test_bwd_nbhd_matches_width1(monkeypatch):
    _bwd_oracle_vs_mode("nbhd", monkeypatch)


def test_grad_nbhd16_unit():
    """grad_nbhd16 == explicit per-corner scatter on a dense level."""
    res, size, n = 9, 736, 64   # padded size > res^3 stays zero
    size = -(-res ** 3 // 8) * 8
    key = jax.random.PRNGKey(0)
    d0 = jax.random.randint(key, (n,), 0, (res - 1) ** 3, dtype=jnp.int32)
    cf = jax.random.normal(jax.random.PRNGKey(1), (n, 8, 2))
    got = he.grad_nbhd16(d0, cf.reshape(n, 16), size, res)
    want = jnp.zeros((size, 2))
    offs = he._corner_flat_offsets(res)
    for c in range(8):
        want = want.at[(d0 + offs[c]) % size].add(cf[:, c, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow  # compile-heavy grad graphs
def test_grad_onehot_mxu_interpret():
    """Pallas one-hot MXU gradient (interpret mode) == scatter oracle."""
    S, n = 512, 300
    idx = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, S,
                             dtype=jnp.int32)
    cf = jax.random.normal(jax.random.PRNGKey(3), (n, 2))
    got = he.grad_onehot_mxu(idx, cf, S, interpret=True)
    want = jnp.zeros((S, 2)).at[idx].add(cf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # compile-heavy grad graphs
def test_cv_gradient_matches_autodiff_oracle(monkeypatch):
    """The hand-derived custom-VJP backward (all modes route through the
    same per-corner source construction) must equal plain jax.grad through
    the pure-jnp oracle encode_with_jacobian — including with a partial
    progressive-level mask. Guards the whole bwd derivation, which the
    mode-vs-mode comparisons alone cannot (a shared bug would cancel)."""
    monkeypatch.setattr(he, "_SCATTER_MODE", "width1")
    cfg = HashGridConfig(n_levels=6, top_resolution=128,
                         log2_hashmap_size=14)
    static = he.HashGridStatic(cfg)
    table = he.init_table(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (193, 3))
    cot_f = jax.random.normal(jax.random.PRNGKey(5), (193, cfg.output_dim))
    cot_j = tuple(jax.random.normal(jax.random.PRNGKey(6 + d),
                                    (193, cfg.output_dim))
                  for d in range(3))
    he_fn = he.make_encode_with_jacobian_cv(static)

    for vl in (None, 4):
        def loss_cv(t):
            f, j = he_fn(t, x, vl)
            return jnp.vdot(f, cot_f) + sum(
                jnp.vdot(j[d], cot_j[d]) for d in range(3))

        def loss_oracle(t):
            f, j = he.encode_with_jacobian(t, x, static, vl)
            return jnp.vdot(f, cot_f) + sum(
                jnp.vdot(j[d], cot_j[d]) for d in range(3))

        g_cv = np.asarray(jax.grad(loss_cv)(table))
        g_or = np.asarray(jax.grad(loss_oracle)(table))
        np.testing.assert_allclose(g_cv, g_or, rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_stochastic_corner_bwd_unbiased():
    """The K-corner importance-sampled backward (stoch_corner_bwd) is an
    unbiased estimator of the exact table gradient (it applies to every
    level when enabled — dense levels' per-slot noise just averages out
    over far more samples).

    MC convergence is checked along the cheap axis (K draws within one
    compiled graph): err(K=64) must shrink vs err(K=2) roughly like
    1/sqrt(K), and land within the MC tolerance of the exact gradient."""
    cfg = HashGridConfig(n_levels=6, top_resolution=128,
                         log2_hashmap_size=10)   # levels 3+ hashed
    static = he.HashGridStatic(cfg)
    assert static.hashed.sum() >= 2
    table = he.init_table(jax.random.PRNGKey(3), cfg)
    n = 129
    x = jax.random.uniform(jax.random.PRNGKey(4), (n, 3))
    cot_f = jax.random.normal(jax.random.PRNGKey(5), (n, cfg.output_dim))
    cot_j = tuple(jax.random.normal(jax.random.PRNGKey(6 + d),
                                    (n, cfg.output_dim)) for d in range(3))

    def grad_for(fn):
        def loss(t):
            f, j = fn(t, x)
            return jnp.vdot(f, cot_f) + sum(
                jnp.vdot(j[d], cot_j[d]) for d in range(3))
        return np.asarray(jax.grad(loss)(table))

    g_exact = grad_for(he.make_encode_with_jacobian_cv(static))
    g_k2 = grad_for(he.make_encode_with_jacobian_cv(
        static, corner_samples=2))
    g_k64 = grad_for(he.make_encode_with_jacobian_cv(
        static, corner_samples=64))
    # independent draw streams at K=16, averaged (exercises corner_salt)
    n_salts = 12
    g_salt = sum(grad_for(he.make_encode_with_jacobian_cv(
        static, corner_samples=16, corner_salt=s))
        for s in range(n_salts)) / n_salts

    # whole-table L2 error must shrink like 1/sqrt(K) toward the exact
    # gradient (a biased estimator would plateau at its bias). Measured on
    # this fixture: relL2 = 1.62 (K=2), 0.30 (K=64), 0.17 (12x16 salts) —
    # exactly the predicted sqrt ratios.
    l2 = np.linalg.norm(g_exact)
    err2 = np.linalg.norm(g_k2 - g_exact) / l2
    err64 = np.linalg.norm(g_k64 - g_exact) / l2
    err_salt = np.linalg.norm(g_salt - g_exact) / l2
    assert err2 > 0.05          # the estimator is actually stochastic
    # sqrt(64/2) = 5.66x expected shrink (measured 5.34)
    assert 3.5 < err2 / err64 < 8.0, (err2, err64)
    # 12 streams x K=16 = 192 effective draws: sqrt(96) = 9.8x (meas. 9.6)
    assert 6.0 < err2 / err_salt < 14.0, (err2, err_salt)


def test_dense_max_entries_densifies_mid_levels():
    """dense_max_entries_log2 lifts the reference's 2^19 per-level cap
    (grid.h:987-999 — a GPU L2-cache tuning choice) for levels whose FULL
    dense table fits under 2^N: those levels lose their hash (no
    collisions) and join the corner-redundant rows-of-16 gather path. At
    the default 14-level config, 22 densifies exactly L5 and L6."""
    base = HashGridConfig()
    cfg = HashGridConfig(dense_max_entries_log2=22)
    sizes, bsizes = cfg.level_table_sizes(), base.level_table_sizes()
    res = cfg.level_resolutions()
    static = he.HashGridStatic(cfg)
    assert sizes[:5] == bsizes[:5]                 # already dense
    for lvl in (5, 6):
        assert sizes[lvl] == -(-res[lvl] ** 3 // 8) * 8
        assert not static.hashed[lvl]
    assert all(s == 1 << 19 for s in sizes[7:])    # beyond the cap
    assert all(static.hashed[7:])
    # monotone dense→hashed switch preserved
    switch = list(static.hashed)
    assert switch == sorted(switch)


def test_densified_encode_matches_numpy_oracle():
    """All three forwards (encode, encode_columns, the custom-VJP training
    forward) agree with the numpy oracle on a MIXED densified layout:
    small-dense levels, knob-densified mid levels, and a still-hashed top
    level in one config."""
    cfg = HashGridConfig(n_levels=4, top_resolution=64,
                         log2_hashmap_size=10, dense_max_entries_log2=17)
    static = he.HashGridStatic(cfg)
    # the layout this test exists for: L0 small-dense, L1-2 knob-densified
    # (dense size > 2^10 but <= 2^17), L3 hashed (64^3 > 2^17)
    assert list(static.hashed) == [0, 0, 0, 1]
    assert static.table_sizes[1] > (1 << 10)
    table = jax.random.normal(jax.random.PRNGKey(0),
                              (static.n_entries, 2), jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
    want = numpy_encode(table, np.asarray(x), static)
    np.testing.assert_allclose(np.asarray(he.encode(table, x, static)),
                               want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(he.encode_columns(table, x, static)), want,
        rtol=1e-5, atol=1e-5)
    f_cv, jac_cv = he.make_encode_with_jacobian_cv(static)(table, x, None)
    np.testing.assert_allclose(np.asarray(f_cv), want, rtol=1e-5, atol=1e-5)
    # jacobian on the densified levels agrees with the pure-jnp oracle
    f_or, jac_or = he.encode_with_jacobian(table, x, static)
    for d in range(3):
        np.testing.assert_allclose(np.asarray(jac_cv[d]),
                                   np.asarray(jac_or[d]),
                                   rtol=1e-4, atol=1e-4)


def test_densified_cv_gradient_matches_oracle():
    """Table gradient through the custom VJP on the densified layout (the
    nbhd rows-of-16 / stoch paths must handle knob-sized dense tables)
    equals jax.grad through the pure-jnp oracle."""
    cfg = HashGridConfig(n_levels=4, top_resolution=64,
                         log2_hashmap_size=10, dense_max_entries_log2=17)
    static = he.HashGridStatic(cfg)
    table = he.init_table(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (193, 3))
    cot_f = jax.random.normal(jax.random.PRNGKey(5), (193, cfg.output_dim))
    cot_j = tuple(jax.random.normal(jax.random.PRNGKey(6 + d),
                                    (193, cfg.output_dim))
                  for d in range(3))
    fn = he.make_encode_with_jacobian_cv(static)

    def loss_cv(t):
        f, j = fn(t, x, None)
        return jnp.vdot(f, cot_f) + sum(
            jnp.vdot(j[d], cot_j[d]) for d in range(3))

    def loss_oracle(t):
        f, j = he.encode_with_jacobian(t, x, static)
        return jnp.vdot(f, cot_f) + sum(
            jnp.vdot(j[d], cot_j[d]) for d in range(3))

    g_cv = np.asarray(jax.grad(loss_cv)(table))
    g_or = np.asarray(jax.grad(loss_oracle)(table))
    np.testing.assert_allclose(g_cv, g_or, rtol=2e-5, atol=2e-6)
