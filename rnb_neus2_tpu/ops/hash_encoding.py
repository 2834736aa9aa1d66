"""Multiresolution hash-grid encoding (instant-ngp style) in pure jnp.

Semantics match the reference's tiny-cuda-nn fork
(`dependencies/neus2_tcnn/include/tiny-cuda-nn/encodings/grid.h`):

- per-level integer lattice scale = resolution − 1 (grid.h:979-982, a NeuS2
  fork delta vs upstream tcnn which uses the fractional scale);
- lattice coordinate = x * scale + 0.5, corner = floor, trilinear weights from
  the fraction (common_device.h:416-424);
- dense indexing (x + y·res + z·res²) for levels whose padded dense size fits
  the table, else spatial hash  x ^ (y·2654435761) ^ (z·805459861)  mod 2^T
  (grid.h:113-148);
- per-level tables concatenated with offsets (grid.h:973-1005);
- progressive level unlocking zeroes features of locked levels
  (grid.h:254-260 via m_valid_level; formula grid.h:1430-1436).

Being pure gather + linear interpolation, `jax.grad` (and grad-of-grad for the
eikonal/shading path through ∇sdf) differentiates this natively — the
reference needed three bespoke second-order CUDA kernels (grid.h:557-859);
here XLA derives them. A Pallas TPU kernel with custom VJP is the planned
fast path; this jnp version is the semantic oracle and fallback.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..config import HashGridConfig

_PRIMES = (1, 2654435761, 805459861)

# encode-backward scatter formulation (A/B-tested on v5e, see DESIGN.md):
#   auto   — per-level best: one-hot MXU kernel (small dense), rows-of-16
#            neighborhood scatter (dense), width-1 scatters (hashed)
#   width1 — one width-1 scatter per feature column per level (oracle)
#   rows   — one (N·8, F) row scatter per level (measured 1.7× slower)
#   sorted — argsort indices then indices_are_sorted segment_sum per level
_SCATTER_MODE = os.environ.get("RNB_SCATTER_MODE", "auto")

# dense levels with table_size <= this use the Pallas one-hot MXU gradient
# kernel on TPU (measured 8.5 ms vs 28 ms width-1 at 2^18 samples)
_MXU_MAX_ENTRIES = int(os.environ.get("RNB_BWD_MXU_MAX", 1 << 15))


def _hash_uniforms(positions: jnp.ndarray, salt: int, k: int):
    """k per-sample uniforms in [0,1) from the position bit patterns.

    Used by the stochastic corner backward: the custom-VJP backward has no
    PRNG key input, so draws are a pseudo-random function of the sample
    position (murmur-style integer mix of the fp32 mantissas). Positions
    are themselves fresh random ray samples every step, so draws decorrelate
    across steps; `salt` varies the stream (used by the unbiasedness test
    to average over independent draw streams).
    """
    bits = [jax.lax.bitcast_convert_type(positions[:, d], jnp.uint32)
            for d in range(3)]
    base = (bits[0] * jnp.uint32(0x9E3779B1)
            ^ bits[1] * jnp.uint32(0x85EBCA77)
            ^ bits[2] * jnp.uint32(0xC2B2AE3D))
    us = []
    for j in range(k):
        h = base + jnp.uint32((0x27D4EB2F * (salt * k + j + 1))
                              & 0xFFFFFFFF)
        h = (h ^ (h >> 15)) * jnp.uint32(0x2C1B3C6D)
        h = (h ^ (h >> 12)) * jnp.uint32(0x297A2D39)
        h = h ^ (h >> 15)
        us.append((h >> 8).astype(jnp.float32) * (1.0 / (1 << 24)))
    return us


class HashGridStatic:
    """Precomputed static tables for a HashGridConfig (host-side)."""

    def __init__(self, cfg: HashGridConfig):
        self.cfg = cfg
        self.scales = np.asarray(cfg.level_scales(), np.float32)          # (L,)
        self.resolutions = np.asarray(cfg.level_resolutions(), np.int32)  # (L,)
        self.table_sizes = np.asarray(cfg.level_table_sizes(), np.int32)  # (L,)
        self.offsets = np.asarray(cfg.level_offsets()[:-1], np.int32)     # (L,)
        # level is hashed when its dense (unpadded) size exceeds its table
        dense = self.resolutions.astype(np.int64) ** 3
        self.hashed = (dense > self.table_sizes).astype(np.int32)
        self.n_entries = int(cfg.level_offsets()[-1])


def init_table(key: jax.Array, cfg: HashGridConfig,
               dtype=jnp.float32) -> jax.Array:
    """Hash table init: U(−1e−4, 1e−4) (tcnn grid.h initialize_params)."""
    static = HashGridStatic(cfg)
    return jax.random.uniform(
        key, (static.n_entries, cfg.n_features_per_level),
        dtype=dtype, minval=-1e-4, maxval=1e-4)


def level_tables(table: jnp.ndarray, static: "HashGridStatic",
                 n_levels: int | None = None):
    """Slice the concatenated table into per-level buffers.

    Trace-verified on v5e (DESIGN.md "Kernel war, continued"): per-level
    gathers/scatters against ≤2^19-row slices shave ~15% off the train
    step vs the monolithic ~5.3M-row table (the per-element scatter cost
    itself is size-independent; the win is on the gather side and in
    fusion quality). The optimization_barrier pins the slices as real
    buffers so XLA cannot fold them back into big-table operand indexing.
    """
    L = n_levels if n_levels is not None else static.cfg.n_levels
    outs = []
    for lvl in range(L):
        off = int(static.offsets[lvl])
        size = int(static.table_sizes[lvl])
        outs.append(jax.lax.slice_in_dim(table, off, off + size, axis=0))
    return jax.lax.optimization_barrier(tuple(outs))


def _corner_indices(pos_grid: jnp.ndarray, res: jnp.ndarray,
                    table_size: jnp.ndarray, hashed: jnp.ndarray) -> jnp.ndarray:
    """Table index for integer lattice corners.

    pos_grid: (..., 3) int32 lattice coords; res/table_size/hashed: scalars.
    """
    x, y, z = pos_grid[..., 0], pos_grid[..., 1], pos_grid[..., 2]
    # dense linear index, x fastest (grid.h:132-141)
    dense = x + y * res + z * res * res
    # spatial hash (grid.h:113-130); uint32 wraparound arithmetic
    ux = x.astype(jnp.uint32)
    uy = y.astype(jnp.uint32)
    uz = z.astype(jnp.uint32)
    h = ux ^ (uy * jnp.uint32(_PRIMES[1])) ^ (uz * jnp.uint32(_PRIMES[2]))
    idx = jnp.where(hashed > 0, (h % table_size.astype(jnp.uint32)).astype(jnp.int32),
                    dense % table_size)
    return idx


# 8 corner offsets of the unit cube, ordered (z, y, x) minor→major like a
# 3-bit counter (the order is irrelevant to the math, only to determinism).
_CORNERS = np.array([[i & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)],
                    np.int32)


def encode(table: jnp.ndarray, positions: jnp.ndarray,
           static: HashGridStatic, valid_level: jnp.ndarray | int | None = None,
           n_active: int | None = None) -> jnp.ndarray:
    """Encode positions through all levels.

    Args:
      table: (n_entries, F) parameter table.
      positions: (N, 3) in [0, 1] (warped coordinates).
      static: precomputed level tables.
      valid_level: number of unlocked levels (progressive training); features
        of levels >= valid_level are zeroed (grid.h:254-260). None = all.

    Returns:
      (N, L*F) features, level-major concatenation [lvl0_f0, lvl0_f1, lvl1_f0...].
    """
    cfg = static.cfg
    L = cfg.n_levels
    La = min(L, n_active) if n_active else L
    n = positions.shape[0]
    corners = jnp.asarray(_CORNERS)                        # (8, 3)

    # statically unrolled per-level loop gathering from PER-LEVEL table
    # slices (≤2^19 rows each) — measurably faster than indexing the
    # monolithic table (see level_tables); dense levels fetch all 8
    # corners with one rows-of-16 gather from a corner-redundant buffer
    # (see dense_corner_tables)
    tables = level_tables(table, static, La)
    nbs = dense_corner_tables(tables, static, La)
    F = cfg.n_features_per_level
    outs = []
    for lvl in range(La):
        scale = float(static.scales[lvl])
        res = jnp.int32(int(static.resolutions[lvl]))
        tsize = jnp.int32(int(static.table_sizes[lvl]))
        hashed = jnp.int32(int(static.hashed[lvl]))

        p = positions * scale + 0.5
        p0 = jnp.floor(p)
        frac = p - p0
        if lvl in nbs:
            d0 = _base_dense_index(positions, static, lvl)
            feats = nbs[lvl][d0].reshape(n, 8, F)          # (N, 8, F)
        else:
            cpos = p0.astype(jnp.int32)[:, None, :] \
                + corners[None, :, :]                      # (N, 8, 3)
            idx = _corner_indices(cpos, res, tsize, hashed)  # (N, 8)
            feats = tables[lvl][idx]                       # (N, 8, F)
        w = jnp.prod(jnp.where(corners[None, :, :] > 0, frac[:, None, :],
                               1.0 - frac[:, None, :]), axis=-1)       # (N,8)
        outs.append(jnp.sum(feats * w[..., None], axis=1))  # (N, F)

    out = jnp.stack(outs, axis=1)                           # (N, La, F)
    if valid_level is not None:
        lvl_ids = jnp.arange(La)
        mask = (lvl_ids < valid_level).astype(out.dtype)   # (La,)
        out = out * mask[None, :, None]
    if La < L:
        out = jnp.concatenate(
            [out, jnp.zeros((n, L - La, cfg.n_features_per_level),
                            out.dtype)], axis=1)

    return out.reshape(n, L * cfg.n_features_per_level)


def _level_constants(static: HashGridStatic, lvl: int):
    return (float(static.scales[lvl]),
            jnp.int32(int(static.resolutions[lvl])),
            jnp.int32(int(static.table_sizes[lvl])),
            int(static.offsets[lvl]),
            jnp.int32(int(static.hashed[lvl])))


def _level_corner_arrays(positions, static: HashGridStatic, lvl: int):
    """Per-corner 1-D arrays for one level.

    Returns (idx_cs, w_cs, dw_cs, scale):
      idx_cs: list of 8 (N,) int32 table indices;
      w_cs:   list of 8 (N,) trilinear weights;
      dw_cs:  list of 8 3-tuples of (N,) weight-gradients wrt x (per dim).

    EVERYTHING 1-D ON PURPOSE: (N,8)/(N,8,3)-shaped tensors put the tiny
    dim in the 128-lane minor of the (8,128) TPU tile (16–42× padding —
    a f32[2^18,8] buffer materializes as 128 MB) and reshapes across the
    padded layout force copy fusions; per-corner (N,) vectors tile
    perfectly and fuse into the gathers/scatters that consume them.
    """
    scale, res, tsize, _, _ = _level_constants(static, lvl)
    hashed = bool(static.hashed[lvl])
    p = positions * scale + 0.5
    p0 = jnp.floor(p)
    p0i = p0.astype(jnp.int32)
    fr = p - p0
    xs = [p0i[:, d] for d in range(3)]
    fs = [fr[:, d] for d in range(3)]
    ws = [(1.0 - fs[d], fs[d]) for d in range(3)]   # per dim: (w at 0, at 1)
    idx_cs, w_cs, dw_cs = [], [], []
    for c in _CORNERS:
        cx, cy, cz = int(c[0]), int(c[1]), int(c[2])
        if hashed:
            ux = (xs[0] + cx).astype(jnp.uint32)
            uy = (xs[1] + cy).astype(jnp.uint32)
            uz = (xs[2] + cz).astype(jnp.uint32)
            h = ux ^ (uy * jnp.uint32(_PRIMES[1])) \
                ^ (uz * jnp.uint32(_PRIMES[2]))
            idx_cs.append((h % tsize.astype(jnp.uint32)).astype(jnp.int32))
        else:
            dense = (xs[0] + cx) + (xs[1] + cy) * res \
                + (xs[2] + cz) * res * res
            idx_cs.append(dense % tsize)
        wx, wy, wz = ws[0][cx], ws[1][cy], ws[2][cz]
        sx, sy, sz = 2 * cx - 1, 2 * cy - 1, 2 * cz - 1
        w_cs.append(wx * wy * wz)
        dw_cs.append((sx * (wy * wz), sy * (wx * wz), sz * (wx * wy)))
    return idx_cs, w_cs, dw_cs, scale


def _level_indices_weights(positions, static: HashGridStatic, lvl: int):
    """(LOCAL idx (N,8), w (N,8), dw (N,8,3), scale) for one level.

    Indices are level-local (no table offset): all gathers/scatters run
    against the per-level slices from level_tables() — see its docstring
    for why (the monolithic-table cache cliff)."""
    scale, res, tsize, off, hashed = _level_constants(static, lvl)
    corners = jnp.asarray(_CORNERS)
    corn = corners[None, :, :]
    p = positions * scale + 0.5
    p0 = jnp.floor(p)
    frac = p - p0
    cpos = p0.astype(jnp.int32)[:, None, :] + corners[None, :, :]
    idx = _corner_indices(cpos, res, tsize, hashed)
    wd = jnp.where(corn > 0, frac[:, None, :], 1.0 - frac[:, None, :])
    sd = jnp.where(corn > 0, 1.0, -1.0)
    w = wd[..., 0] * wd[..., 1] * wd[..., 2]
    dw = jnp.stack([
        sd[..., 0] * wd[..., 1] * wd[..., 2],
        wd[..., 0] * sd[..., 1] * wd[..., 2],
        wd[..., 0] * wd[..., 1] * sd[..., 2],
    ], axis=-1)
    return idx, w, dw, scale


def encode_with_jacobian(table: jnp.ndarray, positions: jnp.ndarray,
                         static: HashGridStatic,
                         valid_level: jnp.ndarray | int | None = None):
    """Encode AND the analytic position-jacobian from one gather.

    Returns (features (N, L·F), jac = 3-tuple of (N, L·F)) with
    jac[d][n, lf] = ∂ features[n, lf] / ∂ x[n, d]. THREE SEPARATE 2-D
    arrays matter on TPU: a (N, L, F, 3) tensor has a 6-lane minor
    footprint in (8,128) tiles (≈5% lane utilization) and forces layout
    copies/casts measured ~60 ms/step, and even a single (N, 3·L·F)
    concat gets canonicalized back to the 4-D form by XLA; separate
    arrays keep every consumer a clean 2-D matmul.

    Within a cell the gathered corner features are constants, so the
    jacobian is exact: d/dx of the trilinear weights times the SAME corner
    features used by the forward — which is how the reference computes the
    in-pass SDF gradient (grid.h dy_dx path + nerf_network.h:163-190). One
    gather (and one scatter-add in the backward) serves both outputs,
    instead of nested autodiff re-gathering per differentiation level.
    """
    cfg = static.cfg
    L = cfg.n_levels
    F = cfg.n_features_per_level
    n = positions.shape[0]
    corners = jnp.asarray(_CORNERS)                        # (8, 3)
    corn = corners[None, :, :]                             # (1, 8, 3)

    tables = level_tables(table, static, L)
    outs, jacs = [], [[], [], []]
    for lvl in range(L):
        scale = float(static.scales[lvl])
        res = jnp.int32(int(static.resolutions[lvl]))
        tsize = jnp.int32(int(static.table_sizes[lvl]))
        hashed = jnp.int32(int(static.hashed[lvl]))

        p = positions * scale + 0.5
        p0 = jnp.floor(p)
        frac = p - p0                                      # (N, 3)
        cpos = p0.astype(jnp.int32)[:, None, :] + corners[None, :, :]
        idx = _corner_indices(cpos, res, tsize, hashed)
        feats = tables[lvl][idx]                           # (N, 8, F)

        # per-corner weight and its gradient wrt frac
        wd = jnp.where(corn > 0, frac[:, None, :], 1.0 - frac[:, None, :])
        sd = jnp.where(corn > 0, 1.0, -1.0)                # dwd/dfrac sign
        w = wd[..., 0] * wd[..., 1] * wd[..., 2]           # (N, 8)
        outs.append(jnp.einsum("ncf,nc->nf", feats, w))
        dws = (sd[..., 0] * wd[..., 1] * wd[..., 2],
               wd[..., 0] * sd[..., 1] * wd[..., 2],
               wd[..., 0] * wd[..., 1] * sd[..., 2])       # 3 × (N, 8)
        for d in range(3):
            # dfrac/dx = scale
            jacs[d].append(jnp.einsum("ncf,nc->nf", feats, dws[d]) * scale)

    if valid_level is not None:
        mask = (jnp.arange(L) < valid_level).astype(outs[0].dtype)
        outs = [o * mask[lvl] for lvl, o in enumerate(outs)]
        for d in range(3):
            jacs[d] = [j * mask[lvl] for lvl, j in enumerate(jacs[d])]
    out = jnp.concatenate(outs, axis=1)                    # (N, L·F)
    jac = tuple(jnp.concatenate(jacs[d], axis=1) for d in range(3))
    return out, jac


def encode_columns(table: jnp.ndarray, positions: jnp.ndarray,
                   static: HashGridStatic,
                   valid_level: jnp.ndarray | int | None = None,
                   n_active: int | None = None) -> jnp.ndarray:
    """Features-only forward in the measured-fast per-corner 1-D layout.

    Exactly `encode` (same gathers, same math — parity-tested), but built
    like the custom-VJP fast path's forward: per-corner (N,) columns with a
    final column-stack, no (N,8,F) intermediates. The (N,8)/(N,8,F)
    tensors in `encode` put the tiny dim in the 128-lane tile minor
    (16–42× padding + layout copies — DESIGN.md kernel war round 3);
    forward-only consumers (occupancy refresh: 1M density evals per
    refresh, mesh extraction, IoU) get the clean layout without the
    jacobian columns the training path also carries. Differentiable by
    autodiff (gathers transpose to scatters) — fine for the cold paths
    that use it; training keeps the custom-VJP variant.
    """
    cfg = static.cfg
    L = cfg.n_levels
    F = cfg.n_features_per_level
    La = min(L, n_active) if n_active else L
    n = positions.shape[0]
    if valid_level is None:
        mask = jnp.ones((La,), jnp.float32)
    else:
        mask = (jnp.arange(La) < valid_level).astype(jnp.float32)
    tables = level_tables(table, static, La)
    nbs = dense_corner_tables(tables, static, La)
    out_cols = []
    for lvl in range(La):
        idx_cs, w_cs, _, _ = _level_corner_arrays(positions, static, lvl)
        m = mask[lvl]
        if lvl in nbs:
            fl = nbs[lvl][idx_cs[0]]                         # (N, 8·F)
            feats = [[fl[:, c * F + f] for f in range(F)]
                     for c in range(8)]
        else:
            fcs = [tables[lvl][idx_cs[c]] for c in range(8)]
            feats = [[fcs[c][:, f] for f in range(F)] for c in range(8)]
        for f in range(F):
            out_cols.append(
                sum(w_cs[c] * feats[c][f] for c in range(8)) * m)
    if La < L:
        z = jnp.zeros((n,), jnp.float32)
        out_cols.extend([z] * ((L - La) * F))
    return jnp.stack(out_cols, axis=1)


def _corner_flat_offsets(res: int):
    """Flat dense-index offset of each of the 8 corners from the base cell
    (x-fastest layout, grid.h:132-141): δ_c = dx + dy·res + dz·res²."""
    return [int(c[0] + c[1] * res + c[2] * res * res) for c in _CORNERS]


def dense_corner_tables(tables, static: HashGridStatic, n_levels: int):
    """Corner-redundant buffers for the DENSE levels: lvl → (size, 8·F).

    Column block c of row i holds table[(i + δ_c) % size] — built with 8
    dense rolls (pure shifts, bandwidth-trivial at ≤0.7M total dense rows).
    The forward then fetches all 8 corner features of a sample with ONE
    rows-of-16 gather at its base-cell index instead of 8 rows-of-F
    gathers: XLA's TPU gather is per-ROW bound (~4.4 ns/row, width mostly
    free — measured, DESIGN.md "Kernel war, round 2"), so this cuts the
    dense-level share of the 29M-row forward gather wall ~8×. Exact: roll
    reproduces the oracle's modular dense indexing (grid.h:132-141 + the
    % table_size wrap) bit-for-bit. Hashed levels have no such structure
    (corners hash to unrelated rows) and keep per-corner gathers.
    """
    nbs = {}
    for lvl in range(n_levels):
        if int(static.hashed[lvl]):
            continue
        res = int(static.resolutions[lvl])
        nbs[lvl] = jnp.concatenate(
            [jnp.roll(tables[lvl], -off, axis=0)
             for off in _corner_flat_offsets(res)], axis=1)
    return nbs


def _base_dense_index(positions, static: HashGridStatic, lvl: int):
    """(N,) dense base-cell index (corner 0) for a dense level."""
    scale, res, tsize, _, _ = _level_constants(static, lvl)
    p0 = jnp.floor(positions * scale + 0.5).astype(jnp.int32)
    dense = p0[:, 0] + p0[:, 1] * res + p0[:, 2] * res * res
    return dense % tsize


def grad_nbhd16(d0: jnp.ndarray, cf: jnp.ndarray, table_size: int,
                res: int) -> jnp.ndarray:
    """Dense-level table gradient via ONE rows-of-16 scatter.

    All 8 corners of a sample sit at fixed flat offsets from its base cell
    in the dense layout, so the 16 cotangents (8 corners × F=2) scatter as
    a single 16-wide row at the base-cell index into a corner-redundant
    buffer, which then reduces to the true table with 8 shifted dense adds.
    Measured on v5e: 3.7 ns/source-element vs 6.7 for width-1 scatters
    (the XLA scatter loop is per-row bound, so wide rows amortize).

    d0: (N,) base-cell dense indices; cf: (N, 8·F) corner cotangents
    laid out corner-major ([c0f0, c0f1, c1f0, …], matching _CORNERS).
    """
    F = cf.shape[1] // 8
    buf = jnp.zeros((table_size, 8 * F), cf.dtype)
    buf = buf.at[d0].add(cf, mode="drop")
    grad = jnp.zeros((table_size, F), cf.dtype)
    for c, off in enumerate(_corner_flat_offsets(res)):
        # corner entry = (d0 + off) % table_size — the roll reproduces the
        # oracle's modular dense indexing (grid.h:132-141 + % table) exactly
        grad = grad + jnp.roll(buf[:, c * F:(c + 1) * F], off, axis=0)
    return grad


def grad_onehot_mxu(idx_el: jnp.ndarray, cf_el: jnp.ndarray,
                    table_size: int, interpret: bool = False) -> jnp.ndarray:
    """Small-level table gradient as an on-the-fly one-hot contraction on
    the MXU (Pallas): grad = onehotᵀ(S, N_el) @ cf (N_el, F), with the
    one-hot generated per tile in VMEM (never materialized to HBM).
    Replaces the reference's atomic scatter-add (grid.h kernel_grid
    backward) with dense matmuls — the TPU-native formulation for levels
    whose table fits comfortably in VMEM. Measured on v5e: 8.5 ms vs 28 ms
    width-1 scatters at 2^21 source elements, S ≤ 2^14.

    idx_el: (N_el,) element indices in [0, table_size) (pad with
    >= Hpad*128 to drop); cf_el: (N_el, F) cotangents. Returns (S, F).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_el, F = cf_el.shape
    TN = 2048
    H = -(-table_size // 128)
    Hpad = -(-H // 128) * 128
    nh = Hpad // 128

    if n_el % TN:
        pad = TN - n_el % TN
        idx_el = jnp.concatenate(
            [idx_el, jnp.full((pad,), Hpad * 128, jnp.int32)])
        cf_el = jnp.concatenate([cf_el, jnp.zeros((pad, F), cf_el.dtype)])
        n_el += pad

    def kernel(idx_ref, v_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        idx = idx_ref[:]
        v = v_ref[:]
        hi = idx // 128
        lo = idx % 128
        lane = jax.lax.broadcasted_iota(jnp.int32, (TN, 128), 1)
        oh_lo = (lane == lo[:, None]).astype(jnp.float32)
        m = jnp.concatenate([oh_lo * v[:, f:f + 1] for f in range(F)],
                            axis=1)                        # (TN, 128F)

        def body(h, _):
            hrow = lane + h * 128
            oh_hi = (hrow == hi[:, None]).astype(jnp.float32)
            blk = jax.lax.dot_general(
                oh_hi, m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (128, 128F)
            out_ref[pl.ds(h * 128, 128), :] += blk
            return 0

        jax.lax.fori_loop(0, nh, body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(n_el // TN,),
        in_specs=[
            pl.BlockSpec((TN,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Hpad, 128 * F), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hpad, 128 * F), jnp.float32),
        interpret=interpret,
    )(idx_el, cf_el.astype(jnp.float32))
    # (Hpad, F·128) f-blocked → (Hpad·128, F) → crop
    grad = out.reshape(Hpad, F, 128).transpose(0, 2, 1) \
        .reshape(Hpad * 128, F)
    return grad[:table_size].astype(cf_el.dtype)


def _bwd_formulation(static: HashGridStatic, lvl: int, on_tpu: bool) -> str:
    """Pick the per-level gradient formulation (see DESIGN.md kernel-war
    notes; all three are exact, differing only in summation order)."""
    dense = not int(static.hashed[lvl])
    if _SCATTER_MODE != "auto":
        # nbhd/mxu only exist for dense levels (corners of a hashed level
        # have no fixed offset structure) — forcing them falls back
        if _SCATTER_MODE in ("nbhd", "mxu") and not dense:
            return "width1"
        return _SCATTER_MODE
    size = int(static.table_sizes[lvl])
    if dense and on_tpu and size <= _MXU_MAX_ENTRIES:
        return "mxu"
    if dense:
        return "nbhd"
    return "width1"


def make_encode_with_jacobian_cv(static: HashGridStatic,
                                 n_active: int | None = None,
                                 corner_samples: int = 0,
                                 corner_salt: int = 0):
    """custom-VJP encode_with_jacobian specialized to `static`.

    The generic version lets XLA schedule the backward, which on TPU
    rematerializes the corner gathers several times (~8× fwd cost). This
    variant pins the backward to its minimal form: the cotangents of the
    features and the jacobian combine into ONE per-level (N,8,F) update
    scattered into the table — no gather recompute at all
    (the reference's kernel_grid_backward_grid, grid.h:~400, does the same
    single atomic scatter).

    POSITIONS ARE NON-DIFFERENTIABLE through this op (zero cotangent):
    training differentiates wrt params only, and the position-gradient of
    the field is already provided analytically by the jacobian output.

    n_active statically limits the processed levels (progressive
    unlocking, grid.h:1430-1436): locked levels emit zeros WITHOUT any
    gather/scatter — the trainer compiles one variant per level bucket.

    corner_samples > 0 enables the STOCHASTIC corner backward: instead of
    scattering all 8 trilinear corners per sample (the reference's exact
    kernel_grid_backward_grid), each sample scatters `corner_samples`
    corners drawn with replacement proportionally to each corner's full
    cotangent magnitude (p_c ∝ Σ_f|src_c[f]|), each contribution divided
    by (K·p_c) — an unbiased estimator of the exact table gradient with
    K/8 of the scatter elements, and every scattered value bounded by
    ‖src‖₁/K (self-normalized importance sampling; no amplified rare
    kicks). The width-1 scatter floor (6.7 ns/source-element on
    v5e, DESIGN.md "Kernel war") makes the 8-corner scatters the single
    largest step cost; K=2 cuts the hashed levels 4× and undercuts even
    the exact dense formulations, so it applies to every level (coarse
    levels see the least noise: their per-slot gradients average many
    samples). Draws are a hash of the sample position bits
    (`_hash_uniforms`) — fresh random rays each step decorrelate them
    across steps; corner_salt selects an independent draw stream.
    """
    cfg = static.cfg
    L = cfg.n_levels
    F = cfg.n_features_per_level
    La = min(L, n_active) if n_active else L

    def fwd_math(table, positions, level_mask):
        # pure 1-D column construction (see _level_corner_arrays): the
        # only ≥2-D intermediates are the gather outputs themselves
        n = positions.shape[0]
        tables = level_tables(table, static, La)
        nbs = dense_corner_tables(tables, static, La)
        out_cols, jac_cols = [], [[], [], []]
        for lvl in range(La):
            idx_cs, w_cs, dw_cs, scale = _level_corner_arrays(
                positions, static, lvl)
            m = level_mask[lvl]
            if lvl in nbs:
                # all 8 corners in ONE rows-of-16 gather (dense levels)
                fl = nbs[lvl][idx_cs[0]]                     # (N, 8·F)
                feats = [[fl[:, c * F + f] for f in range(F)]
                         for c in range(8)]
            else:
                fcs = [tables[lvl][idx_cs[c]] for c in range(8)]
                feats = [[fcs[c][:, f] for f in range(F)] for c in range(8)]
            for f in range(F):
                out_cols.append(
                    sum(w_cs[c] * feats[c][f] for c in range(8)) * m)
                for d in range(3):
                    jac_cols[d].append(
                        sum(dw_cs[c][d] * feats[c][f] for c in range(8))
                        * (scale * m))
        if La < L:
            z = jnp.zeros((n,), jnp.float32)
            for _ in range((L - La) * F):
                out_cols.append(z)
                for d in range(3):
                    jac_cols[d].append(z)
        # jac = 3-tuple of (N, L·F) — see encode_with_jacobian
        return (jnp.stack(out_cols, axis=1),
                tuple(jnp.stack(jac_cols[d], axis=1) for d in range(3)))

    @jax.custom_vjp
    def enc(table, positions, level_mask):
        return fwd_math(table, positions, level_mask)

    def enc_fwd(table, positions, level_mask):
        # residuals: positions only — indices/weights are cheap arithmetic
        # recomputed in the backward (NO table gather there), vastly less
        # HBM traffic than saving the (N,8)·L index/weight tensors
        return (fwd_math(table, positions, level_mask),
                (positions, level_mask, table.shape[0]))

    def enc_bwd(saved, cot):
        positions, level_mask, n_entries = saved
        g_out, g_jac = cot
        n = g_out.shape[0]
        # per-level gradient formulation (all exact; picked by measured
        # v5e cost — see DESIGN.md "Kernel war, round 2"):
        #   mxu    — one-hot MXU contraction, small dense levels
        #   nbhd   — ONE rows-of-16 scatter at the base cell + dense
        #            shifted reduction, dense levels
        #   width1 — per-feature width-1 scatters, hashed levels (the
        #            XLA per-element floor; corners hash independently
        #            so no row packing exists)
        # Scatter sources are built as per-corner 1-D columns
        # (_level_corner_arrays): the former (N,8,F) cotangent tensor
        # materialized 16×-padded (8-lane minor) and its reshape to the
        # flat scatter source forced copy fusions — several live at once
        # OOM'd a 16 GB chip at the 2^18 batch.
        on_tpu = jax.default_backend() == "tpu"
        pieces = []
        for lvl in range(La):
            size = int(static.table_sizes[lvl])
            scale0 = float(static.scales[lvl])
            m = level_mask[lvl]
            go = [g_out[:, lvl * F + f] * m for f in range(F)]
            gj = [[g_jac[d][:, lvl * F + f] * (scale0 * m) for f in range(F)]
                  for d in range(3)]
            idx_cs, w_cs, dw_cs, _ = _level_corner_arrays(positions, static,
                                                          lvl)

            def src(c, f):
                s = w_cs[c] * go[f]
                for d in range(3):
                    s = s + dw_cs[c][d] * gj[d][f]
                return s

            mode = _bwd_formulation(static, lvl, on_tpu)
            if corner_samples and _SCATTER_MODE == "auto":
                # stochastic K-corner backward for EVERY level: at K=2 its
                # 2 width-1 scatter elements/sample (~3.5 ms/level at 2^18)
                # undercut even the exact dense formulations (nbhd 15.5,
                # mxu 8.5). Dense/coarse levels see the least noise — their
                # per-slot gradients average hundreds of samples. Forced
                # _SCATTER_MODE (test oracles) bypasses this.
                mode = "stoch"
            if mode == "stoch":
                # stochastic corner backward (see factory docstring):
                # scatter K importance-sampled corners per sample instead
                # of 8. Corner choice by CDF inversion over
                # p_c ∝ Σ_f |src_c[f]| — the magnitude of the corner's
                # FULL cotangent (value + jacobian terms). Proportional
                # sampling makes every scattered value bounded by
                # ‖src‖₁/K: the earlier w_c/2 + 1/16 mixture tracked only
                # the trilinear weight, so a near-zero-weight corner
                # carrying a res-scaled jacobian term could be drawn at
                # p ≈ 1/16 and amplified 8× — at the 2048-res top levels
                # that sign-varying kick random-walked fine-level features
                # until the (unnormalized-normal, reference-spec) shading
                # loss diverged (full-scale run, step ~1500). Selection is
                # 8 vector selects per draw — trivial next to the scatter
                # it removes.
                K = corner_samples
                us = _hash_uniforms(positions, corner_salt * La + lvl, K)
                srcs = [[src(c, f) for f in range(F)] for c in range(8)]
                mags = [sum(jnp.abs(srcs[c][f]) for f in range(F)) + 1e-20
                        for c in range(8)]
                inv_total = 1.0 / sum(mags)
                ps = [mags[c] * inv_total for c in range(8)]
                cdf = []
                acc = None
                for c in range(8):
                    acc = ps[c] if acc is None else acc + ps[c]
                    cdf.append(acc)
                idx_ks, val_ks = [], [[] for _ in range(F)]
                for u in us:
                    # choice = #{c : u >= cdf_c}; cdf[7] ≈ 1 (float sum)
                    choice = sum((u >= cdf[c]).astype(jnp.int32)
                                 for c in range(7))
                    idx_k = jnp.zeros_like(idx_cs[0])
                    p_k = jnp.zeros_like(ps[0])
                    s_k = [jnp.zeros_like(srcs[0][f]) for f in range(F)]
                    for c in range(8):
                        sel = choice == c
                        idx_k = jnp.where(sel, idx_cs[c], idx_k)
                        p_k = jnp.where(sel, ps[c], p_k)
                        for f in range(F):
                            s_k[f] = jnp.where(sel, srcs[c][f], s_k[f])
                    inv = 1.0 / (K * p_k)
                    idx_ks.append(idx_k)
                    for f in range(F):
                        val_ks[f].append(s_k[f] * inv)
                idx_all = jnp.concatenate(idx_ks)
                cols = [jnp.zeros((size,), g_out.dtype)
                        .at[idx_all].add(jnp.concatenate(val_ks[f]),
                                         mode="drop")
                        for f in range(F)]
                pieces.append(jnp.stack(cols, axis=1))
            elif mode == "mxu":
                idx_all = jnp.concatenate(idx_cs)
                cf_el = jnp.stack(
                    [jnp.concatenate([src(c, f) for c in range(8)])
                     for f in range(F)], axis=1)            # (8N, F)
                pieces.append(grad_onehot_mxu(idx_all, cf_el, size))
            elif mode == "nbhd":
                cf16 = jnp.stack([src(c, f) for c in range(8)
                                  for f in range(F)], axis=1)   # (N, 8F)
                pieces.append(grad_nbhd16(
                    idx_cs[0], cf16, size,
                    int(static.resolutions[lvl])))
            elif mode == "rows":
                idx_all = jnp.concatenate(idx_cs)
                cf_el = jnp.stack(
                    [jnp.concatenate([src(c, f) for c in range(8)])
                     for f in range(F)], axis=1)
                pieces.append(jnp.zeros((size, F), g_out.dtype)
                              .at[idx_all].add(cf_el, mode="drop"))
            elif mode == "sorted":
                idx_all = jnp.concatenate(idx_cs)
                cf_el = jnp.stack(
                    [jnp.concatenate([src(c, f) for c in range(8)])
                     for f in range(F)], axis=1)
                order = jnp.argsort(idx_all)
                pieces.append(jax.ops.segment_sum(
                    cf_el[order], idx_all[order],
                    num_segments=size, indices_are_sorted=True))
            else:                                           # width1
                idx_all = jnp.concatenate(idx_cs)
                cols = [jnp.zeros((size,), g_out.dtype)
                        .at[idx_all].add(
                            jnp.concatenate([src(c, f) for c in range(8)]),
                            mode="drop")
                        for f in range(F)]
                pieces.append(jnp.stack(cols, axis=1))
        tail = n_entries - int(static.offsets[La - 1]) \
            - int(static.table_sizes[La - 1])
        if tail:
            pieces.append(jnp.zeros((tail, F), g_out.dtype))
        g_table = jnp.concatenate(pieces, axis=0)
        return (g_table, jnp.zeros((n, 3), g_out.dtype),
                jnp.zeros_like(level_mask))

    enc.defvjp(enc_fwd, enc_bwd)

    def apply(table, positions, valid_level=None):
        if valid_level is None:
            mask = jnp.ones((L,), table.dtype)
        else:
            mask = (jnp.arange(L) < valid_level).astype(table.dtype)
        return enc(table, positions, mask)

    return apply


def encode_batched(table, positions, static, valid_level=None,
                   batch: int = 1 << 20):
    """Chunked encode for huge inference batches (marching cubes grids)."""
    n = positions.shape[0]
    if n <= batch:
        return encode(table, positions, static, valid_level)
    outs = []
    for s in range(0, n, batch):
        outs.append(encode(table, positions[s:s + batch], static, valid_level))
    return jnp.concatenate(outs, 0)
