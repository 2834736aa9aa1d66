"""Occupancy grid: 128³ density EMA + boolean occupancy field.

Reference behavior (src/testbed_nerf.cu:3424-3517, 585-741):
- every update visits each cell once (the "uniform" pass iterates a prime
  permutation over all cells, :585-614) at a uniformly jittered position
  inside the cell, evaluates the NeuS density s·σ(s·sdf)(1−σ) and merges
  grid = max(grid·decay, density) (decay 0.95, ema_grid_samples :655-686);
- occupancy bit = density > min(0.1, mean(max(grid,0)))
  (grid_to_bitfield :693-717; strict '>', so an all-zero grid with mean 0
  yields *no* occupancy — occupancy appears as soon as density does);
- cascade mips exist for aabb_scale > 1 (bitfield_max_pool :719-741); the
  RNb pipeline always runs aabb_scale = 1 → single cascade. Multi-cascade
  is kept as a config hook, not materialized.
- update cadence is driven by the trainer: every clamp(step/16, 1, 16)
  steps (testbed.cu:2801-2821).

Layout: plain (G³,) row-major with index x + G·(y + G·z). The reference's
Morton order is a CUDA memory-coalescing artifact with no TPU benefit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NERF_GRIDSIZE, NERF_MIN_OPTICAL_THICKNESS


class OccupancyState(NamedTuple):
    density: jnp.ndarray    # (G³,) float32 EMA'd density
    bitfield: jnp.ndarray   # (G³,) bool
    mean_density: jnp.ndarray  # () float32
    ema_step: jnp.ndarray   # () int32


def init_state(grid_size: int = NERF_GRIDSIZE) -> OccupancyState:
    n = grid_size ** 3
    return OccupancyState(
        density=jnp.zeros((n,), jnp.float32),
        bitfield=jnp.zeros((n,), bool),
        mean_density=jnp.zeros((), jnp.float32),
        ema_step=jnp.zeros((), jnp.int32),
    )


def cell_positions(key: jax.Array, grid_size: int = NERF_GRIDSIZE
                   ) -> jnp.ndarray:
    """One uniformly jittered position per cell, (G³, 3) in [0,1]."""
    g = grid_size
    idx = jnp.arange(g ** 3)
    x = idx % g
    y = (idx // g) % g
    z = idx // (g * g)
    base = jnp.stack([x, y, z], axis=1).astype(jnp.float32)
    jitter = jax.random.uniform(key, (g ** 3, 3))
    return (base + jitter) / g


def update(state: OccupancyState, densities: jnp.ndarray,
           decay: float = 0.95,
           thresh: float = NERF_MIN_OPTICAL_THICKNESS) -> OccupancyState:
    """Merge fresh per-cell densities and rebuild the occupancy field."""
    new_density = jnp.where(state.density < 0.0, state.density,
                            jnp.maximum(state.density * decay, densities))
    mean = jnp.mean(jnp.maximum(new_density, 0.0))
    bit = new_density > jnp.minimum(thresh, mean)
    return OccupancyState(density=new_density, bitfield=bit,
                          mean_density=mean, ema_step=state.ema_step + 1)


def sample_update_cells(key: jax.Array, state: OccupancyState,
                        grid_size: int, n_uniform: int, n_nonuniform: int,
                        thresh: float = NERF_MIN_OPTICAL_THICKNESS):
    """Steady-state subsampled refresh cells (reference
    generate_grid_samples_nerf_nonuniform, testbed_nerf.cu:585-614):

    - n_uniform samples with threshold −0.01 (only skips cells explicitly
      marked invalid by a negative density);
    - n_nonuniform samples biased to occupied space: up to 10 candidate
      cells from the prime-multiplier sequence, first with
      density > thresh wins (:595-600);
    - one uniformly jittered position inside each chosen cell.

    Returns (positions (M, 3), cell_idx (M,)).
    """
    g = grid_size
    n_cells = g ** 3
    M = n_uniform + n_nonuniform
    i = jnp.arange(M, dtype=jnp.uint32)
    step = state.ema_step.astype(jnp.uint32)
    j = jnp.arange(10, dtype=jnp.uint32)[None, :]
    cand = (((i[:, None] + step * jnp.uint32(M)) * jnp.uint32(56924617)
             + j * jnp.uint32(19349663) + jnp.uint32(96925573))
            % jnp.uint32(n_cells)).astype(jnp.int32)        # (M, 10)
    per_thresh = jnp.where(i < n_uniform, -0.01, thresh)[:, None]
    ok = state.density[cand] > per_thresh                   # (M, 10)
    # first passing candidate; if none pass, the reference keeps the
    # 10th (loop falls through with the last idx)
    first = jnp.argmax(ok, axis=1)
    pick = jnp.where(jnp.any(ok, axis=1), first, 9)
    idx = jnp.take_along_axis(cand, pick[:, None], axis=1)[:, 0]
    x = idx % g
    y = (idx // g) % g
    z = idx // (g * g)
    base = jnp.stack([x, y, z], axis=1).astype(jnp.float32)
    jitter = jax.random.uniform(key, (M, 3))
    return (base + jitter) / g, idx


def update_sampled(state: OccupancyState, cell_idx: jnp.ndarray,
                   densities: jnp.ndarray, decay: float = 0.95,
                   thresh: float = NERF_MIN_OPTICAL_THICKNESS
                   ) -> OccupancyState:
    """Merge densities measured at a SUBSET of cells: sampled cells take
    max(decay·prev, new) (max-splat over duplicates,
    splat_grid_samples_nerf_max_nearest_neighbor :617-640); unsampled
    cells decay (tmp = 0 in ema_grid_samples_nerf :655-686)."""
    tmp = jnp.zeros_like(state.density).at[cell_idx].max(densities)
    return update(state, tmp, decay, thresh)


def lookup(bitfield: jnp.ndarray, pos: jnp.ndarray,
           grid_size: int = 0) -> jnp.ndarray:
    """Occupancy at positions (..., 3) in [0,1] (density_grid_occupied_at).
    grid_size inferred from the flat bitfield when not given."""
    if not grid_size:
        grid_size = round(bitfield.shape[0] ** (1.0 / 3.0))
    cell = jnp.clip((pos * grid_size).astype(jnp.int32), 0, grid_size - 1)
    idx = cell[..., 0] + grid_size * (cell[..., 1] + grid_size * cell[..., 2])
    return bitfield[idx]


def update_cadence(step: int) -> int:
    """clamp(step/16, 1, 16) (testbed.cu:2801)."""
    return int(np.clip(step // 16, 1, 16))


# ---------------------------------------------------------------------------
# Multi-cascade occupancy (aabb_scale > 1)
# ---------------------------------------------------------------------------
# The reference keeps one 128³ grid per cascade m, covering the cube of
# side 2^m centred on 0.5 (cascaded_grid_idx_at, testbed_nerf.cu:439-458);
# the marcher picks the cascade from the position (and step size) via
# mip_from_pos/mip_from_dt (:569-583); after thresholding, each finer
# cascade's occupancy is max-pooled into the central eighth of the next
# (bitfield_max_pool :719-741). Arrays here are (C, G³) row-major; the
# single-cascade API above stays 1-D for the aabb_scale = 1 fast path.


def mip_from_pos(pos: jnp.ndarray, max_cascade: int) -> jnp.ndarray:
    """(..., 3) → (...) int32 cascade from position
    (testbed_nerf.cu:569-573: frexp(max|pos−0.5|) exponent + 1)."""
    maxval = jnp.max(jnp.abs(pos - 0.5), axis=-1)
    # frexpf: maxval = f·2^e with f ∈ [0.5, 1) → e = floor(log2(v)) + 1
    e = jnp.floor(jnp.log2(jnp.maximum(maxval, 1e-30))).astype(jnp.int32) + 1
    return jnp.clip(e + 1, 0, max_cascade)


def mip_from_dt(dt: jnp.ndarray, pos: jnp.ndarray,
                max_cascade: int, grid_size: int = NERF_GRIDSIZE
                ) -> jnp.ndarray:
    """Cascade from step size and position (testbed_nerf.cu:576-583)."""
    mip = mip_from_pos(pos, max_cascade)
    x = dt * (2 * grid_size)
    e = jnp.floor(jnp.log2(jnp.maximum(x, 1e-30))).astype(jnp.int32) + 1
    return jnp.where(x < 1.0, mip,
                     jnp.clip(jnp.maximum(e, mip), 0, max_cascade))


def init_state_cascaded(grid_size: int = NERF_GRIDSIZE,
                        n_cascades: int = 1) -> OccupancyState:
    n = grid_size ** 3
    return OccupancyState(
        density=jnp.zeros((n_cascades, n), jnp.float32),
        bitfield=jnp.zeros((n_cascades, n), bool),
        mean_density=jnp.zeros((), jnp.float32),
        ema_step=jnp.zeros((), jnp.int32),
    )


def cascade_cell_positions(key: jax.Array, grid_size: int,
                           n_cascades: int) -> jnp.ndarray:
    """(C·G³, 3) world positions: one jittered point per cell per cascade
    (cascade m spans [0.5 − 2^{m-1}, 0.5 + 2^{m-1}] per axis)."""
    pts = []
    for m in range(n_cascades):
        k = jax.random.fold_in(key, m)
        local = cell_positions(k, grid_size)          # in [0,1]
        pts.append((local - 0.5) * (2.0 ** m) + 0.5)
    return jnp.concatenate(pts, axis=0)


def _maxpool_into_next(bits: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """(C, G³) bool → same, with each cascade's central eighth OR'd with
    the 2× max-pool of the finer cascade (bitfield_max_pool)."""
    g = grid_size
    C = bits.shape[0]
    out = [bits[0]]
    for m in range(1, C):
        fine = out[m - 1].reshape(g, g, g)
        pooled = fine.reshape(g // 2, 2, g // 2, 2, g // 2, 2) \
            .any(axis=(1, 3, 5))
        cur = bits[m].reshape(g, g, g)
        q = g // 4
        cur = cur.at[q:q + g // 2, q:q + g // 2, q:q + g // 2].set(
            cur[q:q + g // 2, q:q + g // 2, q:q + g // 2] | pooled)
        out.append(cur.reshape(-1))
    return jnp.stack(out, axis=0)


def update_cascaded(state: OccupancyState, densities: jnp.ndarray,
                    grid_size: int = NERF_GRIDSIZE,
                    decay: float = 0.95,
                    thresh: float = NERF_MIN_OPTICAL_THICKNESS
                    ) -> OccupancyState:
    """Merge per-cell densities (C, G³) and rebuild cascaded occupancy."""
    new_density = jnp.where(state.density < 0.0, state.density,
                            jnp.maximum(state.density * decay, densities))
    mean = jnp.mean(jnp.maximum(new_density[0], 0.0))  # mean over mip 0,
    # like the reference (update_density_grid_mean_and_bitfield :3497-3517)
    bits = new_density > jnp.minimum(thresh, mean)
    bits = _maxpool_into_next(bits, grid_size)
    return OccupancyState(density=new_density, bitfield=bits,
                          mean_density=mean, ema_step=state.ema_step + 1)


def lookup_cascaded(bitfield: jnp.ndarray, pos: jnp.ndarray,
                    dt: jnp.ndarray | None = None,
                    grid_size: int = NERF_GRIDSIZE) -> jnp.ndarray:
    """Occupancy at world positions across cascades
    (density_grid_occupied_at + mip selection)."""
    C = bitfield.shape[0]
    mip = mip_from_pos(pos, C - 1)
    if dt is not None:
        mip = mip_from_dt(dt, pos, C - 1, grid_size)
    scale = jnp.exp2(-mip.astype(jnp.float32))[..., None]
    local = (pos - 0.5) * scale + 0.5
    cell = jnp.clip((local * grid_size).astype(jnp.int32), 0,
                    grid_size - 1)
    idx = cell[..., 0] + grid_size * (cell[..., 1]
                                      + grid_size * cell[..., 2])
    return bitfield[mip, idx]
