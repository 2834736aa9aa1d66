"""Training-time ray marching as a fixed-shape ladder + compaction.

The reference marches each ray serially through the occupancy grid
(generate_training_samples_nerf_with_global_movement,
src/testbed_nerf.cu:1216-1387): step dt = clamp(t·cone_angle, √3/1024, ·),
count occupied steps (≤1024), then atomically compact all rays' samples
into a 2^18 buffer.

Key observation: both the occupied step (`t += dt`) and the empty-space
skip (`advance_to_next_voxel`, :301-323, which *also* advances by repeated
`t += calc_dt(t)`) keep t on the SAME deterministic ladder
t_{k+1} = t_k + max(t_k·cone, dt_min) seeded at the jittered entry point.
So the reference's visited sample set is exactly {ladder points inside the
AABB that land in occupied cells}. That makes the whole march a fixed-shape
computation: evaluate the K-point ladder, mask by AABB + occupancy, and
compact the first M valid samples per ray — no serial loop, no atomics.

The ladder has a closed form: constant steps of dt_min until
t ≥ dt_min/cone (= 0.4330 for the defaults), then geometric growth by
(1 + cone). 1024 points cover the full unit-cube traversal (≈ 611 needed).

Compaction is GLOBAL, like the reference's atomic version: all rays'
samples pack into one fixed S-slot buffer (S = the 2^18 target batch);
rays that would overflow the remaining budget are dropped whole
(testbed_nerf.cu:1352-1356 `base + numsteps > max_samples → return`).
On TPU the atomics become a cumsum over per-ray counts plus one scatter,
and the network then always runs on a single static (S, 3) shape.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MIN_CONE_STEPSIZE, MAX_CONE_STEPSIZE
from ..geom.camera import ray_aabb
from ..grid import occupancy


class FlatSamples(NamedTuple):
    """Globally compacted sample buffer (S static slots)."""

    t: jnp.ndarray          # (S,) sample distance along its ray
    dt: jnp.ndarray         # (S,) step size
    ray_id: jnp.ndarray     # (S,) int32 owner ray; R (sentinel) for unused
    valid: jnp.ndarray      # (S,) slot holds a real sample
    seg_start: jnp.ndarray  # (R,) first slot of each ray (= offsets)
    n_valid: jnp.ndarray    # (R,) per-ray occupied count BEFORE drops
    ray_kept: jnp.ndarray   # (R,) ray survived the budget drop


class MarchedRays(NamedTuple):
    t: jnp.ndarray       # (R, M) sample distances (ladder points)
    dt: jnp.ndarray      # (R, M) step sizes at those points
    valid: jnp.ndarray   # (R, M) sample exists
    n_valid: jnp.ndarray  # (R,) occupied-sample count (pre-truncation)


def ladder_t_at(startt: jnp.ndarray, k: jnp.ndarray,
                cone_angle: float) -> jnp.ndarray:
    """Closed-form ladder point k (any int array broadcastable with startt).

    Phase 1 (t < t_switch = dt_min/cone): t_k = startt + k·dt_min.
    Phase 2: geometric, t_{k+1} = t_k·(1+cone).
    """
    k = k.astype(jnp.float32)
    dt_min = MIN_CONE_STEPSIZE
    if cone_angle <= 0.0:
        return startt + k * dt_min
    t_switch = dt_min / cone_angle
    # number of constant steps before the ladder crosses t_switch
    n0 = jnp.ceil(jnp.maximum(t_switch - startt, 0.0) / dt_min)
    t_const = startt + k * dt_min
    t_sw = startt + n0 * dt_min
    t_geom = t_sw * (1.0 + cone_angle) ** (k - n0)
    return jnp.where(k < n0, t_const, t_geom)


def t_ladder(startt: jnp.ndarray, n_points: int,
             cone_angle: float) -> jnp.ndarray:
    """(R,) start distances → (R, K) ladder; closed-form, no scan."""
    k = jnp.arange(n_points, dtype=jnp.int32)[None, :]
    return ladder_t_at(startt[:, None], k, cone_angle)


def _ladder_valid(ray_o, ray_d, bitfield, u_start, n_ladder, cone_angle,
                  aabb_scale: float = 1.0):
    """Shared ladder construction: returns t, dt, valid, n_valid (R, K).

    aabb_scale > 1 marches the scaled cube centred on 0.5 and consults
    the cascaded occupancy grid (bitfield (C, G³)) with the reference's
    mip selection (testbed_nerf.cu:569-583, 755-790)."""
    lo, hi = 0.5 - aabb_scale / 2.0, 0.5 + aabb_scale / 2.0
    tmin, tmax = ray_aabb(ray_o, ray_d, lo, hi)
    tmin = jnp.maximum(tmin, 0.0)
    dt0 = jnp.clip(tmin * cone_angle, MIN_CONE_STEPSIZE, MAX_CONE_STEPSIZE)
    startt = tmin + dt0 * u_start

    t = t_ladder(startt, n_ladder, cone_angle)           # (R, K)
    dt = jnp.clip(t * cone_angle, MIN_CONE_STEPSIZE, MAX_CONE_STEPSIZE)

    pos = ray_o[:, None, :] + t[..., None] * ray_d[:, None, :]
    inside = jnp.all((pos >= lo) & (pos <= hi), axis=-1)
    inside &= (tmax[:, None] > tmin[:, None])
    if bitfield.ndim == 2:
        occ = occupancy.lookup_cascaded(bitfield, pos, dt)
    else:
        occ = occupancy.lookup(bitfield, pos)
    valid = inside & occ
    return t, dt, valid, jnp.sum(valid, axis=1), startt


def march(ray_o: jnp.ndarray, ray_d: jnp.ndarray, bitfield: jnp.ndarray,
          u_start: jnp.ndarray, n_ladder: int, max_samples: int,
          cone_angle: float, aabb_scale: float = 1.0) -> MarchedRays:
    """Dense per-ray compaction: first M valid samples of each ray
    (order-preserving top_k). Used by the inference renderer and tests.

    ray_d must be unit-norm (see effective_ladder_points); the same
    bit-exact ladder trim as march_flat applies here — the per-ray top_k
    compaction is unaffected by dropping always-masked tail points."""
    n_ladder = effective_ladder_points(n_ladder, cone_angle, aabb_scale)
    max_samples = min(max_samples, n_ladder)
    t, dt, valid, n_valid, _ = _ladder_valid(ray_o, ray_d, bitfield, u_start,
                                             n_ladder, cone_angle, aabb_scale)
    k = jnp.arange(n_ladder, dtype=jnp.int32)[None, :]
    key = jnp.where(valid, -k, -(n_ladder + k))          # valid sort first
    _, sel = jax.lax.top_k(key, max_samples)             # (R, M) indices
    take = lambda a: jnp.take_along_axis(a, sel, axis=1)
    return MarchedRays(t=take(t), dt=take(dt), valid=take(valid),
                       n_valid=n_valid)


def effective_ladder_points(n_ladder: int, cone_angle: float,
                            aabb_scale: float = 1.0) -> int:
    """Tight static bound on ladder points any ray can place inside the
    marched cube — points past the exit are masked (valid=False) and cost
    pure waste, so shrinking K to this bound is BIT-EXACT.

    REQUIRES unit-norm ray directions (t-units == world units): the bound
    assumes the cube chord is at most aabb_scale·√3 in t. A caller with
    |ray_d| < 1 (e.g. a future scaling ray_transform) would silently lose
    tail samples the full-K ladder covered. All current callers normalize
    (geom.camera.rays_from_pixels); march/march_flat assert in debug mode.

    Worst case is entry at t=0 crossing the full diagonal s·√3:
    ceil(t_switch/dt_min) constant steps then geometric growth by
    (1+cone) to the diagonal (the reference's 1024 NERF_STEPS covers the
    cone=0 ladder exactly; at the default cone 1/256 only ~612 of those
    can ever be inside — the other 40% of the (R,K) occupancy gathers,
    position math and rank cumsum are dead work)."""
    diag = aabb_scale * math.sqrt(3.0)
    dt_min = MIN_CONE_STEPSIZE
    if cone_angle <= 0.0:
        need = int(math.ceil(diag / dt_min))
    else:
        t_switch = dt_min / cone_angle
        n0 = math.ceil(t_switch / dt_min)
        geo = (math.log(diag / t_switch) / math.log1p(cone_angle)
               if diag > t_switch else 0.0)
        need = int(n0 + math.ceil(geo))
    return min(n_ladder, max(need + 8, 1))   # +8 jitter/rounding margin


_BLOCK = 8          # fine ladder points per coarse block (blocked path)


def _coarse_dilated(bitfield: jnp.ndarray, grid_size: int):
    """Pool the fine bitfield to ~64³ and dilate by one coarse cell
    (3³ any-pool): a CONSERVATIVE coarse occupancy — any fine-occupied
    cell flags its coarse cell and all neighbors, so a probe within one
    coarse cell (0.0156 world > the 0.007 block half-span) of any
    occupied fine cell always reads True. 64³ over 32³ halves the
    dilation inflation (the flagged shell is 3 coarse cells thick), so
    fewer blocks pass to the fine phase. Returns (coarse_flat, cgrid)."""
    g = grid_size
    f = max(1, g // 64)
    cg = g // f
    b3 = bitfield.reshape(cg, f, cg, f, cg, f).any(axis=(1, 3, 5))
    p = jnp.pad(b3, 1, mode="constant", constant_values=False)
    dil = jnp.zeros_like(b3)
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                dil = dil | p[dx:dx + cg, dy:dy + cg, dz:dz + cg]
    # flat layout: reshaping x + G(y + Gz) C-order gives axes (z, y, x),
    # whose C-order flatten is already x + cg(y + cg z) — no transpose
    return dil.reshape(-1), cg


def _blocked_nb(R: int, n_blocks: int) -> int:
    """Static per-R-bucket block budget: full coverage (exact) up to
    R=8192; above that, each ray keeps its FIRST NB coarse-occupied
    blocks (ladder-tail truncation at ≥ NB·8 occupied-region points —
    the same spirit as the reference's NERF_STEPS cap; at the steady
    state this bound is ~2-20× above the per-ray occupied count)."""
    return min(n_blocks, max(32, (1 << 20) // max(R, 1)))


def march_flat(ray_o: jnp.ndarray, ray_d: jnp.ndarray, bitfield: jnp.ndarray,
               u_start: jnp.ndarray, n_ladder: int, n_slots: int,
               cone_angle: float, aabb_scale: float = 1.0,
               blocked: bool | None = None) -> FlatSamples:
    """Global compaction into a fixed S-slot buffer with whole-ray drops on
    budget overflow — the TPU restatement of the reference's two-pass
    count + atomicAdd compaction (testbed_nerf.cu:1332-1364).

    ray_d must be unit-norm (see effective_ladder_points).

    blocked=None auto-selects the two-phase coarse-block path for the
    production regime (cone 0, single cascade): the (R·K) per-point
    occupancy gather is the training step's single biggest cost at the
    steady state (measured 272 of 334 ms march / 549 ms step at
    R=32768, K=1024 — runs/STEP_BUDGET_r5.log + march bisect), and the
    coarse phase prunes ~90% of it. blocked=False forces the exact
    single-phase ladder (the two are bitwise identical whenever
    NB == K/8, i.e. R ≤ 8192 — tests/test_ray_march_flat.py)."""
    R = ray_o.shape[0]
    K = n_ladder = effective_ladder_points(n_ladder, cone_angle, aabb_scale)
    if blocked is None:
        blocked = (cone_angle == 0.0 and bitfield.ndim == 1
                   and K % _BLOCK == 0 and K >= 64)
    if blocked:
        return _march_flat_blocked(ray_o, ray_d, bitfield, u_start, K,
                                   n_slots, cone_angle, aabb_scale)
    t, dt, valid, n_valid, startt = _ladder_valid(
        ray_o, ray_d, bitfield, u_start, n_ladder, cone_angle, aabb_scale)
    cum = jnp.cumsum(n_valid)
    ray_kept = cum <= n_slots            # drop whole overflowing rays
    counts = jnp.where(ray_kept, n_valid, 0)
    offsets = jnp.cumsum(counts) - counts                  # (R,)

    # NO (R·K)-element compaction scatter (XLA TPU scatter costs ~7 ns per
    # SOURCE element — the full-ladder scatter was ~28 ms/step). Everything
    # is derived slot-side instead:
    #   valid[s]  = s < Σ kept counts (compaction is dense by construction);
    #   ray_id[s] = forward-fill (cummax) of an R-element scatter of each
    #               kept ray's id at its segment start (R sources, ~free);
    #   k(s)      = ladder index of the slot's sample = binary search of
    #               its intra-ray rank in the ray's running valid count
    #               (log2 K rounds of (S,)-row gathers ≈ 12 ms);
    #   t[s]      = closed-form ladder at k (ladder_t_at) — the scatter
    #               carried no information the ladder formula doesn't.
    total = jnp.sum(counts)
    slot_ids = jnp.arange(n_slots, dtype=jnp.int32)
    valid_flat = slot_ids < total

    ray_ids = jnp.arange(R, dtype=jnp.int32)
    seg_write = ray_kept & (n_valid > 0)
    starts = jnp.zeros((n_slots + 1,), jnp.int32) \
        .at[jnp.where(seg_write, offsets, n_slots)].max(ray_ids)[:n_slots]
    rid_flat = jnp.where(valid_flat, jax.lax.cummax(starts),
                         jnp.int32(R))

    rank1 = jnp.cumsum(valid.astype(jnp.int32), axis=1).reshape(-1)  # (R·K,)
    rid_c = jnp.minimum(rid_flat, R - 1)
    j1 = slot_ids - offsets[rid_c] + 1     # 1-based intra-ray rank
    lo = jnp.zeros((n_slots,), jnp.int32)
    hi = jnp.full((n_slots,), K - 1, jnp.int32)
    base = rid_c * K
    for _ in range(max(1, (K - 1).bit_length())):
        mid = (lo + hi) >> 1
        ge = rank1[base + mid] >= j1       # first k with rank1 ≥ j1
        lo = jnp.where(ge, lo, mid + 1)
        hi = jnp.where(ge, mid, hi)
    k_flat = lo
    t_flat = jnp.where(valid_flat,
                       ladder_t_at(startt[rid_c], k_flat, cone_angle), 0.0)
    dt_flat = jnp.clip(t_flat * cone_angle, MIN_CONE_STEPSIZE,
                       MAX_CONE_STEPSIZE)

    return FlatSamples(
        t=t_flat,
        dt=dt_flat,
        ray_id=rid_flat,
        valid=valid_flat,
        seg_start=offsets.astype(jnp.int32),
        n_valid=n_valid,
        ray_kept=ray_kept,
    )


def _march_flat_blocked(ray_o, ray_d, bitfield, u_start, K: int,
                        n_slots: int, cone_angle: float,
                        aabb_scale: float) -> FlatSamples:
    """Two-phase march (cone=0 fast path; see march_flat docstring).

    Phase A probes each ray's K/8 block MIDPOINTS against the dilated
    coarse occupancy (_coarse_dilated — a proven superset: block
    half-span 4·dt_min ≈ 0.007 < one coarse cell 0.031, so a block
    containing ANY occupied fine point always flags). Phase B selects
    each ray's first NB flagged blocks (order-preserving top_k) and
    gathers fine occupancy only inside them: R·NB·8 rows instead of
    R·K. The slot-side reconstruction is the exact single-phase
    algorithm run on the compact (R, NB·8) lattice, with ladder indices
    recovered through the block map."""
    R = ray_o.shape[0]
    B = _BLOCK
    KB = K // B
    NB = _blocked_nb(R, KB)
    lo, hi = 0.5 - aabb_scale / 2.0, 0.5 + aabb_scale / 2.0
    g = round(bitfield.shape[0] ** (1.0 / 3.0))
    coarse, cg = _coarse_dilated(bitfield, g)

    tmin, tmax = ray_aabb(ray_o, ray_d, lo, hi)
    tmin = jnp.maximum(tmin, 0.0)
    dt0 = jnp.clip(tmin * cone_angle, MIN_CONE_STEPSIZE, MAX_CONE_STEPSIZE)
    startt = tmin + dt0 * u_start

    # ---- phase A: block flags ------------------------------------------
    kmid = (jnp.arange(KB, dtype=jnp.int32)[None, :] * B) + (B - 1) // 2
    t_mid = ladder_t_at(startt[:, None], kmid, cone_angle)       # (R, KB)
    pos_mid = ray_o[:, None, :] + t_mid[..., None] * ray_d[:, None, :]
    margin = B * MIN_CONE_STEPSIZE
    inside_sup = jnp.all((pos_mid >= lo - margin)
                         & (pos_mid <= hi + margin), axis=-1)
    inside_sup &= (tmax[:, None] > tmin[:, None])
    cell = jnp.clip((pos_mid * cg).astype(jnp.int32), 0, cg - 1)
    cidx = cell[..., 0] + cg * (cell[..., 1] + cg * cell[..., 2])
    flags = inside_sup & coarse[cidx]                            # (R, KB)

    # ---- phase B: first NB flagged blocks, fine occupancy ---------------
    bids = jnp.arange(KB, dtype=jnp.int32)[None, :]
    key = jnp.where(flags, -bids, -(KB + bids))
    _, sel = jax.lax.top_k(key, NB)                              # (R, NB)
    sel_on = jnp.take_along_axis(flags, sel, axis=1)             # (R, NB)
    kf = sel[..., None] * B + jnp.arange(B, dtype=jnp.int32)     # (R,NB,B)
    t_f = ladder_t_at(startt[:, None, None], kf, cone_angle)
    pos = ray_o[:, None, None, :] + t_f[..., None] * ray_d[:, None, None, :]
    inside = jnp.all((pos >= lo) & (pos <= hi), axis=-1)
    occ = occupancy.lookup(bitfield, pos)
    valid = inside & occ & sel_on[..., None]                     # (R,NB,B)

    n_valid = jnp.sum(valid, axis=(1, 2))
    cum = jnp.cumsum(n_valid)
    ray_kept = cum <= n_slots
    counts = jnp.where(ray_kept, n_valid, 0)
    offsets = jnp.cumsum(counts) - counts

    total = jnp.sum(counts)
    slot_ids = jnp.arange(n_slots, dtype=jnp.int32)
    valid_flat = slot_ids < total

    ray_ids = jnp.arange(R, dtype=jnp.int32)
    seg_write = ray_kept & (n_valid > 0)
    starts = jnp.zeros((n_slots + 1,), jnp.int32) \
        .at[jnp.where(seg_write, offsets, n_slots)].max(ray_ids)[:n_slots]
    rid_flat = jnp.where(valid_flat, jax.lax.cummax(starts), jnp.int32(R))

    C = NB * B                        # compact per-ray lattice width
    rank1 = jnp.cumsum(valid.reshape(R, C).astype(jnp.int32),
                       axis=1).reshape(-1)                       # (R·C,)
    rid_c = jnp.minimum(rid_flat, R - 1)
    j1 = slot_ids - offsets[rid_c] + 1
    blo = jnp.zeros((n_slots,), jnp.int32)
    bhi = jnp.full((n_slots,), C - 1, jnp.int32)
    base = rid_c * C
    for _ in range(max(1, (C - 1).bit_length())):
        mid = (blo + bhi) >> 1
        ge = rank1[base + mid] >= j1
        blo = jnp.where(ge, blo, mid + 1)
        bhi = jnp.where(ge, mid, bhi)
    j_flat = blo                      # compact-lattice index
    # ladder index through the block map: sel[rid, j//B]*B + j%B
    sel_flat = sel.reshape(-1)[rid_c * NB + (j_flat // B)]
    k_flat = sel_flat * B + (j_flat % B)
    t_flat = jnp.where(valid_flat,
                       ladder_t_at(startt[rid_c], k_flat, cone_angle), 0.0)
    dt_flat = jnp.clip(t_flat * cone_angle, MIN_CONE_STEPSIZE,
                       MAX_CONE_STEPSIZE)

    return FlatSamples(
        t=t_flat,
        dt=dt_flat,
        ray_id=rid_flat,
        valid=valid_flat,
        seg_start=offsets.astype(jnp.int32),
        n_valid=n_valid,
        ray_kept=ray_kept,
    )
