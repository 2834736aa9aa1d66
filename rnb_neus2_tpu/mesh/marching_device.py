"""On-device (XLA) table-based marching cubes.

The reference triangulates on the GPU in seconds at 1024³
(src/marching_cubes.cu:794-822 marching_cubes_gpu; gen_vertices/gen_faces
:276-430). Round-2's host numpy port (marching.marching_cubes_grid) is
topology-exact but takes ~270 s at 512³ on a 1-core host — and the SDF
volume is *produced on the device*, so pulling res³ floats through the
remote-device transport just to triangulate on the host is backwards.

This is the same algorithm expressed as one jit:

- vertex per sign-change grid edge at the linear zero crossing, ids
  raster-deterministic in axis-major order (x-edges, then y, then z) —
  EXACTLY the host implementation's (and the CUDA vertidx_grid's) layout,
  so outputs are comparable element-for-element with the host oracle;
- enumeration by `cumsum(hit) − 1` instead of `np.flatnonzero` (the XLA
  replacement for the CUDA atomic counter: deterministic AND parallel);
- compaction by scatter-with-drop into capacity-bounded buffers; the
  exact counts come back with the buffers and the host trims (a retry
  with doubled caps covers the rare overflow — caps are bucketed so the
  jit caches across meshes);
- faces: per active cell (0 < 8-corner mask < 255), gather the 12 edge
  ids, look up the Bourke triangle table, emit ≤5 triangles at
  `tri_base + j` (tri_base = exclusive cumsum of per-cell triangle
  counts) — raster cell order, identical to the host/CUDA face order.

Memory: three int32 edge-id grids + the f32 volume ≈ 16·res³ bytes
(2.7 GB at 512³) — comfortably in HBM at the pipeline resolutions up to
640; `extract_mesh` keeps the host path for larger grids (1024³ works
there, ~26 GB host RAM).

Layout discipline: every capacity-sized tensor is a 1-D column. The
natural shapes — V (cap, 3), the (C, 12) edge gather, the (C, 5, 3)
triangle lookup, F (face_cap, 3) — carry tiny minor dims that this
backend tile-pads to (8, 128) lanes: the (C, 5, 3) int32 intermediate
alone materialized as a 34 GB allocation at 512³ and OOM'd the one-jit
path on the 16 GB chip (the first real-chip 512³ extraction,
runs/RUN_r2c_composite10k.log — earlier validation had run the one-jit
path on CPU only, where no tiling exists). Same lesson as the hash
encoding's per-corner columns (DESIGN.md kernel war round 3).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .mc_tables import TRIANGLE_TABLE

# triangles per cube case (0..5), host-derived from the table
_TRI_COUNT = np.sum(TRIANGLE_TABLE[:, :15].reshape(256, 5, 3)[:, :, 0] >= 0,
                    axis=1).astype(np.int32)
# 15 per-(triangle, vertex) 256-entry columns of the Bourke table: all
# device tensors stay 1-D (see _emit_face_cols)
_TRI_COLS = [TRIANGLE_TABLE[:, t * 3 + v].astype(np.int32)
             for t in range(5) for v in range(3)]


def _iota3(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _emit_face_cols(g0, g1, g2, ax, ay, az, cell_mask, cell_tbase, live,
                    face_cap: int):
    """Face emission with 1-D columns only.

    The natural tensors here — the (C, 12) per-cell edge-id gather, the
    (C, 5, 3) triangle-table lookup, the (face_cap, 3) output — all carry
    tiny minor dims, which this backend tile-pads to (8, 128): at 512³
    the (C, 5, 3) int32 intermediate materialized as a 34 GB allocation
    and OOM'd the one-jit path on a 16 GB chip (run log
    runs/RUN_r2c_composite10k.log, 'falling back to the host path').
    Column form: 12 per-edge (C,) gathers, 15 per-(tri, vertex) 256-way
    select chains, three (face_cap,) output columns. Identical output
    order (parity-tested against the host oracle)."""
    e_cols = [
        g0[ax, ay, az], g1[ax + 1, ay, az], g0[ax, ay + 1, az],
        g1[ax, ay, az], g0[ax, ay, az + 1], g1[ax + 1, ay, az + 1],
        g0[ax, ay + 1, az + 1], g1[ax, ay, az + 1], g2[ax, ay, az],
        g2[ax + 1, ay, az], g2[ax + 1, ay + 1, az], g2[ax, ay + 1, az],
    ]                                                     # 12 × (C,)
    Fc = [jnp.zeros((face_cap,), jnp.int32) for _ in range(3)]
    cnt = jnp.zeros_like(cell_tbase)
    for t in range(5):
        tri0 = jnp.asarray(_TRI_COLS[t * 3])[cell_mask]   # (C,)
        valid = (tri0 >= 0) & live
        cnt = cnt + valid.astype(jnp.int32)
        fdest = jnp.where(valid, cell_tbase + cnt - 1, face_cap)
        for v in range(3):
            tri_tv = (tri0 if v == 0
                      else jnp.asarray(_TRI_COLS[t * 3 + v])[cell_mask])
            # data-dependent pick among the 12 edge columns as a select
            # chain (elementwise — no padded gather)
            sel = e_cols[0]
            for k in range(1, 12):
                sel = jnp.where(tri_tv == k, e_cols[k], sel)
            Fc[v] = Fc[v].at[fdest].set(sel, mode="drop")
    return Fc


@functools.partial(jax.jit, static_argnames=("vert_cap", "face_cap"))
def _mc_device(vol, thresh, vert_cap: int, face_cap: int):
    """vol (X,Y,Z) f32 → (V 3×(vert_cap,) f32 coordinate columns in GRID
    units, F 3×(face_cap,) i32 vertex-id columns, n_verts, n_faces).
    Column outputs on purpose: (cap, 3) buffers tile-pad 3 → 128 lanes on
    this backend (42×) — see _emit_face_cols."""
    X, Y, Z = vol.shape
    inside = vol > thresh

    tri_count = jnp.asarray(_TRI_COUNT)

    Vc = [jnp.zeros((vert_cap,), jnp.float32) for _ in range(3)]
    axis_slices = (
        (inside[:-1, :, :], inside[1:, :, :], vol[:-1, :, :], vol[1:, :, :]),
        (inside[:, :-1, :], inside[:, 1:, :], vol[:, :-1, :], vol[:, 1:, :]),
        (inside[:, :, :-1], inside[:, :, 1:], vol[:, :, :-1], vol[:, :, 1:]),
    )
    id_grids = []
    base = jnp.int32(0)
    counts = []
    for axis, (i0, i1, f0, f1) in enumerate(axis_slices):
        hit = (i0 != i1).reshape(-1)
        ids_local = jnp.cumsum(hit.astype(jnp.int32)) - 1
        n_axis = jnp.sum(hit.astype(jnp.int32))
        ids = ids_local + base
        shape = i0.shape
        # zero-crossing position in grid units
        f0f = f0.reshape(-1)
        f1f = f1.reshape(-1)
        dt = (thresh - f0f) / jnp.where(f1f == f0f, 1.0, f1f - f0f)
        px = _iota3(shape, 0).reshape(-1).astype(jnp.float32)
        py = _iota3(shape, 1).reshape(-1).astype(jnp.float32)
        pz = _iota3(shape, 2).reshape(-1).astype(jnp.float32)
        p = [px, py, pz]
        p[axis] = p[axis] + dt
        dest = jnp.where(hit, ids, vert_cap)     # drop non-crossings
        for d in range(3):
            Vc[d] = Vc[d].at[dest].set(p[d], mode="drop")
        id_grids.append(ids.reshape(shape))
        base = base + n_axis
        counts.append(n_axis)
    n_verts = counts[0] + counts[1] + counts[2]

    # ---- cells -----------------------------------------------------------
    m = (inside[:-1, :-1, :-1].astype(jnp.uint8)
         | (inside[1:, :-1, :-1] << 1)
         | (inside[1:, 1:, :-1] << 2)
         | (inside[:-1, 1:, :-1] << 3)
         | (inside[:-1, :-1, 1:].astype(jnp.uint8) << 4)
         | (inside[1:, :-1, 1:] << 5)
         | (inside[1:, 1:, 1:] << 6)
         | (inside[:-1, 1:, 1:] << 7)).reshape(-1)
    cshape = (X - 1, Y - 1, Z - 1)
    active = (m > 0) & (m < 255)
    ntri_cell = jnp.where(active, tri_count[m], 0)
    tri_base = jnp.cumsum(ntri_cell) - ntri_cell          # exclusive
    n_faces = tri_base[-1] + ntri_cell[-1] if m.shape[0] > 0 else jnp.int32(0)

    # compact the active cells (flat index + mask + tri_base) so the
    # 12-gather/table stage runs over ~surface cells, not res³
    cell_cap = max(face_cap // 2, 1)
    cid = jnp.cumsum(active.astype(jnp.int32)) - 1
    cdest = jnp.where(active, cid, cell_cap)
    cell_flat = jnp.zeros((cell_cap,), jnp.int32).at[cdest].set(
        jnp.arange(m.shape[0], dtype=jnp.int32), mode="drop")
    cell_mask = jnp.zeros((cell_cap,), jnp.int32).at[cdest].set(
        m.astype(jnp.int32), mode="drop")
    cell_tbase = jnp.zeros((cell_cap,), jnp.int32).at[cdest].set(
        tri_base.astype(jnp.int32), mode="drop")
    n_cells = jnp.sum(active.astype(jnp.int32))
    live = jnp.arange(cell_cap, dtype=jnp.int32) < n_cells

    az = cell_flat % (Z - 1)
    ay = (cell_flat // (Z - 1)) % (Y - 1)
    ax = cell_flat // ((Z - 1) * (Y - 1))

    # local edge order = gen_faces (marching_cubes.cu:690-703), as in the
    # host implementation
    g0, g1, g2 = id_grids
    Fc = _emit_face_cols(g0, g1, g2, ax, ay, az, cell_mask, cell_tbase,
                         live, face_cap)
    return tuple(Vc), tuple(Fc), n_verts, n_faces


def _mask8(ins):
    """(P, Y, Z) bool → (P−1, Y−1, Z−1) uint8 cube-corner mask
    (bit order marching_cubes.cu:675-683)."""
    return (ins[:-1, :-1, :-1].astype(jnp.uint8)
            | (ins[1:, :-1, :-1] << 1)
            | (ins[1:, 1:, :-1] << 2)
            | (ins[:-1, 1:, :-1] << 3)
            | (ins[:-1, :-1, 1:].astype(jnp.uint8) << 4)
            | (ins[1:, :-1, 1:] << 5)
            | (ins[1:, 1:, 1:] << 6)
            | (ins[:-1, 1:, 1:] << 7))


@functools.partial(jax.jit, static_argnames=("sc",))
def _slab_counts(vol, thresh, sc: int):
    """Per-slab edge/triangle counts for the slabbed path. Slab s owns
    cells x ∈ [s·sc, (s+1)·sc) and axis-1/2 edge planes [s·sc, (s+1)·sc);
    the final plane X−1 is counted separately (it belongs to the last
    slab). Returns ((n_slabs, 4) [n0, n1, n2, ntri], (2,) last-plane
    [n1, n2])."""
    X, Y, Z = vol.shape
    n_slabs = (X - 1) // sc
    tri_count = jnp.asarray(_TRI_COUNT)

    def body(s, _):
        sv = jax.lax.dynamic_slice(vol, (s * sc, 0, 0), (sc + 1, Y, Z))
        ins = sv > thresh
        n0 = jnp.sum((ins[:-1] != ins[1:]).astype(jnp.int32))
        n1 = jnp.sum((ins[:sc, :-1, :] != ins[:sc, 1:, :])
                     .astype(jnp.int32))
        n2 = jnp.sum((ins[:sc, :, :-1] != ins[:sc, :, 1:])
                     .astype(jnp.int32))
        m = _mask8(ins).reshape(-1)
        ntri = jnp.sum(jnp.where((m > 0) & (m < 255), tri_count[m], 0))
        return s + 1, jnp.stack([n0, n1, n2, ntri])

    _, rows = jax.lax.scan(body, jnp.int32(0), None, length=n_slabs)
    lastp = vol[X - 1] > thresh
    e1 = jnp.sum((lastp[:-1, :] != lastp[1:, :]).astype(jnp.int32))
    e2 = jnp.sum((lastp[:, :-1] != lastp[:, 1:]).astype(jnp.int32))
    return rows, jnp.stack([e1, e2])


@functools.partial(jax.jit, static_argnames=(
    "sc", "last", "v0_cap", "v1_cap", "v2_cap", "face_cap"))
def _slab_emit(vol, thresh, x0, base0, base1, base2, base1_next,
               base2_next, sc: int, last: bool, v0_cap: int, v1_cap: int,
               v2_cap: int, face_cap: int):
    """Vertices + faces for one slab. V buffers are slab-LOCAL (the host
    writes them at the global bases); face vertex ids are GLOBAL (built
    from the bases, including the next slab's boundary-plane ids, which
    are just base_next + the plane-local crossing rank)."""
    X, Y, Z = vol.shape
    sv = jax.lax.dynamic_slice(vol, (x0, 0, 0), (sc + 1, Y, Z))
    ins = sv > thresh
    x0f = x0.astype(jnp.float32)
    tri_count = jnp.asarray(_TRI_COUNT)

    def axis_verts(i0, i1, f0, f1, axis, cap, n_planes):
        shape = i0.shape
        hit = (i0 != i1).reshape(-1)
        local = jnp.cumsum(hit.astype(jnp.int32)) - 1
        n = jnp.sum(hit.astype(jnp.int32))
        f0f, f1f = f0.reshape(-1), f1.reshape(-1)
        dt = (thresh - f0f) / jnp.where(f1f == f0f, 1.0, f1f - f0f)
        p = [(_iota3(shape, d).reshape(-1)).astype(jnp.float32)
             for d in range(3)]
        p[axis] = p[axis] + dt
        p[0] = p[0] + x0f
        dest = jnp.where(hit, local, cap)
        V = tuple(jnp.zeros((cap,), jnp.float32).at[dest].set(
            p[d], mode="drop") for d in range(3))
        return V, n, local.reshape(shape), hit.reshape(shape)

    # axis 0: edges (x, x+1), x local in [0, sc)
    V0, n0, l0, _ = axis_verts(ins[:-1], ins[1:], sv[:-1], sv[1:], 0,
                               v0_cap, sc)
    g0 = l0 + base0                                        # (sc, Y, Z)

    n_own = sc + 1 if last else sc
    V1, n1, l1, _ = axis_verts(ins[:n_own, :-1, :], ins[:n_own, 1:, :],
                               sv[:n_own, :-1, :], sv[:n_own, 1:, :], 1,
                               v1_cap, n_own)
    g1own = l1 + base1                                     # (n_own, Y-1, Z)
    V2, n2, l2, _ = axis_verts(ins[:n_own, :, :-1], ins[:n_own, :, 1:],
                               sv[:n_own, :, :-1], sv[:n_own, :, 1:], 2,
                               v2_cap, n_own)
    g2own = l2 + base2                                     # (n_own, Y, Z-1)

    if last:
        g1, g2 = g1own, g2own                  # covers planes 0..sc
    else:
        hb1 = (ins[sc, :-1, :] != ins[sc, 1:, :]).reshape(-1)
        rb1 = (jnp.cumsum(hb1.astype(jnp.int32)) - 1 + base1_next
               ).reshape(1, Y - 1, Z)
        g1 = jnp.concatenate([g1own, rb1], axis=0)
        hb2 = (ins[sc, :, :-1] != ins[sc, :, 1:]).reshape(-1)
        rb2 = (jnp.cumsum(hb2.astype(jnp.int32)) - 1 + base2_next
               ).reshape(1, Y, Z - 1)
        g2 = jnp.concatenate([g2own, rb2], axis=0)

    # ---- faces (slab-local order == global raster order) ---------------
    m = _mask8(ins).reshape(-1)
    active = (m > 0) & (m < 255)
    ntri_cell = jnp.where(active, tri_count[m], 0)
    tri_base = jnp.cumsum(ntri_cell) - ntri_cell
    nf = jnp.sum(ntri_cell)

    cell_cap = max(face_cap // 2, 1)
    cid = jnp.cumsum(active.astype(jnp.int32)) - 1
    cdest = jnp.where(active, cid, cell_cap)
    cell_flat = jnp.zeros((cell_cap,), jnp.int32).at[cdest].set(
        jnp.arange(m.shape[0], dtype=jnp.int32), mode="drop")
    cell_mask = jnp.zeros((cell_cap,), jnp.int32).at[cdest].set(
        m.astype(jnp.int32), mode="drop")
    cell_tbase = jnp.zeros((cell_cap,), jnp.int32).at[cdest].set(
        tri_base.astype(jnp.int32), mode="drop")
    n_cells = jnp.sum(active.astype(jnp.int32))
    live = jnp.arange(cell_cap, dtype=jnp.int32) < n_cells

    az = cell_flat % (Z - 1)
    ay = (cell_flat // (Z - 1)) % (Y - 1)
    ax = cell_flat // ((Z - 1) * (Y - 1))
    Fc = _emit_face_cols(g0, g1, g2, ax, ay, az, cell_mask, cell_tbase,
                         live, face_cap)
    return V0, n0, V1, n1, V2, n2, tuple(Fc), nf


def marching_cubes_device_slabbed(vol, origin, spacing: float,
                                  thresh: float = 0.0, n_slabs: int = 8
                                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Slab-along-x device MC for volumes whose three int32 id grids
    would overflow HBM as one jit (≳700³). Output is identical to
    marching_cubes_grid / marching_cubes_device including vertex and
    face ORDER: slabbing along x keeps every per-axis raster contiguous,
    so global ids are just per-slab bases + local cumsum ranks.

    Peak HBM ≈ vol (4·res³) + one slab's transients (≈ 16·res³/n_slabs)
    — 1024³ fits a 16 GB chip at n_slabs=8."""
    vol = jnp.asarray(vol, jnp.float32)
    X, Y, Z = vol.shape
    if (X - 1) % n_slabs:
        raise ValueError(f"X-1={X - 1} not divisible by n_slabs={n_slabs}")
    sc = (X - 1) // n_slabs
    rows, extra = _slab_counts(vol, jnp.float32(thresh), sc)
    rows = np.asarray(rows).astype(np.int64)
    extra = np.asarray(extra)
    rows[-1, 1] += int(extra[0])
    rows[-1, 2] += int(extra[1])

    N0, N1, N2 = rows[:, 0].sum(), rows[:, 1].sum(), rows[:, 2].sum()
    pre0 = np.concatenate([[0], np.cumsum(rows[:, 0])])
    pre1 = np.concatenate([[0], np.cumsum(rows[:, 1])])
    pre2 = np.concatenate([[0], np.cumsum(rows[:, 2])])
    base0 = pre0[:-1]
    base1 = N0 + pre1[:-1]
    base2 = N0 + N1 + pre2[:-1]
    # next slab's base (boundary-plane ids); unused for the last slab
    base1n = N0 + pre1[1:]
    base2n = N0 + N1 + pre2[1:]

    def bucket(n):
        return 1 << max(int(np.ceil(np.log2(max(int(n), 1)))), 10)

    v0c = bucket(rows[:, 0].max())
    v1c = bucket(rows[:, 1].max())
    v2c = bucket(rows[:, 2].max())
    fc = bucket(rows[:, 3].max())

    V = np.empty((N0 + N1 + N2, 3), np.float64)
    Fs = []
    for s in range(n_slabs):
        V0, n0, V1, n1, V2, n2, F, nf = _slab_emit(
            vol, jnp.float32(thresh), jnp.int32(s * sc),
            jnp.int32(base0[s]), jnp.int32(base1[s]), jnp.int32(base2[s]),
            jnp.int32(base1n[s]), jnp.int32(base2n[s]),
            sc=sc, last=(s == n_slabs - 1), v0_cap=v0c, v1_cap=v1c,
            v2_cap=v2c, face_cap=fc)
        n0, n1, n2, nf = int(n0), int(n1), int(n2), int(nf)
        assert (n0, n1, n2, nf) == tuple(rows[s]), (s, (n0, n1, n2, nf),
                                                    rows[s])
        V[base0[s]:base0[s] + n0] = np.stack(
            [np.asarray(c[:n0]) for c in V0], axis=1)
        V[base1[s]:base1[s] + n1] = np.stack(
            [np.asarray(c[:n1]) for c in V1], axis=1)
        V[base2[s]:base2[s] + n2] = np.stack(
            [np.asarray(c[:n2]) for c in V2], axis=1)
        Fs.append(np.stack([np.asarray(c[:nf], np.int64) for c in F],
                           axis=1))
    Fh = (np.concatenate(Fs, axis=0) if Fs
          else np.zeros((0, 3), np.int64))
    Vh = (V * spacing + np.asarray(origin, np.float64)).astype(np.float32)
    return Vh, Fh


def marching_cubes_device(vol, origin, spacing: float, thresh: float = 0.0
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Device-resident drop-in for marching.marching_cubes_grid: same
    vertices (order included), same faces (order included). `vol` may be
    a device array (stays on device) or numpy (pushed once)."""
    vol = jnp.asarray(vol, jnp.float32)
    X, Y, Z = vol.shape
    # cap heuristic: surface ≈ O(res²); bucket to powers of two for the
    # jit cache. 16·res² covers every scene we have with ~8× margin.
    res = max(X, Y, Z)
    cap = 1 << int(np.ceil(np.log2(max(16 * res * res, 1 << 12))))
    for _ in range(4):
        V, F, nv, nf = _mc_device(vol, jnp.float32(thresh),
                                  vert_cap=cap, face_cap=2 * cap)
        nv, nf = int(nv), int(nf)
        if nv <= cap and nf <= 2 * cap:
            break
        cap *= 4
    else:
        raise RuntimeError(f"marching_cubes_device: caps exhausted "
                           f"(nv={nv}, nf={nf})")
    Vh = np.stack([np.asarray(c[:nv], np.float64) for c in V], axis=1)
    Fh = np.stack([np.asarray(c[:nf], np.int64) for c in F], axis=1)
    Vh = (Vh * spacing + np.asarray(origin, np.float64)).astype(np.float32)
    return Vh, Fh
