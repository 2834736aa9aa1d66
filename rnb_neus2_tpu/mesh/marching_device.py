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


def _iota3(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


@functools.partial(jax.jit, static_argnames=("vert_cap", "face_cap"))
def _mc_device(vol, thresh, vert_cap: int, face_cap: int):
    """vol (X,Y,Z) f32 → (V (vert_cap,3) f32 in GRID units, F (face_cap,3)
    i32, n_verts i32, n_faces i32)."""
    X, Y, Z = vol.shape
    inside = vol > thresh

    tri_table = jnp.asarray(TRIANGLE_TABLE[:, :15].reshape(256, 5, 3),
                            jnp.int32)
    tri_count = jnp.asarray(_TRI_COUNT)

    V = jnp.zeros((vert_cap, 3), jnp.float32)
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
        V = V.at[dest].set(jnp.stack(p, axis=1), mode="drop")
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
    e = jnp.stack([
        g0[ax, ay, az],
        g1[ax + 1, ay, az],
        g0[ax, ay + 1, az],
        g1[ax, ay, az],
        g0[ax, ay, az + 1],
        g1[ax + 1, ay, az + 1],
        g0[ax, ay + 1, az + 1],
        g1[ax, ay, az + 1],
        g2[ax, ay, az],
        g2[ax + 1, ay, az],
        g2[ax + 1, ay + 1, az],
        g2[ax, ay + 1, az],
    ], axis=1)                                            # (C, 12)

    tri = tri_table[cell_mask]                            # (C, 5, 3)
    valid = (tri[:, :, 0] >= 0) & live[:, None]           # (C, 5)
    fdest = jnp.where(valid, cell_tbase[:, None]
                      + jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1,
                      face_cap)
    C = e.shape[0]
    edge_ids = e[jnp.arange(C, dtype=jnp.int32)[:, None, None],
                 jnp.maximum(tri, 0)]                     # (C, 5, 3)
    F = jnp.zeros((face_cap, 3), jnp.int32).at[fdest.reshape(-1)].set(
        edge_ids.reshape(-1, 3), mode="drop")
    return V, F, n_verts, n_faces


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
    tri_table = jnp.asarray(TRIANGLE_TABLE[:, :15].reshape(256, 5, 3),
                            jnp.int32)
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
        V = jnp.zeros((cap, 3), jnp.float32).at[dest].set(
            jnp.stack(p, axis=1), mode="drop")
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
    e = jnp.stack([
        g0[ax, ay, az], g1[ax + 1, ay, az], g0[ax, ay + 1, az],
        g1[ax, ay, az], g0[ax, ay, az + 1], g1[ax + 1, ay, az + 1],
        g0[ax, ay + 1, az + 1], g1[ax, ay, az + 1], g2[ax, ay, az],
        g2[ax + 1, ay, az], g2[ax + 1, ay + 1, az], g2[ax, ay + 1, az],
    ], axis=1)

    tri = tri_table[cell_mask]
    valid = (tri[:, :, 0] >= 0) & live[:, None]
    fdest = jnp.where(valid, cell_tbase[:, None]
                      + jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1,
                      face_cap)
    C = e.shape[0]
    edge_ids = e[jnp.arange(C, dtype=jnp.int32)[:, None, None],
                 jnp.maximum(tri, 0)]
    F = jnp.zeros((face_cap, 3), jnp.int32).at[fdest.reshape(-1)].set(
        edge_ids.reshape(-1, 3), mode="drop")
    return V0, n0, V1, n1, V2, n2, F, nf


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
        V[base0[s]:base0[s] + n0] = np.asarray(V0[:n0])
        V[base1[s]:base1[s] + n1] = np.asarray(V1[:n1])
        V[base2[s]:base2[s] + n2] = np.asarray(V2[:n2])
        Fs.append(np.asarray(F[:nf], np.int64))
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
    Vh = np.asarray(V[:nv], np.float64)
    Fh = np.asarray(F[:nf], np.int64)
    Vh = (Vh * spacing + np.asarray(origin, np.float64)).astype(np.float32)
    return Vh, Fh
