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
