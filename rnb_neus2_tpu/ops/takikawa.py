"""Takikawa (NGLOD) octree feature encoding — SDF-mode alternative encoding.

Behavioral twin of the reference's TakikawaEncoding
(include/neural-graphics-primitives/takikawa_encoding.cuh) + its
TriangleOctree substrate (triangle_octree.cuh):

- an octree is refined only where the target mesh's triangles live;
  levels [starting_level, starting_level + n_levels) store
  N_FEATURES_PER_LEVEL=8 features at the *vertices* (lattice corners) of
  occupied cells (takikawa_encoding.cuh:277-285);
- encoding a point: walk the octree; at each stored level trilinearly
  interpolate the 8 corner features of the containing cell
  (kernel_takikawa:77-106); levels whose cell is not refined output
  zeros (:155-163);
- Linear or Smoothstep interpolation (:64-75); position derivative
  scales by 2^(level+starting_level) (:112).

TPU-native design instead of a pointer-chasing GPU octree walk:
- the octree is built ONCE on the host (numpy) from the triangle mesh —
  occupied cells per level via triangle rasterization, shared corner
  vertices deduplicated into one global vertex table;
- per level the occupied-cell ids live in a SORTED array; the device
  lookup is a `searchsorted` binary search (log₂C vector gathers) +
  one octet gather + trilinear lerp — all fixed-shape, all fusable;
- gradients (first and second order wrt params) come from `jax.grad`
  of the gather+lerp expression, replacing kernel_takikawa_backward
  (:191-275) and the dy_dx buffer.

Not used by the RNb pipeline (which is Nerf-mode with the hash grid);
provided for SDF-mode capability parity (testbed.cu:2423,2654).
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class TriangleOctree:
    """Host-built sparse octree over a triangle mesh in [0,1]³.

    Per stored level l (resolution 2^(starting_level+l)):
      cell_keys[l]: (C_l,) int32 sorted linear cell ids (x + y·R + z·R²)
      octets[l]:    (C_l, 8) int32 global vertex ids, corner order =
                    bit d of the corner index ↔ +1 step in dim d
                    (kernel_takikawa:82-93)
    """
    starting_level: int
    n_levels: int
    cell_keys: List[np.ndarray]
    octets: List[np.ndarray]
    n_vertices: int

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * 8


_CORNERS = np.array([[(i >> d) & 1 for d in range(3)] for i in range(8)],
                    np.int32)                     # (8,3), bit d ↔ dim d


def _occupied_cells(tri: np.ndarray, res: int) -> np.ndarray:
    """Linear ids of cells touched by any triangle at resolution `res`.

    Conservative rasterization by recursive edge-midpoint subdivision
    until every triangle is smaller than half a cell — the same cover
    the reference computes exactly with triangle/AABB tests
    (triangle_octree.cuh build via TriangleBvh)."""
    tris = [tri.astype(np.float64)]
    h = 0.5 / res
    out = []
    while tris:
        t = tris.pop()
        # max edge length per triangle
        e = np.maximum(np.linalg.norm(t[:, 0] - t[:, 1], axis=1),
                       np.maximum(np.linalg.norm(t[:, 1] - t[:, 2], axis=1),
                                  np.linalg.norm(t[:, 2] - t[:, 0], axis=1)))
        small = e <= h
        done = t[small]
        if len(done):
            # mark every cell the small triangle's AABB overlaps (the
            # box spans <= 2 cells per axis since the triangle is under
            # half a cell) — conservative: a sliver crossing a cell
            # boundary marks both cells, unlike point sampling which
            # could miss one
            lo = np.clip(np.floor(done.min(axis=1) * res), 0,
                         res - 1).astype(np.int64)         # (T, 3)
            hi = np.clip(np.floor(done.max(axis=1) * res), 0,
                         res - 1).astype(np.int64)
            for dx, dy, dz in _CORNERS:
                c = np.minimum(lo + np.array([dx, dy, dz]), hi)
                out.append(c[:, 0] + c[:, 1] * res + c[:, 2] * res * res)
        big = t[~small]
        if len(big):
            m01 = (big[:, 0] + big[:, 1]) / 2
            m12 = (big[:, 1] + big[:, 2]) / 2
            m20 = (big[:, 2] + big[:, 0]) / 2
            tris.extend([
                np.stack([big[:, 0], m01, m20], axis=1),
                np.stack([m01, big[:, 1], m12], axis=1),
                np.stack([m20, m12, big[:, 2]], axis=1),
                np.stack([m01, m12, m20], axis=1),
            ])
    if not out:
        return np.zeros((0,), np.int64)
    return np.unique(np.concatenate(out))


def build_triangle_octree(vertices: np.ndarray, faces: np.ndarray,
                          depth: int, starting_level: int = 0
                          ) -> TriangleOctree:
    """Build the octree: levels starting_level..depth-1 store features.

    vertices must already be in [0,1]³ (the SDF-mode scene normalization).
    """
    assert depth > starting_level
    tri = np.asarray(vertices, np.float64)[np.asarray(faces)]
    cell_keys, octets = [], []
    v_offset = 0
    for lvl in range(starting_level, depth):
        res = 1 << lvl
        keys = _occupied_cells(tri, res)
        cx = (keys % res).astype(np.int64)
        cy = ((keys // res) % res).astype(np.int64)
        cz = (keys // (res * res)).astype(np.int64)
        # corner lattice ids on the (res+1)³ vertex lattice
        vres = res + 1
        corners = (np.stack([cx, cy, cz], 1)[:, None, :]
                   + _CORNERS[None, :, :])                     # (C,8,3)
        vid = (corners[..., 0] + corners[..., 1] * vres
               + corners[..., 2] * vres * vres)                # (C,8)
        uniq, inv = np.unique(vid, return_inverse=True)
        octets.append((inv.reshape(vid.shape) + v_offset).astype(np.int32))
        cell_keys.append(keys.astype(np.int32))
        v_offset += len(uniq)
    return TriangleOctree(starting_level, depth - starting_level,
                          cell_keys, octets, v_offset)


def init_takikawa_params(key: jax.Array, octree: TriangleOctree,
                         n_features: int = 8) -> jnp.ndarray:
    """Vertex feature table U(−1e−4, 1e−4) (tcnn-style init)."""
    return jax.random.uniform(key, (octree.n_vertices, n_features),
                              jnp.float32, -1e-4, 1e-4)


def _smoothstep(x):
    return x * x * (3.0 - 2.0 * x)


def encode(table: jnp.ndarray, positions: jnp.ndarray,
           octree: TriangleOctree, interpolation: str = "linear"
           ) -> jnp.ndarray:
    """(N,3) in [0,1] → (N, n_levels·F) features; zeros where the octree
    is not refined (kernel_takikawa:155-163)."""
    n = positions.shape[0]
    F = table.shape[1]
    outs = []
    for lvl in range(octree.n_levels):
        res = 1 << (octree.starting_level + lvl)
        keys = jnp.asarray(octree.cell_keys[lvl])
        octs = jnp.asarray(octree.octets[lvl])
        p = positions * res
        cell = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, res - 1)
        frac = p - cell
        key = cell[:, 0] + cell[:, 1] * res + cell[:, 2] * res * res
        i = jnp.searchsorted(keys, key)
        i = jnp.clip(i, 0, max(keys.shape[0] - 1, 0))
        if keys.shape[0] == 0:
            outs.append(jnp.zeros((n, F), table.dtype))
            continue
        found = keys[i] == key
        feats = table[octs[i]]                           # (N, 8, F)
        if interpolation == "smoothstep":
            frac = _smoothstep(frac)                     # :64-75
        cw = jnp.asarray(_CORNERS, jnp.float32)[None]    # (1,8,3)
        w = jnp.prod(jnp.where(cw > 0, frac[:, None, :],
                               1.0 - frac[:, None, :]), axis=-1)
        out = jnp.einsum("ncf,nc->nf", feats, w)
        outs.append(out * found[:, None].astype(table.dtype))
    return jnp.concatenate(outs, axis=1)
