"""Mesh postprocessing: keep the largest connected component by area.

Replaces the reference pipeline's trimesh step (rnb_neus2/pipeline.py:178-219:
split(only_watertight=False) → max component by area → fix_normals →
export). Components are computed by union-find over shared vertices; our
extraction already orients faces consistently from the SDF gradient, which
covers fix_normals' job.
"""

from __future__ import annotations

import numpy as np


def _union_find_components(n_verts: int, faces: np.ndarray) -> np.ndarray:
    parent = np.arange(n_verts)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    for f in faces:
        r0 = find(f[0])
        r1 = find(f[1])
        r2 = find(f[2])
        parent[r1] = r0
        parent[r2] = r0
    return np.array([find(i) for i in range(n_verts)])


def largest_component(V: np.ndarray, F: np.ndarray,
                      N: np.ndarray | None = None,
                      C: np.ndarray | None = None):
    """Keep the component with the largest surface area."""
    if len(F) == 0:
        return V, F, N, C
    comp = _union_find_components(len(V), F)
    tri = V[F]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    face_comp = comp[F[:, 0]]
    comps, inv = np.unique(face_comp, return_inverse=True)
    areas = np.bincount(inv, weights=area)
    keep_comp = comps[np.argmax(areas)]
    keep_faces = F[face_comp == keep_comp]

    used = np.unique(keep_faces.ravel())
    remap = np.full(len(V), -1, np.int64)
    remap[used] = np.arange(len(used))
    V2 = V[used]
    F2 = remap[keep_faces]
    N2 = N[used] if N is not None else None
    C2 = C[used] if C is not None else None
    return V2, F2, N2, C2
