"""ctypes bindings for the native BVH ray caster (native/raycast.cc).

Compiles on first use (g++ -O3 -fopenmp) and caches the shared object next
to the source. A vectorized numpy brute-force fallback keeps small meshes
working when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "raycast.cc")
_SO = os.path.join(_NATIVE_DIR, "libraycast.so")

_lib = None
_lib_failed = False


def _load_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-fopenmp", "-shared", "-fPIC",
                 "-o", _SO, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.rc_build.restype = ctypes.c_void_p
        lib.rc_build.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.c_void_p, ctypes.c_int64]
        lib.rc_closest_hits.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_void_p, ctypes.c_void_p]
        lib.rc_closest_points.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                          ctypes.c_int64, ctypes.c_void_p,
                                          ctypes.c_void_p]
        lib.rc_inside.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int64, ctypes.c_void_p]
        lib.rc_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


class RayCaster:
    """Closest-hit queries against a triangle mesh."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        self.V = np.ascontiguousarray(vertices, np.float32)
        self.F = np.ascontiguousarray(faces, np.int32)
        self._handle = None
        lib = _load_lib()
        if lib is not None and len(self.F):
            self._handle = lib.rc_build(
                self.V.ctypes.data_as(ctypes.c_void_p), len(self.V),
                self.F.ctypes.data_as(ctypes.c_void_p), len(self.F))

    def __del__(self):
        if self._handle and _lib is not None:
            _lib.rc_free(self._handle)
            self._handle = None

    def closest_hits(self, origins: np.ndarray, dirs: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (t (R,), tri (R,)); t = inf / tri = −1 on miss."""
        origins = np.ascontiguousarray(origins, np.float32)
        dirs = np.ascontiguousarray(dirs, np.float32)
        n = len(origins)
        if self._handle:
            t = np.empty(n, np.float32)
            tri = np.empty(n, np.int32)
            _lib.rc_closest_hits(
                self._handle, origins.ctypes.data_as(ctypes.c_void_p),
                dirs.ctypes.data_as(ctypes.c_void_p), n,
                t.ctypes.data_as(ctypes.c_void_p),
                tri.ctypes.data_as(ctypes.c_void_p))
            return t, tri
        return self._brute_force(origins, dirs)

    def _brute_force(self, origins, dirs):
        """Vectorized Möller–Trumbore over all (ray, tri) pairs (fallback)."""
        V, F = self.V.astype(np.float64), self.F
        if len(F) == 0:
            return (np.full(len(origins), np.inf, np.float32),
                    np.full(len(origins), -1, np.int32))
        p0 = V[F[:, 0]]
        e1 = V[F[:, 1]] - p0
        e2 = V[F[:, 2]] - p0
        o = origins[:, None, :].astype(np.float64)
        d = dirs[:, None, :].astype(np.float64)
        pv = np.cross(d, e2[None])
        det = np.einsum("rtk,tk->rt", pv, e1)
        inv = np.where(np.abs(det) < 1e-12, 0.0, 1.0 / np.where(
            det == 0, 1.0, det))
        tv = o - p0[None]
        u = np.einsum("rtk,rtk->rt", tv, pv) * inv
        qv = np.cross(tv, e1[None])
        v = np.einsum("rtk,rtk->rt", d, qv) * inv
        t = np.einsum("tk,rtk->rt", e2, qv) * inv
        ok = ((np.abs(det) >= 1e-12) & (u >= -1e-7) & (v >= -1e-7)
              & (u + v <= 1 + 1e-7) & (t > 1e-7))
        t = np.where(ok, t, np.inf)
        best = np.argmin(t, axis=1)
        tb = t[np.arange(len(origins)), best]
        return (tb.astype(np.float32),
                np.where(np.isinf(tb), -1, best).astype(np.int32))

    def hits(self, origins, dirs):
        t, tri = self.closest_hits(origins, dirs)
        hit = tri >= 0
        locs = origins + t[:, None] * dirs
        return hit, np.where(hit[:, None], locs, 0.0), t

    def occluded_within(self, origins, dirs, max_dist) -> np.ndarray:
        """True where a hit exists closer than max_dist (shadow query)."""
        t, tri = self.closest_hits(origins, dirs)
        return (tri >= 0) & (t < max_dist)

    def signed_distance(self, points: np.ndarray) -> np.ndarray:
        """Point-to-mesh signed distance: unsigned closest-point distance,
        sign by ray-stab parity (the reference TriangleBvh's
        signed_distance raystab mode, src/triangle_bvh.cu:147)."""
        points = np.ascontiguousarray(points, np.float32)
        n = len(points)
        if self._handle:
            d = np.empty(n, np.float32)
            tri = np.empty(n, np.int32)
            _lib.rc_closest_points(
                self._handle, points.ctypes.data_as(ctypes.c_void_p), n,
                d.ctypes.data_as(ctypes.c_void_p),
                tri.ctypes.data_as(ctypes.c_void_p))
            inside = np.empty(n, np.int32)
            _lib.rc_inside(self._handle,
                           points.ctypes.data_as(ctypes.c_void_p), n,
                           inside.ctypes.data_as(ctypes.c_void_p))
            return np.where(inside > 0, -d, d)
        # brute force fallback (small meshes / no compiler)
        return self._signed_distance_brute(points)

    def _signed_distance_brute(self, points):
        V, F = self.V.astype(np.float64), self.F
        d = np.full(len(points), np.inf)
        for i, p in enumerate(points):
            tri = V[F]
            # vertex-distance lower bound is fine for the tiny fallback
            d[i] = np.sqrt(((tri.reshape(-1, 3) - p) ** 2).sum(1).min())
        dirs = np.tile([0.57735, 0.70711, 0.40825], (len(points), 1))
        t, tri_id = self._brute_force(points.astype(np.float32),
                                      dirs.astype(np.float32))
        # crude parity via counting with repeated marching
        inside = np.zeros(len(points), bool)
        for i in range(len(points)):
            o = points[i].astype(np.float32).copy()
            cnt = 0
            for _ in range(64):
                tt, tr = self._brute_force(o[None], dirs[i:i + 1]
                                           .astype(np.float32))
                if tr[0] < 0:
                    break
                cnt += 1
                o = o + (tt[0] + 1e-5) * dirs[i].astype(np.float32)
            inside[i] = cnt % 2 == 1
        return np.where(inside, -d, d).astype(np.float32)
