"""Camera model and ray generation.

Conventions follow the prepared-dataset contract (transform.json with
from_na=true): OpenCV-style pinhole — x right, y down, z forward; c2w with
rotation unchanged by the loader and translation mapped t → scale·t + offset
(nerf_loader.h:180-201 with from_na: the two column sign flips cancel).
Ray directions are built from normalized pixel coordinates
(testbed_nerf.cu:1285-1296): d_cam = ((u−cx)·W/fx, (v−cy)·H/fy, 1), rotated
by R_c2w and normalized.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class Cameras(NamedTuple):
    """Per-view pinhole cameras on device. All arrays share leading dim N."""

    rot_c2w: jnp.ndarray     # (N, 3, 3)
    origin: jnp.ndarray      # (N, 3) camera center in unit-cube space
    focal: jnp.ndarray       # (N, 2) fx, fy in pixels
    principal: jnp.ndarray   # (N, 2) cx, cy normalized to [0,1]
    resolution: Tuple[int, int]  # (W, H), shared by all views
    # OpenCV lens distortion [k1, k2, p1, p2] per view, or None for
    # ideal pinholes. The reference applies it inside EVERY generated ray
    # (iterative_camera_undistortion on the normalized plane coords,
    # testbed_nerf.cu:1298-1300; params parsed from transform.json's
    # top-level k1/k2/p1/p2, nerf_loader.cu:432-465, stored per view in
    # TrainingImageMetadata, nerf_loader.h:33-49).
    distortion: jnp.ndarray | None = None   # (N, 4)
    # F-theta fisheye [p0..p4, width, height] shared by all views
    # (nerf_loader.cu ftheta_p0..p4; testbed_nerf.cu:1284-1286)
    ftheta: jnp.ndarray | None = None       # (7,)


def rays_from_pixels(cams: Cameras, img_idx: jnp.ndarray,
                     xy: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """img_idx: (R,), xy: (R,2) normalized image coords in [0,1).

    Returns (origins, unit directions), each (R, 3). Lens distortion is
    applied exactly where the reference applies it (testbed_nerf.cu:
    1282-1300): F-theta replaces the pinhole back-projection wholesale;
    the OpenCV model Newton-undistorts the normalized plane coords.
    """
    W, H = cams.resolution
    rot = cams.rot_c2w[img_idx]                       # (R,3,3)
    o = cams.origin[img_idx]
    pp = cams.principal[img_idx]
    if cams.ftheta is not None:
        from .distortion import f_theta_undistortion
        d_cam = f_theta_undistortion(xy - pp, cams.ftheta,
                                     error_direction=(0.0, 0.0, 1.0))
    else:
        f = cams.focal[img_idx]
        x = (xy[:, 0] - pp[:, 0]) * W / f[:, 0]
        y = (xy[:, 1] - pp[:, 1]) * H / f[:, 1]
        if cams.distortion is not None:
            from .distortion import iterative_undistortion
            x, y = iterative_undistortion(cams.distortion[img_idx], x, y)
        d_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=1)
    d = jnp.einsum("rij,rj->ri", rot, d_cam)
    return o, d / jnp.linalg.norm(d, axis=1, keepdims=True)


def ray_aabb(o: jnp.ndarray, d: jnp.ndarray,
             lo: float = 0.0, hi: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab intersection with the axis-aligned cube [lo,hi]³
    (bounding_box.cuh ray_intersect). Returns (tmin, tmax); empty if
    tmin > tmax."""
    inv = 1.0 / d
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return tmin, tmax
