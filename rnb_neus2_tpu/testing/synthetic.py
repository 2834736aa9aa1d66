"""Synthetic analytic-sphere scene for end-to-end tests and benchmarks.

Generates what a photometric-stereo pipeline would hand the system: per-view
normal maps (camera frame, y-up/z-toward-viewer convention — the inverse of
the loss kernel's y/z negation), albedo maps, and masks, for a Lambertian
sphere centered in the unit cube. This is our stand-in for the reference's
de-facto validation datasets (DiLiGenT-MV etc., SURVEY §4) in hermetic tests.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..geom.camera import Cameras
from ..io.dataset import SceneMeta, TrainingDataset, build_dataset


def ring_cameras(n_views: int, radius: float, width: int, height: int,
                 focal: float, center=(0.5, 0.5, 0.5),
                 elevation: float = 0.35) -> Cameras:
    """Cameras on a ring looking at the cube center (OpenCV convention:
    x right, y down, z forward)."""
    c = np.asarray(center, np.float32)
    rots, origins = [], []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        eye = c + radius * np.array([
            np.cos(ang) * np.cos(elevation),
            np.sin(ang) * np.cos(elevation),
            np.sin(elevation)], np.float32)
        fwd = c - eye
        fwd = fwd / np.linalg.norm(fwd)
        up_world = np.array([0.0, 0.0, -1.0], np.float32)
        right = np.cross(fwd, up_world)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=1)  # columns = cam axes
        rots.append(R.astype(np.float32))
        origins.append(eye)
    n = n_views
    return Cameras(
        rot_c2w=jnp.asarray(np.stack(rots)),
        origin=jnp.asarray(np.stack(origins)),
        focal=jnp.asarray(np.full((n, 2), focal, np.float32)),
        principal=jnp.asarray(np.full((n, 2), 0.5, np.float32)),
        resolution=(width, height),
    )


def render_sphere_views(cams: Cameras, center=(0.5, 0.5, 0.5),
                        radius: float = 0.25,
                        albedo_rgb=(0.8, 0.6, 0.4)):
    """Analytic ray-sphere render → decoded-space arrays for build_dataset."""
    W, H = cams.resolution
    c = np.asarray(center, np.float32)
    n_views = cams.rot_c2w.shape[0]
    rots = np.asarray(cams.rot_c2w)
    origins = np.asarray(cams.origin)
    focal = np.asarray(cams.focal)
    pp = np.asarray(cams.principal)

    u = (np.arange(W) + 0.5) / W
    v = (np.arange(H) + 0.5) / H
    uu, vv = np.meshgrid(u, v)

    normals = np.zeros((n_views, H, W, 3), np.float32)
    alphas = np.zeros((n_views, H, W), np.float32)
    for i in range(n_views):
        d_cam = np.stack([
            (uu - pp[i, 0]) * W / focal[i, 0],
            (vv - pp[i, 1]) * H / focal[i, 1],
            np.ones_like(uu)], axis=-1)
        d_world = d_cam @ rots[i].T
        d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)
        oc = origins[i] - c
        b = np.sum(d_world * oc, axis=-1)
        disc = b * b - (np.sum(oc * oc) - radius * radius)
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        hit &= t > 0
        p = origins[i] + t[..., None] * d_world
        n_world = (p - c) / radius
        # world → OpenCV camera frame; this is what the decoded GT must be
        n_cam = n_world @ rots[i]
        normals[i] = np.where(hit[..., None], n_cam, 0.0)
        # masked pixels decode (after the y/z negation) to (−1,+1,+1)/√3
        normals[i][~hit] = np.array([-1.0, 1.0, 1.0]) / np.sqrt(3.0)
        alphas[i] = hit.astype(np.float32)

    albedo = np.broadcast_to(np.asarray(albedo_rgb, np.float32),
                             (n_views, H, W, 3)).copy()
    albedo *= alphas[..., None]
    return normals, albedo, alphas


def sphere_dataset(n_views: int = 8, width: int = 48, height: int = 48,
                   radius: float = 0.25, cam_radius: float = 1.5,
                   focal: float = 70.0,
                   albedo_rgb=(0.8, 0.6, 0.4)) -> TrainingDataset:
    cams = ring_cameras(n_views, cam_radius, width, height, focal)
    normals, albedo, alphas = render_sphere_views(cams, radius=radius,
                                                  albedo_rgb=albedo_rgb)
    return build_dataset(cams, normals, albedo, alphas, alphas, SceneMeta())


def write_prepared_scene(out_dir, n_views: int = 8, width: int = 48,
                         height: int = 48, radius: float = 0.25,
                         cam_radius: float = 1.5, focal: float = 70.0,
                         albedo_scales=None):
    """Materialize a prepared scene DIRECTORY (transform.json + 16-bit RGBA
    normals/albedos), exercising the full PNG encode/decode path the real
    pipeline uses. Cameras are stored in the pre-normalization convention
    (t raw; the loader applies t → 0.5·t + 0.5)."""
    import json
    import os

    from ..io import image_io

    cams = ring_cameras(n_views, cam_radius, width, height, focal)
    normals, albedo, alphas = render_sphere_views(cams, radius=radius)
    os.makedirs(os.path.join(out_dir, "normals"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "albedos"), exist_ok=True)

    frames = []
    rots = np.asarray(cams.rot_c2w)
    origins = np.asarray(cams.origin)
    for i in range(n_views):
        # decoded = stored*2−1 with y,z negated → stored = decoded·(1,−1,−1)
        stored = normals[i] * np.array([1.0, -1.0, -1.0])
        png = np.concatenate([(stored + 1.0) / 2.0, alphas[i][..., None]],
                             axis=-1)
        name = f"{i:05d}.png"
        image_io.save_image(png, os.path.join(out_dir, "normals", name), 16)
        a = albedo[i].copy()
        if albedo_scales is not None:
            a = np.clip(a * albedo_scales[i], 0, 1)
        image_io.save_image(
            np.concatenate([a, alphas[i][..., None]], axis=-1),
            os.path.join(out_dir, "albedos", name), 16)

        c2w = np.eye(4)
        c2w[:3, :3] = rots[i]
        # loader maps t → 0.5·t + 0.5; invert so origins land where built
        c2w[:3, 3] = (origins[i] - 0.5) / 0.5
        K = np.eye(4)
        K[0, 0] = K[1, 1] = focal
        K[0, 2], K[1, 2] = width / 2.0, height / 2.0
        frames.append({"albedo_path": f"albedos/{name}",
                       "normal_path": f"normals/{name}",
                       "transform_matrix": c2w.tolist(),
                       "intrinsic_matrix": K.tolist()})
    tj = {"w": width, "h": height, "aabb_scale": 1.0, "scale": 0.5,
          "offset": [0.5, 0.5, 0.5], "from_na": True,
          "n2w": np.eye(4).tolist(), "frames": frames}
    with open(os.path.join(out_dir, "transform.json"), "w") as f:
        json.dump(tj, f)
    return out_dir


# ---------------------------------------------------------------------------
# Composite analytic scene (sphere ∪ torus ∪ rounded box)
# ---------------------------------------------------------------------------
# A nontrivial stand-in for the reference's multi-object validation scenes
# (DiLiGenT-MV-style: 20 ring views, per-view normal+albedo maps, masks).
# Analytic SDF → exact GT surface for Chamfer-L1 (mesh/metrics.py).


def composite_sdf(p: np.ndarray) -> np.ndarray:
    """(..., 3) → (...) SDF of the union scene, exact enough for GT use."""
    p = np.asarray(p, np.float32)
    # sphere
    d1 = np.linalg.norm(p - np.array([0.50, 0.54, 0.56], np.float32),
                        axis=-1) - 0.14
    # torus, axis = z, centered slightly low
    q = p - np.array([0.50, 0.46, 0.40], np.float32)
    qxy = np.linalg.norm(q[..., :2], axis=-1) - 0.17
    d2 = np.sqrt(qxy * qxy + q[..., 2] * q[..., 2]) - 0.055
    # rounded box
    b = np.abs(p - np.array([0.52, 0.62, 0.40], np.float32)) \
        - np.array([0.10, 0.055, 0.045], np.float32)
    d3 = (np.linalg.norm(np.maximum(b, 0.0), axis=-1)
          + np.minimum(np.max(b, axis=-1), 0.0)) - 0.02
    return np.minimum(np.minimum(d1, d2), d3)


def composite_normal(p: np.ndarray, eps: float = 1e-4) -> np.ndarray:
    """Central-difference normal of composite_sdf, normalized."""
    p = np.asarray(p, np.float32)
    g = np.stack([
        composite_sdf(p + np.eye(3, dtype=np.float32)[d] * eps)
        - composite_sdf(p - np.eye(3, dtype=np.float32)[d] * eps)
        for d in range(3)], axis=-1)
    return g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-12)


def composite_albedo(p: np.ndarray) -> np.ndarray:
    """Smoothly varying per-component albedo (texture for the RGB loss)."""
    p = np.asarray(p, np.float32)
    base = np.stack([
        0.55 + 0.25 * np.sin(14.0 * p[..., 0]),
        0.45 + 0.25 * np.sin(11.0 * p[..., 1] + 1.3),
        0.50 + 0.30 * np.sin(9.0 * p[..., 2] + 2.1)], axis=-1)
    return np.clip(base, 0.05, 1.0).astype(np.float32)


def composite_norm(sphere_scale: float = 1.0):
    """Reference-exact unit-sphere normalization of the composite scene.

    Mirrors `rnb_neus2/scaling.py:9-34 compute_unit_sphere_scaling` (the
    prep stage EVERY real scene passes before the testbed sees it):
    centroid of the GT surface points, 99th-percentile outlier rejection,
    re-centered mean, scale so the max distance = sphere_scale in RAW
    coords. Returns (center (3,), k) in UNIT-cube terms: the normalized
    scene is p_v2 = (p_v1 − center)·k + 0.5, with k = 0.5·sphere_scale /
    max_dist — the GT surface fills the radius-0.5 ball of the unit cube,
    like every scene the reference pipeline ever trains. The original
    composite scene skipped this normalization (object radius ≈ 0.23,
    half the world scale the reference operates at) — the round-4
    missing-geometry dissection traced the reconstruction stall to that
    out-of-envelope scaling (DESIGN.md round-5 chapter)."""
    V, _ = composite_gt_mesh(96)
    centroid = V.mean(0)
    d = np.linalg.norm(V - centroid, axis=1)
    inl = V[d <= np.percentile(d, 99)]
    c = inl.mean(0)
    max_dist = float(np.max(np.linalg.norm(inl - c, axis=1)))
    return c.astype(np.float32), 0.5 * sphere_scale / max_dist


def composite_sdf_v2(p: np.ndarray, norm) -> np.ndarray:
    """SDF of the unit-sphere-normalized scene (exact under uniform
    scaling: d_v2(p) = k·d_v1(center + (p−0.5)/k))."""
    c, k = norm
    return composite_sdf(c + (np.asarray(p, np.float32) - 0.5) / k) * k


def render_composite_views(cams: Cameras, max_iters: int = 96,
                           norm=None, t_max: float = None):
    """Sphere-traced analytic render → (normals_cam, albedo, alphas).

    norm=(center, k) renders the unit-sphere-normalized scene
    (composite_norm); albedo is evaluated at the ORIGINAL scene point so
    the texture is identical across scalings."""
    W, H = cams.resolution
    n_views = cams.rot_c2w.shape[0]
    rots = np.asarray(cams.rot_c2w)
    origins = np.asarray(cams.origin)
    focal = np.asarray(cams.focal)
    pp = np.asarray(cams.principal)
    u = (np.arange(W) + 0.5) / W
    v = (np.arange(H) + 0.5) / H
    uu, vv = np.meshgrid(u, v)
    if t_max is None:
        t_max = 3.0 if norm is None else float(
            np.max(np.linalg.norm(origins - 0.5, axis=-1)) + 1.0)
    if norm is None:
        sdf_fn = composite_sdf
        unmap = lambda p: p
    else:
        c, k = norm
        sdf_fn = lambda p: composite_sdf_v2(p, norm)
        unmap = lambda p: c + (p - 0.5) / k

    normals = np.zeros((n_views, H, W, 3), np.float32)
    albedo = np.zeros((n_views, H, W, 3), np.float32)
    alphas = np.zeros((n_views, H, W), np.float32)
    for i in range(n_views):
        d_cam = np.stack([
            (uu - pp[i, 0]) * W / focal[i, 0],
            (vv - pp[i, 1]) * H / focal[i, 1],
            np.ones_like(uu)], axis=-1)
        d = d_cam @ rots[i].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = d.reshape(-1, 3)
        o = origins[i][None, :]
        t = np.full((d.shape[0],), 0.05, np.float32)
        alive = np.ones_like(t, bool)
        for _ in range(max_iters):
            s = sdf_fn(o + t[:, None] * d)
            hit_now = s < 5e-5
            t = np.where(alive & ~hit_now, t + np.maximum(s, 1e-4), t)
            alive &= t < t_max
        s = sdf_fn(o + t[:, None] * d)
        hit = (s < 2e-3) & (t < t_max)
        p = o + t[:, None] * d
        n_world = composite_normal(unmap(p))
        n_cam = np.einsum("nd,dk->nk", n_world, rots[i])
        normals[i] = np.where(hit[:, None], n_cam,
                              np.array([-1.0, 1.0, 1.0]) / np.sqrt(3.0)
                              ).reshape(H, W, 3)
        albedo[i] = (composite_albedo(unmap(p)) * hit[:, None]
                     ).reshape(H, W, 3)
        alphas[i] = hit.astype(np.float32).reshape(H, W)
    return normals, albedo, alphas


def composite_dataset(n_views: int = 20, width: int = 512, height: int = 612,
                      cam_radius: float = 1.6,
                      focal: float = 900.0) -> TrainingDataset:
    cams = ring_cameras(n_views, cam_radius, width, height, focal)
    normals, albedo, alphas = render_composite_views(cams)
    return build_dataset(cams, normals, albedo, alphas, alphas, SceneMeta())


# v2 camera defaults: ring radius ≈ the v1 cameras after the unit-sphere
# scaling (1.6·k ≈ 3.4), focal chosen so the radius-0.5 object projects to
# ~90% of the image half-width — the tight DiLiGenT-MV-style framing
# (612×512 crops, object filling most of the frame) that the v1 scene's
# 900-focal wide shot lacked (in-mask fraction 8% vs ~25-30% real).
COMPOSITE_V2_CAM_RADIUS = 3.4
COMPOSITE_V2_FOCAL = 1550.0


def composite_dataset_v2(n_views: int = 20, width: int = 512,
                         height: int = 612,
                         cam_radius: float = COMPOSITE_V2_CAM_RADIUS,
                         focal: float = COMPOSITE_V2_FOCAL,
                         sphere_scale: float = 1.0) -> TrainingDataset:
    """Unit-sphere-normalized composite scene (composite_norm): the
    representative stand-in — world scale and framing statistics match
    what the reference's prep (scaling.py) + DiLiGenT-style capture hand
    the testbed."""
    norm = composite_norm(sphere_scale)
    cams = ring_cameras(n_views, cam_radius, width, height, focal)
    normals, albedo, alphas = render_composite_views(cams, 128, norm)
    return build_dataset(cams, normals, albedo, alphas, alphas, SceneMeta())


def composite_gt_mesh_v2(resolution: int = 384, sphere_scale: float = 1.0):
    """GT mesh of the normalized scene, unit-cube coords."""
    from ..mesh.marching import marching_cubes_grid

    norm = composite_norm(sphere_scale)
    ax = np.linspace(0.0, 1.0, resolution + 1, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = composite_sdf_v2(np.stack([X, Y, Z], axis=-1), norm)
    return marching_cubes_grid(-vol, (0.0, 0.0, 0.0), 1.0 / resolution, 0.0)


def composite_gt_mesh(resolution: int = 384):
    """GT mesh of the analytic scene via table marching cubes."""
    from ..mesh.marching import marching_cubes_grid

    ax = np.linspace(0.0, 1.0, resolution + 1, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = composite_sdf(np.stack([X, Y, Z], axis=-1))
    return marching_cubes_grid(-vol, (0.0, 0.0, 0.0), 1.0 / resolution, 0.0)


def write_prepared_composite_scene(out_dir, n_views: int = 20,
                                   width: int = 512, height: int = 612,
                                   cam_radius: float = 1.6,
                                   focal: float = 900.0,
                                   normalized: bool = False,
                                   sphere_scale: float = 1.0):
    """Materialize the composite scene as a prepared directory
    (transform.json + 16-bit RGBA normal/albedo PNGs), the exact input
    contract of the reference's stage-1 testbed (SURVEY §2.1).
    normalized=True applies the reference-exact unit-sphere scaling +
    v2 framing (composite_norm / composite_dataset_v2)."""
    import json
    import os

    from ..io import image_io

    norm = None
    if normalized:
        norm = composite_norm(sphere_scale)
        if cam_radius == 1.6:
            cam_radius = COMPOSITE_V2_CAM_RADIUS
        if focal == 900.0:
            focal = COMPOSITE_V2_FOCAL
    cams = ring_cameras(n_views, cam_radius, width, height, focal)
    normals, albedo, alphas = render_composite_views(cams, 128, norm)
    os.makedirs(os.path.join(out_dir, "normals"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "albedos"), exist_ok=True)
    frames = []
    rots = np.asarray(cams.rot_c2w)
    origins = np.asarray(cams.origin)
    for i in range(n_views):
        stored = normals[i] * np.array([1.0, -1.0, -1.0])
        png = np.concatenate([(stored + 1.0) / 2.0, alphas[i][..., None]],
                             axis=-1)
        name = f"{i:05d}.png"
        image_io.save_image(png, os.path.join(out_dir, "normals", name), 16)
        image_io.save_image(
            np.concatenate([albedo[i], alphas[i][..., None]], axis=-1),
            os.path.join(out_dir, "albedos", name), 16)
        c2w = np.eye(4)
        c2w[:3, :3] = rots[i]
        c2w[:3, 3] = (origins[i] - 0.5) / 0.5
        K = np.eye(4)
        K[0, 0] = K[1, 1] = focal
        K[0, 2], K[1, 2] = width / 2.0, height / 2.0
        frames.append({"albedo_path": f"albedos/{name}",
                       "normal_path": f"normals/{name}",
                       "transform_matrix": c2w.tolist(),
                       "intrinsic_matrix": K.tolist()})
    tj = {"w": width, "h": height, "aabb_scale": 1.0, "scale": 0.5,
          "offset": [0.5, 0.5, 0.5], "from_na": True,
          "n2w": np.eye(4).tolist(), "frames": frames}
    with open(os.path.join(out_dir, "transform.json"), "w") as f:
        json.dump(tj, f)
    return out_dir
