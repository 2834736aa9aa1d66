"""In-memory training dataset: decoded images + cameras on device.

Replaces the reference's NerfDataset GPU upload path
(src/nerf_loader.cu:392-763): parses transform.json (the prepare.py
interchange format — keys w,h,scale,offset,from_na,n2w,frames[] with
transform_matrix (c2w) + intrinsic_matrix), applies the from_na camera
convention (rotation unchanged, translation → scale·t + offset,
nerf_loader.h:180-201), and pre-decodes every texel to the exact values the
loss kernel would compute (image_io.decode_*), so the training sampler is a
pure gather.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..geom.camera import Cameras
from . import image_io


@dataclass
class SceneMeta:
    """Everything needed to undo the unit-cube normalization at export."""

    scale: float = 0.5
    offset: tuple = (0.5, 0.5, 0.5)
    from_na: bool = True
    n2w_scale: float = 1.0
    n2w_translation: tuple = (0.0, 0.0, 0.0)
    aabb_scale: float = 1.0


@dataclass
class TrainingDataset:
    cameras: Cameras
    normals: jnp.ndarray        # (N, H, W, 3) decoded unit normals
    albedos: jnp.ndarray        # (N, H, W, 3) decoded albedo values
    alpha_normal: jnp.ndarray   # (N, H, W) float
    alpha_albedo: jnp.ndarray   # (N, H, W) float
    skip_candidate: jnp.ndarray  # (N, H, W) bool: premultiplied red ≤ 0
    meta: SceneMeta = field(default_factory=SceneMeta)

    @property
    def n_images(self) -> int:
        return self.normals.shape[0]

    @property
    def resolution(self):
        return self.cameras.resolution


def _decode_view(raw16: np.ndarray, is_normal: bool):
    rgb = raw16[..., :3].astype(np.float32) / 65535.0
    alpha = raw16[..., 3].astype(np.float32) / 65535.0
    if is_normal:
        value = image_io.decode_normal(rgb, alpha)
    else:
        value = image_io.decode_texel(rgb, alpha)
    return value, alpha


def load_transform_json(scene_dir: str) -> TrainingDataset:
    """Load a prepared scene directory containing transform.json."""
    path = os.path.join(scene_dir, "transform.json")
    with open(path) as f:
        tj = json.load(f)

    scale = float(tj.get("scale", 0.5))
    offset = tuple(tj.get("offset", [0.5, 0.5, 0.5]))
    from_na = bool(tj.get("from_na", False))
    n2w = np.asarray(tj.get("n2w", np.eye(4)), np.float32)
    meta = SceneMeta(scale=scale, offset=offset, from_na=from_na,
                     n2w_scale=float(n2w[0, 0]),
                     n2w_translation=tuple(float(v) for v in n2w[:3, 3]),
                     aabb_scale=float(tj.get("aabb_scale", 1.0)))

    W, H = int(tj["w"]), int(tj["h"])
    rots, origins, focals, pps = [], [], [], []
    normals, albedos, a_n, a_a, skips = [], [], [], [], []
    for fr in tj["frames"]:
        c2w = np.asarray(fr["transform_matrix"], np.float32)
        K = np.asarray(fr["intrinsic_matrix"], np.float32)
        rot = c2w[:3, :3].copy()
        t = c2w[:3, 3] * scale + np.asarray(offset, np.float32)
        if not from_na:
            # instant-ngp convention: flip y,z columns then cycle rows
            rot[:, 1] *= -1
            rot[:, 2] *= -1
            rot = rot[[1, 2, 0], :]
            t = t[[1, 2, 0]]
        rots.append(rot)
        origins.append(t)
        focals.append([K[0, 0], K[1, 1]])
        pps.append([K[0, 2] / W, K[1, 2] / H])

        nrm_raw = image_io.load_image_raw16(
            os.path.join(scene_dir, fr["normal_path"]))
        alb_path = fr.get("albedo_path")
        if alb_path and os.path.exists(os.path.join(scene_dir, alb_path)):
            alb_raw = image_io.load_image_raw16(
                os.path.join(scene_dir, alb_path))
        else:
            alb_raw = np.full_like(nrm_raw, 65535)
        n_val, n_alpha = _decode_view(nrm_raw, is_normal=True)
        a_val, a_alpha = _decode_view(alb_raw, is_normal=False)
        normals.append(n_val)
        albedos.append(a_val)
        a_n.append(n_alpha)
        a_a.append(a_alpha)
        skips.append((nrm_raw[..., 0] == 0) | (nrm_raw[..., 3] == 0))

    # top-level lens distortion, shared by all frames like the reference
    # (nerf_loader.cu:432-497: k1/k2/p1/p2 → Iterative mode if any key is
    # nonzero; ftheta_p0..p4 + w/h → FTheta)
    n_frames = len(tj["frames"])
    distortion = None
    ftheta = None
    k = [float(tj.get(key, 0.0)) for key in ("k1", "k2", "p1", "p2")]
    if any(v != 0.0 for v in k):
        distortion = jnp.broadcast_to(
            jnp.asarray(k, jnp.float32), (n_frames, 4))
    if "ftheta_p0" in tj:
        ftheta = jnp.asarray(
            [float(tj[f"ftheta_p{i}"]) for i in range(5)] + [W, H],
            jnp.float32)

    cams = Cameras(
        rot_c2w=jnp.asarray(np.stack(rots)),
        origin=jnp.asarray(np.stack(origins)),
        focal=jnp.asarray(np.stack(focals), jnp.float32),
        principal=jnp.asarray(np.stack(pps), jnp.float32),
        resolution=(W, H),
        distortion=distortion,
        ftheta=ftheta,
    )
    alpha_n = np.stack(a_n)
    return TrainingDataset(
        cameras=cams,
        normals=jnp.asarray(np.stack(normals)),
        albedos=jnp.asarray(np.stack(albedos)),
        alpha_normal=jnp.asarray(alpha_n),
        alpha_albedo=jnp.asarray(np.stack(a_a)),
        skip_candidate=jnp.asarray(np.stack(skips)),
        meta=meta,
    )


def build_dataset(cameras: Cameras, normals, albedos, alpha_normal,
                  alpha_albedo, meta: Optional[SceneMeta] = None
                  ) -> TrainingDataset:
    """Assemble a dataset from already-decoded arrays (tests, synthetic).

    The black-pixel skip candidate (premultiplied linear red ≤ 0 in the raw
    normal texel, testbed_nerf.cu:1264-1266) reduces to alpha == 0 for
    synthetic data whose in-mask normals have nonzero red.
    """
    normals = np.asarray(normals, np.float32)
    alpha_n = np.asarray(alpha_normal, np.float32)
    return TrainingDataset(
        cameras=cameras,
        normals=jnp.asarray(normals),
        albedos=jnp.asarray(np.asarray(albedos, np.float32)),
        alpha_normal=jnp.asarray(alpha_n),
        alpha_albedo=jnp.asarray(np.asarray(alpha_albedo, np.float32)),
        skip_candidate=jnp.asarray(alpha_n <= 0.0),
        meta=meta or SceneMeta(),
    )
