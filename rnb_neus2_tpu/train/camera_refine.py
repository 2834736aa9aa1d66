"""Per-view camera refinement: extrinsics + exposure + focal length.

Reference capability (include/…/adam_optimizer.h per-image AdamOptimizer /
RotationAdamOptimizer, stepped in train_nerf src/testbed_nerf.cu:3761-3841;
toggles m_nerf.training.optimize_extrinsics / optimize_exposure /
optimize_focal_length, default OFF in the RNb pipeline). Here:

- extrinsics: a trainable SE(3) delta per view (axis-angle rotation +
  translation, like the reference's rot/pos adams) applied to that view's
  rays before marching; gradients flow through the differentiable sample
  positions (the same path the global-movement phase uses);
- exposure: per-view log2 RGB scale applied to the decoded GT values,
  value' = linear_to_srgb(2^e · srgb_to_linear(value)) — exactly the
  engine's exposure_scale·texsamp composition (testbed_nerf.cu:1504-1524)
  expressed on the pre-decoded images;
- focal length: ONE shared (fx, fy) relative offset for all views, like
  the reference's single cam_focal_length_offset AdamOptimizer<Vector2f>
  (testbed.h:613, stepped at testbed_nerf.cu:3799-3810): the effective
  focal is base·(1+offset), applied in camera space by rescaling the
  normalized-plane ray coordinates.

Trained jointly with the field by a dedicated Adam, mirroring
n_steps_between_cam_updates semantics at cadence 1.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax


class CameraRefineParams(NamedTuple):
    rot: jnp.ndarray        # (N, 3) axis-angle deltas
    trans: jnp.ndarray      # (N, 3)
    exposure: jnp.ndarray   # (N, 3) log2 RGB scales
    focal: jnp.ndarray      # (2,) shared relative (fx, fy) offset


def init_refine_params(n_views: int) -> CameraRefineParams:
    z = jnp.zeros((n_views, 3), jnp.float32)
    return CameraRefineParams(rot=z, trans=z, exposure=z,
                              focal=jnp.zeros((2,), jnp.float32))


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """(N,3) axis-angle → (N,3,3) via Rodrigues.

    theta uses a smoothed norm: the exact norm has a NaN gradient at the
    zero rotation, which is exactly where refinement starts."""
    theta = jnp.sqrt(jnp.sum(aa * aa, axis=-1, keepdims=True) + 1e-16)
    k = aa / theta
    zeros = jnp.zeros_like(k[..., 0])
    K = jnp.stack([
        jnp.stack([zeros, -k[..., 2], k[..., 1]], -1),
        jnp.stack([k[..., 2], zeros, -k[..., 0]], -1),
        jnp.stack([-k[..., 1], k[..., 0], zeros], -1),
    ], -2)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.eye(3)
    return eye + s * K + (1 - c) * (K @ K)


def refine_rays(params: CameraRefineParams, img: jnp.ndarray,
                ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                rot_c2w: jnp.ndarray | None = None):
    """Apply each ray's per-view SE(3) delta, and — when the per-view
    camera rotations are supplied — the shared focal offset: the
    effective focal fx·(1+offset) divides the normalized-plane ray
    coordinates, so the adjustment is a camera-space rescale of the
    direction's x/y before the extrinsic delta."""
    d = ray_d
    if rot_c2w is not None:
        dc = jnp.einsum("rji,rj->ri", rot_c2w, d)      # R_view^T · d
        dc = dc / dc[..., 2:3]
        scale = 1.0 + params.focal                     # (2,)
        dc = jnp.concatenate([dc[..., :2] / scale, dc[..., 2:]], axis=-1)
        d = jnp.einsum("rij,rj->ri", rot_c2w, dc)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    R = axis_angle_to_matrix(params.rot[img])          # (R,3,3)
    o = jnp.einsum("rij,rj->ri", R, ray_o) + params.trans[img]
    d = jnp.einsum("rij,rj->ri", R, d)
    return o, d


def exposure_adjust(params: CameraRefineParams, img: jnp.ndarray,
                    decoded: jnp.ndarray) -> jnp.ndarray:
    """Apply 2^exposure in linear space to pre-decoded values
    (exposure_scale = exp(ln2·e), testbed_nerf.cu:1504)."""
    scale = jnp.exp2(params.exposure[img])             # (R,3)
    lin = jnp.where(decoded <= 0.04045, decoded / 12.92,
                    ((decoded + 0.055) / 1.055) ** 2.4)
    lin = lin * scale
    return jnp.where(lin < 0.0031308, 12.92 * lin,
                     1.055 * jnp.clip(lin, 0, None) ** 0.41666 - 0.055)


def make_refiner(learning_rate: float = 1e-4):
    """Optimizer for the refinement params (the reference's per-image
    adams use comparable tiny rates, testbed.h camera lr defaults)."""
    return optax.adam(learning_rate, b1=0.9, b2=0.99, eps=1e-15)
