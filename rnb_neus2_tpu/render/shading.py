"""Synthetic light triplets and the RNb shading model.

The reference renders each ray under ONE of three synthetic directional
lights chosen at random (testbed_nerf.cu:1537-1593):

- canonical triplet: tilt 0°/120°/240°, slant 54.74°, pointing toward the
  camera (columns of L; testbed_nerf.cu:1537-1554);
- supernormal mode: identity triplet (light k = axis e_k), so the "color"
  equals the normal component (:1551-1554);
- opti-lights mode (stage 2): the triplet is rotated by the Rodrigues
  rotation taking +z to the per-pixel GT normal, then negated (:1563-1581) —
  lights follow the observed surface orientation.

Shading s = n·l (optionally ReLU'd, --relu), applied to the GT normal with
the CAMERA-frame light and to the predicted normal with the WORLD-frame
light l_world = R_c2w · l_cam (:1582-1593, :1700-1707).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def canonical_light_triplet() -> np.ndarray:
    """(3, 3) matrix, column k = camera-frame direction of light k."""
    tilt = np.radians([0.0, 120.0, 240.0])
    slant = np.radians([54.74, 54.74, 54.74])
    L = np.stack([
        -np.sin(slant) * np.cos(tilt),
        -np.sin(slant) * np.sin(tilt),
        -np.cos(slant),
    ], axis=0)
    return L.astype(np.float32)


def rodrigues_to_normal(normal_gt: jnp.ndarray) -> jnp.ndarray:
    """(R,3) GT normals → (R,3,3) rotations: R v rotates +z toward n.

    Axis k = normalize(−n_y, n_x, 0), cosθ = n_z
    (testbed_nerf.cu:1563-1581). Degenerate at n = ±z (the reference
    divides by ‖k‖ = 0 there too); we guard with an epsilon.
    """
    k = jnp.stack([-normal_gt[:, 1], normal_gt[:, 0],
                   jnp.zeros_like(normal_gt[:, 0])], axis=1)
    k = k / (jnp.linalg.norm(k, axis=1, keepdims=True) + 1e-12)
    cos_t = normal_gt[:, 2]
    sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t * cos_t, 0.0, 1.0))
    zeros = jnp.zeros_like(cos_t)
    K = jnp.stack([
        jnp.stack([zeros, -k[:, 2], k[:, 1]], axis=1),
        jnp.stack([k[:, 2], zeros, -k[:, 0]], axis=1),
        jnp.stack([-k[:, 1], k[:, 0], zeros], axis=1),
    ], axis=1)                                           # (R,3,3)
    KK = k[:, :, None] * k[:, None, :]
    eye = jnp.eye(3)[None]
    return cos_t[:, None, None] * eye + sin_t[:, None, None] * K \
        + (1.0 - cos_t)[:, None, None] * KK


def per_ray_lights(normal_gt: jnp.ndarray, light_idx: jnp.ndarray,
                   supernormal: bool, light_opti: bool) -> jnp.ndarray:
    """(R,3) camera-frame light for each ray's randomly chosen triplet slot."""
    if supernormal:
        L = jnp.eye(3, dtype=jnp.float32)
    else:
        L = jnp.asarray(canonical_light_triplet())
    lights = jnp.broadcast_to(L[None], (normal_gt.shape[0], 3, 3))
    if light_opti:
        R = rodrigues_to_normal(normal_gt)
        lights = -jnp.einsum("rij,rjk->rik", R, lights)
    # pick column light_idx
    return jnp.take_along_axis(
        lights, light_idx[:, None, None].astype(jnp.int32), axis=2)[:, :, 0]


def shade(normal: jnp.ndarray, light: jnp.ndarray,
          apply_relu: bool) -> jnp.ndarray:
    s = jnp.sum(normal * light, axis=-1)
    return jax.nn.relu(s) if apply_relu else s
