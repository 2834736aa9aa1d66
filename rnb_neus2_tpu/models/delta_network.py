"""Global rigid-motion model for dynamic scenes (DeltaNetwork).

Reference: include/neural-graphics-primitives/transform_network.h (6D
rotation representation, rotation_reprensentation=1) + src/rotation.cu
(`rotation_6d_to_matrix` Gram-Schmidt, :16-40). The reference trains a
per-frame rigid transform applied to ray origins/directions
(global_movement_with_rotation_6d, testbed_nerf.cu:162-230) with its own
optimizer chain (configs base.json "globalmove"), and accumulates frame
transforms for the final mesh (transform_mesh_with_6d,
testbed_nerf.cu:4316-4326). For static RNb scenes the transform stays
identity but is wired into every call path; here it is an optional,
fully-trainable component.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

IDENTITY_6D = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], jnp.float32)


def init_delta_params() -> Dict[str, jnp.ndarray]:
    return {"rotation6d": IDENTITY_6D,
            "translation": jnp.zeros((3,), jnp.float32)}


def rotation_6d_to_matrix(r6: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt: first two (unnormalized) rotation-matrix columns →
    orthonormal frame (rotation.cu:16-40; Zhou et al. continuity rep)."""
    a1, a2 = r6[:3], r6[3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1), 1e-12)
    a2p = a2 - jnp.dot(b1, a2) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=1)


def apply_rigid(delta: Dict[str, jnp.ndarray], origins: jnp.ndarray,
                dirs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Transform rays into the canonical frame
    (global_movement_with_rotation_6d)."""
    R = rotation_6d_to_matrix(delta["rotation6d"])
    o = origins @ R.T + delta["translation"]
    d = dirs @ R.T
    return o, d


def apply_rigid_points(delta: Dict[str, jnp.ndarray],
                       pts: jnp.ndarray) -> jnp.ndarray:
    R = rotation_6d_to_matrix(delta["rotation6d"])
    return pts @ R.T + delta["translation"]


def compose(acc: Dict[str, jnp.ndarray],
            delta: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Accumulate frame movements: x ↦ R_d(R_a x + t_a) + t_d
    (nerf_network.h:973-1081 accumulation buffers)."""
    Ra = rotation_6d_to_matrix(acc["rotation6d"])
    Rd = rotation_6d_to_matrix(delta["rotation6d"])
    R = Rd @ Ra
    t = Rd @ acc["translation"] + delta["translation"]
    return {"rotation6d": jnp.concatenate([R[:, 0], R[:, 1]]),
            "translation": t}


def inverse_transform_points(delta: Dict[str, jnp.ndarray],
                             pts: jnp.ndarray) -> jnp.ndarray:
    """Canonical → world (mesh vertices after training,
    transform_mesh_with_6d)."""
    R = rotation_6d_to_matrix(delta["rotation6d"])
    return (pts - delta["translation"]) @ R
