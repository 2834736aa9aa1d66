"""Trainable environment-map background (lat-long RGBA texture).

Equivalent of the reference's envmap (include/…/envmap.cuh): a
(H, W, 4) equirectangular texture sampled by ray direction —

- direction swizzled to (z, −x, y) then mapped to cylindrical-equal-area
  unorm coordinates (envmap.cuh read_envmap → dir_to_spherical_unorm,
  common_device.cuh);
- bilinear filtering with x (azimuth) wrap-around and y (polar) clamp
  (envmap.cuh:38-63);
- trainable: the reference deposits bilinear gradients with a bespoke
  atomic kernel (deposit_envmap_gradient, envmap.cuh:69-104); here the
  sample is pure jnp gather+lerp so `jax.grad` produces exactly that
  scatter — no custom kernel needed.

Used as the background term of the compositor: color += T_final·envmap(d).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_envmap(height: int = 16, width: int = 32,
                value: float = 0.5) -> jnp.ndarray:
    """Constant-gray RGBA envmap (alpha 1)."""
    e = jnp.full((height, width, 4), value, jnp.float32)
    return e.at[..., 3].set(1.0)


def dir_to_spherical_unorm(d: jnp.ndarray) -> jnp.ndarray:
    """Unit direction → (polar, azimuth) in [0,1]² (common_device.cuh).

    polar = acos(z')/π with the reference's swizzle already applied by the
    caller; azimuth = atan2(y', x')/(2π) + 0.5.
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    polar = jnp.arccos(jnp.clip(z, -1.0, 1.0)) / jnp.pi
    azimuth = jnp.arctan2(y, x) / (2.0 * jnp.pi) + 0.5
    return jnp.stack([polar, azimuth], axis=-1)


def sample_envmap(envmap: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear envmap lookup by ray direction.

    envmap: (H, W, 4); dirs: (..., 3) unit vectors (world).
    Returns (..., 4). Differentiable in `envmap`.
    """
    H, W = envmap.shape[0], envmap.shape[1]
    # reference swizzle: dir_to_spherical_unorm({z, -x, y}) (envmap.cuh:31)
    sw = jnp.stack([dirs[..., 2], -dirs[..., 0], dirs[..., 1]], axis=-1)
    uv = dir_to_spherical_unorm(sw)                       # (..., 2) polar, az
    fx = uv[..., 1] * (W - 1)                             # azimuth → x
    fy = uv[..., 0] * (H - 1)                             # polar → y
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    wx = fx - x0
    wy = fy - y0

    def at(xi, yi):
        xi = jnp.mod(xi, W)                               # azimuth wraps
        yi = jnp.clip(yi, 0, H - 1)                       # polar clamps
        return envmap[yi, xi]

    return ((1 - wx)[..., None] * (1 - wy)[..., None] * at(x0, y0)
            + wx[..., None] * (1 - wy)[..., None] * at(x0 + 1, y0)
            + (1 - wx)[..., None] * wy[..., None] * at(x0, y0 + 1)
            + wx[..., None] * wy[..., None] * at(x0 + 1, y0 + 1))


def background_color(envmap: jnp.ndarray | None, dirs: jnp.ndarray,
                     default=(1.0, 1.0, 1.0)) -> jnp.ndarray:
    """RGB background per ray: envmap sample or a constant."""
    if envmap is None:
        return jnp.broadcast_to(jnp.asarray(default, jnp.float32),
                                dirs.shape[:-1] + (3,))
    return sample_envmap(envmap, dirs)[..., :3]
