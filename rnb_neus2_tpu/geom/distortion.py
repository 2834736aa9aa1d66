"""Camera lens distortion (OpenCV radial/tangential + F-theta fisheye).

Reference: common_device.cuh — apply_camera_distortion (OpenCV k1..k4,
p1, p2 model), iterative_camera_undistortion (Newton with numeric central
differences, :162-199) and f_theta_undistortion (:231-244). The Newton
loop becomes a fixed-iteration lax.fori_loop (TPU-friendly; 10 analytic-
jacobian iterations match the reference's 100 numeric ones to float
precision on realistic coefficients)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_distortion(params: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """OpenCV model: params = [..., [k1, k2, p1, p2, (k3, k4)]]; returns
    (dx, dy) displacement such that distorted = (x+dx, y+dy). The leading
    dims of params broadcast against x/y (per-ray parameters from
    set_camera_intrinsics-style per-view distortion)."""
    k1, k2 = params[..., 0], params[..., 1]
    p1, p2 = params[..., 2], params[..., 3]
    k3 = params[..., 4] if params.shape[-1] > 4 else 0.0
    k4 = params[..., 5] if params.shape[-1] > 5 else 0.0
    x2, y2, xy = x * x, y * y, x * y
    r2 = x2 + y2
    radial = r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
    dx = x * radial + 2 * p1 * xy + p2 * (r2 + 2 * x2)
    dy = y * radial + 2 * p2 * xy + p1 * (r2 + 2 * y2)
    return dx, dy


def iterative_undistortion(params: jnp.ndarray, u: jnp.ndarray,
                           v: jnp.ndarray, n_iters: int = 10):
    """Invert apply_distortion by Newton iteration (vectorized over rays)."""

    def residual(xy):
        dx, dy = apply_distortion(params, xy[..., 0], xy[..., 1])
        return jnp.stack([xy[..., 0] + dx, xy[..., 1] + dy], axis=-1)

    x0 = jnp.stack([u, v], axis=-1)

    def body(_, x):
        # analytic jacobian of residual via jvp along both axes
        r = residual(x)
        e1 = jnp.zeros_like(x).at[..., 0].set(1.0)
        e2 = jnp.zeros_like(x).at[..., 1].set(1.0)
        _, j1 = jax.jvp(residual, (x,), (e1,))
        _, j2 = jax.jvp(residual, (x,), (e2,))
        # solve 2x2 J·step = (r − x0)
        a, b = j1[..., 0], j2[..., 0]
        c, d = j1[..., 1], j2[..., 1]
        det = a * d - b * c
        det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
        rx = r[..., 0] - x0[..., 0]
        ry = r[..., 1] - x0[..., 1]
        sx = (d * rx - b * ry) / det
        sy = (-c * rx + a * ry) / det
        return x - jnp.stack([sx, sy], axis=-1)

    x = jax.lax.fori_loop(0, n_iters, body, x0)
    return x[..., 0], x[..., 1]


def f_theta_undistortion(uv: jnp.ndarray, params: jnp.ndarray,
                         error_direction=(1000.0, 0.0, 0.0)):
    """F-theta fisheye: params = [r0..r4, resx, resy]; uv centered
    normalized coords → unit-ish direction (common_device.cuh:231-244)."""
    xpix = uv[..., 0] * params[5]
    ypix = uv[..., 1] * params[6]
    norm = jnp.sqrt(xpix * xpix + ypix * ypix)
    alpha = params[0] + norm * (params[1] + norm * (
        params[2] + norm * (params[3] + norm * params[4])))
    sin_a, cos_a = jnp.sin(alpha), jnp.cos(alpha)
    bad = (cos_a <= jnp.finfo(jnp.float32).tiny) | (norm == 0.0)
    s = sin_a / jnp.where(norm == 0, 1.0, norm)
    dir_ = jnp.stack([s * xpix, s * ypix, cos_a], axis=-1)
    err = jnp.broadcast_to(jnp.asarray(error_direction, dir_.dtype),
                           dir_.shape)
    return jnp.where(bad[..., None], err, dir_)
