"""Error-map importance sampling (reference: the error_map/CDF machinery in
src/testbed_nerf.cu:1802-1831 splat, :2435-2497 CDF construction, host logic
src/testbed.cu train_nerf :3600-3725).

Per-image error maps accumulate the per-ray color loss (bilinear splat);
every `n_steps_between_error_map_updates` (128 initially, ×1.5 after each
rebuild) the maps become sampling CDFs:

- cdf_x_cond_y: per-row normalized prefix sums;
- cdf_y: per-image row marginals;
- cdf_img: across images, blended with a uniform floor
  MIN_PMF = 0.1 (testbed.cu:3712-3718);
- resolution = min(image res, ceil(√√(samples_per_image))·3.5)
  (testbed.cu:3642-3644).

Sampling inverts the CDFs per ray (uniform within the chosen texel — the
reference linearly interpolates the CDF, a piecewise-linear vs our
piecewise-constant pdf within one error-map texel; documented divergence).
The per-ray pdf divides the LOGGED loss only (the gradient keeps the
importance weighting, testbed_nerf.cu:1782-1801).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MIN_IMG_PMF = 0.1


class ErrorMapState(NamedTuple):
    accum: jnp.ndarray        # (N, EH, EW) accumulated loss since rebuild
    cdf_x: jnp.ndarray        # (N, EH, EW) per-row CDF
    cdf_y: jnp.ndarray        # (N, EH) row CDF per image
    cdf_img: jnp.ndarray      # (N,) image CDF
    pmf_img: jnp.ndarray      # (N,) image pmf (for the logged-loss divide)
    valid: jnp.ndarray        # () bool — CDFs built at least once


def resolution_for(n_images: int, rays_per_batch: int,
                   update_interval: int, image_res: Tuple[int, int]
                   ) -> Tuple[int, int]:
    spp = update_interval * rays_per_batch / max(n_images, 1)
    r = int(math.sqrt(math.sqrt(spp)) * 3.5)
    return (max(2, min(r, image_res[0])), max(2, min(r, image_res[1])))


def init_state(n_images: int, ew: int, eh: int) -> ErrorMapState:
    uni_x = jnp.broadcast_to(
        (jnp.arange(ew, dtype=jnp.float32) + 1) / ew, (n_images, eh, ew))
    uni_y = jnp.broadcast_to(
        (jnp.arange(eh, dtype=jnp.float32) + 1) / eh, (n_images, eh))
    return ErrorMapState(
        accum=jnp.zeros((n_images, eh, ew), jnp.float32),
        cdf_x=uni_x, cdf_y=uni_y,
        cdf_img=(jnp.arange(n_images, dtype=jnp.float32) + 1) / n_images,
        pmf_img=jnp.full((n_images,), 1.0 / n_images),
        valid=jnp.zeros((), bool),
    )


def splat(state: ErrorMapState, img: jnp.ndarray, xy: jnp.ndarray,
          loss: jnp.ndarray) -> ErrorMapState:
    """Bilinear accumulation of per-ray losses (testbed_nerf.cu:1802-1831)."""
    n, eh, ew = state.accum.shape
    px = jnp.clip(xy[:, 0] * ew - 0.5, 0.0, ew - 1.0 - 1e-4)
    py = jnp.clip(xy[:, 1] * eh - 0.5, 0.0, eh - 1.0 - 1e-4)
    x0 = px.astype(jnp.int32)
    y0 = py.astype(jnp.int32)
    fx, fy = px - x0, py - y0
    flat = state.accum.reshape(-1)
    base = (img * eh + y0) * ew + x0
    flat = flat.at[base].add(loss * (1 - fx) * (1 - fy), mode="drop")
    flat = flat.at[base + 1].add(loss * fx * (1 - fy), mode="drop")
    flat = flat.at[base + ew].add(loss * (1 - fx) * fy, mode="drop")
    flat = flat.at[base + ew + 1].add(loss * fx * fy, mode="drop")
    return state._replace(accum=flat.reshape(n, eh, ew))


def rebuild(state: ErrorMapState) -> ErrorMapState:
    """Accumulated errors → sampling CDFs; accumulator reset."""
    n, eh, ew = state.accum.shape
    m = state.accum + 1e-10
    row_sum = m.sum(axis=2)                                 # (N, EH)
    cdf_x = jnp.cumsum(m, axis=2) / row_sum[:, :, None]
    img_sum = row_sum.sum(axis=1)                           # (N,)
    cdf_y = jnp.cumsum(row_sum, axis=1) / img_sum[:, None]
    pmf = img_sum / img_sum.sum()
    pmf = (1 - MIN_IMG_PMF) * pmf + MIN_IMG_PMF / n
    cdf_img = jnp.cumsum(pmf)
    return ErrorMapState(accum=jnp.zeros_like(state.accum), cdf_x=cdf_x,
                         cdf_y=cdf_y, cdf_img=cdf_img, pmf_img=pmf,
                         valid=jnp.ones((), bool))


def sample(state: ErrorMapState, key: jax.Array, n_rays: int):
    """→ (img (R,), xy (R,2) in [0,1)², pdf (R,)) by CDF inversion; falls
    back to the stratified-uniform scheme until the first rebuild."""
    n, eh, ew = state.accum.shape
    k_i, k_y, k_x, k_u = jax.random.split(key, 4)
    u_img = jax.random.uniform(k_i, (n_rays,))
    u_y = jax.random.uniform(k_y, (n_rays,))
    u_x = jax.random.uniform(k_x, (n_rays,))
    jit_xy = jax.random.uniform(k_u, (n_rays, 2))

    img_is = jnp.searchsorted(state.cdf_img, u_img).astype(jnp.int32)
    img_is = jnp.minimum(img_is, n - 1)
    rows_cdf = state.cdf_y[img_is]                          # (R, EH)
    y_idx = jax.vmap(jnp.searchsorted)(rows_cdf, u_y).astype(jnp.int32)
    y_idx = jnp.minimum(y_idx, eh - 1)
    x_cdf = state.cdf_x[img_is, y_idx]                      # (R, EW)
    x_idx = jax.vmap(jnp.searchsorted)(x_cdf, u_x).astype(jnp.int32)
    x_idx = jnp.minimum(x_idx, ew - 1)

    xy_is = jnp.stack([(x_idx + jit_xy[:, 0]) / ew,
                       (y_idx + jit_xy[:, 1]) / eh], axis=1)
    # piecewise-constant pdf of the drawn texel
    pmf_x = x_cdf[jnp.arange(n_rays), x_idx] - jnp.where(
        x_idx > 0, x_cdf[jnp.arange(n_rays), x_idx - 1], 0.0)
    pmf_y = rows_cdf[jnp.arange(n_rays), y_idx] - jnp.where(
        y_idx > 0, rows_cdf[jnp.arange(n_rays), y_idx - 1], 0.0)
    pdf_is = (state.pmf_img[img_is] * n) * (pmf_y * eh) * (pmf_x * ew)

    # uniform fallback (pre-first-rebuild): stratified images, uniform xy
    img_u = ((jnp.arange(n_rays) * n) // n_rays).astype(jnp.int32)
    use_is = state.valid
    img = jnp.where(use_is, img_is, img_u)
    xy = jnp.where(use_is, xy_is, jit_xy)
    pdf = jnp.where(use_is, pdf_is, 1.0)
    return img, xy, pdf
