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

Sampling mirrors sample_cdf_2d (testbed_nerf.cu:1115-1148) exactly:

- with probability UNIFORM_SAMPLING_FRACTION = 0.5 (on u_x) the pixel is
  drawn uniformly, ignoring the CDFs (the rescaled residual of u covers
  the texel);
- otherwise CDF inversion per axis, where the intra-texel position is the
  rescaled residual (u − cdf[i−1]) / pmf_i — i.e. a piecewise-constant
  pdf per texel (NOT an interpolated CDF);
- the image index always comes from cdf_img (image_idx, :1194-1206).

The NeuS2 fork does NOT divide either the gradient or the logged loss by
the sampling pdf (testbed_nerf.cu:1780-1790, the upstream divide is
commented out), and splats the raw per-ray loss into the error map; the
pdf returned here is the reference's pdf_2d mixture density, kept for
diagnostics only.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MIN_IMG_PMF = 0.1
# per-texel / per-row uniform floor (testbed_nerf.cu:2433 MIN_PDF)
MIN_PDF = 0.01
# fraction of rays whose pixel is drawn uniformly instead of from the
# error-map CDF (sample_cdf_2d, testbed_nerf.cu:1115)
UNIFORM_SAMPLING_FRACTION = 0.5


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
    """Accumulated errors → sampling CDFs; accumulator reset.

    Every CDF level gets the reference's uniform floor blended in
    (construct_cdf_2d/1d, testbed_nerf.cu:2433-2489): per-texel and
    per-row MIN_PDF = 0.01, per-image MIN_PMF = 0.1 — guarantees full
    coverage no matter how peaked the accumulated error is."""
    n, eh, ew = state.accum.shape
    m = state.accum + 1e-10
    row_sum = m.sum(axis=2)                                 # (N, EH)
    cdf_x = (1 - MIN_PDF) * jnp.cumsum(m, axis=2) / row_sum[:, :, None] \
        + MIN_PDF * (jnp.arange(ew, dtype=jnp.float32) + 1) / ew
    img_sum = row_sum.sum(axis=1)                           # (N,)
    cdf_y = (1 - MIN_PDF) * jnp.cumsum(row_sum, axis=1) / img_sum[:, None] \
        + MIN_PDF * (jnp.arange(eh, dtype=jnp.float32) + 1) / eh
    pmf = img_sum / img_sum.sum()
    pmf = (1 - MIN_IMG_PMF) * pmf + MIN_IMG_PMF / n
    cdf_img = jnp.cumsum(pmf)
    return ErrorMapState(accum=jnp.zeros_like(state.accum), cdf_x=cdf_x,
                         cdf_y=cdf_y, cdf_img=cdf_img, pmf_img=pmf,
                         valid=jnp.ones((), bool))


def sample(state: ErrorMapState, key: jax.Array, n_rays: int,
           image_proportional: bool = True,
           focal_proportional: bool = True):
    """→ (img (R,), xy (R,2) in [0,1)², pdf (R,)): sample_cdf_2d
    (testbed_nerf.cu:1115-1148) vectorized; falls back to the
    stratified-uniform scheme until the first rebuild.

    image_proportional / focal_proportional mirror the pyngp knobs
    (testbed.h:663-664; both DEFAULT FALSE in the reference — callers
    must opt in). Off → stratified image choice (image_idx) / uniform
    pixel position, exactly the cdf==nullptr kernel paths."""
    n, eh, ew = state.accum.shape
    if not (image_proportional or focal_proportional):
        k_x, k_y = jax.random.split(key, 2)
        img = ((jnp.arange(n_rays) * n) // n_rays).astype(jnp.int32)
        xy = jnp.stack([jax.random.uniform(k_x, (n_rays,)),
                        jax.random.uniform(k_y, (n_rays,))], axis=1)
        return img, xy, jnp.ones((n_rays,), jnp.float32)
    k_i, k_y, k_x = jax.random.split(key, 3)
    u_img = jax.random.uniform(k_i, (n_rays,))
    u_y = jax.random.uniform(k_y, (n_rays,))
    u_x = jax.random.uniform(k_x, (n_rays,))

    if image_proportional:
        img_is = jnp.searchsorted(state.cdf_img, u_img).astype(jnp.int32)
        img_is = jnp.minimum(img_is, n - 1)
    else:
        img_is = ((jnp.arange(n_rays) * n) // n_rays).astype(jnp.int32)

    # uniform branch (u_x < 0.5): pixel uniform, residual covers the texel
    uniform = u_x < UNIFORM_SAMPLING_FRACTION
    ux_uni = u_x / UNIFORM_SAMPLING_FRACTION
    ux_cdf = (u_x - UNIFORM_SAMPLING_FRACTION) \
        / (1.0 - UNIFORM_SAMPLING_FRACTION)

    rows_cdf = state.cdf_y[img_is]                          # (R, EH)
    y_idx = jax.vmap(jnp.searchsorted)(rows_cdf, u_y).astype(jnp.int32)
    y_idx = jnp.minimum(y_idx, eh - 1)
    x_cdf = state.cdf_x[img_is, y_idx]                      # (R, EW)
    x_idx = jax.vmap(jnp.searchsorted)(x_cdf, ux_cdf).astype(jnp.int32)
    x_idx = jnp.minimum(x_idx, ew - 1)

    ar = jnp.arange(n_rays)
    cy_prev = jnp.where(y_idx > 0, rows_cdf[ar, jnp.maximum(y_idx - 1, 0)],
                        0.0)
    pmf_y = rows_cdf[ar, y_idx] - cy_prev
    cx_prev = jnp.where(x_idx > 0, x_cdf[ar, jnp.maximum(x_idx - 1, 0)],
                        0.0)
    pmf_x = x_cdf[ar, x_idx] - cx_prev
    # intra-texel position = rescaled inversion residual (:1130-1141)
    ry = jnp.clip((u_y - cy_prev) / jnp.maximum(pmf_y, 1e-12), 0.0, 1.0)
    rx = jnp.clip((ux_cdf - cx_prev) / jnp.maximum(pmf_x, 1e-12), 0.0, 1.0)
    xy_cdf = jnp.stack([(x_idx + rx) / ew, (y_idx + ry) / eh], axis=1)
    xy_is = jnp.where(uniform[:, None],
                      jnp.stack([ux_uni, u_y], axis=1), xy_cdf)
    # mixture density at the RETURNED pixel (pdf_2d, :1150-1169) × image
    # pmf — diagnostics only (the loss uses no pdf division)
    tx = jnp.clip((xy_is[:, 0] * ew).astype(jnp.int32), 0, ew - 1)
    ty = jnp.clip((xy_is[:, 1] * eh).astype(jnp.int32), 0, eh - 1)
    pmf_y_at = rows_cdf[ar, ty] - jnp.where(
        ty > 0, rows_cdf[ar, jnp.maximum(ty - 1, 0)], 0.0)
    x_cdf_at = state.cdf_x[img_is, ty]                      # (R, EW)
    pmf_x_at = x_cdf_at[ar, tx] - jnp.where(
        tx > 0, x_cdf_at[ar, jnp.maximum(tx - 1, 0)], 0.0)
    pdf_img_f = state.pmf_img[img_is] * n if image_proportional else 1.0
    pdf_xy_f = (UNIFORM_SAMPLING_FRACTION
                + (pmf_y_at * eh) * (pmf_x_at * ew)
                * (1.0 - UNIFORM_SAMPLING_FRACTION))
    if not focal_proportional:
        xy_is = jnp.stack([u_x, u_y], axis=1)
        pdf_xy_f = 1.0
    pdf_is = pdf_img_f * pdf_xy_f

    # uniform fallback (pre-first-rebuild): stratified images, uniform xy
    img_u = ((jnp.arange(n_rays) * n) // n_rays).astype(jnp.int32)
    use_is = state.valid
    img = jnp.where(use_is, img_is, img_u)
    xy = jnp.where(use_is, xy_is, jnp.stack([u_x, u_y], axis=1))
    pdf = jnp.where(use_is, pdf_is, 1.0)
    return img, xy, pdf
