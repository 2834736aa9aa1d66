"""Image-space inference renderer (reference: Testbed::render_nerf,
src/testbed_nerf.cu:2772-2913 + NerfTracer::trace :2581-2702 +
composite_kernel_nerf :881-1216).

The reference traces rays in waves (compact alive rays, 1-8 steps per
round, ≤10000 rounds); here each pixel marches its full fixed ladder
against the occupancy grid in one vectorized pass (the same sampling the
trainer uses), then composites:

- color = albedo activation of the RGB head (the reference renders with
  rgb_activation on the first 3 outputs, :987 — no shading term);
- optional Lambertian shading with a given light (beyond-reference nicety);
- depth = Σ w·t; alpha = Σ w; early termination at T < min_transmittance.

Runs on the EMA (inference) params, matching the reference's
inference_params path.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MarchConfig
from ..geom.camera import Cameras, rays_from_pixels
from ..ops import ray_march
from . import losses, neus
from .envmap import background_color


def _upsample(img: np.ndarray, W: int, H: int) -> np.ndarray:
    """Bilinear upsample (H', W'[, C]) → (H, W[, C])."""
    h, w = img.shape[:2]
    ys = (np.arange(H) + 0.5) * h / H - 0.5
    xs = (np.arange(W) + 0.5) * w / W - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    if img.ndim == 3:
        fy = fy[..., None]
        fx = fx[..., None]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return ((1 - fy) * ((1 - fx) * a + fx * b)
            + fy * ((1 - fx) * c + fx * d)).astype(img.dtype)


def _downsample_box(img: np.ndarray, W: int, H: int) -> np.ndarray:
    """Area-average (H', W'[, C]) → (H, W[, C]) for H' >= H, W' >= W.

    Each output pixel averages the source pixels whose centers fall in
    its footprint (fractional boxes handled by linear edge weights)."""
    h, w = img.shape[:2]

    def axis_weights(n_src, n_dst):
        # weight of source sample s in destination d
        ws = np.zeros((n_dst, n_src), np.float64)
        scale = n_src / n_dst
        for d in range(n_dst):
            lo, hi = d * scale, (d + 1) * scale
            s0, s1 = int(np.floor(lo)), int(np.ceil(hi))
            for s in range(s0, min(s1, n_src)):
                ov = min(hi, s + 1) - max(lo, s)
                if ov > 0:
                    ws[d, s] = ov
        return ws / ws.sum(axis=1, keepdims=True)

    wy = axis_weights(h, H)
    wx = axis_weights(w, W)
    flat = img.reshape(h, w, -1)
    out = np.einsum("Hh,hwc,Ww->HWc", wy, flat, wx)
    return out.reshape((H, W) + img.shape[2:]).astype(img.dtype)


def render_view(field, params, cams: Cameras, view_idx: int,
                bitfield: jnp.ndarray,
                march_cfg: Optional[MarchConfig] = None,
                max_samples: int = 256, tile: int = 4096,
                background=(1.0, 1.0, 1.0),
                envmap: Optional[jnp.ndarray] = None,
                render_scale: float = 1.0
                ) -> Dict[str, np.ndarray]:
    """Render one view → {"albedo" (H,W,3), "depth", "alpha", "normal"}.

    render_scale < 1 renders at a reduced internal resolution and
    upsamples bilinearly to the output size — the headless counterpart of
    the reference's DLSS render-scale path (src/dlss.cu; the NGX upscaler
    itself is a GUI-only NVIDIA binary, the capability here is the same
    render-small/display-big control).
    """
    march_cfg = march_cfg or MarchConfig()
    W, H = cams.resolution
    if render_scale != 1.0:
        W_out, H_out = W, H
        W = max(int(round(W * render_scale)), 1)
        H = max(int(round(H * render_scale)), 1)
        # scale focal by the ROUNDED raster ratio per axis so the FOV is
        # preserved exactly even when W·scale is fractional
        fscale = jnp.asarray([W / W_out, H / H_out], jnp.float32)
        cams = cams._replace(focal=cams.focal * fscale,
                             resolution=(W, H))
        out = render_view(field, params, cams, view_idx, bitfield,
                          march_cfg, max_samples, tile, background, envmap)
        if render_scale > 1.0:
            # supersampled: box-filter down (area average), not
            # point-sample — avoids aliasing the extra samples away
            return {k: _downsample_box(v, W_out, H_out) for k, v in
                    out.items()}
        return {k: _upsample(v, W_out, H_out) for k, v in out.items()}
    n = W * H
    ys, xs = np.mgrid[0:H, 0:W]
    xy = np.stack([(xs.ravel() + 0.5) / W, (ys.ravel() + 0.5) / H], axis=1)
    xy = jnp.asarray(xy, jnp.float32)
    img_ids = jnp.full((n,), view_idx, jnp.int32)

    @jax.jit
    def render_tile(xy_t, ids_t):
        o, d = rays_from_pixels(cams, ids_t, xy_t)
        marched = ray_march.march(o, d, bitfield,
                                  jnp.full((ids_t.shape[0],), 0.5),
                                  march_cfg.n_ladder, max_samples,
                                  march_cfg.cone_angle)
        pos = o[:, None, :] + marched.t[..., None] * d[:, None, :]
        R, M = marched.t.shape
        out = field.apply(params, jnp.clip(pos.reshape(-1, 3), 0, 1))
        sdf = out["sdf"].reshape(R, M)
        grad = out["grad"].reshape(R, M, 3)
        alb = losses.albedo_activation(out["albedo_raw"]).reshape(R, M, 3)
        inv_s = jnp.exp(10.0 * out["variance"])
        tc = jnp.sum(d[:, None, :] * grad, axis=-1)
        alpha = neus.sdf_to_alpha(sdf, tc, marched.dt, inv_s, 1.0)
        comp = neus.composite(alpha, marched.valid)
        w = comp.weight
        color = jnp.sum(w[..., None] * alb, axis=1)
        depth = jnp.sum(w * marched.t, axis=1)
        asum = jnp.sum(w, axis=1)
        nrm = jnp.sum(w[..., None] * grad, axis=1)
        nrm = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
        bg = background_color(envmap, d, background)   # envmap.cuh read path
        color = color + (1.0 - asum[:, None]) * bg
        return color, depth, asum, nrm

    cols, deps, alps, nrms = [], [], [], []
    pad = (-n) % tile
    xy_p = jnp.concatenate([xy, jnp.zeros((pad, 2))]) if pad else xy
    id_p = jnp.concatenate([img_ids, jnp.zeros((pad,), jnp.int32)]) \
        if pad else img_ids
    for s in range(0, n + pad, tile):
        c, dp, a, nr = render_tile(xy_p[s:s + tile], id_p[s:s + tile])
        cols.append(np.asarray(c))
        deps.append(np.asarray(dp))
        alps.append(np.asarray(a))
        nrms.append(np.asarray(nr))
    cat = lambda xs_: np.concatenate(xs_, 0)[:n]
    return {
        "albedo": cat(cols).reshape(H, W, 3),
        "depth": cat(deps).reshape(H, W),
        "alpha": cat(alps).reshape(H, W),
        "normal": cat(nrms).reshape(H, W, 3),
    }
