"""Training ray-batch assembly (pure jnp, jit-friendly).

Reproduces the per-ray setup of generate_training_samples…
(src/testbed_nerf.cu:1216-1387) and the target decode of the loss kernel
(:1460-1561):

- image choice: stratified img = i·n_images / n_rays (image_idx with no CDF);
- pixel: uniform continuous xy per ray, texel looked up at floor(xy·res);
- black-pixel skip: texels whose premultiplied linear red ≤ 0 are dropped
  when random_val ≥ 0.9, i.e. with probability 0.1 — the reference KEEPS
  90% of black-pixel rays (:1264-1266);
- per-ray random light index in {0,1,2} (the reference uses curand seeded
  with clock64() — non-deterministic; we use the counted PRNG, a documented
  divergence);
- ray march with jittered start (ops/ray_march.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import MarchConfig
from ..geom.camera import rays_from_pixels
from ..io.dataset import TrainingDataset
from ..ops import ray_march
from ..render.losses import RayBatch


def sample_ray_batch(dataset: TrainingDataset, bitfield: jnp.ndarray,
                     key: jax.Array, n_rays: int, n_slots: int,
                     march_cfg: MarchConfig, emap_state=None,
                     ray_transform=None, light_salt: int = 0,
                     emap_image_prop: bool = False,
                     emap_focal_prop: bool = False):
    """Returns (RayBatch, FlatSamples, positions (S, 3), (img, xy)).

    With emap_state AND one of the emap_*_prop knobs, pixels/images are
    drawn from the error-map CDFs (importance sampling — OPT-IN, exactly
    like the reference's testbed.h:663-664 flags which default false);
    otherwise stratified images + uniform pixels (the reference's default
    path, image_idx + cdf==nullptr). ray_transform (o, d) → (o, d) maps
    rays into the canonical frame BEFORE marching (global movement,
    testbed_nerf.cu:1311-1323).
    """
    W, H = dataset.resolution
    n_img = dataset.n_images
    k_xy, k_skip, k_light, k_start = jax.random.split(key, 4)

    if emap_state is not None and (emap_image_prop or emap_focal_prop):
        # OPT-IN error-proportional sampling (testbed.h:663-664 — the
        # reference defaults both knobs off and the RNb pipeline never
        # enables them; the error map itself is still accumulated)
        from . import error_map
        img, xy, pdf = error_map.sample(emap_state, k_xy, n_rays,
                                        emap_image_prop, emap_focal_prop)
    else:
        ray_ids = jnp.arange(n_rays)
        img = ((ray_ids * n_img) // n_rays).astype(jnp.int32)
        xy = jax.random.uniform(k_xy, (n_rays, 2))
        pdf = jnp.ones((n_rays,), jnp.float32)
    px = jnp.clip((xy[:, 0] * W).astype(jnp.int32), 0, W - 1)
    py = jnp.clip((xy[:, 1] * H).astype(jnp.int32), 0, H - 1)
    if march_cfg.snap_to_pixel_centers:
        # default-on in the reference (testbed.h:650,
        # nerf_random_image_pos_training :1180)
        xy = jnp.stack([(px + 0.5) / W, (py + 0.5) / H], axis=1)

    flat = (img * H + py) * W + px
    gather = lambda a: a.reshape((-1,) + a.shape[3:])[flat]
    normal_gt = gather(dataset.normals)
    albedo_gt = gather(dataset.albedos)
    alpha_n = gather(dataset.alpha_normal)
    alpha_a = gather(dataset.alpha_albedo)
    skip_cand = gather(dataset.skip_candidate)

    u_skip = jax.random.uniform(k_skip, (n_rays,))
    alive = ~(skip_cand & (u_skip >= 0.9))

    ray_o, ray_d = rays_from_pixels(dataset.cameras, img, xy)
    if ray_transform is not None:
        ray_o, ray_d = ray_transform(ray_o, ray_d)
    u_start = jax.random.uniform(k_start, (n_rays,))
    samples = ray_march.march_flat(ray_o, ray_d, bitfield, u_start,
                                   march_cfg.n_ladder, n_slots,
                                   march_cfg.cone_angle)
    alive &= samples.n_valid > 0

    if light_salt:
        # separable light-choice stream (divergence A/B — see
        # TrainConfig.light_prng_salt)
        k_light = jax.random.fold_in(k_light, light_salt)
    light_idx = jax.random.randint(k_light, (n_rays,), 0, 3)

    # ONE rows-of-8 gather hands every per-SAMPLE consumer its per-ray
    # attributes: XLA's TPU gather is per-row bound (narrow (S,3) gathers
    # measured ~49 ns/row ≈ 13 ms/step each at 2^18 samples), so packing
    # [ray_d | alive&kept | ray_o | pad] into one (R, 8) array replaces
    # three such gathers (pos assembly here + ray_d/alive in the loss).
    full_alive = alive & samples.ray_kept
    attrs = jnp.concatenate(
        [ray_d, full_alive[:, None].astype(jnp.float32), ray_o,
         jnp.zeros((n_rays, 1), jnp.float32)], axis=1)     # (R, 8)
    rid = jnp.minimum(samples.ray_id, n_rays - 1)
    s_attr = attrs[rid]                                    # (S, 8)
    pos = s_attr[:, 4:7] + samples.t[:, None] * s_attr[:, 0:3]
    pos = jnp.clip(pos, 0.0, 1.0)

    batch = RayBatch(
        ray_o=ray_o, ray_d=ray_d,
        alive=alive,
        normal_gt=normal_gt, albedo_gt=albedo_gt,
        mask_color=(alpha_a > 0.99).astype(jnp.float32),
        mask_gt=(alpha_n > 0.99).astype(jnp.float32),
        rot_c2w=dataset.cameras.rot_c2w[img],
        light_idx=light_idx,
        pdf=pdf,
        sample_attrs=s_attr,
    )
    return batch, samples, pos, (img, xy)
