"""Multi-chip training driver: the single-scene Trainer host loop over a
1-D data-parallel device mesh.

The reference has no distributed capability (SURVEY §2.4); this is the
TPU-native scaling story: rays and the sample budget sharded over 'dp',
params replicated, one grad `psum` per step (see mesh.py). Inherits ALL
host-loop behavior from train.Trainer — adaptive ray batching, occupancy
cadence, progressive-level buckets, fused 16-step scan chunks, snapshots —
by overriding only the two raw jitted bodies.

Divergences from the single-chip Trainer (both documented, both off the
reference's semantic surface):
- error-map accumulation is skipped (the map is carried through untouched):
  proportional sampling is OFF by default exactly like the reference
  (testbed.h:663-664), and splatting a replicated map from sharded rays
  would serialize a cross-chip scatter for a visualization feature;
- the occupancy refresh is a full sharded sweep every cadence instead of
  the post-256 half-sample sweep (each chip evaluates G³/n_dev cells — at
  8 chips that is 4× LESS work per chip than the single-chip subsampled
  refresh).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..config import TestbedConfig
from ..grid import occupancy
from ..io.dataset import TrainingDataset
from ..render.losses import training_loss
from ..train import optimizer as opt
from ..train.sampler import sample_ray_batch
from ..train.trainer import Trainer, effective_lr_scale, valid_level_for_step
from .mesh import make_mesh


class ParallelTrainer(Trainer):
    """Data-parallel Trainer over `n_chips` devices (None = all)."""

    def __init__(self, dataset: TrainingDataset, cfg: TestbedConfig,
                 params: Optional[Dict[str, Any]] = None,
                 n_chips: Optional[int] = None, axis: str = "dp"):
        devices = jax.devices()
        if n_chips:
            devices = devices[:n_chips]
        if len(devices) < 2:
            raise ValueError(
                f"ParallelTrainer needs >= 2 devices, have {len(devices)}; "
                "use train.Trainer on a single chip")
        if (cfg.train.sample_image_proportional_to_error
                or cfg.train.sample_focal_plane_proportional_to_error):
            # the parallel path skips error-map accumulation (module
            # docstring) — silently training with a never-updated CDF
            # would change behavior vs --n-chips 1, so refuse loudly
            raise ValueError(
                "error-map-proportional sampling is not supported on the "
                "multi-chip path (the map is not accumulated there); "
                "disable sample_*_proportional_to_error or run with "
                "--n-chips 1")
        self.mesh = make_mesh(devices, axis)
        self.axis = axis
        self.n_dev = len(devices)
        super().__init__(dataset, cfg, params)

    def _bucket(self) -> int:
        # global ray count must split evenly over the mesh; both are
        # powers of two, so just clamp the floor
        return max(super()._bucket(), self.n_dev)

    def _raw_step_fn(self, n_rays: int, n_active: int):
        cfg = self.cfg
        field = self.field
        tx = self.tx
        axis = self.axis
        n_dev = self.n_dev
        assert n_rays % n_dev == 0, (n_rays, n_dev)
        n_rays_local = n_rays // n_dev
        n_slots_local = cfg.train.target_batch_size // n_dev

        def local_grads(params, bitfield, key, step):
            key = key[0]        # unstack this device's key row
            batch, samples, pos, _ = sample_ray_batch(
                self.dataset, bitfield, key, n_rays_local, n_slots_local,
                cfg.march, light_salt=cfg.train.light_prng_salt)
            vl = valid_level_for_step(cfg.grid, step)
            anneal = jnp.where(
                cfg.loss.anneal_end <= 0, 1.0,
                jnp.minimum(1.0, step / max(cfg.loss.anneal_end, 1)))

            def loss_fn(p):
                out = field.apply_chunked(p, pos, vl,
                                          cfg.train.field_chunk, n_active)
                # GLOBAL ray count as the normalizer so one grad psum
                # reproduces the single-chip gradient (mesh.py docstring)
                return training_loss(out, samples, batch, cfg.flags,
                                     cfg.loss, anneal,
                                     n_rays_divisor=n_rays,
                                     ek_samples_divisor=(
                                         cfg.train.target_batch_size))

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            metrics = dict(metrics)
            metrics.pop("_per_ray_color_logged", None)
            grads = jax.lax.psum(grads, axis)
            loss = jax.lax.psum(loss, axis)
            counts = {"n_samples_kept", "n_rays_alive"}
            metrics = {k: jax.lax.psum(v, axis) / (1 if k in counts
                                                   else n_dev)
                       for k, v in metrics.items()}
            metrics["loss_total"] = loss
            metrics["n_valid_total"] = jax.lax.psum(
                jnp.sum(samples.n_valid), axis)
            metrics["n_rays_kept"] = jax.lax.psum(
                jnp.sum(samples.ray_kept.astype(jnp.int32)), axis)
            return grads, metrics

        grad_fn = jax.shard_map(
            local_grads, mesh=self.mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False)

        def step_fn(params, opt_state, emap, bitfield, key, step,
                    lr_scale):
            keys = jax.random.split(key, n_dev)
            grads, metrics = grad_fn(params, bitfield, keys, step)
            if cfg.loss.fp16_grad_emulation:
                from ..render.losses import quantize_grads_fp16
                grads = quantize_grads_fp16(grads)
            if cfg.train.fractional_from_step is not None:
                rgb_scale = (step < cfg.train.fractional_from_step
                             ).astype(jnp.float32)
            else:
                rgb_scale = jnp.float32(1.0)
            params, opt_state = opt.apply_updates(
                tx, cfg.optimizer, params, grads, opt_state, rgb_scale,
                effective_lr_scale(cfg.train, step, lr_scale))
            # error map carried through untouched (module docstring)
            return params, opt_state, emap, metrics

        return step_fn

    def _raw_occ_fn(self, n_active: int, subsampled: bool):
        field = self.field
        n_active = self._occ_n_active(n_active)
        cfg = self.cfg
        gsize = cfg.train.occ_grid_size
        decay = cfg.train.density_grid_decay
        axis = self.axis

        def local(params, pos, step):
            vl = valid_level_for_step(cfg.grid, step)
            return field.density(params, pos, vl, n_active)

        density_fn = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(), P(axis), P()), out_specs=P(axis),
            check_vma=False)

        def occ_fn(params, occ_state, key, step):
            pos = occupancy.cell_positions(key, gsize)
            dens = density_fn(params, pos, step)
            return occupancy.update(occ_state, dens, decay)

        return occ_fn
