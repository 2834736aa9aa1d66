"""Multi-chip data parallelism over a 1-D ICI mesh.

The reference has NO distributed capability (SURVEY §2.4: no NCCL/MPI/
torch.distributed anywhere in the tree — concurrency is two CUDA streams and
a host thread pool). The TPU-native scaling story for this workload is
batch(ray)-sharded data parallelism: the model (~12 M params, hash table
dominated) is replicated, each chip marches and shades its own slice of the
ray batch against its slice of the sample budget, and the gradient is one
`psum` that XLA lowers onto ICI. No other collective is needed; the
occupancy-grid refresh shards over cells the same way.

Loss decomposition keeping single-chip semantics exact:
  global = Σ_dev [ (color+mask)_dev ] / R_global + ek_w · Σ_dev ek_dev
so each device computes its partial with the GLOBAL ray count as the
normalizer and one psum of grads reproduces the single-chip gradient.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import TestbedConfig
from ..render.losses import training_loss
from ..train.sampler import sample_ray_batch


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def sharded_grad_fn(dataset, field, cfg: TestbedConfig, mesh: Mesh,
                    n_rays_global: int, axis: str = "dp"):
    """Returns grad_fn(params, bitfield, keys, step) → (grads, metrics),
    gradients already psum'd (replicated)."""
    n_dev = mesh.devices.size
    assert n_rays_global % n_dev == 0
    n_rays_local = n_rays_global // n_dev
    n_slots_local = cfg.train.target_batch_size // n_dev

    def local_grads(params, bitfield, key, step):
        key = key[0]            # unstack the per-device key row
        batch, samples, pos, _ = sample_ray_batch(
            dataset, bitfield, key, n_rays_local, n_slots_local, cfg.march)
        from ..train.trainer import valid_level_for_step
        vl = valid_level_for_step(cfg.grid, step)
        anneal = jnp.where(cfg.loss.anneal_end <= 0, 1.0,
                           jnp.minimum(1.0, step / max(cfg.loss.anneal_end, 1)))

        def loss_fn(p):
            out = field.apply_chunked(p, pos, vl, cfg.train.field_chunk)
            return training_loss(out, samples, batch, cfg.flags, cfg.loss,
                                 anneal, n_rays_divisor=n_rays_global)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        metrics = dict(metrics)
        metrics.pop("_per_ray_color_logged", None)  # per-ray array
        grads = jax.lax.psum(grads, axis)
        loss = jax.lax.psum(loss, axis)
        counts = {"n_samples_kept", "n_rays_alive"}
        metrics = {k: jax.lax.psum(v, axis) / (1 if k in counts else n_dev)
                   for k, v in metrics.items()}
        metrics["loss_total"] = loss
        metrics["n_valid_total"] = jax.lax.psum(jnp.sum(samples.n_valid),
                                                axis)
        return grads, metrics

    return jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(P(), P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )


def make_parallel_train_step(dataset, field, cfg: TestbedConfig, mesh: Mesh,
                             tx, n_rays_global: int, axis: str = "dp"):
    """Full jitted multi-chip training step: sharded grads + replicated
    optimizer + parameter EMA."""
    from ..train import optimizer as opt

    grad_fn = sharded_grad_fn(dataset, field, cfg, mesh, n_rays_global, axis)
    n_dev = mesh.devices.size

    @jax.jit
    def step_fn(params, opt_state, bitfield, key, step):
        keys = jax.random.split(key, n_dev)
        grads, metrics = grad_fn(params, bitfield, keys, step)
        if cfg.train.fractional_from_step is not None:
            rgb_scale = (step < cfg.train.fractional_from_step
                         ).astype(jnp.float32)
        else:
            rgb_scale = jnp.float32(1.0)
        params, opt_state = opt.apply_updates(
            tx, cfg.optimizer, params, grads, opt_state, rgb_scale)
        return params, opt_state, metrics

    return step_fn


def sharded_occ_update_fn(field, cfg: TestbedConfig, mesh: Mesh,
                          axis: str = "dp"):
    """Occupancy refresh with the G³ cell batch sharded across chips."""
    from ..grid import occupancy
    from ..train.trainer import valid_level_for_step

    n_dev = mesh.devices.size
    gsize = cfg.train.occ_grid_size
    decay = cfg.train.density_grid_decay

    def local(params, pos, step):
        vl = valid_level_for_step(cfg.grid, step)
        return field.density(params, pos, vl)

    density_fn = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(axis), P()), out_specs=P(axis),
        check_vma=False)

    @jax.jit
    def occ_fn(params, occ_state, key, step):
        pos = occupancy.cell_positions(key, gsize)
        dens = density_fn(params, pos, step)
        return occupancy.update(occ_state, dens, decay)

    return occ_fn
