"""Decompose the K=1-era ~300 ms training step (real TPU, warm runtime).

The DESIGN.md round-3 budget (scatter-dominated) is stale: K=1 cut the
hashed backward scatters 8x. This measures the CURRENT step's pieces,
each under its own jit at the production shapes, plus the full fused
chunk for reference:

  full chunk step : train_steps(48, sync 16)      (the bench number)
  sampler         : sample_ray_batch alone
  loss fwd        : apply_chunked + training_loss (no grad)
  loss fwd+bwd    : value_and_grad of the above
  adam update     : opt.apply_updates alone
  emap splat      : error_map.splat alone
  occ refresh     : amortized /16 (measured by _bisect_occ_refresh)

Usage (tunnel up, chip free): python tools/profiling/_step_budget_r4.py
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from rnb_neus2_tpu.config import TestbedConfig, TrainConfig
    from rnb_neus2_tpu.render.losses import training_loss
    from rnb_neus2_tpu.testing.synthetic import sphere_dataset
    from rnb_neus2_tpu.train import error_map
    from rnb_neus2_tpu.train import optimizer as opt
    from rnb_neus2_tpu.train.sampler import sample_ray_batch
    from rnb_neus2_tpu.train.trainer import Trainer, valid_level_for_step

    ds = sphere_dataset(n_views=20, width=512, height=612, radius=0.35,
                        cam_radius=1.6, focal=900.0)
    cfg = TestbedConfig(train=TrainConfig(seed=0))
    tr = Trainer(ds, cfg)
    for _ in range(20):
        tr.train_step()
    tr.step = 608
    tr.train_steps(32, sync_every=16)

    n = 48
    t0 = time.perf_counter()
    out = tr.train_steps(n, sync_every=16)
    full = (time.perf_counter() - t0) / n * 1e3
    print(f"full chunk step : {full:7.1f} ms  rays={out['rays_per_batch']}",
          flush=True)

    n_rays = tr._bucket()
    n_active = tr._level_bucket()
    n_slots = cfg.train.target_batch_size
    field, params = tr.field, tr.params
    key = jax.random.PRNGKey(3)
    step = jnp.int32(tr.step)
    vl = valid_level_for_step(cfg.grid, tr.step)

    @jax.jit
    def sampler(params, emap, bitfield, key):
        return sample_ray_batch(
            ds, bitfield, key, n_rays, n_slots, cfg.march,
            emap_state=emap, light_salt=cfg.train.light_prng_salt)
    print(f"sampler         : "
          f"{timeit(sampler, params, tr.emap, tr.occ.bitfield, key):7.1f} ms",
          flush=True)

    batch, samples, pos, (img, xy) = jax.block_until_ready(
        sampler(params, tr.emap, tr.occ.bitfield, key))

    def loss_fn(p, pos):
        out = field.apply_chunked(p, pos, vl, cfg.train.field_chunk,
                                  n_active)
        return training_loss(out, samples, batch, cfg.flags, cfg.loss, 1.0)

    fwd = jax.jit(lambda p, pos: loss_fn(p, pos)[0])
    print(f"loss fwd        : {timeit(fwd, params, pos):7.1f} ms",
          flush=True)

    vg = jax.jit(lambda p, pos: jax.value_and_grad(
        lambda q: loss_fn(q, pos)[0])(p))
    print(f"loss fwd+bwd    : {timeit(vg, params, pos):7.1f} ms",
          flush=True)

    _, grads = jax.block_until_ready(vg(params, pos))

    @jax.jit
    def adam(params, grads, opt_state):
        return opt.apply_updates(tr.tx, cfg.optimizer, params, grads,
                                 opt_state, jnp.float32(1.0),
                                 jnp.float32(1.0))
    print(f"adam update     : "
          f"{timeit(adam, params, grads, tr.opt_state):7.1f} ms", flush=True)

    per_ray = jnp.zeros((n_rays,), jnp.float32)

    @jax.jit
    def splat(emap, img, xy, per_ray):
        return error_map.splat(emap, img, xy, per_ray)
    print(f"emap splat      : "
          f"{timeit(splat, tr.emap, img, xy, per_ray):7.1f} ms", flush=True)

    occf = tr._occ_update_fn(n_active, subsampled=True)
    occ_ms = timeit(occf, params, tr.occ, key, step, n=4)
    print(f"occ refresh     : {occ_ms:7.1f} ms  (/16 = {occ_ms / 16:.1f})",
          flush=True)


if __name__ == "__main__":
    main()
