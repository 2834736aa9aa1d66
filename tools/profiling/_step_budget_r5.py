"""Round-5 step budget at the TRUE production steady state.

The r4 budget tool measured a warmup-regime batch (rays=512 under the
new cone=0 adaptation trajectory — useless: production converges to
rays ~32-44k). This loads the round-5 clean-10k snapshot (trained field,
converged occupancy, adapted ray count riding the snapshot), re-settles,
and measures the fused chunk + each piece at the REAL shapes.

Usage (tunnel up, chip free):
  python tools/profiling/_step_budget_r5.py \
      [--snapshot runs/composite_scene/output/snapshot_10000.msgpack]
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot",
                    default="runs/composite_scene/output/"
                            "snapshot_10000.msgpack")
    ap.add_argument("--scene", default="runs/composite_scene")
    args = ap.parse_args()

    from rnb_neus2_tpu.cli import testbed as tb
    from rnb_neus2_tpu.io.dataset import load_transform_json
    from rnb_neus2_tpu.render.losses import training_loss
    from rnb_neus2_tpu.train import error_map
    from rnb_neus2_tpu.train import optimizer as opt
    from rnb_neus2_tpu.train import snapshot as snap
    from rnb_neus2_tpu.train.sampler import sample_ray_batch
    from rnb_neus2_tpu.train.trainer import Trainer, valid_level_for_step

    p = tb.build_argparser().parse_args(
        ["--scene", args.scene, "--maxiter", "20000", "--no-gui"])
    cfg = tb.make_config(p)
    ds = load_transform_json(args.scene)
    tr = Trainer(ds, cfg)
    snap.restore_trainer(tr, snap.load_snapshot(args.snapshot))
    print(f"restored step={tr.step} n_rays={tr.n_rays}", flush=True)
    # align to the fused-chunk phase and warm the steady-state compiles
    tr.step = (tr.step // 16) * 16
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
    vl = valid_level_for_step(cfg.grid, tr.step)
    print(f"measuring pieces at rays bucket={n_rays}, levels={n_active}",
          flush=True)

    @jax.jit
    def sampler(params, emap, bitfield, key):
        return sample_ray_batch(
            ds, bitfield, key, n_rays, n_slots, cfg.march,
            emap_state=emap, light_salt=cfg.train.light_prng_salt)
    print(f"sampler+march   : "
          f"{timeit(sampler, params, tr.emap, tr.occ.bitfield, key):7.1f} ms",
          flush=True)

    # march alone (the (R,K) ladder phase, K=1024 at cone=0)
    from rnb_neus2_tpu.geom.camera import rays_from_pixels
    from rnb_neus2_tpu.ops import ray_march
    k1, k2 = jax.random.split(key)
    img = jnp.zeros((n_rays,), jnp.int32)
    xy = jax.random.uniform(k1, (n_rays, 2))
    ro, rd = rays_from_pixels(ds.cameras, img, xy)
    u0 = jax.random.uniform(k2, (n_rays,))

    @jax.jit
    def march(bitfield, u0):
        return ray_march.march_flat(ro, rd, bitfield, u0,
                                    cfg.march.n_ladder, n_slots,
                                    cfg.march.cone_angle)
    print(f"march_flat alone: {timeit(march, tr.occ.bitfield, u0):7.1f} ms",
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

    occ_fn = tr._occ_update_fn(n_active, subsampled=True)
    kk = jax.random.PRNGKey(5)
    t = timeit(occ_fn, params, tr.occ, kk, jnp.int32(tr.step))
    print(f"occ refresh     : {t:7.1f} ms  (/16 = {t/16:.1f})", flush=True)


if __name__ == "__main__":
    main()
