"""Honest per-cap cost of the occ-refresh density forward (real TPU).

The r3 ab_occ_refresh_levels timings (flat ~1000 ms across caps) were
harness artifacts; _bisect_occ_refresh measured the true refresh at
477 ms = select 98 + density 375 + update 10. This times ONLY the
1M-point density forward at each encode-level cap with the bisect's
methodology — the honest speed side of the occ_refresh_levels decision
(the agreement side stands from the r3 A/B: bitfield agreement vs
uncapped 1.0/1.0/1.0/0.99999 at caps 14/10/8/6 on a trained snapshot).

Usage (tunnel up, chip free): python tools/profiling/_occ_cap_density.py
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
    from rnb_neus2_tpu.grid import occupancy
    from rnb_neus2_tpu.testing.synthetic import sphere_dataset
    from rnb_neus2_tpu.train.trainer import Trainer, valid_level_for_step

    ds = sphere_dataset(n_views=20, width=512, height=612, radius=0.35,
                        cam_radius=1.6, focal=900.0)
    cfg = TestbedConfig(train=TrainConfig(seed=0))
    tr = Trainer(ds, cfg)
    for _ in range(20):
        tr.train_step()
    tr.step = 608
    field, params = tr.field, tr.params
    gsize = cfg.train.occ_grid_size
    vl = valid_level_for_step(cfg.grid, tr.step)
    key = jax.random.PRNGKey(7)
    pos, _ = occupancy.sample_update_cells(
        key, tr.occ, gsize, gsize ** 3 // 4, gsize ** 3 // 4)
    pos = jax.block_until_ready(pos)

    for cap in (14, 10, 8, 6, 5):
        f = jax.jit(lambda p, x, c=cap: field.density(p, x, vl, c))
        ms = timeit(f, params, pos)
        print(f"density @ cap {cap:2d}: {ms:7.1f} ms  (/16 = {ms / 16:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
