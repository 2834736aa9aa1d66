"""Bisect the ~900 ms steady-state occupancy refresh (real TPU).

The r3 A/B (runs/AB_occ_levels_r3.log) showed the per-refresh time is
FLAT across encode-level caps 14/10/8/6 (1002/932/1011/898 ms) — the
density forward's hashed gathers (~330 ms arithmetic floor at cap 14,
~30 ms at cap 6) cannot be what costs ~900 ms. This isolates each piece
of trainer._raw_occ_fn(subsampled=True) under its own jit:

  full            : the exact production occ_fn
  no_candidates   : density at cell_positions (same M) + update_sampled
  select_only     : sample_update_cells alone
  density_only    : the lax.map density eval alone (production positions)
  update_only     : update_sampled alone (precomputed dens/idx)
  density_half    : density at M/2 — does the cost even scale with M?
  nomap_density   : density WITHOUT the 1-chunk lax.map wrapper

Usage (tunnel up, chip free): python tools/profiling/_bisect_occ_refresh.py
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
    lb = tr._level_bucket()
    field = tr.field
    gsize = cfg.train.occ_grid_size
    n_cells = gsize ** 3
    n_quarter = n_cells // 4
    M = n_cells // 2
    decay = cfg.train.density_grid_decay
    params, occ = tr.params, tr.occ
    key = jax.random.PRNGKey(7)
    step = jnp.int32(tr.step)
    vl = valid_level_for_step(cfg.grid, tr.step)

    occ_fn = tr._occ_update_fn(lb, subsampled=True)
    print(f"full           : {timeit(occ_fn, params, occ, key, step):8.1f} ms",
          flush=True)

    @jax.jit
    def no_candidates(params, occ_state, key):
        pos = occupancy.cell_positions(key, gsize)[:M]
        idx = jnp.arange(M, dtype=jnp.int32)
        dens = jax.lax.map(
            lambda p: field.density(params, p, vl, lb),
            pos.reshape(1, M, 3)).reshape(-1)
        return occupancy.update_sampled(occ_state, idx, dens, decay)
    print(f"no_candidates  : {timeit(no_candidates, params, occ, key):8.1f}"
          " ms", flush=True)

    @jax.jit
    def select_only(occ_state, key):
        return occupancy.sample_update_cells(key, occ_state, gsize,
                                             n_quarter, n_quarter)
    print(f"select_only    : {timeit(select_only, occ, key):8.1f} ms",
          flush=True)

    pos, idx = jax.block_until_ready(select_only(occ, key))

    @jax.jit
    def density_only(params, pos):
        return jax.lax.map(
            lambda p: field.density(params, p, vl, lb),
            pos.reshape(1, M, 3)).reshape(-1)
    print(f"density_only   : {timeit(density_only, params, pos):8.1f} ms",
          flush=True)

    dens = jax.block_until_ready(density_only(params, pos))

    @jax.jit
    def update_only(occ_state, idx, dens):
        return occupancy.update_sampled(occ_state, idx, dens, decay)
    print(f"update_only    : {timeit(update_only, occ, idx, dens):8.1f} ms",
          flush=True)

    @jax.jit
    def density_half(params, pos):
        return jax.lax.map(
            lambda p: field.density(params, p, vl, lb),
            pos[:M // 2].reshape(1, M // 2, 3)).reshape(-1)
    print(f"density_half   : {timeit(density_half, params, pos):8.1f} ms",
          flush=True)

    @jax.jit
    def nomap_density(params, pos):
        return field.density(params, pos, vl, lb)
    print(f"nomap_density  : {timeit(nomap_density, params, pos):8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
