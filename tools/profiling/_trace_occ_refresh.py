"""Device-trace the steady-state occupancy refresh in isolation.

Round-3 traces put the subsampled refresh at ~900 ms per 16 steps
(~56 ms/step amortized) — but its arithmetic floor is much lower:
1M density evals ≈ 9 hashed levels x 8 corners x 1M gather rows
(~320 ms at the 4.4 ns/row floor) + dense fwd + a tiny MLP. This
isolates the refresh under jax.profiler to see where the other
~500 ms goes (candidate-cell selection gathers? dispatch? fusion
breaks?).

Usage (tunnel up): python tools/profiling/_trace_occ_refresh.py
Trace lands in /tmp/occ_trace; summarize with the usual trace tooling.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import time

import jax
import jax.numpy as jnp


def main():
    from rnb_neus2_tpu.config import TestbedConfig, TrainConfig
    from rnb_neus2_tpu.testing.synthetic import sphere_dataset
    from rnb_neus2_tpu.train.trainer import Trainer

    ds = sphere_dataset(n_views=20, width=512, height=612, radius=0.35,
                        cam_radius=1.6, focal=900.0)
    cfg = TestbedConfig(train=TrainConfig(seed=0))
    tr = Trainer(ds, cfg)
    for _ in range(20):
        tr.train_step()
    tr.step = 608
    lb = tr._level_bucket()
    occ_fn = tr._occ_update_fn(lb, subsampled=True)
    k = jax.random.PRNGKey(7)
    # compile + one warm call
    occ = occ_fn(tr.params, tr.occ, k, jnp.int32(tr.step))
    jax.block_until_ready(occ.density)

    t0 = time.perf_counter()
    for i in range(8):
        occ = occ_fn(tr.params, occ, jax.random.fold_in(k, i),
                     jnp.int32(tr.step))
    jax.block_until_ready(occ.density)
    print(f"subsampled refresh: "
          f"{(time.perf_counter() - t0) / 8 * 1e3:.1f} ms/refresh")

    with jax.profiler.trace("/tmp/occ_trace"):
        for i in range(3):
            occ = occ_fn(tr.params, occ, jax.random.fold_in(k, 100 + i),
                         jnp.int32(tr.step))
        jax.block_until_ready(occ.density)
    print("trace written to /tmp/occ_trace")

    # A/B: the full (non-subsampled) sweep for comparison
    occ_full = tr._occ_update_fn(lb, subsampled=False)
    occ = occ_full(tr.params, occ, k, jnp.int32(tr.step))
    jax.block_until_ready(occ.density)
    t0 = time.perf_counter()
    for i in range(4):
        occ = occ_full(tr.params, occ, jax.random.fold_in(k, 200 + i),
                       jnp.int32(tr.step))
    jax.block_until_ready(occ.density)
    print(f"full sweep: {(time.perf_counter() - t0) / 4 * 1e3:.1f} "
          f"ms/refresh")


if __name__ == "__main__":
    main()
