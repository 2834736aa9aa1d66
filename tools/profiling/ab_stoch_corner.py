"""A/B: step time with the stochastic corner backward (K=0/2/1), full-size
config, real TPU. Methodology identical to bench.py (warm past the occupancy
refresh compile, async window of 32 steps, sync bound).

Usage: python tools/profiling/ab_stoch_corner.py [K ...]
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import time

import jax


def measure(k: int) -> float:
    from rnb_neus2_tpu.config import (NetworkConfig, TestbedConfig,
                                      TrainConfig)
    from rnb_neus2_tpu.testing.synthetic import sphere_dataset
    from rnb_neus2_tpu.train.trainer import Trainer

    ds = sphere_dataset(n_views=20, width=512, height=612, radius=0.35,
                        cam_radius=1.6, focal=900.0)
    cfg = TestbedConfig(network=NetworkConfig(stoch_corner_bwd=k),
                        train=TrainConfig(seed=0))
    tr = Trainer(ds, cfg)
    for _ in range(20):
        tr.train_step()
    tr.step = 608
    tr.train_steps(32, sync_every=16)   # compile chunk + steady occ
    n = 48
    t0 = time.perf_counter()
    tr.train_steps(n, sync_every=16)
    dt = time.perf_counter() - t0
    return dt / n * 1e3


def main():
    ks = [int(a) for a in sys.argv[1:]] or [0, 2, 1]
    for k in ks:
        ms = measure(k)
        print(f"stoch_corner_bwd={k}: {ms:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
