"""A/B: step time with mid-level densification
(HashGridConfig.dense_max_entries_log2), full-size config, real TPU.

The knob lifts the reference's per-level 2^19 table cap (grid.h:987-999)
for levels whose full dense table fits: at 22, L5/L6 switch from 8
per-corner hashed gathers to ONE corner-redundant rows-of-16 gather per
sample (training-forward rows 77 -> 63 per sample), at the price of a
per-step roll-table rebuild (8 shifts over the level) and a bigger param
tree. This measures whether the row cut beats the rebuild at full size.
Methodology identical to ab_stoch_corner.py (warm past the occupancy
refresh compile, steady-state fused chunks, sync-bounded window).

Usage: python tools/profiling/ab_dense_levels.py [log2 ...]   # 0 = off
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import time

import jax


def measure(log2: int) -> float:
    from rnb_neus2_tpu.config import (HashGridConfig, TestbedConfig,
                                      TrainConfig)
    from rnb_neus2_tpu.testing.synthetic import sphere_dataset
    from rnb_neus2_tpu.train.trainer import Trainer

    ds = sphere_dataset(n_views=20, width=512, height=612, radius=0.35,
                        cam_radius=1.6, focal=900.0)
    cfg = TestbedConfig(
        grid=HashGridConfig(dense_max_entries_log2=log2 or None),
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
    caps = [int(a) for a in sys.argv[1:]] or [0, 22]
    for c in caps:
        ms = measure(c)
        print(f"dense_max_entries_log2={c or None}: {ms:.1f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
