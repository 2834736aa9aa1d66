"""A/B: metric-sync depth in the fused-chunk host loop (real TPU).

train_steps(n, sync_every=16) blocks on every 16-step chunk's metrics
(the consume happens right after the dispatch), exposing the remote
tunnel RTT + queue drain once per chunk. The STEP_BUDGET_r4 gap
(full 297 ms vs sum-of-parts ~266) suggests ~31 ms/step of that is
sync/dispatch overhead. This measures the same 48-step window at sync
depths 16/32/48: if deeper windows approach the sum-of-parts rate, a
1-chunk-lagged consume (pipeline the next chunk before syncing the
previous) is worth the guard-plumbing complexity.

Usage (tunnel up, chip free): python tools/profiling/_ab_sync_depth.py
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import time


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
    tr.train_steps(32, sync_every=16)   # compile chunk + steady occ

    for depth in (16, 32, 48, 16):      # repeat 16 to bound drift
        n = 48
        t0 = time.perf_counter()
        tr.train_steps(n, sync_every=depth)
        dt = time.perf_counter() - t0
        print(f"sync_every={depth:2d}: {dt / n * 1e3:6.1f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
