"""Benchmark: steady-state training throughput on real TPU hardware.

Runs the full-size configuration (14-level hash grid to 2^19 entries,
2^18-sample batches, 128³ occupancy grid — the reference's defaults from
configs/nerf/base.json + testbed.h) on a DiLiGenT-MV-sized synthetic scene
(20 views, 512×612) and measures steady-state training rays/sec/chip.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
driver-provided north star is "10k steps in <5 min on v5e-8" ≈ 2400
chip-seconds. vs_baseline = that budget divided by our projected
chip-seconds for 10k steps (>1 = beating the target).

Prints ONE JSON line.
"""

import json
import socket
import time


def _wait_for_transport(max_wait_s: float = 900.0) -> None:
    """The TPU is reachable only through a remote-compile tunnel on
    127.0.0.1:8103 that drops intermittently; jax backend init HANGS
    (not errors) while it is down. Wait for it — bounded — before
    importing anything that touches the backend."""
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        try:
            with socket.create_connection(("127.0.0.1", 8103), timeout=3):
                return
        except OSError:
            time.sleep(20)
    raise SystemExit(
        "bench: TPU transport 127.0.0.1:8103 unreachable for "
        f"{max_wait_s:.0f}s; refusing to hang in backend init")


def main():
    _wait_for_transport()
    import jax

    from rnb_neus2_tpu.config import TestbedConfig, TrainConfig
    from rnb_neus2_tpu.testing.synthetic import sphere_dataset
    from rnb_neus2_tpu.train.trainer import Trainer

    ds = sphere_dataset(n_views=20, width=512, height=612, radius=0.35,
                        cam_radius=1.6, focal=900.0)
    cfg = TestbedConfig(train=TrainConfig(seed=0))
    tr = Trainer(ds, cfg)

    # warmup: let occupancy form, kernels compile
    for _ in range(20):
        tr.train_step()
    # measure the steady-state regime: past step 256 the occupancy refresh
    # cadence is 16 (testbed.cu:2801). The RAY-COUNT regime is pinned at
    # the measured production steady state (the round-5 clean 10k settled
    # at rays ≈ 43k → bucket 32768; runs/RUN_r5_composite10k.log): under
    # the reference-exact cone=0 march the adaptive controller takes
    # ~1500 steps to climb there, and letting it adapt inside a short
    # window puts bucket RECOMPILES in the timing (measured 3.4 s/step —
    # all compile). Pinning measures what a long run actually pays
    # per step; tools/profiling/_step_budget_r5.py cross-checks the same
    # number from the real trained snapshot (353 ms at step 10000).
    PIN_RAYS = 1 << 15
    tr.step = 608   # steady state, 16-aligned for the fused-chunk path
    tr.n_rays = PIN_RAYS
    # warm window: compiles the steady-state subsampled occ refresh AND
    # the fused 16-step scan chunk BEFORE the timed window
    for _ in range(3):
        tr.train_steps(16, sync_every=16)
        tr.n_rays = PIN_RAYS

    n_steps = 48
    # fused stepping: steps dispatch as [refresh + 16-step scan] chunks
    # (train_steps); metrics sync bounds the wall clock
    t0 = time.perf_counter()
    out = {}
    for _ in range(n_steps // 16):
        out = tr.train_steps(16, sync_every=16)
        tr.n_rays = PIN_RAYS
    dt = time.perf_counter() - t0
    rays = PIN_RAYS * n_steps

    # the Trainer above runs on ONE chip regardless of visible devices
    # (multi-chip uses parallel.mesh, exercised by the driver's dryrun)
    n_chips = 1
    rays_per_sec = rays / dt / n_chips
    step_ms = dt / n_steps * 1e3
    projected_10k_s = 10_000 * dt / n_steps * n_chips  # chip-seconds
    vs_baseline = 2400.0 / projected_10k_s

    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(vs_baseline, 3),
        "step_ms": round(step_ms, 2),
        "samples_per_sec_per_chip": round(
            cfg.train.target_batch_size / (dt / n_steps) / n_chips, 1),
        "projected_10k_steps_chip_seconds": round(projected_10k_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
