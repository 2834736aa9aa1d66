"""A/B the occupancy-refresh encode-level cap (TrainConfig.occ_refresh_levels).

Two questions, one run:
1. Speed: ms/refresh of the steady-state subsampled refresh at cap in
   {None, 10, 8, 6} on the full-size config (14 levels, 128^3 grid).
2. Fidelity: bitfield agreement vs the uncapped refresh from the SAME
   params + PRNG stream — the occupancy bit is the only consumer of the
   refresh density (testbed_nerf.cu:3497-3517), so agreement there is the
   whole quality question at the grid level. (A full Chamfer A/B needs a
   complete training run; this gate screens caps worth that cost.)

Params come from a trained snapshot when --snapshot is given (the honest
test: a converged field has top-level detail to lose), else from a short
fresh warm-up.

Usage (tunnel up, chip free):
  python tools/profiling/ab_occ_refresh_levels.py \
      [--snapshot runs/r3b_10k/output/snapshot_latest.msgpack]
Prints one JSON line per cap.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", default="")
    ap.add_argument("--caps", default="0,10,8,6",
                    help="comma list; 0 = uncapped")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import dataclasses

    from rnb_neus2_tpu.config import TestbedConfig, TrainConfig
    from rnb_neus2_tpu.testing.synthetic import sphere_dataset
    from rnb_neus2_tpu.train.trainer import Trainer

    ds = sphere_dataset(n_views=20, width=512, height=612, radius=0.35,
                        cam_radius=1.6, focal=900.0)
    tr = Trainer(ds, TestbedConfig(train=TrainConfig(seed=0)))
    if args.snapshot:
        from rnb_neus2_tpu.train import snapshot as snap
        snap.restore_trainer(tr, snap.load_snapshot(args.snapshot))
        print(f"# params from snapshot at step {tr.step}")
    else:
        for _ in range(64):
            tr.train_step()
        print("# params from a 64-step fresh warm-up (weak gate — "
              "prefer --snapshot)")
    tr.step = max(tr.step, 608)
    lb = tr._level_bucket()
    key = jax.random.PRNGKey(7)
    step = jnp.asarray(tr.step, jnp.int32)

    ref_bits = None
    for cap_s in args.caps.split(","):
        cap = int(cap_s) or None
        tr.cfg = dataclasses.replace(
            tr.cfg, train=dataclasses.replace(tr.cfg.train,
                                              occ_refresh_levels=cap))
        tr._compiled.pop(("occ", lb, True), None)
        occ_fn = tr._occ_update_fn(lb, subsampled=True)
        occ = occ_fn(tr.params, tr.occ, key, step)    # compile + warm
        jax.block_until_ready(occ.density)
        t0 = time.perf_counter()
        o = tr.occ
        for i in range(args.reps):
            # same fold_in stream for every cap → identical cells/jitter
            o = occ_fn(tr.params, o, jax.random.fold_in(key, i), step)
        jax.block_until_ready(o.density)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        bits = np.asarray(o.bitfield)
        if ref_bits is None:
            ref_bits = bits
        agree = float((bits == ref_bits).mean())
        occupied = float(bits.mean())
        print(json.dumps({"cap": cap or 14, "ms_per_refresh": round(ms, 1),
                          "amortized_ms_per_step": round(ms / 16, 1),
                          "bitfield_agreement_vs_uncapped": round(agree, 5),
                          "occupied_frac": round(occupied, 5)}))


if __name__ == "__main__":
    main()
