"""Replay the full-scale step-1400 → 1550 window from a saved healthy
snapshot with a chosen backward estimator, logging PER-STEP metrics.

Both full-scale composite runs (w-mixture K=2 and magnitude-proportional
K=2) diverged at step ~1500; they share the seed/PRNG trajectory, so the
step coincidence alone cannot separate "stochastic-gradient noise" from
"a deterministic event near step 1500". Replaying the SAME healthy
step-1400 state under K=0 (exact) vs K=2 from identical params answers
it directly — CPU-runnable (slow but tractable for ~150 steps).

Usage: python tools/profiling/replay_divergence.py --k 0 --steps 150 \
           [--snapshot runs/snapshot_k2magprop_step1400.msgpack]
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, required=True)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--snapshot",
                    default="/root/repo/runs/snapshot_k2magprop_step1400"
                            ".msgpack")
    ap.add_argument("--scene", default="/root/repo/runs/composite_scene")
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--ek-weight", type=float, default=None)
    ap.add_argument("--mask-weight", type=float, default=None)
    ap.add_argument("--sg-alpha", action="store_true",
                    help="stop-grad ∇sdf through the alpha path")
    ap.add_argument("--sg-shade", action="store_true",
                    help="stop-grad ∇sdf through the shading path")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--freeze-occ", action="store_true",
                    help="skip occupancy refreshes during the replay")
    ap.add_argument("--sg-sdf", action="store_true",
                    help="stop-grad sdf through the alpha path")
    ap.add_argument("--no-rgbplus", action="store_true")
    ap.add_argument("--floor", type=float, default=None,
                    help="rgbplus_grad_floor override (0 = reference's "
                         "bare +1e-5 jacobian shift)")
    ap.add_argument("--fp16-emu", action="store_true",
                    help="emulate the reference's fp16 loss-gradient chain")
    ap.add_argument("--no-guard", action="store_true",
                    help="disable the divergence guard so raw (in)stability "
                         "is observable")
    ap.add_argument("--dense-adam", action="store_true",
                    help="control arm: rounds-1/2 dense optax Adam instead "
                         "of the tcnn-exact sparse Adam default")
    args = ap.parse_args()

    import dataclasses

    from rnb_neus2_tpu.config import TestbedConfig
    from rnb_neus2_tpu.io.dataset import load_transform_json
    from rnb_neus2_tpu.train import snapshot as snap
    from rnb_neus2_tpu.train.trainer import Trainer

    ds = load_transform_json(args.scene)
    cfg = TestbedConfig()
    cfg = dataclasses.replace(
        cfg, network=dataclasses.replace(
            cfg.network, stoch_corner_bwd=args.k),
        train=dataclasses.replace(cfg.train, light_prng_salt=args.salt,
                                  fused_steps=1))
    loss = cfg.loss
    if args.ek_weight is not None:
        loss = dataclasses.replace(loss, ek_loss_weight=args.ek_weight)
    if args.mask_weight is not None:
        loss = dataclasses.replace(loss, mask_loss_weight=args.mask_weight)
    if args.sg_alpha:
        loss = dataclasses.replace(loss, debug_stopgrad_alpha_normal=True)
    if args.sg_shade:
        loss = dataclasses.replace(loss, debug_stopgrad_shading_normal=True)
    if args.sg_sdf:
        loss = dataclasses.replace(loss, debug_stopgrad_alpha_sdf=True)
    if args.floor is not None:
        loss = dataclasses.replace(loss, rgbplus_grad_floor=args.floor)
    if args.fp16_emu:
        loss = dataclasses.replace(loss, fp16_grad_emulation=True)
    cfg = dataclasses.replace(cfg, loss=loss)
    if args.no_guard:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, divergence_guard=False))
    if args.no_rgbplus:
        cfg = dataclasses.replace(cfg, flags=dataclasses.replace(
            cfg.flags, apply_rgbplus=False))
    if args.lr is not None:
        cfg = dataclasses.replace(cfg, optimizer=dataclasses.replace(
            cfg.optimizer, learning_rate=args.lr))
    if args.dense_adam:
        cfg = dataclasses.replace(cfg, optimizer=dataclasses.replace(
            cfg.optimizer, sparse_adam=False))
    tr = Trainer(ds, cfg)
    snap.restore_trainer(tr, snap.load_snapshot(args.snapshot))
    if args.freeze_occ:
        # _occ_update_fn(bucket, subsampled) returns the jitted refresh fn
        tr._occ_update_fn = lambda *a, **k: (lambda *a2, **k2: tr.occ)
    print(f"resumed at step {tr.step}, k={args.k}", flush=True)
    for _ in range(args.steps):
        t0 = time.time()
        out = tr.train_step()
        print(f"step={tr.step} loss={out['loss_color']:.6f} "
              f"ek={out['loss_ek']:.5f} mask={out['loss_mask']:.4f} "
              f"ws={out['weight_sum_mean']:.4f} "
              f"rays={out['rays_per_batch']} "
              f"({time.time() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
