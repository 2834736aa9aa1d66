"""Growth-dissection A/B matrix (VERDICT r4 task #1, round-5 fix).

Three defects found in round 5's dissection of the missing-geometry
failure:
  1. cone_angle parity bug: reference trains aabb_scale=1 scenes at
     cone=0 (uniform dt=sqrt(3)/1024, testbed_nerf.cu:3214); rounds 1-4
     trained at testbed.h:717's never-used 1/256 member default.
  2. Scene v1 skipped the reference's unit-sphere prep scaling
     (rnb_neus2/scaling.py) — object radius 0.23 unit-cube vs the 0.5
     every real prepared scene has, in-mask fraction 8% vs ~25-30%.
  3. The reduced 80x96 protocols kept focal=900 (full-res value): FOV
     +/-2.5 deg sees only the central +/-0.07 of the world — most of the
     object was OUTSIDE every test view, pinning completeness at ~0.14
     regardless of training quality.

This matrix re-measures 900-step growth with each defect corrected:
  arms = {v1, v2 (normalized+framed)} x {cone 1/256 (old), cone 0 (ref)}
All arms use scale-consistent framing (focal scaled with image width).

Output: one JSON line per arm with chamfer acc/comp, recon bounds vs GT
bounds, inv_s trajectory, in-mask fraction.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import argparse
import json
import time

import numpy as np


def run_arm(name, scene, cone, steps, out):
    import jax
    from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig,
                                      TestbedConfig, TrainConfig)
    from rnb_neus2_tpu.mesh.extract import extract_mesh
    from rnb_neus2_tpu.mesh.metrics import chamfer_distance
    from rnb_neus2_tpu.testing.synthetic import (
        composite_dataset, composite_dataset_v2,
        composite_gt_mesh, composite_gt_mesh_v2)
    from rnb_neus2_tpu.train.trainer import Trainer

    if scene == "v1":
        # focal scaled from the 512-wide full-scale scene (900*80/512)
        ds = composite_dataset(n_views=12, width=80, height=96,
                               focal=900.0 * 80 / 512)
        Vg, Fg = composite_gt_mesh(192)
    else:
        ds = composite_dataset_v2(n_views=12, width=80, height=96,
                                  focal=1550.0 * 80 / 512)
        Vg, Fg = composite_gt_mesh_v2(192)
    in_mask = float(np.asarray(ds.alpha_normal).mean())

    cfg = TestbedConfig(
        grid=HashGridConfig(n_levels=8, top_resolution=256,
                            log2_hashmap_size=15),
        train=TrainConfig(target_batch_size=1 << 13,
                          initial_rays_per_batch=256,
                          occ_grid_size=64, seed=0),
        march=MarchConfig(n_ladder=1024, cone_angle=cone),
    )
    tr = Trainer(ds, cfg)
    t0 = time.time()
    invs_traj = []
    last = {}
    for k in range(steps // 100):
        last = tr.train_steps(100, sync_every=20)
        invs_traj.append(round(float(last.get("inv_s", 0.0)), 1))
    m = extract_mesh(tr.field, tr.inference_params, resolution=128,
                     meta=ds.meta)
    ch = chamfer_distance(m["V"], m["F"], (Vg - 0.5) / 0.5, Fg)
    V = np.asarray(m["V"])
    rec = {
        "arm": name, "scene": scene, "cone": cone, "steps": steps,
        "seconds": round(time.time() - t0, 1),
        "in_mask_frac": round(in_mask, 4),
        "inv_s_traj": invs_traj,
        "loss": round(float(last.get("loss_color", -1)), 5),
        "mask": round(float(last.get("loss_mask", -1)), 5),
        "recon_lo": [round(float(x), 3) for x in V.min(0)] if len(V) else [],
        "recon_hi": [round(float(x), 3) for x in V.max(0)] if len(V) else [],
        "gt_lo": [round(float(x), 3) for x in ((Vg - 0.5) / 0.5).min(0)],
        "gt_hi": [round(float(x), 3) for x in ((Vg - 0.5) / 0.5).max(0)],
        **{k: round(v, 5) for k, v in ch.items()},
    }
    out.write(json.dumps(rec) + "\n")
    out.flush()
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=900)
    ap.add_argument("--arms", default="v1_old,v1_ref,v2_old,v2_ref")
    ap.add_argument("--out",
                    default="/root/repo/runs/r5_dissect/ab_matrix.jsonl")
    args = ap.parse_args()
    spec = {
        "v1_old": ("v1", 1.0 / 256.0),
        "v1_ref": ("v1", 0.0),
        "v2_old": ("v2", 1.0 / 256.0),
        "v2_ref": ("v2", 0.0),
    }
    with open(args.out, "a") as out:
        for arm in args.arms.split(","):
            scene, cone = spec[arm]
            run_arm(arm, scene, cone, args.steps, out)


if __name__ == "__main__":
    main()
