"""Silhouette-error dissection from snapshots (VERDICT r3 weak #1 / task 5).

The logged mask EMA is sum(BCE * ray_alive) / n_rays_in_batch — it
confounds the true silhouette fit with the alive-ray fraction (more
alive rays => larger metric at identical geometry) AND with the
sigmoid-BCE floor (a PERFECT in-mask ray still scores −log σ(1−1e−4)
≈ 0.313, a perfect out-mask ray −log(1−σ(1e−4)) ≈ 0.693 — the
reference's sigmoid-of-weight-sum form, testbed_nerf.cu:1756-1777,
never reaches zero). So a rising mask EMA is NOT by itself evidence of
geometry erosion. This tool renders full silhouettes from snapshots and
reports what actually moved:

  per view: IoU(alpha>0.5, mask_gt), erosion px (gt=1, alpha<0.5),
  dilation px (gt=0, alpha>0.5), each split into a boundary band
  (within --band px of the GT silhouette edge — sub-pixel fit wobble)
  vs far (real holes / floaters), plus the mean sigmoid-BCE over
  in-mask/out-mask pixels and the alive fraction.

Compare several snapshots (e.g. stage-1 end vs stage-2 end) in one
invocation to see whether the mask-EMA rise is compositional or real.

Usage: python tools/profiling/silhouette_dissect.py --scene DIR \
           --snapshot A.msgpack [--snapshot B.msgpack ...] \
           [--views 0,7,14] [--render-scale 0.5] [--save-png]
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import argparse
import dataclasses
import json
import os

import numpy as np


def silhouette_metrics(alpha: np.ndarray, gt_alpha: np.ndarray,
                       band_px: int = 2) -> dict:
    """alpha: rendered weight-sum image (H,W); gt_alpha: (H,W) in [0,1]."""
    from scipy import ndimage

    gt = gt_alpha > 0.99            # training mask_gt (losses.py:52)
    pred = alpha > 0.5
    inter = np.sum(pred & gt)
    union = np.sum(pred | gt)
    # distance (px) to the GT silhouette boundary, both sides
    d_in = ndimage.distance_transform_edt(gt)
    d_out = ndimage.distance_transform_edt(~gt)
    dist = np.where(gt, d_in, d_out)
    near = dist <= band_px

    erosion = gt & ~pred
    dilation = pred & ~gt
    ws = np.clip(alpha, 1e-4, 1.0 - 1e-4)
    sig = 1.0 / (1.0 + np.exp(-ws))
    bce = -(gt * np.log(sig) + (~gt) * np.log(1.0 - sig))
    return {
        "iou": float(inter / max(union, 1)),
        "gt_px": int(np.sum(gt)),
        "erosion_px": int(np.sum(erosion)),
        "erosion_far_px": int(np.sum(erosion & ~near)),
        "erosion_far_maxdist": float(np.max(dist[erosion & ~near])
                                     if np.any(erosion & ~near) else 0.0),
        "dilation_px": int(np.sum(dilation)),
        "dilation_far_px": int(np.sum(dilation & ~near)),
        "dilation_far_maxdist": float(np.max(dist[dilation & ~near])
                                     if np.any(dilation & ~near) else 0.0),
        "bce_in_mask": float(np.mean(bce[gt])) if np.any(gt) else 0.0,
        "bce_out_mask": float(np.mean(bce[~gt])) if np.any(~gt) else 0.0,
        "mean_alpha_in": float(np.mean(alpha[gt])) if np.any(gt) else 0.0,
        "mean_alpha_out": float(np.mean(alpha[~gt])) if np.any(~gt)
        else 0.0,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True)
    ap.add_argument("--snapshot", action="append", required=True)
    ap.add_argument("--views", default="0,7,14")
    ap.add_argument("--render-scale", type=float, default=0.5)
    ap.add_argument("--max-samples", type=int, default=192)
    ap.add_argument("--band", type=int, default=2)
    ap.add_argument("--save-png", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from rnb_neus2_tpu.config import TestbedConfig
    from rnb_neus2_tpu.io.dataset import load_transform_json
    from rnb_neus2_tpu.render.renderer import render_view
    from rnb_neus2_tpu.train import snapshot as snap
    from rnb_neus2_tpu.train.trainer import Trainer

    views = [int(v) for v in args.views.split(",")]
    ds = load_transform_json(args.scene)
    cfg = TestbedConfig()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, fused_steps=1))
    tr = Trainer(ds, cfg)

    results = []
    for path in args.snapshot:
        snap.restore_trainer(tr, snap.load_snapshot(path))
        row = {"snapshot": path, "step": int(tr.step), "views": {}}
        for v in views:
            out = render_view(tr.field, tr.inference_params,
                              ds.cameras, v, tr.occ.bitfield, cfg.march,
                              max_samples=args.max_samples,
                              render_scale=args.render_scale)
            gt = np.asarray(ds.alpha_normal[v])
            if args.render_scale != 1.0:
                # render_view upsampled back to full res; compare there
                pass
            m = silhouette_metrics(out["alpha"], gt, args.band)
            row["views"][v] = m
            print(f"step {tr.step} view {v}: iou={m['iou']:.4f} "
                  f"ero={m['erosion_px']} (far {m['erosion_far_px']}, "
                  f"maxd {m['erosion_far_maxdist']:.0f}px) "
                  f"dil={m['dilation_px']} (far {m['dilation_far_px']}, "
                  f"maxd {m['dilation_far_maxdist']:.0f}px) "
                  f"bce_in={m['bce_in_mask']:.4f} "
                  f"bce_out={m['bce_out_mask']:.4f}", flush=True)
            if args.save_png:
                from rnb_neus2_tpu.io.image_io import save_image
                gtm = (gt > 0.99).astype(np.float32)
                pm = (out["alpha"] > 0.5).astype(np.float32)
                # red = erosion (gt not covered), green = dilation
                err = np.stack([gtm * (1 - pm), pm * (1 - gtm),
                                np.zeros_like(pm)], -1)
                save_image(err, f"{os.path.splitext(path)[0]}"
                           f"_silherr_v{v}.png", bit_depth=8)
        results.append(row)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
