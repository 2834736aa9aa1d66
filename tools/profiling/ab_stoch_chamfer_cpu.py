"""Geometry-level A/B of the stochastic corner backward, CPU-runnable.

The loss-trajectory A/B (tests/test_train_e2e.py::
test_stochastic_corner_bwd_convergence_ab) shows K=2 converges like the
exact backward on a sphere; flipping the default additionally wants
evidence that the RECONSTRUCTED SURFACE is as good. This trains the
composite analytic scene (sphere ∪ torus ∪ rounded box) twice at a
reduced-but-hashed config — identical seeds/data, stoch_corner_bwd 0 vs
K — extracts meshes through the product path, and reports Chamfer-L1
against the exact analytic GT surface.

Runs on CPU (no TPU tunnel needed): ~tens of minutes.
Usage: python tools/profiling/ab_stoch_chamfer_cpu.py [--k 2]
                [--steps 1200] [--mesh-res 160]
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import argparse  # noqa: E402
import dataclasses  # noqa: E402
import json  # noqa: E402
import time  # noqa: E402

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--steps", type=int, default=900)
    ap.add_argument("--mesh-res", type=int, default=128)
    ap.add_argument("--gt-res", type=int, default=192)
    ap.add_argument("--seeds", default="0",
                    help="comma-separated seeds; >1 turns on the "
                         "multi-seed protocol (every arm run per seed, "
                         "mean/std aggregated)")
    ap.add_argument("--ks", default=None,
                    help="comma-separated arm list, e.g. 0,2,1 "
                         "(default: 0 and --k)")
    ap.add_argument("--levels", type=int, default=8)
    ap.add_argument("--top-res", type=int, default=256)
    ap.add_argument("--log2-hashmap", type=int, default=15)
    ap.add_argument("--out",
                    default="/root/repo/runs/ab_stoch_chamfer_cpu.json")
    args = ap.parse_args()

    from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig,
                                      NetworkConfig, TestbedConfig,
                                      TrainConfig)
    from rnb_neus2_tpu.mesh.extract import extract_mesh
    from rnb_neus2_tpu.mesh.metrics import chamfer_distance
    from rnb_neus2_tpu.testing.synthetic import (composite_dataset,
                                                 composite_gt_mesh)
    from rnb_neus2_tpu.train.trainer import Trainer

    ds = composite_dataset(n_views=12, width=80, height=96,
                          focal=900.0 * 80 / 512)
    Vg, Fg = composite_gt_mesh(args.gt_res)
    Vg = (Vg - 0.5) / 0.5      # unit cube -> world (SceneMeta defaults)

    def run(k, seed):
        # default log2_hashmap_size=15 keeps levels >31^3 hashed (the
        # stochastic fast path) while the bottom levels stay dense; pass
        # --levels 14 --top-res 2048 --log2-hashmap 19 for the full
        # production grid shape
        cfg = TestbedConfig(
            grid=HashGridConfig(n_levels=args.levels,
                                top_resolution=args.top_res,
                                log2_hashmap_size=args.log2_hashmap),
            network=NetworkConfig(stoch_corner_bwd=k),
            train=TrainConfig(target_batch_size=1 << 13,
                              initial_rays_per_batch=256,
                              occ_grid_size=64, seed=seed),
            march=MarchConfig(n_ladder=512),
        )
        t0 = time.time()
        tr = Trainer(ds, cfg)
        last = {}
        for i in range(args.steps):
            last = tr.train_step()
            if (i + 1) % 200 == 0:
                print(f"  k={k} seed={seed} step={i+1} "
                      f"loss={last['loss_color']:.5f}", flush=True)
        m = extract_mesh(tr.field, tr.inference_params,
                         resolution=args.mesh_res, meta=ds.meta)
        ch = chamfer_distance(m["V"], m["F"], Vg, Fg)
        return {"k": k, "seed": seed, "steps": args.steps,
                "final_loss_color": float(last["loss_color"]),
                "mesh_vertices": int(len(m["V"])),
                "train_seconds": round(time.time() - t0, 1),
                **{kk: round(vv, 6) for kk, vv in ch.items()}}

    seeds = [int(s) for s in args.seeds.split(",")]
    ks = ([int(s) for s in args.ks.split(",")] if args.ks
          else [0, args.k])
    if len(seeds) == 1 and len(ks) == 2:
        # original two-arm protocol, output layout unchanged
        exact = run(0, seeds[0])
        print(json.dumps({"exact": exact}), flush=True)
        stoch = run(args.k, seeds[0])
        ratio = stoch["chamfer_l1"] / max(exact["chamfer_l1"], 1e-12)
        out = {"exact": exact, "stoch": stoch,
               "chamfer_ratio_stoch_over_exact": round(ratio, 4)}
    else:
        # multi-seed protocol: every arm per seed; ratios are paired
        # per seed against that seed's exact arm, then summarized
        runs = {k: [] for k in ks}
        for seed in seeds:
            for k in ks:
                r = run(k, seed)
                runs[k].append(r)
                # checkpoint partial results: hours-long on this host
                with open(args.out + ".partial", "w") as f:
                    json.dump({str(kk): v for kk, v in runs.items()}, f)
                print(json.dumps(r), flush=True)
        summary = {}
        for k in ks:
            ch = np.asarray([r["chamfer_l1"] for r in runs[k]])
            summary[f"k{k}"] = {
                "chamfer_l1_mean": round(float(ch.mean()), 6),
                "chamfer_l1_std": round(float(ch.std()), 6),
                "chamfer_l1_per_seed": [round(float(v), 6) for v in ch],
            }
            if 0 in ks and k != 0:
                base = np.asarray([r["chamfer_l1"] for r in runs[0]])
                ratios = ch / np.maximum(base, 1e-12)
                summary[f"k{k}"]["ratio_vs_exact_per_seed"] = [
                    round(float(v), 4) for v in ratios]
                summary[f"k{k}"]["ratio_vs_exact_mean"] = round(
                    float(ratios.mean()), 4)
        out = {"arms": {str(k): runs[k] for k in ks},
               "summary": summary, "seeds": seeds,
               "config": {"levels": args.levels, "top_res": args.top_res,
                          "log2_hashmap": args.log2_hashmap,
                          "steps": args.steps}}
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
