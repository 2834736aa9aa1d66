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

    ds = composite_dataset(n_views=12, width=80, height=96)
    Vg, Fg = composite_gt_mesh(args.gt_res)
    Vg = (Vg - 0.5) / 0.5      # unit cube -> world (SceneMeta defaults)

    def run(k):
        # log2_hashmap_size=15 keeps levels >31^3 hashed (the stochastic
        # fast path) while the bottom levels stay dense, like the full
        # 14-level config
        cfg = TestbedConfig(
            grid=HashGridConfig(n_levels=8, top_resolution=256,
                                log2_hashmap_size=15),
            network=NetworkConfig(stoch_corner_bwd=k),
            train=TrainConfig(target_batch_size=1 << 13,
                              initial_rays_per_batch=256,
                              occ_grid_size=64, seed=0),
            march=MarchConfig(n_ladder=512),
        )
        t0 = time.time()
        tr = Trainer(ds, cfg)
        last = {}
        for i in range(args.steps):
            last = tr.train_step()
            if (i + 1) % 200 == 0:
                print(f"  k={k} step={i+1} "
                      f"loss={last['loss_color']:.5f}", flush=True)
        m = extract_mesh(tr.field, tr.inference_params,
                         resolution=args.mesh_res, meta=ds.meta)
        ch = chamfer_distance(m["V"], m["F"], Vg, Fg)
        return {"k": k, "steps": args.steps,
                "final_loss_color": float(last["loss_color"]),
                "mesh_vertices": int(len(m["V"])),
                "train_seconds": round(time.time() - t0, 1),
                **{kk: round(vv, 6) for kk, vv in ch.items()}}

    exact = run(0)
    print(json.dumps({"exact": exact}), flush=True)
    stoch = run(args.k)
    ratio = stoch["chamfer_l1"] / max(exact["chamfer_l1"], 1e-12)
    out = {"exact": exact, "stoch": stoch,
           "chamfer_ratio_stoch_over_exact": round(ratio, 4)}
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
