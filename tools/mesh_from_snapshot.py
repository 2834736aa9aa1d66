"""Extract a mesh from a saved snapshot + Chamfer-L1 vs the composite GT.

Closes VERDICT r3 task 1's "get a number on the books": the reference's
contract ends with output/mesh_<iter>.obj (src/main.cu:455-461) and the
pipeline's Chamfer postprocess; this runs that exact tail from any
snapshot without retraining.

Usage: python tools/mesh_from_snapshot.py --scene DIR --snapshot PATH \
           --iter N [--resolution 512] [--gt-resolution 384] [--out NAME]
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True)
    ap.add_argument("--snapshot", required=True)
    ap.add_argument("--iter", type=int, default=None,
                    help="default: the snapshot's own step (no retraining)")
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--gt-resolution", type=int, default=384)
    ap.add_argument("--out", default="chamfer_from_snapshot.json")
    args = ap.parse_args()

    from rnb_neus2_tpu.cli import testbed
    from rnb_neus2_tpu.mesh.metrics import chamfer_distance
    from rnb_neus2_tpu.mesh.writer import load_obj
    from rnb_neus2_tpu.testing.synthetic import composite_gt_mesh

    if args.iter is None:
        from rnb_neus2_tpu.train import snapshot as snap
        args.iter = int(snap.load_snapshot(args.snapshot)["step"])
        print(f"snapshot is at step {args.iter}; extracting there")

    t0 = time.time()
    rc = testbed.main(["--scene", args.scene, "--maxiter", str(args.iter),
                       "--no-gui", "--snapshot", args.snapshot,
                       "--save-mesh", "--resolution", str(args.resolution)])
    mesh_path = os.path.join(args.scene, "output", f"mesh_{args.iter}.obj")
    assert rc == 0 and os.path.exists(mesh_path), (rc, mesh_path)
    V, F = load_obj(mesh_path)
    Vg, Fg = composite_gt_mesh(args.gt_resolution)
    Vg = (Vg - 0.5) / 0.5  # unit-cube -> world
    ch = chamfer_distance(V, F, Vg, Fg)
    result = {"snapshot": args.snapshot, "iter": args.iter,
              "resolution": args.resolution,
              "mesh_vertices": int(len(V)),
              "seconds": round(time.time() - t0, 1),
              **{k: round(v, 6) for k, v in ch.items()}}
    out = os.path.join(args.scene, "output", args.out)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
