#!/usr/bin/env python3
"""Convert a NeuS-style dataset (cameras_sphere.npz + image/ + mask/) to the
testbed's transform.json layout.

Developer utility mirroring the reference's tools/data_format_from_neus.py
(torch-based); this version is numpy-only. Output: <out>/<name>/ with
images/ (RGBA = RGB + mask alpha) and transform.json (w, h, scale=0.5,
offset=[.5,.5,.5], from_na, n2w from scale_mat_0, per-frame c2w decomposed
from P = world_mat @ scale_mat).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rnb_neus2_tpu.io.dataloaders import decompose_projection  # noqa: E402


def generate(dataset_dir, output_dir,
             cameras_name="cameras_sphere.npz",
             image_folder="image", mask_folder="mask"):
    import cv2

    cams = np.load(os.path.join(dataset_dir, cameras_name))
    img_dir = os.path.join(dataset_dir, image_folder)
    msk_dir = os.path.join(dataset_dir, mask_folder)
    images = sorted(os.listdir(img_dir))
    masks = sorted(os.listdir(msk_dir)) if os.path.isdir(msk_dir) else []
    n = len(images)
    print(f"#images: {n}")

    out_img_dir = os.path.join(output_dir, "images")
    os.makedirs(out_img_dir, exist_ok=True)

    frames = []
    W = H = None
    for i, name in enumerate(images):
        img = cv2.imread(os.path.join(img_dir, name))
        if masks:
            msk = cv2.imread(os.path.join(msk_dir, masks[i]), 0)
        else:
            msk = np.full(img.shape[:2], 255, np.uint8)
        rgba = np.concatenate([img, msk[:, :, None]], axis=-1)
        H, W = rgba.shape[:2]
        cv2.imwrite(os.path.join(out_img_dir, name), rgba)

        P = (cams[f"world_mat_{i}"] @ cams[f"scale_mat_{i}"])[:3, :4]
        K, c2w = decompose_projection(P.astype(np.float32))
        frames.append({
            "file_path": f"images/{name}",
            "normal_path": f"images/{name}",
            "albedo_path": f"images/{name}",
            "transform_matrix": np.asarray(c2w, np.float64).tolist(),
            "intrinsic_matrix": np.asarray(K, np.float64).tolist(),
        })

    n2w = np.asarray(cams["scale_mat_0"], np.float64)
    transform = {
        "w": W, "h": H,
        "aabb_scale": 1.0,
        "scale": 0.5,
        "offset": [0.5, 0.5, 0.5],
        "from_na": True,
        "n2w": n2w.tolist(),
        "frames": frames,
    }
    with open(os.path.join(output_dir, "transform.json"), "w") as f:
        json.dump(transform, f, indent=4)
    print(f"Wrote {output_dir}/transform.json")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset_dir")
    p.add_argument("output_dir")
    p.add_argument("--cameras-name", default="cameras_sphere.npz")
    p.add_argument("--image-folder", default="image")
    p.add_argument("--mask-folder", default="mask")
    a = p.parse_args()
    generate(a.dataset_dir, a.output_dir, a.cameras_name, a.image_folder,
             a.mask_folder)


if __name__ == "__main__":
    main()
