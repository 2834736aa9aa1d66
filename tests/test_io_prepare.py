"""Data-layer tests: prepare/scaling/loaders.

Includes the rebuild of the reference's only regression test
(tests/test_prepare_albedo_alpha.py): mixed-bit-depth inputs must get an
alpha channel at each image's own bit depth.
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rnb_neus2_tpu.io import dataloaders, image_io, prepare
from rnb_neus2_tpu.io import scaling as sc
from rnb_neus2_tpu.io.dataset import load_transform_json


def _write_synth_scene(root, n_views=3, w=24, h=20, albedo_16bit=True,
                       with_mask=False):
    os.makedirs(root, exist_ok=True)
    views = []
    rng = np.random.default_rng(0)
    for i in range(n_views):
        npth = os.path.join(root, f"n_{i}.png")
        apth = os.path.join(root, f"a_{i}.png")
        cv2.imwrite(npth, rng.integers(0, 255, (h, w, 3), np.uint8
                                       ).astype(np.uint8))
        alb = rng.integers(0, 65535, (h, w, 3)).astype(np.uint16)
        if not albedo_16bit:
            alb = (alb >> 8).astype(np.uint8)
        cv2.imwrite(apth, alb)
        mpth = None
        if with_mask:
            mpth = os.path.join(root, f"m_{i}.png")
            m = np.zeros((h, w), np.uint8)
            m[4:16, 6:18] = 255
            cv2.imwrite(mpth, m)
        ang = 2 * np.pi * i / n_views
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [10 * np.cos(ang), 10 * np.sin(ang), 3.0]
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 50.0
        K[0, 2], K[1, 2] = w / 2, h / 2
        views.append({"c2w": c2w, "K": K, "normal_path": npth,
                      "albedo_path": apth, "mask_path": mpth,
                      "pose_id": str(i)})
    return {"views": views, "landmarks": None, "image_width": w,
            "image_height": h, "scale_mat": None}


def test_albedo_alpha_matches_bit_depth(tmp_path):
    """8-bit normals + 16-bit albedos, no mask → albedo alpha must be fully
    opaque at 16 bits (the reference's regression test scenario)."""
    data = _write_synth_scene(tmp_path / "in", albedo_16bit=True)
    out = tmp_path / "prep"
    prepare.prepare_testbed_data(data, str(out), scaling_mode="cameras")
    alb = cv2.imread(str(out / "albedos" / "00000.png"),
                     cv2.IMREAD_UNCHANGED)
    assert alb.dtype == np.uint16
    assert alb.shape[2] == 4
    assert np.all(alb[:, :, 3] == 65535)
    nrm = cv2.imread(str(out / "normals" / "00000.png"),
                     cv2.IMREAD_UNCHANGED)
    assert nrm.dtype == np.uint8
    assert np.all(nrm[:, :, 3] == 255)


def test_transform_json_contract(tmp_path):
    data = _write_synth_scene(tmp_path / "in")
    out = tmp_path / "prep"
    info = prepare.prepare_testbed_data(data, str(out),
                                        scaling_mode="cameras")
    tj = json.load(open(out / "transform.json"))
    assert tj["from_na"] is True
    assert tj["scale"] == 0.5 and tj["offset"] == [0.5, 0.5, 0.5]
    assert tj["aabb_scale"] == 1.0
    assert len(tj["frames"]) == 3
    n2w = np.asarray(tj["n2w"])
    np.testing.assert_allclose(n2w, info["n2w"], rtol=1e-6)
    # scale_matrix @ n2w = identity
    np.testing.assert_allclose(info["scale_matrix"] @ n2w, np.eye(4),
                               atol=1e-5)
    # rescaled camera centers lie inside the unit sphere
    for fr in tj["frames"]:
        c = np.asarray(fr["transform_matrix"])[:3, 3]
        assert np.linalg.norm(c) < 1.0 + 1e-5


def test_dataset_roundtrip(tmp_path):
    """prepare → load_transform_json reproduces the cameras."""
    data = _write_synth_scene(tmp_path / "in")
    out = tmp_path / "prep"
    info = prepare.prepare_testbed_data(data, str(out),
                                        scaling_mode="cameras")
    ds = load_transform_json(str(out))
    assert ds.n_images == 3
    assert ds.resolution == (24, 20)
    # c2w translation mapping: unit = 0.5·(s·(c−center)) + 0.5
    c0 = data["views"][0]["c2w"][:3, 3]
    expect = 0.5 * (info["scale_factor"] * (c0 - info["scene_center"])) + 0.5
    np.testing.assert_allclose(np.asarray(ds.cameras.origin[0]), expect,
                               rtol=1e-4, atol=1e-5)
    assert ds.meta.n2w_scale == pytest.approx(1.0 / info["scale_factor"],
                                              rel=1e-5)


def test_unit_sphere_scaling_math():
    pts = np.random.default_rng(1).normal(size=(500, 3)) * [2.0, 1.0, 0.5]
    pts[0] = [100, 100, 100]  # outlier to reject
    center, s, M = sc.unit_sphere_from_points(pts)
    inl = pts[np.linalg.norm(pts - pts.mean(0), axis=1)
              <= np.percentile(np.linalg.norm(pts - pts.mean(0), axis=1), 99)]
    assert np.linalg.norm(center - inl.mean(0)) < 1e-9
    hom = M @ np.concatenate([inl, np.ones((len(inl), 1))], 1).T
    assert np.linalg.norm(hom[:3], axis=0).max() <= 1.0 + 1e-9


def test_silhouette_scaling_recovers_sphere(tmp_path):
    """Render analytic circle masks of a known sphere; silhouettes_v2 must
    recover center and a scale that maps it near the unit sphere."""
    true_c = np.array([0.3, -0.2, 0.1])
    true_r = 0.5
    cams, masks = [], []
    W = H = 64
    f = 80.0
    for i in range(6):
        ang = 2 * np.pi * i / 6
        eye = true_c + 4.0 * np.array([np.cos(ang), np.sin(ang), 0.3])
        fwd = (true_c - eye)
        fwd /= np.linalg.norm(fwd)
        up = np.array([0, 0, -1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], 1)
        # rasterize the sphere's projection
        ys, xs = np.mgrid[0:H, 0:W]
        d_cam = np.stack([(xs - W / 2) / f, (ys - H / 2) / f,
                          np.ones_like(xs, float)], -1)
        d_world = d_cam @ R.T
        d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)
        oc = eye - true_c
        b = (d_world * oc).sum(-1)
        disc = b * b - ((oc * oc).sum() - true_r ** 2)
        masks.append((disc > 0).astype(np.float32))
        cams.append({"fx": f, "fy": f, "cx": W / 2, "cy": H / 2,
                     "R_cam2world": R, "center": eye})
    center, s = sc.silhouette_scaling_v2(cams, masks, sphere_scale=1.0,
                                         margin_px=2)
    assert np.linalg.norm(center - true_c) < 0.08
    # scaled sphere radius ≈ within unit sphere (margin makes it smaller)
    assert 0.5 < s * true_r <= 1.05


def test_sfm_json_loader(tmp_path):
    sfm = {
        "intrinsics": [{"intrinsicId": "i0", "width": 32, "height": 24,
                        "pxFocalLength": ["40", "41"],
                        "principalPoint": ["1.0", "-0.5"]}],
        "poses": [{"poseId": "p0", "pose": {"transform": {
            "rotation": [str(v) for v in np.eye(3).ravel()],
            "center": ["1", "2", "3"]}}}],
        "views": [{"viewId": "v0", "intrinsicId": "i0", "poseId": "p0",
                   "path": "img.png"}],
        "structure": [{"X": ["0.5", "1.0", "2.0"]}],
    }
    p = tmp_path / "scene.json"
    json.dump(sfm, open(p, "w"))
    data = dataloaders.load_data(str(p))
    v = data["views"][0]
    # world correction: y,z negated
    np.testing.assert_allclose(v["c2w"][:3, 3], [1, -2, -3])
    np.testing.assert_allclose(np.diag(v["c2w"][:3, :3]), [1, -1, -1])
    assert v["K"][0, 0] == 40 and v["K"][1, 1] == 41
    assert v["K"][0, 2] == 17.0 and v["K"][1, 2] == 11.5
    np.testing.assert_allclose(data["landmarks"][0], [0.5, -1.0, -2.0])


def test_idr_loader_roundtrip(tmp_path):
    """Build cameras.npz from a known K,[R|t]; loader must recover them."""
    root = tmp_path / "idr"
    (root / "normal").mkdir(parents=True)
    (root / "mask").mkdir()
    K = np.array([[100, 0, 16, 0], [0, 100, 12, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1.0]])
    w2c = np.eye(4)
    w2c[:3, 3] = [0.1, -0.2, 5.0]
    P = K @ w2c
    np.savez(root / "cameras.npz", world_mat_0=P.astype(np.float32),
             scale_mat_0=np.eye(4, dtype=np.float32))
    cv2.imwrite(str(root / "normal" / "000.png"),
                np.zeros((24, 32, 3), np.uint8))
    cv2.imwrite(str(root / "mask" / "000.png"),
                np.full((24, 32), 255, np.uint8))
    data = dataloaders.load_data(str(root))
    v = data["views"][0]
    np.testing.assert_allclose(v["K"][0, 0], 100, rtol=1e-4)
    np.testing.assert_allclose(v["K"][0, 2], 16, atol=1e-3)
    c2w_expected = np.linalg.inv(w2c)
    np.testing.assert_allclose(v["c2w"][:3, 3], c2w_expected[:3, 3],
                               atol=1e-4)


def test_image_io_decode_roundtrip():
    """srgb_to_linear ∘ linear_to_srgb inside the mask is an exact
    round-trip — the property the engine's decode path relies on."""
    v = np.linspace(0, 1, 101, dtype=np.float32)
    np.testing.assert_allclose(
        image_io.linear_to_srgb(image_io.srgb_to_linear(v)), v, atol=2e-4)
    # outside mask (alpha 0) everything collapses to 0
    rgb = np.random.default_rng(0).random((4, 4, 3)).astype(np.float32)
    out = image_io.decode_texel(rgb, np.zeros((4, 4), np.float32))
    assert np.all(out == 0)
    n = image_io.decode_normal(rgb, np.zeros((4, 4), np.float32))
    np.testing.assert_allclose(n, np.broadcast_to(
        np.array([-1, 1, 1]) / np.sqrt(3), n.shape), rtol=1e-5)
