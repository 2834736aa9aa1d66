"""Bit-level parity vs the REFERENCE's own Python data layer.

The reference's rnb_neus2 package (prepare/scaling/dataloaders) is pure
numpy/cv2/scipy and runs in this environment, so we execute it directly on
synthetic scenes and require our implementation to match its outputs:
scale matrices, rescaled cameras, written RGBA PNGs, and transform.json.
(Only the CUDA testbed is unportable; this pins the whole CPU data path.)
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REF = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REF, "rnb_neus2"))

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_pkg():
    sys.path.insert(0, REF)
    import rnb_neus2.prepare as ref_prepare
    import rnb_neus2.scaling as ref_scaling
    yield ref_prepare, ref_scaling
    sys.path.remove(REF)


def _scene(tmp, n_views=4, w=20, h=16, with_mask=True):
    rng = np.random.default_rng(7)
    views = []
    os.makedirs(tmp, exist_ok=True)
    for i in range(n_views):
        npth = os.path.join(tmp, f"n_{i}.png")
        cv2.imwrite(npth, rng.integers(0, 65535, (h, w, 3)).astype(np.uint16))
        apth = os.path.join(tmp, f"a_{i}.png")
        cv2.imwrite(apth, rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
        mpth = None
        if with_mask:
            mpth = os.path.join(tmp, f"m_{i}.png")
            m = np.zeros((h, w), np.uint8)
            m[3:12, 4:15] = 255
            cv2.imwrite(mpth, m)
        ang = 2 * np.pi * i / n_views
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.array([[np.cos(ang), -np.sin(ang), 0],
                                [np.sin(ang), np.cos(ang), 0],
                                [0, 0, 1]], np.float32)
        c2w[:3, 3] = [8 * np.cos(ang), 8 * np.sin(ang), 2.0]
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1] = 40.0, 42.0
        K[0, 2], K[1, 2] = w / 2 + 0.3, h / 2 - 0.2
        views.append({"c2w": c2w, "K": K, "normal_path": npth,
                      "albedo_path": apth, "mask_path": mpth,
                      "pose_id": str(i)})
    return {"views": views, "landmarks": rng.normal(size=(50, 3)) * 2,
            "image_width": w, "image_height": h, "scale_mat": None}


class _Quiet:
    def info(self, *_):
        pass

    warning = error = info


def test_unit_sphere_scaling_parity(ref_pkg, tmp_path):
    _, ref_scaling = ref_pkg
    from rnb_neus2_tpu.io import scaling as ours

    pts = np.random.default_rng(3).normal(size=(400, 3)) * [3, 2, 1]
    c_r, s_r, m_r = ref_scaling.compute_unit_sphere_scaling(pts, 1.0)
    c_o, s_o, m_o = ours.unit_sphere_from_points(pts, 1.0)
    np.testing.assert_allclose(c_o, c_r, rtol=1e-7)
    assert abs(s_o - s_r) < 1e-9
    np.testing.assert_allclose(m_o, m_r, rtol=1e-6)


def test_silhouette_v1_parity(ref_pkg):
    _, ref_scaling = ref_pkg
    from rnb_neus2_tpu.io import scaling as ours

    rng = np.random.default_rng(1)
    cams, masks = [], []
    for i in range(5):
        ang = 2 * np.pi * i / 5
        R = np.array([[np.cos(ang), 0, -np.sin(ang)],
                      [0, 1, 0],
                      [np.sin(ang), 0, np.cos(ang)]])
        cams.append({"fx": 50.0, "fy": 52.0, "cx": 16.0, "cy": 12.0,
                     "R_cam2world": R,
                     "center": R @ np.array([0, 0, -5.0])})
        m = np.zeros((24, 32), np.float32)
        m[6:18, 10:22] = 1.0
        masks.append(m)
    c_r, s_r = ref_scaling.compute_scaling_from_silhouettes(cams, masks)
    c_o, s_o = ours.silhouette_scaling(cams, masks)
    np.testing.assert_allclose(c_o, c_r, rtol=1e-6, atol=1e-9)
    assert abs(s_o - s_r) / s_r < 1e-6


def test_silhouette_v2_parity(ref_pkg):
    _, ref_scaling = ref_pkg
    from rnb_neus2_tpu.io import scaling as ours

    cams, masks = [], []
    for i in range(4):
        ang = 2 * np.pi * i / 4
        R = np.array([[np.cos(ang), 0, -np.sin(ang)],
                      [0, 1, 0],
                      [np.sin(ang), 0, np.cos(ang)]])
        cams.append({"fx": 60.0, "fy": 60.0, "cx": 24.0, "cy": 18.0,
                     "R_cam2world": R,
                     "center": R @ np.array([0.2, -0.1, -6.0])})
        m = np.zeros((36, 48), np.float32)
        m[10:26, 16:32] = 1.0
        masks.append(m)
    c_r, s_r = ref_scaling.compute_scaling_from_silhouettes_v2(
        cams, masks, sphere_scale=1.0, margin_px=5)
    c_o, s_o = ours.silhouette_scaling_v2(cams, masks, sphere_scale=1.0,
                                          margin_px=5)
    np.testing.assert_allclose(c_o, c_r, atol=2e-3)
    assert abs(s_o - s_r) / s_r < 2e-3


def test_prepare_outputs_bitwise_parity(ref_pkg, tmp_path):
    ref_prepare, _ = ref_pkg
    data = _scene(str(tmp_path / "in"))
    out_ref = str(tmp_path / "ref")
    out_ours = str(tmp_path / "ours")

    ref_prepare.prepare_testbed_data(data, out_ref, _Quiet(),
                                     scaling_mode="cameras")
    from rnb_neus2_tpu.io.prepare import prepare_testbed_data
    prepare_testbed_data(data, out_ours, _Quiet(), scaling_mode="cameras")

    tj_r = json.load(open(os.path.join(out_ref, "transform.json")))
    tj_o = json.load(open(os.path.join(out_ours, "transform.json")))
    for k in ("w", "h", "aabb_scale", "scale", "offset", "from_na"):
        assert tj_o[k] == tj_r[k], k
    np.testing.assert_allclose(tj_o["n2w"], tj_r["n2w"], rtol=1e-6,
                               atol=1e-9)
    assert len(tj_o["frames"]) == len(tj_r["frames"])
    for fo, fr in zip(tj_o["frames"], tj_r["frames"]):
        assert fo["normal_path"] == fr["normal_path"]
        np.testing.assert_allclose(fo["transform_matrix"],
                                   fr["transform_matrix"], atol=1e-5)
        np.testing.assert_allclose(fo["intrinsic_matrix"],
                                   fr["intrinsic_matrix"], rtol=1e-6)
    # written images must match BIT FOR BIT
    for sub in ("normals", "albedos"):
        for name in sorted(os.listdir(os.path.join(out_ref, sub))):
            a = cv2.imread(os.path.join(out_ref, sub, name),
                           cv2.IMREAD_UNCHANGED)
            b = cv2.imread(os.path.join(out_ours, sub, name),
                           cv2.IMREAD_UNCHANGED)
            assert a.dtype == b.dtype and a.shape == b.shape, (sub, name)
            np.testing.assert_array_equal(a, b, err_msg=f"{sub}/{name}")


def test_composite_scene_prepare_parity(ref_pkg, tmp_path):
    """VERDICT r2 item #6: the ACTUAL run scene's content through the
    reference's own prepare. Renders the composite analytic scene (the
    10k-run stand-in for DiLiGenT-MV) to RAW loader-contract inputs —
    real normal maps, partial masks, bright/dark albedo — and requires
    our prepare to match the reference's bit for bit on the production
    scaling mode (silhouettes_v2), plus a decode round-trip: loading the
    REFERENCE-prepared directory with our training dataset loader must
    recover the analytic camera-space normals inside the mask. This
    pins the entire data layer out of the divergence investigation."""
    ref_prepare, _ = ref_pkg
    from rnb_neus2_tpu.testing.synthetic import (render_composite_views,
                                                 ring_cameras)

    W, H = 128, 153
    cams = ring_cameras(4, 1.6, W, H, focal=225.0)
    normals, albedo, alphas = render_composite_views(cams)
    rots = np.asarray(cams.rot_c2w)
    origins = np.asarray(cams.origin)

    raw = tmp_path / "raw"
    raw.mkdir()
    views = []
    for i in range(4):
        # raw input convention = the stored normal convention (the y/z
        # negation happens at training time, testbed_nerf.cu:1507-1510)
        stored = normals[i] * np.array([1.0, -1.0, -1.0])
        npth = str(raw / f"n_{i}.png")
        cv2.imwrite(npth, ((stored[..., ::-1] + 1) / 2 * 65535
                           ).astype(np.uint16))
        apth = str(raw / f"a_{i}.png")
        cv2.imwrite(apth, (albedo[i][..., ::-1] * 65535).astype(np.uint16))
        mpth = str(raw / f"m_{i}.png")
        cv2.imwrite(mpth, (alphas[i] * 255).astype(np.uint8))
        c2w = np.eye(4, dtype=np.float64)
        c2w[:3, :3] = rots[i]
        c2w[:3, 3] = (origins[i] - 0.5) / 0.5      # world coords
        K = np.eye(4, dtype=np.float64)
        K[0, 0] = K[1, 1] = 225.0
        K[0, 2], K[1, 2] = W / 2, H / 2
        views.append({"c2w": c2w, "K": K, "normal_path": npth,
                      "albedo_path": apth, "mask_path": mpth,
                      "pose_id": str(i)})
    data = {"views": views, "landmarks": None,
            "image_width": W, "image_height": H, "scale_mat": None}

    out_ref = str(tmp_path / "ref")
    out_ours = str(tmp_path / "ours")
    ref_prepare.prepare_testbed_data(data, out_ref, _Quiet(),
                                     scaling_mode="silhouettes_v2")
    from rnb_neus2_tpu.io.prepare import prepare_testbed_data
    prepare_testbed_data(data, out_ours, _Quiet(),
                         scaling_mode="silhouettes_v2")

    tj_r = json.load(open(os.path.join(out_ref, "transform.json")))
    tj_o = json.load(open(os.path.join(out_ours, "transform.json")))
    for k in ("w", "h", "aabb_scale", "scale", "offset", "from_na"):
        assert tj_o[k] == tj_r[k], k
    np.testing.assert_allclose(tj_o["n2w"], tj_r["n2w"], rtol=1e-6,
                               atol=1e-9)
    for fo, fr in zip(tj_o["frames"], tj_r["frames"]):
        np.testing.assert_allclose(fo["transform_matrix"],
                                   fr["transform_matrix"], atol=1e-5)
        np.testing.assert_allclose(fo["intrinsic_matrix"],
                                   fr["intrinsic_matrix"], rtol=1e-6)
    for sub in ("normals", "albedos"):
        for name in sorted(os.listdir(os.path.join(out_ref, sub))):
            a = cv2.imread(os.path.join(out_ref, sub, name),
                           cv2.IMREAD_UNCHANGED)
            b = cv2.imread(os.path.join(out_ours, sub, name),
                           cv2.IMREAD_UNCHANGED)
            np.testing.assert_array_equal(a, b, err_msg=f"{sub}/{name}")

    # decode round-trip: OUR training loader on the REF-prepared dir
    # recovers the analytic camera normals (the loader applies the
    # training-time y/z negation, so it must undo the storage flip)
    from rnb_neus2_tpu.io.dataset import load_transform_json
    ds = load_transform_json(out_ref)
    dec = np.asarray(ds.normals)
    mask = np.asarray(ds.alpha_normal) > 0.99
    for i in range(4):
        m = mask[i]
        if m.sum() == 0:
            continue
        err = np.linalg.norm(dec[i][m] - normals[i][m], axis=-1)
        # 16-bit quantization + sRGB decode round-trip tolerance
        assert np.percentile(err, 99) < 0.01, err.max()


def test_idr_loader_parity(ref_pkg, tmp_path):
    import rnb_neus2.dataloaders as ref_dl
    from rnb_neus2_tpu.io import dataloaders as ours

    root = tmp_path / "idr"
    (root / "normal").mkdir(parents=True)
    K = np.array([[90, 2.0, 15, 0], [0, 95, 11, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1.0]])
    w2c = np.eye(4)
    w2c[:3, :3] = cv2.Rodrigues(np.array([0.1, -0.2, 0.3]))[0]
    w2c[:3, 3] = [0.4, -0.1, 4.0]
    P = K @ w2c
    scale = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    scale[:3, 3] = [0.1, 0.2, 0.3]
    np.savez(root / "cameras.npz", world_mat_0=P.astype(np.float32),
             scale_mat_0=scale)
    cv2.imwrite(str(root / "normal" / "000.png"),
                np.zeros((22, 30, 3), np.uint8))

    ref = ref_dl.load_data(str(root))
    got = ours.load_data(str(root))
    vr, vo = ref["views"][0], got["views"][0]
    np.testing.assert_allclose(vo["c2w"], vr["c2w"], atol=1e-5)
    np.testing.assert_allclose(vo["K"], vr["K"], rtol=1e-5)
    assert got["image_width"] == ref["image_width"]
