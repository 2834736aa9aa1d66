"""pyalicevision-backed SfM loader, exercised against a mocked
`pyalicevision` package (the real bindings are an optional dependency;
the loader must produce the standard contract dict through them —
reference rnb_neus2/dataloaders/sfm_pyav_loader.py)."""

import os
import sys
import types

import numpy as np
import pytest


class _Vec2:
    def __init__(self, x, y):
        self._x, self._y = x, y

    def x(self):
        return self._x

    def y(self):
        return self._y


class _Image:
    def __init__(self, path, w, h):
        self._p, self._w, self._h = path, w, h

    def getImagePath(self):
        return self._p

    def getWidth(self):
        return self._w

    def getHeight(self):
        return self._h


class _View:
    def __init__(self, pose_id, img, intrinsic_id=0):
        self._pose = pose_id
        self._img = img
        self._intr = intrinsic_id

    def getPoseId(self):
        return self._pose

    def getImage(self):
        return self._img

    def getIntrinsicId(self):
        return self._intr


class _Transform:
    def __init__(self, R, c):
        self._R, self._c = R, c

    def rotation(self):
        return self._R

    def center(self):
        return self._c


class _Pose:
    def __init__(self, tf):
        self._tf = tf

    def getTransform(self):
        return self._tf


class _Landmark:
    def __init__(self, X):
        self.X = X


class _PinholeCam:
    """Has focal accessors + principal point."""

    def __init__(self, fx, fy, cx, cy):
        self._f = (fx, fy)
        self._pp = (cx, cy)

    def getFocalLengthPixX(self):
        return self._f[0]

    def getFocalLengthPixY(self):
        return self._f[1]

    def getPrincipalPoint(self):
        return self._pp


class _Intrinsic:
    def __init__(self, pinhole=None, scale=(100.0, 101.0),
                 offset=(10.0, 11.0)):
        self.pinhole = pinhole
        self._scale = _Vec2(*scale)
        self._offset = _Vec2(*offset)

    def getScale(self):
        return self._scale

    def getOffset(self):
        return self._offset


class _SfM:
    instances = []

    def __init__(self):
        self.views = {}
        self.intrinsics = {}
        self.landmarks = {}
        self.poses = {}
        _SfM.instances.append(self)

    def getViews(self):
        return self.views

    def getIntrinsics(self):
        return self.intrinsics

    def getLandmarks(self):
        return self.landmarks

    def isPoseAndIntrinsicDefined(self, pose_id):
        return pose_id in self.poses

    def getPose(self, view):
        return self.poses[view.getPoseId()]


def _install_mock(monkeypatch, payloads):
    """payloads: path -> configured _SfM (or None for load failure)."""
    pkg = types.ModuleType("pyalicevision")

    sfm_data_mod = types.SimpleNamespace(SfMData=_SfM)
    loaded = {}

    def load(data, path, flags):
        src = payloads.get(path)
        if src is None:
            return False
        data.views = src.views
        data.intrinsics = src.intrinsics
        data.landmarks = src.landmarks
        data.poses = src.poses
        return True

    sfm_io = types.SimpleNamespace(load=load, ALL=object())

    class Pinhole:
        @staticmethod
        def cast(intr):
            return intr.pinhole

    camera = types.SimpleNamespace(Pinhole=Pinhole)
    numeric = types.SimpleNamespace(getX=lambda pp: pp[0],
                                    getY=lambda pp: pp[1])
    pkg.sfmData = sfm_data_mod
    pkg.sfmDataIO = sfm_io
    pkg.camera = camera
    pkg.numeric = numeric
    monkeypatch.setitem(sys.modules, "pyalicevision", pkg)
    return pkg


def _scene(tmp_path):
    sfm = _SfM.__new__(_SfM)
    sfm.views = {}
    sfm.intrinsics = {0: _Intrinsic(pinhole=_PinholeCam(800, 810, 320, 240))}
    sfm.landmarks = {7: _Landmark(np.array([1.0, 2.0, 3.0]))}
    sfm.poses = {}
    R = np.eye(3, dtype=np.float32)
    for pid in (11, 22):
        img = tmp_path / f"n{pid}.png"
        img.write_bytes(b"")
        sfm.views[pid] = _View(pid, _Image(str(img), 640, 480))
        sfm.poses[pid] = _Pose(_Transform(R, np.array([0.1 * pid, 0, 1.0])))
    # a secondary (non-representative) view: poseId != viewId
    sfm.views[33] = _View(11, _Image(str(tmp_path / "x.png"), 640, 480))
    return sfm


def test_pyav_loader_contract(monkeypatch, tmp_path):
    from rnb_neus2_tpu.io import dataloaders as dl

    scene = _scene(tmp_path)
    sfm_path = str(tmp_path / "normals.sfm")
    _install_mock(monkeypatch, {sfm_path: scene})
    out = dl.load_sfm_scene_pyav(sfm_path)
    assert out["image_width"] == 640 and out["image_height"] == 480
    assert len(out["views"]) == 2            # representative views only
    v = out["views"][0]
    assert v["pose_id"] == "11"
    K = v["K"]
    assert K[0, 0] == 800 and K[1, 1] == 810
    assert K[0, 2] == 320 and K[1, 2] == 240
    # Y/Z flip on c2w (AliceVision frame -> world)
    c2w = v["c2w"]
    np.testing.assert_allclose(c2w[:3, :3],
                               np.diag([1, -1, -1]), atol=1e-6)
    np.testing.assert_allclose(c2w[:3, 3], [1.1, 0, -1.0], atol=1e-6)
    # landmarks flipped
    np.testing.assert_allclose(out["landmarks"], [[1, -2, -3]])


def test_pyav_loader_non_pinhole_fallback(monkeypatch, tmp_path):
    from rnb_neus2_tpu.io import dataloaders as dl

    scene = _scene(tmp_path)
    scene.intrinsics = {0: _Intrinsic(pinhole=None, scale=(55, 56),
                                      offset=(5, 6))}
    sfm_path = str(tmp_path / "normals.sfm")
    _install_mock(monkeypatch, {sfm_path: scene})
    out = dl.load_sfm_scene_pyav(sfm_path)
    K = out["views"][0]["K"]
    assert K[0, 0] == 55 and K[1, 1] == 56
    assert K[0, 2] == 5 and K[1, 2] == 6


def test_pyav_loader_mask_folder_fallback(monkeypatch, tmp_path):
    from rnb_neus2_tpu.io import dataloaders as dl

    scene = _scene(tmp_path)
    mask_dir = tmp_path / "masks"
    mask_dir.mkdir()
    (mask_dir / "11.png").write_bytes(b"")
    sfm_path = str(tmp_path / "normals.sfm")
    _install_mock(monkeypatch, {sfm_path: scene})
    out = dl.load_sfm_scene_pyav(sfm_path,
                                 mask_folder_path=str(mask_dir))
    assert out["views"][0]["mask_path"] == str(mask_dir / "11.png")
    assert out["views"][1]["mask_path"] is None


def test_factory_uses_pyav_branch(monkeypatch, tmp_path):
    from rnb_neus2_tpu.io import dataloaders as dl

    scene = _scene(tmp_path)
    sfm_path = str(tmp_path / "normals.abc")
    open(sfm_path, "w").close()
    _install_mock(monkeypatch, {sfm_path: scene})
    out = dl.load_data(sfm_path)
    assert len(out["views"]) == 2
