"""pyngp-equivalent API facade smoke test."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import rnb_neus2_tpu.api as ngp
from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig, TestbedConfig,
                                  TrainConfig)
from rnb_neus2_tpu.testing.synthetic import write_prepared_scene

pytestmark = pytest.mark.slow  # facade tests train the underlying models


def test_api_surface(tmp_path):
    scene = tmp_path / "scene"
    write_prepared_scene(str(scene), n_views=4, width=16, height=16,
                         radius=0.2)
    cfg = TestbedConfig(
        grid=HashGridConfig(n_levels=3, top_resolution=32),
        train=TrainConfig(target_batch_size=1 << 10,
                          initial_rays_per_batch=64, occ_grid_size=16,
                          max_steps=6),
        march=MarchConfig(n_ladder=128, cone_angle=1.0 / 256.0))
    tb = ngp.Testbed(ngp.TestbedMode.Nerf, cfg)
    tb.load_training_data(str(scene))
    tb.set_max_iter(6)
    steps = 0
    while tb.frame():
        steps += 1
    assert steps == 6 and tb.training_step == 6
    assert tb.n_params() > 1000
    assert np.isfinite(tb.loss)

    img = tb.render_to_cpu(0, max_samples=32)
    assert img.shape == (16, 16, 4)
    tb.screenshot(tmp_path / "shot.png")
    assert (tmp_path / "shot.png").exists()

    snap = tmp_path / "s.msgpack"
    tb.save_snapshot(str(snap))
    tb2 = ngp.Testbed(ngp.TestbedMode.Nerf, cfg)
    tb2.load_training_data(str(scene))
    tb2.load_snapshot(str(snap))
    assert tb2.training_step == 6

    iou = tb.calculate_iou(
        n_samples=4096,
        gt_sdf=lambda p: np.linalg.norm(p - 0.5, axis=-1) - 0.2)
    assert 0.0 <= iou <= 1.0

    m = tb.compute_marching_cubes_mesh((48, 48, 48))
    assert set(m.keys()) == {"V", "N", "C", "F"}


def test_set_camera_intrinsics(tmp_path):
    """pyngp parity: set_camera_intrinsics overrides one view's focal /
    principal point / OpenCV distortion with the reference's argument
    conventions (testbed_nerf.cu:2915-2930)."""
    scene = tmp_path / "scene"
    write_prepared_scene(str(scene), n_views=3, width=16, height=16,
                         radius=0.2)
    cfg = TestbedConfig(
        grid=HashGridConfig(n_levels=3, top_resolution=32),
        train=TrainConfig(target_batch_size=1 << 10,
                          initial_rays_per_batch=64, occ_grid_size=16,
                          max_steps=2),
        march=MarchConfig(n_ladder=128, cone_angle=1.0 / 256.0))
    tb = ngp.Testbed(ngp.TestbedMode.Nerf, cfg)
    tb.load_training_data(str(scene))
    # fx<=0 falls back to fy; negative cx/cy means already-normalized |c|
    tb.set_camera_intrinsics(1, fx=0.0, fy=20.0, cx=-0.25, cy=8.0,
                             k1=-0.1, k2=0.01)
    cams = tb._dataset.cameras
    np.testing.assert_allclose(np.asarray(cams.focal[1]), [20.0, 20.0])
    np.testing.assert_allclose(np.asarray(cams.principal[1]), [0.25, 0.5])
    assert cams.distortion is not None
    np.testing.assert_allclose(np.asarray(cams.distortion[1]),
                               [-0.1, 0.01, 0.0, 0.0], atol=1e-7)
    # other views keep ideal pinholes
    assert np.all(np.asarray(cams.distortion[0]) == 0)
    # out-of-range frame index is a silent no-op, like the reference
    tb.set_camera_intrinsics(99, fx=1.0, fy=1.0)
    # training still runs with the distorted camera in the batch
    tb.train(2)
    assert np.isfinite(tb.loss)


# ---------------------------------------------------------------------------
# mode selection through the facade (ETestbedMode, python_api.cu:219-616)
# ---------------------------------------------------------------------------

def test_image_mode_through_facade():
    import rnb_neus2_tpu.api as ngp
    rng = np.random.RandomState(0)
    img = np.zeros((32, 32, 3), np.float32)
    img[8:24, 8:24] = [0.9, 0.2, 0.4]
    tb = ngp.Testbed(ngp.TestbedMode.Image)
    tb.load_training_data(img)
    tb.train(300)
    out = tb.render_to_cpu()
    assert out.shape == (32, 32, 3)
    err = np.abs(out - img).mean()
    assert err < 0.1, err
    assert tb.training_step == 300
    # frame() advances extra-mode training too
    assert tb.frame()
    assert tb.training_step == 301


def test_sdf_mode_through_facade():
    import rnb_neus2_tpu.api as ngp
    from tests.test_mesh import _sphere_vol
    from rnb_neus2_tpu.mesh.marching import marching_cubes_grid
    n = 24
    V, F = marching_cubes_grid(_sphere_vol(n, 0.3), (0.5 / n,) * 3,
                               1.0 / n, 0.0)
    tb = ngp.Testbed(ngp.TestbedMode.Sdf)
    tb.load_training_data((V, F))
    tb.train(150)
    iou = tb.calculate_iou(n_samples=4096)
    assert iou > 0.6, iou
    # sphere-traced render through the facade (api.py render_to_cpu for
    # Sdf mode was a NotImplementedError until round 3)
    img = tb.render_to_cpu(W=32, H=32)
    assert img.shape == (32, 32, 4)
    assert np.isfinite(img).all()
    assert img[..., 3].max() == 1.0 and img[..., 3].min() == 0.0


def test_volume_mode_through_facade():
    import rnb_neus2_tpu.api as ngp
    ax = (np.arange(24) + 0.5) / 24
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    vol = np.exp(-40 * np.sum((g - 0.5) ** 2, -1)).astype(np.float32)
    tb = ngp.Testbed(ngp.TestbedMode.Volume)
    tb.load_training_data(vol)
    tb.train(200)
    assert tb.loss < 0.01, tb.loss
    # ratio-tracked render through the facade
    img = tb.render_to_cpu(W=32, H=32)
    assert img.shape == (32, 32, 4)
    assert np.isfinite(img).all()
