"""Render buffer (accumulation + tonemap), camera path, envmap tests."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnb_neus2_tpu.render.buffer import (ColorSpace, RenderBuffer,
                                         TonemapCurve, tonemap)
from rnb_neus2_tpu.render.camera_path import (CameraKeyframe, CameraPath,
                                              _mat_to_quat, _quat_to_mat)
from rnb_neus2_tpu.render.envmap import (background_color, init_envmap,
                                         sample_envmap)


# ---------------------------------------------------------------- buffer

def test_accumulation_is_running_mean():
    buf = RenderBuffer.create(4, 3)
    frames = [np.full((3, 4, 4), v, np.float32) for v in (0.2, 0.4, 0.9)]
    for f in frames:
        buf = buf.accumulate(jnp.asarray(f))
    assert buf.spp == 3
    np.testing.assert_allclose(np.asarray(buf.accumulation),
                               np.mean(frames, axis=0), rtol=1e-6)


@pytest.mark.parametrize("curve", list(TonemapCurve))
def test_tonemap_curves_monotone_bounded(curve):
    x = jnp.linspace(0.0, 4.0, 64)[:, None].repeat(3, 1)
    y = np.asarray(tonemap(x, 0.0, curve, ColorSpace.LINEAR,
                           ColorSpace.LINEAR))
    assert np.all(np.diff(y[:, 0]) >= -1e-6), "curve must be monotone"
    assert y.min() >= 0.0
    if curve != TonemapCurve.IDENTITY:
        assert y.max() <= 1.0 + 1e-6
    # black maps to (near) black
    assert y[0, 0] == pytest.approx(0.0, abs=1e-3)


def test_exposure_doubles_linear_light():
    x = jnp.full((1, 3), 0.25)
    y0 = tonemap(x, 0.0, TonemapCurve.IDENTITY, ColorSpace.LINEAR,
                 ColorSpace.LINEAR)
    y1 = tonemap(x, 1.0, TonemapCurve.IDENTITY, ColorSpace.LINEAR,
                 ColorSpace.LINEAR)
    np.testing.assert_allclose(np.asarray(y1), 2 * np.asarray(y0), rtol=1e-6)


def test_srgb_roundtrip_through_pipeline():
    x = jnp.asarray([[0.1, 0.5, 0.9]])
    y = tonemap(x, 0.0, TonemapCurve.IDENTITY, ColorSpace.SRGB,
                ColorSpace.SRGB)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


# ------------------------------------------------------------ camera path

def _rot(axis, angle):
    axis = np.asarray(axis, np.float64) / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(angle) * K
            + (1 - np.cos(angle)) * K @ K).astype(np.float32)


def test_quat_mat_roundtrip():
    for ang in (0.1, 1.2, 2.9):
        for ax in ([1, 0, 0], [0, 1, 1], [1, 2, 3]):
            m = _rot(ax, ang)
            q = _mat_to_quat(m)
            np.testing.assert_allclose(_quat_to_mat(q), m, atol=1e-5)


def test_spline_smooths_and_stays_near_keyframes():
    kfs = []
    for i in range(5):
        m = np.zeros((3, 4), np.float32)
        m[:3, :3] = _rot([0, 1, 0], 0.3 * i)
        m[:3, 3] = [i, 0.0, 2.0]
        kfs.append(CameraKeyframe.from_matrix(m, fov=50.0 + i))
    path = CameraPath(kfs)
    mats = path.frames(33)
    assert len(mats) == 33
    # b-spline approximates: midpath translation x must be strictly
    # increasing and within keyframe hull
    xs = [m[0, 3] for m in mats]
    assert all(b >= a - 1e-6 for a, b in zip(xs, xs[1:]))
    assert xs[0] >= -1e-5 and xs[-1] <= 4 + 1e-5
    # rotations stay orthonormal after quaternion blending
    for m in mats:
        R = m[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_quaternion_short_path_sign_alignment():
    k0 = CameraKeyframe(np.array([0, 0, 0, 1.0], np.float32),
                        np.zeros(3, np.float32))
    # same rotation, opposite quaternion sign
    k1 = CameraKeyframe(np.array([0, 0, 0, -1.0], np.float32),
                        np.zeros(3, np.float32))
    path = CameraPath([k0, k1])
    m = path.eval(0.5).m()
    np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-5)


def test_camera_path_json_roundtrip(tmp_path):
    kfs = [CameraKeyframe(np.array([0, 0, 0, 1.0], np.float32),
                          np.array([1, 2, 3], np.float32), 0.1, 1.5, 45.0,
                          0.02)]
    p = CameraPath(kfs)
    p.play_time = 0.7
    f = str(tmp_path / "path.json")
    p.save(f)
    q = CameraPath.load(f)
    assert q.play_time == pytest.approx(0.7)
    np.testing.assert_allclose(q.keyframes[0].T, kfs[0].T)
    assert q.keyframes[0].fov == pytest.approx(45.0)
    # file layout matches the reference's {time, path:[...]} contract
    data = json.load(open(f))
    assert set(data) == {"time", "path"}
    assert set(data["path"][0]) == {"R", "T", "slice", "scale", "fov", "dof"}


# ---------------------------------------------------------------- envmap

def test_envmap_constant_map_any_direction():
    e = init_envmap(8, 16, value=0.3)
    dirs = jax.random.normal(jax.random.PRNGKey(0), (64, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sample_envmap(e, dirs)
    np.testing.assert_allclose(np.asarray(out[:, :3]), 0.3, atol=1e-6)


def test_envmap_azimuth_wraps_polar_clamps():
    e = np.random.default_rng(0).random((8, 16, 4)).astype(np.float32)
    # straight up / straight down hit the clamped poles without NaN
    out = sample_envmap(jnp.asarray(e), jnp.asarray(
        [[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow  # renders/training through testbed
def test_envmap_is_trainable_through_background():
    """Gradient descent on the envmap recovers a target background color
    through the compositor — the reference's deposit_envmap_gradient path
    (envmap.cuh:69-104) via plain jax.grad."""
    e = init_envmap(4, 8, value=0.2)
    dirs = jax.random.normal(jax.random.PRNGKey(1), (128, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    target = jnp.asarray([0.9, 0.1, 0.4])

    def loss(em):
        bg = background_color(em, dirs)
        return jnp.mean((bg - target) ** 2)

    import optax
    tx = optax.adam(0.05)
    state = tx.init(e)
    g = jax.jit(jax.grad(loss))
    for _ in range(300):
        upd, state = tx.update(g(e), state)
        e = optax.apply_updates(e, upd)
    assert float(loss(e)) < 1e-4


def test_background_color_constant_fallback():
    dirs = jnp.asarray([[1.0, 0, 0], [0, 0, 1.0]])
    bg = background_color(None, dirs, (0.25, 0.5, 0.75))
    np.testing.assert_allclose(np.asarray(bg),
                               [[0.25, 0.5, 0.75]] * 2, atol=1e-7)


# ------------------------------------------------------- render scaling

@pytest.mark.slow  # renders/training through testbed
def test_render_scale_upsamples_to_full_resolution():
    """DLSS-analog path: render at 0.5 internal scale, output full size,
    image content consistent with the native render."""
    from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig,
                                      TestbedConfig, TrainConfig)
    from rnb_neus2_tpu.render.renderer import render_view
    from rnb_neus2_tpu.testing.synthetic import sphere_dataset
    from rnb_neus2_tpu.train.trainer import Trainer

    cfg = TestbedConfig(
        grid=HashGridConfig(n_levels=3, top_resolution=32),
        train=TrainConfig(target_batch_size=1 << 10,
                          initial_rays_per_batch=64, occ_grid_size=16),
        march=MarchConfig(n_ladder=64, cone_angle=1.0 / 256.0))
    ds = sphere_dataset(n_views=3, width=24, height=24, radius=0.3)
    tr = Trainer(ds, cfg)
    for _ in range(10):
        tr.train_step()

    full = render_view(tr.field, tr.inference_params, ds.cameras, 0,
                       tr.occ.bitfield, cfg.march, max_samples=48)
    half = render_view(tr.field, tr.inference_params, ds.cameras, 0,
                       tr.occ.bitfield, cfg.march, max_samples=48,
                       render_scale=0.5)
    assert half["albedo"].shape == full["albedo"].shape == (24, 24, 3)
    assert half["alpha"].shape == (24, 24)
    # coverage agrees within a coarse tolerance (half-res then upsample)
    cov_f = float(full["alpha"].mean())
    cov_h = float(half["alpha"].mean())
    assert abs(cov_f - cov_h) < 0.12, (cov_f, cov_h)


@pytest.mark.slow  # renders/training through testbed
def test_testbed_render_path_flythrough(tmp_path):
    """Testbed.render_path: fly a 2-keyframe path, frames differ and are
    well-formed RGBA."""
    from rnb_neus2_tpu.api import Testbed, TestbedMode
    from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig,
                                      TestbedConfig, TrainConfig)
    from rnb_neus2_tpu.render.camera_path import CameraKeyframe, CameraPath
    from rnb_neus2_tpu.testing.synthetic import write_prepared_scene

    scene = tmp_path / "scene"
    write_prepared_scene(str(scene), n_views=4, width=16, height=16,
                         radius=0.25)
    cfg = TestbedConfig(
        grid=HashGridConfig(n_levels=3, top_resolution=32),
        train=TrainConfig(target_batch_size=1 << 10,
                          initial_rays_per_batch=64, occ_grid_size=16,
                          max_steps=4),
        march=MarchConfig(n_ladder=64, cone_angle=1.0 / 256.0))
    tb = Testbed(TestbedMode.Nerf, cfg)
    tb.load_training_data(str(scene))
    while tb.frame():
        pass
    # direction-dependent background so frames vary with the camera even
    # before the field has learned a surface
    from rnb_neus2_tpu.render.envmap import init_envmap
    em = np.asarray(init_envmap(8, 16, 0.0)).copy()
    em[:, :8, 0] = 1.0
    em[:, 8:, 1] = 1.0
    tb.envmap = jnp.asarray(em)

    rot = np.asarray(tb._dataset.cameras.rot_c2w)
    org = np.asarray(tb._dataset.cameras.origin)
    kfs = [CameraKeyframe.from_matrix(
        np.concatenate([rot[i], org[i][:, None]], axis=1)) for i in (0, 2)]
    frames = tb.render_path(CameraPath(kfs), n_frames=3, max_samples=32)
    assert len(frames) == 3
    for f in frames:
        assert f.shape == (16, 16, 4)
        assert np.isfinite(f).all()
    # endpoints use different cameras → different images
    assert np.abs(frames[0] - frames[-1]).max() > 1e-3


def test_tonemap_constants_match_reference_cuda():
    """Numpy re-derivation of render_buffer.cu:254-310 — folded ACES
    pre-exposure, Hable white-scale/exposure-bias folding, and
    luminance-based Reinhard."""
    from rnb_neus2_tpu.render.buffer import TonemapCurve, _tonemap_curve
    x = np.array([[0.1, 0.5, 1.0], [0.0, 2.0, 0.25]], np.float32)

    def cuda_curve(x, k0, k1, k2, k3, k4, k5):
        sq = x * x
        return (sq * k0 + k1 * x + k2) / (k3 * sq + k4 * x + k5)

    aces = cuda_curve(x, 0.36 * 2.51, 0.6 * 0.03, 0.0,
                      0.36 * 2.43, 0.6 * 0.59, 0.14)
    np.testing.assert_allclose(
        np.asarray(_tonemap_curve(jnp.asarray(x), TonemapCurve.ACES)),
        aces, rtol=1e-6)

    A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    k0, k1, k2 = A * F - A * E, C * B * F - B * E, 0.0
    k3, k4, k5 = A * F, B * F, D * F * F
    w = 11.2
    ws = (k3 * w * w + k4 * w + k5) / (k0 * w * w + k1 * w + k2)
    hable = cuda_curve(x, 4 * k0 * ws, 2 * k1 * ws, k2 * ws,
                       4 * k3, 2 * k4, k5)
    np.testing.assert_allclose(
        np.asarray(_tonemap_curve(jnp.asarray(x), TonemapCurve.HABLE)),
        hable, rtol=1e-6)

    yl = x @ np.array([0.2126, 0.7152, 0.0722], np.float32)
    reinhard = x / (yl[:, None] + 1.0)
    np.testing.assert_allclose(
        np.asarray(_tonemap_curve(jnp.asarray(x), TonemapCurve.REINHARD)),
        reinhard, rtol=1e-6)
