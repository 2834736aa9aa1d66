"""Lens distortion: undistortion inverts distortion; f-theta behavior;
distortion wired into ray generation (testbed_nerf.cu:1282-1300) and the
transform.json loader (nerf_loader.cu:432-497)."""

import json

import numpy as np
import jax.numpy as jnp

from rnb_neus2_tpu.geom import distortion as dist
from rnb_neus2_tpu.geom.camera import Cameras, rays_from_pixels


def test_iterative_undistortion_roundtrip():
    params = jnp.asarray([-0.12, 0.05, 0.001, -0.002, 0.01, 0.0])
    rng = np.random.default_rng(0)
    xy = rng.uniform(-0.4, 0.4, (256, 2)).astype(np.float32)
    dx, dy = dist.apply_distortion(params, jnp.asarray(xy[:, 0]),
                                   jnp.asarray(xy[:, 1]))
    distorted_u = xy[:, 0] + np.asarray(dx)
    distorted_v = xy[:, 1] + np.asarray(dy)
    u, v = dist.iterative_undistortion(params, jnp.asarray(distorted_u),
                                       jnp.asarray(distorted_v))
    np.testing.assert_allclose(np.asarray(u), xy[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), xy[:, 1], atol=1e-5)


def _cams(distortion=None, ftheta=None, n=2, W=64, H=48):
    rot = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
    return Cameras(
        rot_c2w=rot,
        origin=jnp.zeros((n, 3)),
        focal=jnp.full((n, 2), 60.0),
        principal=jnp.full((n, 2), 0.5),
        resolution=(W, H),
        distortion=distortion,
        ftheta=ftheta,
    )


def test_distorted_camera_pixel_ray_pixel_roundtrip():
    """A synthetic distorted camera: project each undistorted ray back
    through the forward distortion model — it must land on the pixel the
    ray was generated from (the reference's contract: ray gen inverts
    exactly what the physical lens applied)."""
    W, H = 64, 48
    k = jnp.asarray([-0.2, 0.08, 0.004, -0.003], jnp.float32)
    cams = _cams(distortion=jnp.broadcast_to(k, (2, 4)))
    rng = np.random.default_rng(1)
    xy = jnp.asarray(rng.uniform(0.15, 0.85, (128, 2)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 2, 128), jnp.int32)
    o, d = rays_from_pixels(cams, idx, xy)
    # re-project: normalized plane coords of the ray, then FORWARD distort
    x = np.asarray(d[:, 0] / d[:, 2])
    y = np.asarray(d[:, 1] / d[:, 2])
    dx, dy = dist.apply_distortion(k, jnp.asarray(x), jnp.asarray(y))
    u = (x + np.asarray(dx)) * 60.0 / W + 0.5
    v = (y + np.asarray(dy)) * 60.0 / H + 0.5
    np.testing.assert_allclose(u, np.asarray(xy[:, 0]), atol=2e-5)
    np.testing.assert_allclose(v, np.asarray(xy[:, 1]), atol=2e-5)
    # and the distortion actually bends rays vs the ideal pinhole
    _, d0 = rays_from_pixels(cams._replace(distortion=None), idx, xy)
    assert np.abs(np.asarray(d - d0)).max() > 1e-3


def test_ftheta_camera_rays():
    # equidistant fisheye r(θ)=θ at unit "resolution" scale
    params = jnp.asarray([0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 1.0])
    cams = _cams(ftheta=params)
    xy = jnp.asarray([[0.8, 0.5]], jnp.float32)   # offset 0.3 in u
    _, d = rays_from_pixels(cams, jnp.asarray([0]), xy)
    got = np.asarray(d[0])
    want = np.asarray([np.sin(0.3), 0.0, np.cos(0.3)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_loader_reads_topline_distortion(tmp_path):
    """transform.json k1/k2/p1/p2 keys → per-view distortion on the
    Cameras, matching nerf_loader.cu:441-465 (any nonzero coefficient
    enables the Iterative model)."""
    from rnb_neus2_tpu.io.dataset import load_transform_json
    import cv2
    img = np.zeros((8, 8, 4), np.uint16)
    img[..., 3] = 65535
    cv2.imwrite(str(tmp_path / "n.png"), img)
    tj = {
        "w": 8, "h": 8, "scale": 0.5, "offset": [0.5, 0.5, 0.5],
        "from_na": True, "n2w": np.eye(4).tolist(),
        "k1": -0.1, "k2": 0.02, "p1": 0.0, "p2": 0.001,
        "frames": [{
            "normal_path": "n.png",
            "transform_matrix": np.eye(4).tolist(),
            "intrinsic_matrix": [[8, 0, 4], [0, 8, 4], [0, 0, 1]],
        }],
    }
    (tmp_path / "transform.json").write_text(json.dumps(tj))
    ds = load_transform_json(str(tmp_path))
    assert ds.cameras.distortion is not None
    np.testing.assert_allclose(np.asarray(ds.cameras.distortion[0]),
                               [-0.1, 0.02, 0.0, 0.001], atol=1e-7)
    # all-zero / absent keys stay on the fast pinhole path
    tj2 = dict(tj)
    for key in ("k1", "k2", "p1", "p2"):
        tj2.pop(key)
    (tmp_path / "transform.json").write_text(json.dumps(tj2))
    assert load_transform_json(str(tmp_path)).cameras.distortion is None


def test_f_theta_center_and_falloff():
    # r(θ)=θ lens: alpha = norm ⇒ equidistant fisheye
    params = jnp.asarray([0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 1.0])
    uv = jnp.asarray([[0.0, 0.0], [0.3, 0.0], [0.0, 0.5]])
    d = np.asarray(dist.f_theta_undistortion(uv, params))
    # center ray has zero norm → error direction by convention
    assert d[0, 0] == 1000.0
    # off-center: direction = (sin a·x̂, ·, cos a) with a = radius
    np.testing.assert_allclose(d[1], [np.sin(0.3), 0, np.cos(0.3)],
                               atol=1e-5)
    np.testing.assert_allclose(d[2], [0, np.sin(0.5), np.cos(0.5)],
                               atol=1e-5)
    assert np.allclose(np.linalg.norm(d[1:], axis=1), 1.0, atol=1e-5)
