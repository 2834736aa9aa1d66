"""Lens distortion: undistortion inverts distortion; f-theta behavior."""

import numpy as np
import jax.numpy as jnp

from rnb_neus2_tpu.geom import distortion as dist


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
