"""Sdf/Volume render paths (render/sdf_volume_render.py) against
analytic fields — the sphere tracer, Disney-BRDF-lite shade kernel, and
the ratio-tracking volume compositor (testbed_sdf.cu / testbed_volume.cu
render paths)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rnb_neus2_tpu.render import sdf_volume_render as svr

C = jnp.asarray([0.5, 0.5, 0.5])
R = 0.25


def sphere_sdf(p):
    return jnp.linalg.norm(p - C, axis=-1) - R


def test_sphere_trace_hits_surface():
    rot, eye = svr.orbit_camera()
    o, d = svr.camera_rays(rot, eye, 32, 32)
    pos, hit, steps, _ = svr.sphere_trace(sphere_sdf, o, d)
    hit = np.asarray(hit)
    assert hit.reshape(32, 32)[16, 16]          # center ray hits
    assert not hit.reshape(32, 32)[0, 0]        # corner ray misses
    r_err = np.abs(np.linalg.norm(np.asarray(pos)[hit] - 0.5, axis=-1) - R)
    assert r_err.max() < 2e-3                   # converged onto the surface
    assert np.asarray(steps)[hit.ravel()].min() >= 1


@pytest.mark.parametrize("mode", ["shade", "normals", "depth", "ao",
                                  "positions", "cost"])
def test_render_sdf_modes(mode):
    rgba, depth = svr.render_sdf(sphere_sdf, W=24, H=24, mode=mode,
                                 n_steps=48, shadows=False)
    rgba = np.asarray(rgba)
    assert rgba.shape == (24, 24, 4)
    assert np.all(np.isfinite(rgba))
    assert rgba[12, 12, 3] == 1.0               # center pixel hit
    assert rgba[0, 0, 3] == 0.0                 # corner empty
    if mode == "normals":
        # the surface normal at the center pixel faces the camera
        n = rgba[12, 12, :3] * 2.0 - 1.0
        eye_dir = np.asarray(svr.orbit_camera()[1]) - 0.5
        eye_dir /= np.linalg.norm(eye_dir)
        assert float(n @ eye_dir) > 0.9
    if mode == "depth":
        d = np.asarray(depth)
        # the sphere bulges toward the camera: center closer than rim
        hit = rgba[..., 3] > 0
        assert d[12, 12] <= d[hit].max() - 1e-3


def test_render_sdf_shadowing_darkens():
    """A second sphere between the sun and the main sphere must darken
    the lit side vs the unshadowed render."""
    sun = np.asarray(svr.DEFAULT_SUN_DIR)

    def two_spheres(p):
        d1 = jnp.linalg.norm(p - C, axis=-1) - R
        occ_c = C + jnp.asarray(sun) * 0.4
        d2 = jnp.linalg.norm(p - occ_c, axis=-1) - 0.12
        return jnp.minimum(d1, d2)

    lit, _ = svr.render_sdf(sphere_sdf, W=24, H=24, shadows=True,
                            n_steps=48)
    shadowed, _ = svr.render_sdf(two_spheres, W=24, H=24, shadows=True,
                                 n_steps=48)
    lit, shadowed = np.asarray(lit), np.asarray(shadowed)
    both = (lit[..., 3] > 0) & (shadowed[..., 3] > 0)
    assert both.sum() > 20
    # somewhere on the shared surface the occluder removes sun light
    dark = (lit[..., :3].sum(-1) - shadowed[..., :3].sum(-1))[both]
    assert dark.max() > 0.3, dark.max()


def test_evaluate_shading_backface_is_ambient():
    brdf = svr.BRDFParams(ambientcolor=(0.2, 0.2, 0.2))
    N = jnp.asarray([[0.0, 0.0, 1.0]])
    L = jnp.asarray([[0.0, 0.0, -1.0]])   # light behind the surface
    V = jnp.asarray([[0.0, 0.0, 1.0]])
    base = jnp.asarray([[0.5, 0.5, 0.5]])
    amb_in = jnp.asarray([[1.0, 1.0, 1.0]]) * 0.2
    out = np.asarray(svr.evaluate_shading(base, amb_in, base, brdf,
                                          L, V, N))
    # FV at normal incidence = 0, so amb = 0.2·mix(0.2,0,metallic=0)·base
    np.testing.assert_allclose(out[0], 0.2 * 0.2 * 0.5, atol=1e-6)


def test_render_volume_analytic():
    def density(p):
        return jnp.where(jnp.linalg.norm(p - C, axis=-1) < 0.3, 40.0, 0.0)

    rgba = np.asarray(svr.render_volume(density, W=24, H=24,
                                        global_majorant=40.0,
                                        max_events=64))
    assert rgba.shape == (24, 24, 4)
    assert np.all(np.isfinite(rgba))
    # center ray saturates inside the dense ball → constant-albedo grey,
    # no sky contribution
    c = rgba[12, 12, :3]
    assert np.abs(c - 0.95).max() < 0.05, c
    # corner ray sees only the procedural envmap (sky-ish: blue channel
    # dominates the red)
    k = rgba[0, 0, :3]
    assert k[2] > k[0]
