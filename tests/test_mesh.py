"""Mesh extraction: analytic-SDF golden test + writer round-trip +
largest-component filtering."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from rnb_neus2_tpu.io.dataset import SceneMeta
from rnb_neus2_tpu.mesh import extract, marching, postprocess, writer


class AnalyticSphereField:
    """Duck-typed field: two spheres (one large, one tiny satellite)."""

    def __init__(self, c=(0.5, 0.5, 0.5), r=0.3, c2=(0.1, 0.1, 0.1),
                 r2=0.04):
        self.c = jnp.asarray(c)
        self.r = r
        self.c2 = jnp.asarray(c2)
        self.r2 = r2

    def sdf(self, params, x, valid_level=None):
        d1 = jnp.linalg.norm(x - self.c, axis=1) - self.r
        d2 = jnp.linalg.norm(x - self.c2, axis=1) - self.r2
        return jnp.minimum(d1, d2)

    def sdf_and_grad(self, params, x, valid_level=None):
        d1 = jnp.linalg.norm(x - self.c, axis=1, keepdims=True)
        d2 = jnp.linalg.norm(x - self.c2, axis=1, keepdims=True)
        g = jnp.where(d1 - self.r < d2 - self.r2,
                      (x - self.c) / jnp.maximum(d1, 1e-9),
                      (x - self.c2) / jnp.maximum(d2, 1e-9))
        return self.sdf(params, x), g, None


@pytest.fixture(scope="module")
def mesh():
    field = AnalyticSphereField()
    meta = SceneMeta(from_na=False)  # identity world mapping modulo scale
    return extract.extract_mesh(field, None, resolution=96, meta=meta), meta


def test_sphere_surface_accuracy(mesh):
    m, meta = mesh
    V = m["V"]
    assert len(V) > 500 and len(m["F"]) > 500
    # map back to unit cube: V = (v-offset)/scale*n2w... with defaults
    # scale=0.5, offset=0.5, n2w=identity → unit = V*0.5+0.5
    unit = V * meta.scale + np.asarray(meta.offset)
    r = np.linalg.norm(unit - 0.5, axis=1)
    near_main = np.abs(r - 0.3) < 0.1
    # vertices belong to one of the two spheres; the main one dominates
    assert near_main.mean() > 0.9
    # main-sphere vertices lie on the surface within half a voxel
    assert np.abs(r[near_main] - 0.3).max() < 1.0 / 96


def test_normals_point_outward(mesh):
    m, meta = mesh
    unit = m["V"] * meta.scale + np.asarray(meta.offset)
    r = np.linalg.norm(unit - 0.5, axis=1)
    sel = np.abs(r - 0.3) < 0.05
    radial = (unit[sel] - 0.5) / r[sel][:, None]
    dots = (m["N"][sel] * radial).sum(axis=1)
    assert (dots > 0.7).mean() > 0.95


def test_faces_consistent_orientation(mesh):
    m, meta = mesh
    V, F = m["V"], m["F"]
    unit = V * meta.scale + np.asarray(meta.offset)
    tri = unit[F]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    cent = tri.mean(axis=1)
    r = np.linalg.norm(cent - 0.5, axis=1)
    sel = np.abs(r - 0.3) < 0.05
    radial = (cent[sel] - 0.5) / r[sel][:, None]
    dots = (n[sel] * radial).sum(axis=1)
    assert (dots > 0).mean() > 0.98   # outward winding


def test_largest_component_removes_satellite(mesh):
    m, meta = mesh
    V2, F2, N2, _ = postprocess.largest_component(m["V"], m["F"], m["N"])
    unit = V2 * meta.scale + np.asarray(meta.offset)
    r2 = np.linalg.norm(unit - 0.5, axis=1)
    assert np.all(np.abs(r2 - 0.3) < 0.05)   # satellite gone
    assert len(V2) < len(m["V"])


def test_obj_roundtrip(tmp_path, mesh):
    m, _ = mesh
    p = tmp_path / "mesh.obj"
    writer.save_mesh(p, m["V"], m["F"], m["N"])
    V, F = writer.load_obj(p)
    assert len(V) == len(m["V"]) and len(F) == len(m["F"])
    np.testing.assert_allclose(V, m["V"], atol=1e-4)


def test_ply_writer(tmp_path, mesh):
    m, _ = mesh
    p = tmp_path / "mesh.ply"
    writer.save_mesh(p, m["V"], m["F"], m["N"],
                     np.ones_like(m["V"]) * 0.5)
    head = open(p).read(200)
    assert "element vertex %d" % len(m["V"]) in head
