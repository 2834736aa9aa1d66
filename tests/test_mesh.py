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


@pytest.mark.slow  # 96-cube extraction fixture / large MC grids
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


def test_device_mc_matches_host_exactly():
    """marching_cubes_device is the XLA restatement of the host MC
    (cumsum enumeration replaces flatnonzero, scatter-drop replaces
    append): identical vertex ORDER, positions, and faces — including on
    a random-noise volume (every cube case) and an empty surface."""
    from rnb_neus2_tpu.mesh.marching import marching_cubes_grid
    from rnb_neus2_tpu.mesh.marching_device import marching_cubes_device

    rng = np.random.default_rng(0)
    ax = np.linspace(0, 1, 33, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    sphere = 0.3 - np.sqrt((X - .5) ** 2 + (Y - .5) ** 2 + (Z - .5) ** 2)
    for vol in (sphere.astype(np.float32),
                rng.normal(size=(20, 24, 28)).astype(np.float32),
                np.ones((17, 17, 17), np.float32)):
        V0, F0 = marching_cubes_grid(vol, (0.1, 0.2, 0.3), 0.05, 0.0)
        V1, F1 = marching_cubes_device(vol, (0.1, 0.2, 0.3), 0.05, 0.0)
        assert V0.shape == V1.shape and F0.shape == F1.shape
        if len(V0):
            assert np.abs(V0 - V1).max() < 1e-5
            assert (F0 == F1).all()


def test_device_mc_slabbed_matches_host_exactly():
    """The slab-along-x variant (used >640³ where one-jit id grids would
    overflow HBM) must also be output-identical: slabbing keeps every
    per-axis raster contiguous, so global ids are bases + local ranks —
    including the cross-slab boundary-plane references."""
    from rnb_neus2_tpu.mesh.marching import marching_cubes_grid
    from rnb_neus2_tpu.mesh.marching_device import (
        marching_cubes_device_slabbed)

    rng = np.random.default_rng(1)
    ax = np.linspace(0, 1, 33, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    sphere = (0.3 - np.sqrt((X - .5) ** 2 + (Y - .5) ** 2
                            + (Z - .5) ** 2)).astype(np.float32)
    cases = [(sphere, 4), (sphere, 8),
             (rng.normal(size=(33, 25, 29)).astype(np.float32), 8),
             (np.ones((17, 19, 23), np.float32), 4),
             (rng.normal(size=(9, 9, 9)).astype(np.float32), 2)]
    for vol, ns in cases:
        V0, F0 = marching_cubes_grid(vol, (0.1, 0.2, 0.3), 0.05, 0.0)
        V1, F1 = marching_cubes_device_slabbed(vol, (0.1, 0.2, 0.3),
                                               0.05, 0.0, n_slabs=ns)
        assert V0.shape == V1.shape and F0.shape == F1.shape
        if len(V0):
            assert np.abs(V0 - V1).max() < 1e-5
            assert (F0 == F1).all()


@pytest.mark.slow  # compiles the device fine-pass + MC graphs
def test_extract_mesh_device_backend_matches_host():
    """extract_mesh(backend='device') — the on-device fine pass (block
    scatter into an HBM-resident volume) + device MC — must reproduce
    the host backend's mesh bit-for-bit in topology."""
    field = AnalyticSphereField()
    meta = SceneMeta(from_na=False)
    md = extract.extract_mesh(field, None, resolution=96, meta=meta,
                              backend="device")
    mh = extract.extract_mesh(field, None, resolution=96, meta=meta,
                              backend="host")
    assert md["V"].shape == mh["V"].shape
    assert np.abs(md["V"] - mh["V"]).max() < 1e-5
    assert (md["F"] == mh["F"]).all()
    assert np.abs(md["N"] - mh["N"]).max() < 1e-4


@pytest.mark.slow  # full default-pipeline resolution; ~26 GB host peak
def test_extract_mesh_1024_default_resolution():
    """The pipeline default is --mesh-resolution 1024 (run_pipeline.py:20,
    reference run_pipeline.py:36); the extraction path must actually
    deliver it: block culling keeps field evals ~surface-proportional and
    the host MC handles the 1025³ volume. Accuracy tightens with
    resolution (half-voxel at 1024 ≈ 5e-4 unit cube)."""
    field = AnalyticSphereField(c2=(0.5, 0.5, 0.5), r2=0.01)  # merge
    meta = SceneMeta(from_na=False)
    m = extract.extract_mesh(field, None, resolution=1024, meta=meta)
    V = m["V"]
    assert len(V) > 1_000_000            # ~4π(0.3·1024)² ≈ 1.2M verts
    unit = V * meta.scale + np.asarray(meta.offset)
    r = np.linalg.norm(unit - 0.5, axis=1)
    assert np.abs(r - 0.3).max() < 1.5 / 1024
    # faces reference valid vertices, no degenerate ids
    F = m["F"]
    assert F.min() >= 0 and F.max() < len(V)
    assert (F[:, 0] != F[:, 1]).all()


@pytest.mark.slow  # 96-cube extraction fixture / large MC grids
def test_normals_point_outward(mesh):
    m, meta = mesh
    unit = m["V"] * meta.scale + np.asarray(meta.offset)
    r = np.linalg.norm(unit - 0.5, axis=1)
    sel = np.abs(r - 0.3) < 0.05
    radial = (unit[sel] - 0.5) / r[sel][:, None]
    dots = (m["N"][sel] * radial).sum(axis=1)
    assert (dots > 0.7).mean() > 0.95


@pytest.mark.slow  # 96-cube extraction fixture / large MC grids
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


@pytest.mark.slow  # 96-cube extraction fixture / large MC grids
def test_largest_component_removes_satellite(mesh):
    m, meta = mesh
    V2, F2, N2, _ = postprocess.largest_component(m["V"], m["F"], m["N"])
    unit = V2 * meta.scale + np.asarray(meta.offset)
    r2 = np.linalg.norm(unit - 0.5, axis=1)
    assert np.all(np.abs(r2 - 0.3) < 0.05)   # satellite gone
    assert len(V2) < len(m["V"])


@pytest.mark.slow  # 96-cube extraction fixture / large MC grids
def test_obj_roundtrip(tmp_path, mesh):
    m, _ = mesh
    p = tmp_path / "mesh.obj"
    writer.save_mesh(p, m["V"], m["F"], m["N"])
    V, F = writer.load_obj(p)
    assert len(V) == len(m["V"]) and len(F) == len(m["F"])
    np.testing.assert_allclose(V, m["V"], atol=1e-4)


@pytest.mark.slow  # 96-cube extraction fixture / large MC grids
def test_ply_writer(tmp_path, mesh):
    m, _ = mesh
    p = tmp_path / "mesh.ply"
    writer.save_mesh(p, m["V"], m["F"], m["N"],
                     np.ones_like(m["V"]) * 0.5)
    head = open(p).read(200)
    assert "element vertex %d" % len(m["V"]) in head


# ---------------------------------------------------------------------------
# table-based marching cubes: topology parity with the CUDA algorithm
# ---------------------------------------------------------------------------

def _cuda_mc_oracle(vol, thresh=0.0):
    """Straight-line per-cell re-derivation of gen_vertices/gen_faces
    (src/marching_cubes.cu:276-430, 660-718): raster loops, vertidx_grid
    with axis-major planes, Bourke table. The CUDA kernels differ only in
    vertex id assignment order (atomics)."""
    from rnb_neus2_tpu.mesh.mc_tables import TRIANGLE_TABLE
    X, Y, Z = vol.shape
    inside = vol > thresh
    vid = {}
    verts = []
    for axis, step in ((0, (1, 0, 0)), (1, (0, 1, 0)), (2, (0, 0, 1))):
        for x in range(X - step[0]):
            for y in range(Y - step[1]):
                for z in range(Z - step[2]):
                    x1, y1, z1 = x + step[0], y + step[1], z + step[2]
                    if inside[x, y, z] != inside[x1, y1, z1]:
                        f0, f1 = vol[x, y, z], vol[x1, y1, z1]
                        dt = (thresh - f0) / (f1 - f0)
                        p = np.array([x, y, z], np.float64)
                        p[axis] += dt
                        vid[(axis, x, y, z)] = len(verts)
                        verts.append(p)
    faces = []
    for x in range(X - 1):
        for y in range(Y - 1):
            for z in range(Z - 1):
                m = (int(inside[x, y, z])
                     | int(inside[x + 1, y, z]) << 1
                     | int(inside[x + 1, y + 1, z]) << 2
                     | int(inside[x, y + 1, z]) << 3
                     | int(inside[x, y, z + 1]) << 4
                     | int(inside[x + 1, y, z + 1]) << 5
                     | int(inside[x + 1, y + 1, z + 1]) << 6
                     | int(inside[x, y + 1, z + 1]) << 7)
                if m == 0 or m == 255:
                    continue
                edges = [
                    (0, x, y, z), (1, x + 1, y, z), (0, x, y + 1, z),
                    (1, x, y, z),
                    (0, x, y, z + 1), (1, x + 1, y, z + 1),
                    (0, x, y + 1, z + 1), (1, x, y, z + 1),
                    (2, x, y, z), (2, x + 1, y, z), (2, x + 1, y + 1, z),
                    (2, x, y + 1, z),
                ]
                row = TRIANGLE_TABLE[m]
                for t in range(0, 15, 3):
                    if row[t] < 0:
                        break
                    faces.append([vid[edges[row[t + i]]] for i in range(3)])
    return (np.array(verts).reshape(-1, 3),
            np.array(faces, np.int64).reshape(-1, 3))


def _sphere_vol(n=20, r=0.32):
    ax = (np.arange(n) + 0.5) / n
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    return np.linalg.norm(g - 0.5, axis=-1) - r


def _canonical(V, F):
    """Canonicalize (vertex order independent): sort verts lexicographically
    on quantized coords (stable under fp32/fp64 noise), remap faces, sort
    faces by (rolled-to-min-first) index triple."""
    V = np.round(V * (1 << 16)) / (1 << 16)
    order = np.lexsort((V[:, 2], V[:, 1], V[:, 0]))
    inv = np.empty(len(V), np.int64)
    inv[order] = np.arange(len(V))
    F2 = inv[F]
    roll = np.argmin(F2, axis=1)
    F2 = np.stack([F2[np.arange(len(F2)), (roll + i) % 3]
                   for i in range(3)], axis=1)
    key = np.lexsort((F2[:, 2], F2[:, 1], F2[:, 0]))
    return V[order], F2[key]


def test_mc_matches_cuda_oracle_topology():
    from rnb_neus2_tpu.mesh.marching import marching_cubes_grid
    vol = _sphere_vol(18)
    V1, F1 = marching_cubes_grid(vol, (0.0, 0.0, 0.0), 1.0, 0.0)
    V0, F0 = _cuda_mc_oracle(vol)
    assert len(V1) == len(V0), (len(V1), len(V0))
    assert len(F1) == len(F0), (len(F1), len(F0))
    cV1, cF1 = _canonical(V1.astype(np.float64), F1)
    cV0, cF0 = _canonical(V0, F0)
    np.testing.assert_allclose(cV1, cV0, atol=1e-5)
    np.testing.assert_array_equal(cF1, cF0)


@pytest.mark.slow  # 96-cube extraction fixture / large MC grids
def test_mc_sphere_watertight_and_accurate():
    from rnb_neus2_tpu.mesh.marching import marching_cubes_grid
    n, r = 48, 0.3
    vol = _sphere_vol(n, r)
    V, F = marching_cubes_grid(vol, (0.5 / n,) * 3, 1.0 / n, 0.0)
    assert len(V) > 500 and len(F) > 500
    # every edge shared by exactly 2 triangles (closed 2-manifold)
    E = np.sort(np.concatenate([F[:, [0, 1]], F[:, [1, 2]],
                                F[:, [2, 0]]]), axis=1)
    _, counts = np.unique(E[:, 0] * (1 << 32) + E[:, 1],
                          return_counts=True)
    assert (counts == 2).all()
    # all faces reference valid vertices
    assert F.min() >= 0 and F.max() < len(V)
    rad = np.linalg.norm(V - 0.5, axis=1)
    assert abs(rad.mean() - r) < 2.0 / n
    assert rad.std() < 1.0 / n


# ---------------------------------------------------------------------------
# mesh refinement (1-ring laplacian + SDF-guided optimization)
# ---------------------------------------------------------------------------

def _noisy_sphere_mesh(n=32, r=0.3, noise=0.01, seed=0):
    from rnb_neus2_tpu.mesh.marching import marching_cubes_grid
    vol = _sphere_vol(n, r)
    V, F = marching_cubes_grid(vol, (0.5 / n,) * 3, 1.0 / n, 0.0)
    rng = np.random.RandomState(seed)
    d = V - 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Vn = V + d * rng.uniform(-noise, noise, (len(V), 1))
    return Vn.astype(np.float32), F


def test_laplacian_smoothing_reduces_roughness():
    from rnb_neus2_tpu.mesh.refine import laplacian_smooth
    V, F = _noisy_sphere_mesh()
    r0 = np.linalg.norm(V - 0.5, axis=1)
    Vs = laplacian_smooth(V, F, amount=0.8, n_steps=5)
    r1 = np.linalg.norm(Vs - 0.5, axis=1)
    assert r1.std() < 0.5 * r0.std(), (r0.std(), r1.std())


def test_1ring_normals_point_along_radius_for_sphere():
    from rnb_neus2_tpu.mesh.refine import compute_mesh_1ring
    from rnb_neus2_tpu.mesh.marching import marching_cubes_grid
    n, r = 32, 0.3
    vol = _sphere_vol(n, r)
    V, F = marching_cubes_grid(vol, (0.5 / n,) * 3, 1.0 / n, 0.0)
    _, N = compute_mesh_1ring(V, F)
    N /= np.maximum(np.linalg.norm(N, axis=1, keepdims=True), 1e-12)
    d = (V - 0.5) / np.linalg.norm(V - 0.5, axis=1, keepdims=True)
    dots = np.abs(np.sum(N * d, axis=1))
    assert np.median(dots) > 0.95


@pytest.mark.slow  # 96-cube extraction fixture / large MC grids
def test_optimise_mesh_step_moves_verts_to_zero_set():
    from rnb_neus2_tpu.mesh.refine import optimise_mesh_step
    V, F = _noisy_sphere_mesh(noise=0.02)
    r = 0.3

    def sdf_grad(x):
        d = x - 0.5
        dist = np.linalg.norm(d, axis=1)
        return (dist - r).astype(np.float32), (d / dist[:, None]
                                               ).astype(np.float32)

    sdf0 = np.abs(sdf_grad(V)[0])
    V2 = optimise_mesh_step(sdf_grad, V, F, n_steps=60)
    sdf1 = np.abs(sdf_grad(V2)[0])
    assert sdf1.mean() < 0.5 * sdf0.mean(), (sdf0.mean(), sdf1.mean())
