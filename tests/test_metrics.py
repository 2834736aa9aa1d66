"""Chamfer metric: analytic sanity on concentric spheres."""

import numpy as np

from rnb_neus2_tpu.mesh.metrics import chamfer_distance, sample_surface
from tests.test_raycast_albedo import icosphere


def test_chamfer_concentric_spheres():
    V1, F1 = icosphere(0.30, (0.5, 0.5, 0.5), subdiv=3)
    V2, F2 = icosphere(0.33, (0.5, 0.5, 0.5), subdiv=3)
    m = chamfer_distance(V1, F1, V2, F2, n_samples=4000)
    # distance between concentric spheres ≈ Δr = 0.03 in both directions
    assert abs(m["accuracy"] - 0.03) < 0.005
    assert abs(m["completeness"] - 0.03) < 0.005
    assert abs(m["chamfer_l1"] - 0.03) < 0.005
    # identical meshes → ~0
    z = chamfer_distance(V1, F1, V1, F1, n_samples=2000)
    assert z["chamfer_l1"] < 2e-3


def test_surface_sampling_uniform():
    V, F = icosphere(0.5, (0, 0, 0), subdiv=3)
    p = sample_surface(V, F, 5000)
    r = np.linalg.norm(p, axis=1)
    # on the faceted sphere, radii slightly below 0.5
    assert 0.47 < r.mean() < 0.5
    # roughly isotropic
    assert np.abs(p.mean(axis=0)).max() < 0.03
