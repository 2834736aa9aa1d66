"""Inherited testbed modes: image / mesh-SDF / volume fitting."""

import numpy as np
import pytest

from rnb_neus2_tpu.models.extra_modes import ImageField, SdfField, VolumeField
from rnb_neus2_tpu.config import HashGridConfig
from tests.test_raycast_albedo import icosphere

pytestmark = pytest.mark.slow  # image/sdf/volume fit loops


def test_image_fit():
    H = W = 48
    ys, xs = np.mgrid[0:H, 0:W]
    img = np.stack([np.sin(xs / 6.0) * 0.5 + 0.5,
                    np.cos(ys / 9.0) * 0.5 + 0.5,
                    ((xs + ys) % 16) / 16.0], -1).astype(np.float32)
    f = ImageField()
    params, loss = f.fit(img, n_steps=300, batch=4096)
    assert loss < 5e-3
    out = f.render(params, W, H)
    assert np.mean((out - img) ** 2) < 1e-2


def test_sdf_fit_and_iou():
    V, F = icosphere(0.3, (0.5, 0.5, 0.5), subdiv=2)
    f = SdfField(HashGridConfig(n_levels=4, top_resolution=64))
    _, loss = f.fit(V, F, n_steps=250, batch=2048)
    assert loss < 5e-3
    iou = f.calculate_iou(n_samples=1 << 13)
    assert iou > 0.9, iou


def test_signed_distance_native():
    from rnb_neus2_tpu.io.raycast import RayCaster

    V, F = icosphere(0.3, (0.5, 0.5, 0.5), subdiv=3)
    rc = RayCaster(V, F)
    pts = np.array([[0.5, 0.5, 0.5],      # center: inside, d≈0.3
                    [0.95, 0.5, 0.5],     # outside, d≈0.15
                    [0.5, 0.82, 0.5]],    # outside, d≈0.02
                   np.float32)
    sd = rc.signed_distance(pts)
    assert sd[0] < 0 and abs(-sd[0] - 0.3) < 0.01
    assert sd[1] > 0 and abs(sd[1] - 0.15) < 0.01
    assert sd[2] > 0


def test_volume_fit():
    g = np.mgrid[0:24, 0:24, 0:24] / 24.0
    vol = np.exp(-(((g - 0.5) ** 2).sum(0)) / 0.05).astype(np.float32)
    f = VolumeField(HashGridConfig(n_levels=4, top_resolution=32))
    _, loss = f.fit(vol, n_steps=300, batch=4096)
    assert loss < 5e-3
