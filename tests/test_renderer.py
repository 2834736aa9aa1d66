"""Inference renderer: silhouette and albedo of the trained sphere."""

import numpy as np
import pytest

from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig, TestbedConfig,
                                  TrainConfig)
from rnb_neus2_tpu.render.renderer import render_view
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train.trainer import Trainer

RADIUS = 0.2


@pytest.fixture(scope="module")
def trained():
    ds = sphere_dataset(n_views=6, width=32, height=32, radius=RADIUS,
                        albedo_rgb=(0.7, 0.5, 0.3))
    cfg = TestbedConfig(
        grid=HashGridConfig(n_levels=4, top_resolution=64),
        train=TrainConfig(target_batch_size=1 << 13,
                          initial_rays_per_batch=128,
                          occ_grid_size=32, seed=0),
        march=MarchConfig(n_ladder=512, cone_angle=1.0 / 256.0),
    )
    tr = Trainer(ds, cfg)
    for _ in range(900):
        tr.train_step()
    return ds, tr


@pytest.mark.slow  # 900-step training fixture
def test_rendered_silhouette_matches_gt(trained):
    ds, tr = trained
    out = render_view(tr.field, tr.inference_params, ds.cameras, 0,
                      tr.occ.bitfield, tr.cfg.march, max_samples=128,
                      tile=1024)
    gt = np.asarray(ds.alpha_normal[0]) > 0.5
    pred = out["alpha"] > 0.5
    iou = (gt & pred).sum() / max((gt | pred).sum(), 1)
    assert iou > 0.75, iou
    # depth inside silhouette within scene bounds
    d = out["depth"][pred]
    assert np.all(d > 0.5) and np.all(d < 3.0)


@pytest.mark.slow  # 900-step training fixture
def test_rendered_albedo_color(trained):
    ds, tr = trained
    out = render_view(tr.field, tr.inference_params, ds.cameras, 0,
                      tr.occ.bitfield, tr.cfg.march, max_samples=128,
                      tile=1024)
    inside = (np.asarray(ds.alpha_normal[0]) > 0.5) & (out["alpha"] > 0.8)
    if inside.sum() > 10:
        mean_alb = out["albedo"][inside].mean(axis=0)
        # trained albedo ≈ GT albedo (0.7, 0.5, 0.3) within tolerance
        assert np.abs(mean_alb - np.array([0.7, 0.5, 0.3])).max() < 0.2


def test_downsample_box_area_average():
    from rnb_neus2_tpu.render.renderer import _downsample_box
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = _downsample_box(img, 2, 2)
    # each output pixel = mean of its 2x2 block
    want = np.array([[2.5, 4.5], [10.5, 12.5]], np.float32)
    np.testing.assert_allclose(out, want)
    # fractional ratio 3 -> 2 keeps total mean
    img = np.random.RandomState(0).rand(3, 3).astype(np.float32)
    out = _downsample_box(img, 2, 2)
    np.testing.assert_allclose(out.mean(), img.mean(), rtol=1e-5)
