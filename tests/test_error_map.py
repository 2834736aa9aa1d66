"""Error-map importance sampling: splat/rebuild/sample statistics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rnb_neus2_tpu.train import error_map as em


def test_splat_accumulates_bilinearly():
    st = em.init_state(2, ew=8, eh=6)
    img = jnp.array([0, 1], jnp.int32)
    xy = jnp.array([[0.5, 0.5], [0.0625, 0.0833333]])  # texel centers
    st = em.splat(st, img, xy, jnp.array([2.0, 3.0]))
    a = np.asarray(st.accum)
    assert abs(a.sum() - 5.0) < 1e-5
    assert abs(a[0].sum() - 2.0) < 1e-5
    # second ray at texel (0,0) center of image 1 → all mass in one texel
    assert abs(a[1, 0, 0] - 3.0) < 1e-4


@pytest.mark.slow  # large-draw statistics
def test_sampling_follows_error_distribution():
    st = em.init_state(2, ew=4, eh=4)
    # image 0, texel (1,2) gets all the error
    img = jnp.zeros((64,), jnp.int32)
    xy = jnp.tile(jnp.array([[0.375, 0.625]]), (64, 1))
    st = em.splat(st, img, xy, jnp.ones((64,)))
    st = em.rebuild(st)
    assert bool(st.valid)
    imgs, xys, pdf = em.sample(st, jax.random.PRNGKey(0), 8192)
    imgs, xys, pdf = map(np.asarray, (imgs, xys, pdf))
    # image 0 sampled at (1−MIN_PMF) + MIN_PMF/2 ≈ 0.95
    assert abs((imgs == 0).mean() - 0.95) < 0.03
    sel = imgs == 0
    tex = np.floor(xys[sel] * 4).astype(int)
    hot = (tex[:, 0] == 1) & (tex[:, 1] == 2)
    # sample_cdf_2d (testbed_nerf.cu:1115): half the draws are uniform
    # (hot texel at pmf 1/16 within that half), half follow the CDF (all
    # on the hot texel) → expect ≈ 0.5·(1/16) + 0.5 ≈ 0.53
    assert abs(hot.mean() - 0.53) < 0.04
    # mixture density at the hot texel ≈ n·pmf_img·(0.5 + 0.5·16·1) ≈ 16
    assert np.all(pdf[sel][hot] > 10)
    # off-texel samples exist and carry the uniform floor density
    cold = ~hot
    assert cold.mean() > 0.4
    assert np.all(pdf[sel][cold] > 0.5 * 0.95 * 2 - 1e-3)


@pytest.mark.slow  # large-draw statistics
def test_uniform_mixture_covers_whole_image():
    """With prob 0.5 pixels ignore the CDF entirely (sample_cdf_2d), so
    even a maximally peaked error map leaves ~uniform coverage."""
    st = em.init_state(1, ew=8, eh=8)
    img = jnp.zeros((128,), jnp.int32)
    xy = jnp.tile(jnp.array([[0.0625, 0.0625]]), (128, 1))
    st = em.rebuild(em.splat(st, img, xy, jnp.full((128,), 100.0)))
    _, xys, _ = em.sample(st, jax.random.PRNGKey(2), 16384)
    xys = np.asarray(xys)
    hot = (xys[:, 0] < 0.125) & (xys[:, 1] < 0.125)
    # uniform half spreads 1/64 per texel; CDF half is all-hot
    assert abs(hot.mean() - (0.5 + 0.5 / 64)) < 0.02
    # every quadrant of the image still gets samples
    for qx in (0, 1):
        for qy in (0, 1):
            q = ((xys[:, 0] >= 0.5 * qx) & (xys[:, 0] < 0.5 * (qx + 1))
                 & (xys[:, 1] >= 0.5 * qy) & (xys[:, 1] < 0.5 * (qy + 1)))
            assert q.mean() > 0.08


def test_uniform_fallback_before_first_rebuild():
    st = em.init_state(4, ew=4, eh=4)
    imgs, xys, pdf = em.sample(st, jax.random.PRNGKey(1), 4000)
    imgs, pdf = np.asarray(imgs), np.asarray(pdf)
    counts = np.bincount(imgs, minlength=4)
    assert np.all(counts == 1000)          # stratified
    assert np.all(pdf == 1.0)


@pytest.mark.slow
def test_trainer_integration_smoke():
    from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig,
                                      TestbedConfig, TrainConfig)
    from rnb_neus2_tpu.testing.synthetic import sphere_dataset
    from rnb_neus2_tpu.train.trainer import Trainer

    ds = sphere_dataset(n_views=4, width=16, height=16, radius=0.2)
    cfg = TestbedConfig(
        grid=HashGridConfig(n_levels=3, top_resolution=32),
        train=TrainConfig(target_batch_size=1 << 10,
                          initial_rays_per_batch=64, occ_grid_size=16),
        march=MarchConfig(n_ladder=128, cone_angle=1.0 / 256.0))
    tr = Trainer(ds, cfg)
    tr._emap_interval = 5   # force a rebuild inside the smoke run
    for _ in range(12):
        out = tr.train_step()
    assert bool(np.asarray(tr.emap.valid))
    assert np.isfinite(out["loss_total"])


def test_sampling_knobs_default_reference_off_behavior():
    """With both proportional knobs off (the reference's defaults,
    testbed.h:663-664) sampling must ignore the CDFs entirely: stratified
    image choice + uniform pixels, even on a maximally peaked map."""
    st = em.init_state(2, ew=4, eh=4)
    img = jnp.zeros((64,), jnp.int32)
    xy = jnp.tile(jnp.array([[0.375, 0.625]]), (64, 1))
    st = em.rebuild(em.splat(st, img, xy, jnp.full((64,), 100.0)))
    imgs, xys, pdf = em.sample(st, jax.random.PRNGKey(1), 2048,
                               image_proportional=False,
                               focal_proportional=False)
    imgs, xys, pdf = map(np.asarray, (imgs, xys, pdf))
    # stratified images: exactly half the rays per image, in order
    assert (imgs[:1024] == 0).all() and (imgs[1024:] == 1).all()
    # uniform pixels: hot texel gets ~1/16 of draws, not ~1
    tex = np.floor(xys * 4).astype(int)
    hot = (tex[:, 0] == 1) & (tex[:, 1] == 2)
    assert hot.mean() < 0.15
    assert np.allclose(pdf, 1.0)


def test_sampling_image_knob_only():
    """image_proportional alone: CDF image choice, uniform pixels."""
    st = em.init_state(2, ew=4, eh=4)
    img = jnp.zeros((64,), jnp.int32)
    xy = jnp.tile(jnp.array([[0.375, 0.625]]), (64, 1))
    st = em.rebuild(em.splat(st, img, xy, jnp.full((64,), 100.0)))
    imgs, xys, _ = em.sample(st, jax.random.PRNGKey(2), 4096,
                             image_proportional=True,
                             focal_proportional=False)
    imgs, xys = np.asarray(imgs), np.asarray(xys)
    # image 0 favored at (1−MIN_PMF)+MIN_PMF/2 ≈ 0.95
    assert abs((imgs == 0).mean() - 0.95) < 0.04
    tex = np.floor(xys * 4).astype(int)
    hot = (tex[:, 0] == 1) & (tex[:, 1] == 2)
    assert hot.mean() < 0.15          # pixels stay uniform
