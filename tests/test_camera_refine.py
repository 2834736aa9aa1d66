"""Per-view camera refinement: recover a known pose perturbation of one
view against a frozen converged field."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig, TestbedConfig,
                                  TrainConfig)
from rnb_neus2_tpu.render.losses import training_loss
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train import camera_refine as cr
from rnb_neus2_tpu.train.sampler import sample_ray_batch
from rnb_neus2_tpu.train.trainer import Trainer


def test_axis_angle_identity_and_orthonormal():
    aa = jnp.asarray([[0.0, 0.0, 0.0], [0.1, -0.2, 0.3]])
    R = np.asarray(cr.axis_angle_to_matrix(aa))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(R[1] @ R[1].T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(R[1]) - 1) < 1e-5


def test_exposure_roundtrip():
    p = cr.init_refine_params(2)
    img = jnp.asarray([0, 1, 0, 1])
    v = jnp.asarray([[0.2, 0.5, 0.8]] * 4)
    # zero exposure = identity
    np.testing.assert_allclose(np.asarray(cr.exposure_adjust(p, img, v)), v,
                               atol=2e-4)
    # +1 stop doubles the linear value
    p2 = p._replace(exposure=jnp.ones((2, 3)))
    out = np.asarray(cr.exposure_adjust(p2, img, v))
    assert np.all(out > np.asarray(v))


@pytest.fixture(scope="module")
def refine_field():
    """A converged field + dataset shared by the pose and focal tests."""
    ds = sphere_dataset(n_views=6, width=32, height=32, radius=0.2)
    cfg = TestbedConfig(
        grid=HashGridConfig(n_levels=4, top_resolution=64),
        train=TrainConfig(target_batch_size=1 << 13,
                          initial_rays_per_batch=128,
                          occ_grid_size=32, seed=0),
        march=MarchConfig(n_ladder=512, cone_angle=1.0 / 256.0))
    tr = Trainer(ds, cfg)
    for _ in range(900):
        tr.train_step()
    return ds, cfg, tr


@pytest.mark.slow  # 400-step pose optimization
def test_pose_refinement_recovers_offset(refine_field):
    ds, cfg, tr = refine_field

    # perturb view 0's rays by a known translation; the refiner must undo it
    TRUE_T = jnp.asarray([0.03, -0.02, 0.0])
    params = cr.init_refine_params(ds.n_images)
    tx = cr.make_refiner(2e-3)
    state = tx.init(params)
    import dataclasses as dc
    loss_cfg = dc.replace(cfg.loss, ek_loss_weight=0.0)

    @jax.jit
    def step(p, s, key):
        # march on clean rays (small perturbation: t-values stay valid),
        # evaluate positions on corrupted-then-refined rays
        batch, samples, _, (img, xy) = sample_ray_batch(
            ds, tr.occ.bitfield, key, 4096,
            cfg.train.target_batch_size, cfg.march)

        def loss_fn(pp):
            o = batch.ray_o + TRUE_T * (img == 0)[:, None]
            o2, d2 = cr.refine_rays(pp, img, o, batch.ray_d)
            rid = jnp.minimum(samples.ray_id, 4096 - 1)
            pos2 = jnp.clip(o2[rid] + samples.t[:, None] * d2[rid], 0, 1)
            # refined rays invalidate the pre-gathered per-sample attrs
            batch2 = batch._replace(ray_o=o2, ray_d=d2, sample_attrs=None)
            out = tr.field.apply(tr.params, pos2,
                                 differentiable_positions=True)
            total, m = training_loss(out, samples, batch2, cfg.flags,
                                     loss_cfg, 1.0)
            return total

        l, g = jax.value_and_grad(loss_fn)(p)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    key = jax.random.PRNGKey(0)
    for i in range(400):
        key, k = jax.random.split(key)
        params, state, l = step(params, state, k)
    t0 = np.asarray(params.trans[0])
    others = np.asarray(params.trans[1:])
    # view 0 learns ≈ −TRUE_T; other views stay near zero
    err = np.linalg.norm(t0 + np.asarray(TRUE_T))
    assert err < 0.6 * float(jnp.linalg.norm(TRUE_T)), t0
    assert np.abs(others).max() < 0.02


@pytest.mark.slow  # 400-step focal optimization
def test_focal_refinement_recovers_offset(refine_field):
    """The shared focal offset (cam_focal_length_offset,
    testbed_nerf.cu:3799-3810): corrupt every ray as if calibrated with
    focal × (1+CORRUPT); the refiner's focal offset must drive the
    EFFECTIVE focal back toward truth, i.e. (1+CORRUPT)(1+learned) → 1."""
    ds, cfg, tr = refine_field
    CORRUPT = 0.06
    corrupt_params = cr.init_refine_params(ds.n_images)._replace(
        focal=jnp.full((2,), CORRUPT, jnp.float32))
    params = cr.init_refine_params(ds.n_images)
    tx = cr.make_refiner(2e-3)
    state = tx.init(params)
    import dataclasses as dc
    loss_cfg = dc.replace(cfg.loss, ek_loss_weight=0.0)

    @jax.jit
    def step(p, s, key):
        batch, samples, _, (img, xy) = sample_ray_batch(
            ds, tr.occ.bitfield, key, 4096,
            cfg.train.target_batch_size, cfg.march)
        rot = ds.cameras.rot_c2w[img]

        def loss_fn(pp):
            # corrupt (fixed) then refine (trainable), both as focal
            # rescales in camera space
            o1, d1 = cr.refine_rays(corrupt_params, img, batch.ray_o,
                                    batch.ray_d, rot_c2w=rot)
            o2, d2 = cr.refine_rays(pp, img, o1, d1, rot_c2w=rot)
            rid = jnp.minimum(samples.ray_id, 4096 - 1)
            pos2 = jnp.clip(o2[rid] + samples.t[:, None] * d2[rid], 0, 1)
            batch2 = batch._replace(ray_o=o2, ray_d=d2, sample_attrs=None)
            out = tr.field.apply(tr.params, pos2,
                                 differentiable_positions=True)
            total, _ = training_loss(out, samples, batch2, cfg.flags,
                                     loss_cfg, 1.0)
            return total

        l, g = jax.value_and_grad(loss_fn)(p)
        # isolate the focal channel (the reference's optimize_focal_length
        # toggle steps only cam_focal_length_offset)
        g = g._replace(rot=jnp.zeros_like(g.rot),
                       trans=jnp.zeros_like(g.trans),
                       exposure=jnp.zeros_like(g.exposure))
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    key = jax.random.PRNGKey(0)
    for _ in range(400):
        key, k = jax.random.split(key)
        params, state, l = step(params, state, k)
    eff = (1.0 + CORRUPT) * (1.0 + np.asarray(params.focal))
    # at least 40% of the miscalibration recovered on both axes, and the
    # correction must move the right way, not overshoot into new error
    assert np.all(np.abs(eff - 1.0) < 0.6 * CORRUPT), eff
