"""Dynamic scenes: the rigid-motion phase recovers a known object shift
with the canonical field frozen (NeuS2 predict_global_movement flow)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig, TestbedConfig,
                                  TrainConfig)
from rnb_neus2_tpu.io.dataset import SceneMeta, build_dataset
from rnb_neus2_tpu.models import delta_network as dn
from rnb_neus2_tpu.testing.synthetic import (render_sphere_views,
                                             ring_cameras)
from rnb_neus2_tpu.train.dynamic import DynamicConfig, FrameSequenceTrainer

pytestmark = pytest.mark.slow  # 900-step first-frame training fixture

RADIUS = 0.2
SHIFT = np.array([0.06, -0.04, 0.0], np.float32)


def frame_dataset(center):
    cams = ring_cameras(6, 1.5, 32, 32, focal=70.0)
    normals, albedo, alphas = render_sphere_views(cams, center=center,
                                                  radius=RADIUS)
    return build_dataset(cams, normals, albedo, alphas, alphas, SceneMeta())


@pytest.fixture(scope="module")
def sequence():
    cfg = TestbedConfig(
        grid=HashGridConfig(n_levels=4, top_resolution=64),
        train=TrainConfig(target_batch_size=1 << 13,
                          initial_rays_per_batch=128,
                          occ_grid_size=32, seed=0),
        march=MarchConfig(n_ladder=512, cone_angle=1.0 / 256.0),
    )
    seq = FrameSequenceTrainer(
        frame_dataset((0.5, 0.5, 0.5)), cfg,
        DynamicConfig(first_frame_max_training_step=900,
                      # the reference's 100 steps suit small video motions;
                      # this test shift (0.072) needs a longer phase
                      predict_global_movement_training_step=400,
                      next_frame_max_training_step=60))
    seq.train_first_frame()
    return seq


def test_first_frame_converged(sequence):
    tr = sequence.trainer
    sdf0 = float(np.asarray(tr.field.sdf(
        tr.inference_params, jnp.asarray([[0.5, 0.5, 0.5]]))))
    assert sdf0 < -0.05   # inside the canonical sphere


def test_delta_recovers_shift(sequence):
    seq = sequence
    delta = seq.advance_frame(frame_dataset(tuple(0.5 + SHIFT)))
    R = np.asarray(dn.rotation_6d_to_matrix(delta["rotation6d"]))
    t = np.asarray(delta["translation"])
    # the delta maps frame-1 rays into the canonical frame: x ↦ Rx + t
    # must move the shifted object back toward the center → t ≈ −SHIFT,
    # R ≈ I. On this tiny low-res fixture the estimate is noisy; assert
    # the mechanism: rotation near identity, residual error at most half
    # the original motion, direction strongly aligned.
    np.testing.assert_allclose(R, np.eye(3), atol=0.08)
    err = np.linalg.norm(t + SHIFT)
    assert err < 0.5 * np.linalg.norm(SHIFT), (t, -SHIFT)
    cos = -t @ SHIFT / (np.linalg.norm(t) * np.linalg.norm(SHIFT) + 1e-9)
    assert cos > 0.8, (t, -SHIFT)


def test_mesh_in_frame_space(sequence):
    m = sequence.extract_mesh(resolution=64)
    if len(m["V"]):
        # world = (unit−0.5)/0.5: shifted sphere center → 2·SHIFT
        center = np.median(m["V"], axis=0)
        np.testing.assert_allclose(center, 2 * SHIFT, atol=0.12)
