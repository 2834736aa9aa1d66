"""Multi-chip data parallelism (parallel.trainer.ParallelTrainer over an
8-device virtual CPU mesh): the psum'd sharded step must train, keep
params replicated and finite, drive the full inherited host loop, and
statistically track the single-chip loss trajectory."""

import numpy as np
import jax
import pytest

from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig, TestbedConfig,
                                  TrainConfig)
from rnb_neus2_tpu.parallel.trainer import ParallelTrainer
from rnb_neus2_tpu.testing.synthetic import sphere_dataset

pytestmark = pytest.mark.slow  # 8-device CPU-mesh training steps


@pytest.fixture(scope="module")
def setup():
    ds = sphere_dataset(n_views=8, width=32, height=32, radius=0.2)
    cfg = TestbedConfig(
        grid=HashGridConfig(n_levels=4, top_resolution=64),
        train=TrainConfig(target_batch_size=1 << 13,
                          initial_rays_per_batch=128,
                          occ_grid_size=32, seed=0),
        march=MarchConfig(n_ladder=512),
    )
    return ds, cfg


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_error_map_sampling_refused_multichip(setup):
    """The parallel path never accumulates the error map, so enabling the
    proportional-sampling knobs with >1 chip must hard-error instead of
    silently changing behavior vs --n-chips 1."""
    import dataclasses
    ds, cfg = setup
    bad = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, sample_image_proportional_to_error=True))
    with pytest.raises(ValueError, match="error-map"):
        ParallelTrainer(ds, bad)


def test_parallel_trainer_replicated_and_finite(setup):
    """One sharded step: occupancy forms, params move, every leaf stays
    finite and identical across devices (the psum'd grads + replicated
    optimizer must keep the replicas in lockstep)."""
    ds, cfg = setup
    tr = ParallelTrainer(ds, cfg)
    before = [np.asarray(l) for l in
              jax.tree_util.tree_leaves(tr.params)]
    metrics = tr.train_step()
    assert float(tr.occ.bitfield.mean()) > 0
    assert float(metrics["n_samples_kept"]) > 0
    delta = 0.0
    for a, b in zip(before, jax.tree_util.tree_leaves(tr.params)):
        b = np.asarray(b)
        assert np.isfinite(b).all()
        delta += float(np.abs(a - b).sum())
    assert delta > 0
    # replicated output: one logical array per leaf, fully addressable
    for leaf in jax.tree_util.tree_leaves(tr.params):
        assert leaf.is_fully_replicated or len(leaf.devices()) == 1


def test_parallel_trainer_host_loop(setup):
    """ParallelTrainer drives the FULL inherited host loop (occupancy
    cadence, adaptive buckets, fused 16-step scan chunks) over the
    8-device CPU mesh: loss falls, controller tracks the budget, and the
    fused-chunk path actually executes."""
    ds, cfg = setup
    tr = ParallelTrainer(ds, cfg)
    assert tr.n_dev == 8
    first = tr.train_step()["loss_total"]
    for _ in range(39):
        out = tr.train_step()
    tr.step = 256                       # steady state, 16-aligned
    out = tr.train_steps(32, sync_every=16)
    assert tr.step == 288               # two fused chunks consumed
    assert ("chunk", tr._bucket(), tr._level_bucket(), 16) in tr._compiled
    assert np.isfinite(out["loss_total"])
    assert out["loss_total"] < first
    assert out["n_valid_total"] > 0


def test_parallel_trainer_matches_single_chip_loss(setup):
    """Same seed, same scene: the parallel trainer's loss trajectory must
    track the single-chip trainer's (not bit-equal — ray batches shard
    differently — but converging the same way)."""
    from rnb_neus2_tpu.train.trainer import Trainer

    ds, cfg = setup
    a, b = Trainer(ds, cfg), ParallelTrainer(ds, cfg)
    la = [a.train_step()["loss_total"] for _ in range(60)]
    lb = [b.train_step()["loss_total"] for _ in range(60)]
    la, lb = np.asarray(la[-15:]), np.asarray(lb[-15:])
    assert np.isfinite(la).all() and np.isfinite(lb).all()
    assert abs(la.mean() - lb.mean()) < 3 * (la.std() + lb.std() + 1e-5)
