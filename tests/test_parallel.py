"""Multi-chip sharding: the psum'd data-parallel gradient must equal the
single-chip gradient on the same ray batch (up to reduction order)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig, TestbedConfig,
                                  TrainConfig)
from rnb_neus2_tpu.models.neus_field import NeusField, init_params
from rnb_neus2_tpu.parallel.mesh import (make_mesh, make_parallel_train_step,
                                         sharded_occ_update_fn)
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train import optimizer as opt
from rnb_neus2_tpu.grid import occupancy

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
    field = NeusField(cfg.grid, cfg.network)
    params = init_params(jax.random.PRNGKey(0), cfg.grid, cfg.network)
    return ds, cfg, field, params


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_parallel_step_runs_and_trains(setup):
    ds, cfg, field, params = setup
    mesh = make_mesh()
    tx = opt.make_optimizer(cfg.optimizer, params)
    opt_state = opt.init_state(cfg.optimizer, params)
    occ_fn = sharded_occ_update_fn(field, cfg, mesh)
    step_fn = make_parallel_train_step(ds, field, cfg, mesh, tx,
                                       n_rays_global=256)

    occ = occupancy.init_state(cfg.train.occ_grid_size)
    key = jax.random.PRNGKey(1)
    occ = occ_fn(params, occ, key, jnp.int32(0))
    assert float(occ.bitfield.mean()) > 0

    losses = []
    p, s = params, opt_state
    for i in range(12):
        key, k = jax.random.split(key)
        p, s, metrics = step_fn(p, s, occ.bitfield, k, jnp.int32(i))
        losses.append(float(metrics["loss_total"]))
    assert np.isfinite(losses).all()
    # params actually moved
    delta = sum(float(jnp.abs(a - b).sum()) for a, b in
                zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(params)))
    assert delta > 0


def test_parallel_grad_matches_structure(setup):
    """Sanity: replicated outputs (grads applied) keep params synchronized
    across devices — tree norms finite, no NaN."""
    ds, cfg, field, params = setup
    mesh = make_mesh()
    tx = opt.make_optimizer(cfg.optimizer, params)
    opt_state = opt.init_state(cfg.optimizer, params)
    occ = occupancy.init_state(cfg.train.occ_grid_size)
    occ_fn = sharded_occ_update_fn(field, cfg, mesh)
    occ = occ_fn(params, occ, jax.random.PRNGKey(3), jnp.int32(0))
    step_fn = make_parallel_train_step(ds, field, cfg, mesh, tx,
                                       n_rays_global=512)
    p, s, metrics = step_fn(params, opt_state, occ.bitfield,
                            jax.random.PRNGKey(5), jnp.int32(1))
    for leaf in jax.tree_util.tree_leaves(p):
        assert np.isfinite(np.asarray(leaf)).all()
    assert float(metrics["n_samples_kept"]) > 0


def test_parallel_trainer_host_loop(setup):
    """ParallelTrainer drives the FULL inherited host loop (occupancy
    cadence, adaptive buckets, fused 16-step scan chunks) over the
    8-device CPU mesh: loss falls, controller tracks the budget, and the
    fused-chunk path actually executes."""
    from rnb_neus2_tpu.parallel.trainer import ParallelTrainer

    ds, cfg, _, _ = setup
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
    from rnb_neus2_tpu.parallel.trainer import ParallelTrainer
    from rnb_neus2_tpu.train.trainer import Trainer

    ds, cfg, _, _ = setup
    a, b = Trainer(ds, cfg), ParallelTrainer(ds, cfg)
    la = [a.train_step()["loss_total"] for _ in range(60)]
    lb = [b.train_step()["loss_total"] for _ in range(60)]
    la, lb = np.asarray(la[-15:]), np.asarray(lb[-15:])
    assert np.isfinite(la).all() and np.isfinite(lb).all()
    assert abs(la.mean() - lb.mean()) < 3 * (la.std() + lb.std() + 1e-5)
