"""Feed-forward stabilizer window (TrainConfig.stab_*).

The full-scale composite runs have a transient spiky window (~steps
1400-1800; DESIGN.md "Full-scale divergence") that replays show lr 1e-4
rides through cleanly (runs/REPLAY_k0_lr1e4.log). The schedule multiplies
the Adam update by stab_scale inside [stab_start, stab_end) from the
TRACED step index — no recompile, composes with the guard's reactive
lr_scale. No reference analog (the CUDA testbed trains through the
blow-up, src/main.cu:444-453 has no such lever)."""

import jax.numpy as jnp
import numpy as np

from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig, TestbedConfig,
                                  TrainConfig)
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train.trainer import Trainer, effective_lr_scale


def test_effective_lr_scale_window():
    cfg = TrainConfig(stab_start=10, stab_end=20, stab_scale=0.1)
    for step, want in [(0, 1.0), (9, 1.0), (10, 0.1), (19, 0.1), (20, 1.0)]:
        got = effective_lr_scale(cfg, jnp.int32(step), jnp.float32(1.0))
        assert np.isclose(float(got), want), (step, float(got), want)
    # composes multiplicatively with the guard's reactive scale
    got = effective_lr_scale(cfg, jnp.int32(15), jnp.float32(0.5))
    assert np.isclose(float(got), 0.05)


def test_effective_lr_scale_disabled_is_identity():
    base = jnp.float32(0.7)
    for cfg in (TrainConfig(stab_scale=1.0),
                TrainConfig(stab_start=20, stab_end=10, stab_scale=0.1)):
        assert effective_lr_scale(cfg, jnp.int32(15), base) is base


def _param_deltas(cfg, n_steps):
    ds = sphere_dataset(n_views=4, width=16, height=16, radius=0.2)
    tr = Trainer(ds, cfg)
    deltas = []
    for _ in range(n_steps):
        before = np.asarray(tr.params["variance"])
        tr.train_step()
        after = np.asarray(tr.params["variance"])
        deltas.append(float(np.linalg.norm(after - before)))
    return deltas


def test_window_scales_updates_in_training():
    base = TestbedConfig(
        grid=HashGridConfig(n_levels=2, top_resolution=32),
        train=TrainConfig(target_batch_size=1 << 9,
                          initial_rays_per_batch=64,
                          occ_grid_size=16, seed=0,
                          stab_start=2, stab_end=4, stab_scale=0.1),
        march=MarchConfig(n_ladder=64, cone_angle=1.0 / 256.0),
    )
    deltas = _param_deltas(base, 6)
    # Adam's update magnitude is ~lr·m/√v, so the final lr_scale multiplier
    # shows up ~linearly in the param delta: in-window steps (2, 3) must be
    # roughly 10× smaller than their out-of-window neighbors
    out_win = min(deltas[1], deltas[4], deltas[5])
    in_win = max(deltas[2], deltas[3])
    assert in_win < 0.35 * out_win, deltas
