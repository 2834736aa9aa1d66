"""Minimum end-to-end slice: overfit the synthetic sphere (SURVEY §7 step 4).

Small config (4 hash levels, 32³ occupancy grid, 2^13-sample budget) keeps
the run CPU-friendly (~2 min). Asserts the NeuS optimization carves the
sphere: the SDF zero level set grows from the geometric-init radius (0.093)
to the true radius, the variance sharpens, and the color loss collapses —
the same qualitative trajectory as the reference testbed.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig, TestbedConfig,
                                  TrainConfig)
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow  # 1200-step convergence fixture

RADIUS = 0.2


@pytest.fixture(scope="module")
def trained():
    ds = sphere_dataset(n_views=8, width=32, height=32, radius=RADIUS)
    cfg = TestbedConfig(
        grid=HashGridConfig(n_levels=4, top_resolution=64),
        train=TrainConfig(target_batch_size=1 << 13,
                          initial_rays_per_batch=128,
                          occ_grid_size=32, seed=0),
        march=MarchConfig(n_ladder=512, cone_angle=1.0 / 256.0),
    )
    tr = Trainer(ds, cfg)
    first = [tr.train_step() for _ in range(10)]
    last = None
    traj = [(m["rays_per_batch"], m["n_valid_total"]) for m in first]
    for _ in range(1190):
        last = tr.train_step()
        traj.append((last["rays_per_batch"], last["n_valid_total"]))
    return tr, first, last, traj


def _radial_sdf(tr, r, n=96):
    d = np.random.default_rng(0).standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    x = jnp.asarray(0.5 + r * d, jnp.float32)
    return np.asarray(tr.field.sdf(tr.inference_params, x))


def test_color_loss_collapses(trained):
    tr, first, last, _ = trained
    early = np.mean([f["loss_color"] for f in first])
    assert last["loss_color"] < 0.01
    assert last["loss_color"] < early * 0.25
    assert np.isfinite(last["loss_total"])


def test_variance_sharpens(trained):
    tr, first, last, _ = trained
    # inv_s = e^{10v} rises by orders of magnitude as the surface forms
    assert last["inv_s"] > 100.0
    assert float(np.asarray(tr.params["variance"])[0]) > 0.4


def test_sdf_carved_to_sphere(trained):
    tr, _, _, _ = trained
    assert np.abs(_radial_sdf(tr, RADIUS)).mean() < 0.03
    assert _radial_sdf(tr, RADIUS - 0.08).mean() < -0.02
    assert _radial_sdf(tr, RADIUS + 0.1).mean() > 0.02


def test_mask_improves(trained):
    tr, first, last, _ = trained
    assert last["loss_mask"] < first[0]["loss_mask"]


def test_mesh_from_trained_field(trained, tmp_path):
    """End-to-end: trained field → marching → world mesh ≈ sphere of the
    right radius (the reference's full normals-only path, SURVEY §7 step 6)."""
    from rnb_neus2_tpu.io.dataset import SceneMeta
    from rnb_neus2_tpu.mesh import extract, postprocess, writer

    tr, _, _, _ = trained
    meta = SceneMeta()   # scale .5, offset .5, n2w identity, from_na
    m = extract.extract_mesh(tr.field, tr.inference_params, resolution=96,
                             meta=meta)
    V, F, N, _ = postprocess.largest_component(m["V"], m["F"], m["N"])
    assert len(V) > 300
    # world = (unit − 0.5)/0.5 → sphere at origin with radius 2·RADIUS
    r = np.linalg.norm(V, axis=1)
    assert abs(float(np.median(r)) - 2 * RADIUS) < 0.06
    assert float(np.std(r)) < 0.05
    writer.save_mesh(tmp_path / "m.obj", V, F, N)
    assert (tmp_path / "m.obj").exists()


@pytest.mark.slow
def test_light_prng_divergence_within_noise():
    """The reference picks each ray's light with curand(clock64()) — a
    non-deterministic stream; ours is a counted PRNG (documented
    divergence, DESIGN.md). Quantify: two runs differing ONLY in the
    light-choice stream (light_prng_salt) must have loss trajectories
    whose late-phase gap is within each run's own step-to-step noise —
    i.e. the choice of stream does not steer training."""
    def run(salt):
        ds = sphere_dataset(n_views=8, width=32, height=32, radius=RADIUS)
        cfg = TestbedConfig(
            grid=HashGridConfig(n_levels=4, top_resolution=64),
            train=TrainConfig(target_batch_size=1 << 13,
                              initial_rays_per_batch=128,
                              occ_grid_size=32, seed=0,
                              light_prng_salt=salt),
            march=MarchConfig(n_ladder=512, cone_angle=1.0 / 256.0),
        )
        tr = Trainer(ds, cfg)
        losses = [tr.train_step()["loss_color"] for _ in range(500)]
        return np.asarray(losses, np.float64)

    a, b = run(0), run(7)
    assert not np.allclose(a[:50], b[:50])   # streams really differ
    tail_a, tail_b = a[-150:], b[-150:]
    gap = abs(tail_a.mean() - tail_b.mean())
    noise = 0.5 * (tail_a.std() + tail_b.std())
    assert gap < 2.0 * noise, (gap, noise)
    # both converge equally: same order of magnitude of final loss
    assert tail_a.mean() < 3.0 * tail_b.mean() + 1e-4
    assert tail_b.mean() < 3.0 * tail_a.mean() + 1e-4


def test_adaptive_batch_controller_trajectory(trained):
    """The adaptive rays-per-batch controller (testbed_nerf.cu:3554-3555)
    must (a) start at the configured initial ray count, (b) RAMP UP as the
    occupancy grid prunes empty space (fewer samples per ray → more rays
    fit the sample budget), and (c) hold the generated sample count near
    the slot budget in steady state."""
    _, _, _, traj = trained
    rays = np.asarray([r for r, _ in traj], np.float64)
    nval = np.asarray([v for _, v in traj], np.float64)
    target = 1 << 13
    # (a) first step uses the initial bucket
    assert rays[0] == 128
    # (b) ramp: late median rays above the start. Under the reference's
    # uniform-sampling default each ray on this tiny scene yields ~30
    # valid samples, so the budget saturates at 2x the initial bucket
    # (256 rays x ~30 = ~7.7k of the 8192 budget) — the controller
    # correctly STOPS ramping there. (The >=4x ramp seen previously was
    # an artifact of error-proportional sampling concentrating rays on
    # few-sample silhouette texels.)
    assert np.median(rays[-200:]) >= 2 * rays[0]
    # (c) steady state: generated samples track the budget within 2x
    # (the controller aims the PRE-drop count at the slot budget) —
    # THE controller contract (testbed_nerf.cu:3554-3555)
    late = nval[-200:] / target
    assert 0.4 < np.median(late) < 2.5, np.median(late)


@pytest.mark.parametrize("k", [1, 2])
def test_stochastic_corner_bwd_convergence_ab(k):
    """A/B: training with the stochastic corner backward (K of 8 corners
    on hashed levels, NetworkConfig.stoch_corner_bwd) must converge to the
    same late-phase loss as the exact 8-corner backward, within the runs'
    own step-to-step noise. Parametrized over both the shipped default
    (K=1) and K=2 so the default always has in-tree convergence evidence.
    (The unbiasedness itself is proven in
    test_hash_encoding.py::test_stochastic_corner_bwd_unbiased)."""
    from rnb_neus2_tpu.config import NetworkConfig

    def run(k):
        ds = sphere_dataset(n_views=8, width=32, height=32, radius=RADIUS)
        cfg = TestbedConfig(
            # log2_hashmap_size=10 forces the top levels to HASH (the
            # stochastic path only exists for hashed levels)
            grid=HashGridConfig(n_levels=4, top_resolution=64,
                                log2_hashmap_size=10),
            network=NetworkConfig(stoch_corner_bwd=k),
            train=TrainConfig(target_batch_size=1 << 13,
                              initial_rays_per_batch=128,
                              occ_grid_size=32, seed=0),
            march=MarchConfig(n_ladder=512, cone_angle=1.0 / 256.0),
        )
        tr = Trainer(ds, cfg)
        losses = [tr.train_step()["loss_color"] for _ in range(500)]
        return np.asarray(losses, np.float64)

    a, b = run(0), run(k)
    assert not np.allclose(a[-50:], b[-50:])   # paths really differ
    tail_a, tail_b = a[-150:], b[-150:]
    gap = abs(tail_a.mean() - tail_b.mean())
    noise = 0.5 * (tail_a.std() + tail_b.std())
    assert gap < 2.0 * noise, (gap, noise)
    assert tail_a.mean() < 3.0 * tail_b.mean() + 1e-4
    assert tail_b.mean() < 3.0 * tail_a.mean() + 1e-4


def test_fused_chunk_matches_per_step():
    """train_steps' fused [refresh + 16-step lax.scan] chunks must produce
    the same parameters and PRNG stream as the per-step path (the chunk is
    a dispatch-batching transform, not a semantic change)."""
    def make():
        ds = sphere_dataset(n_views=4, width=24, height=24, radius=RADIUS)
        cfg_kw = dict(
            grid=HashGridConfig(n_levels=4, top_resolution=64),
            march=MarchConfig(n_ladder=256, cone_angle=1.0 / 256.0),
        )
        return ds, cfg_kw

    ds, kw = make()
    outs = {}
    for fused in (1, 16):
        cfg = TestbedConfig(
            train=TrainConfig(target_batch_size=1 << 11,
                              initial_rays_per_batch=128,
                              occ_grid_size=16, seed=0,
                              fused_steps=fused), **kw)
        tr = Trainer(ds, cfg)
        for _ in range(8):          # form some occupancy
            tr.train_step()
        tr.step = 256               # steady-state regime, 16-aligned
        tr.train_steps(32, sync_every=8)
        outs[fused] = (tr.params, np.asarray(tr.key), tr.step)

    assert outs[1][2] == outs[16][2] == 288
    np.testing.assert_array_equal(outs[1][1], outs[16][1])  # PRNG stream
    a, b = outs[1][0], outs[16][0]
    # scan-vs-unrolled fusion reassociates float sums, and 32 Adam steps
    # amplify the ulps (sign-flipped gradients near decision boundaries
    # diverge the per-slot moments). The drift profile is RUNTIME-
    # dependent: 27/705k elements / max 7e-5 when first measured, 5% /
    # max 8e-3 on the current jaxlib's CPU codegen — re-verified
    # identical at the round-3 commit, so it's XLA codegen drift, not a
    # code change. Bitwise lockstep is therefore not assertable here;
    # the semantic gates are (a) the EXACT PRNG stream + step count
    # above (catches key mis-threading, skipped refreshes, extra/missing
    # steps — each would also shift most elements at parameter scale)
    # and (b) bounded GLOBAL drift (per-leaf relative norms are
    # meaningless for near-zero leaves like biases/variance).
    da = np.concatenate([np.ravel(np.asarray(x) - np.asarray(y))
                         for x, y in zip(jax.tree_util.tree_leaves(a),
                                         jax.tree_util.tree_leaves(b))])
    na = np.concatenate([np.ravel(np.asarray(x))
                         for x in jax.tree_util.tree_leaves(a)])
    rel_frob = float(np.linalg.norm(da)) / max(float(np.linalg.norm(na)),
                                               1e-6)
    assert rel_frob < 0.05, rel_frob
    assert float(np.max(np.abs(da))) < 0.05


def test_densified_levels_train_and_snapshot(tmp_path):
    """Integration: HashGridConfig.dense_max_entries_log2 (lift the
    reference's per-level 2^19 cap for mid levels — grid.h:987-999 is a
    GPU-cache choice; TPU trades HBM for 8x fewer gather rows) flows
    through Trainer steps, the fused-chunk path, and snapshot
    save/restore at the changed table shape."""
    from rnb_neus2_tpu.train import snapshot as snap

    ds = sphere_dataset(n_views=4, width=24, height=24, radius=RADIUS)
    grid = HashGridConfig(n_levels=4, top_resolution=64,
                          log2_hashmap_size=10, dense_max_entries_log2=17)
    # the point of the fixture: a knob-densified level exists
    assert grid.level_table_sizes()[1] > (1 << 10)
    cfg = TestbedConfig(
        grid=grid,
        train=TrainConfig(target_batch_size=1 << 11,
                          initial_rays_per_batch=64,
                          occ_grid_size=32, seed=0),
        march=MarchConfig(n_ladder=256, cone_angle=1.0 / 256.0),
    )
    tr = Trainer(ds, cfg)
    for _ in range(3):
        m = tr.train_step()
    assert np.isfinite(m["loss_total"])
    p = str(tmp_path / "snap.msgpack")
    snap.save_snapshot(p, tr)
    tr2 = Trainer(ds, cfg)
    snap.restore_trainer(tr2, snap.load_snapshot(p))
    np.testing.assert_array_equal(
        np.asarray(tr2.params["hash_table"]), np.asarray(tr.params["hash_table"]))
    assert np.isfinite(tr2.train_step()["loss_total"])
