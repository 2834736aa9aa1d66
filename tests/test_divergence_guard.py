"""Divergence guard state machine (Trainer._guard_check / _rollback).

No reference analog: the CUDA testbed trains straight through a blow-up.
Motivated by a measured intrinsic instability of the full-scale system
(DESIGN.md "Full-scale divergence"): the RGB+ 4th-channel √(3−Σa²)
gradient is near-singular as predicted albedo approaches white, and at
lr 1e-3 the composite scene crossed into exponential blow-up at step
~1430 with the EXACT backward. The guard keeps a device-side copy of the
last healthy state plus a ≥64-step-lagging anchor (a blow-up builds below
the loss threshold for ~20 steps before a sync sees it), rolls back on a
loss explosion, halves the update scale, and restores it after clean
windows.

Driven directly through _consume_metrics with synthetic metrics — no
training steps — so the suite stays fast.
"""

import math

import numpy as np
import pytest

from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig, TestbedConfig,
                                  TrainConfig)
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def trainer():
    ds = sphere_dataset(n_views=2, width=16, height=16, radius=0.2)
    cfg = TestbedConfig(
        grid=HashGridConfig(n_levels=2, top_resolution=32),
        train=TrainConfig(target_batch_size=1 << 9,
                          initial_rays_per_batch=64,
                          occ_grid_size=16, seed=0),
        march=MarchConfig(n_ladder=64, cone_angle=1.0 / 256.0),
    )
    return Trainer(ds, cfg)


def metrics(loss, rays=64, n_valid=512.0, ek=1e-4):
    return {"loss_color": loss, "loss_ek": ek, "loss_mask": 0.1,
            "loss_total": loss, "n_valid_total": n_valid,
            "rays_per_batch": rays}


def reset(tr):
    import dataclasses
    # undo any degraded-mode flag flip / knob change a previous test left
    tr.cfg = dataclasses.replace(
        tr.cfg,
        flags=dataclasses.replace(tr.cfg.flags, apply_rgbplus=True),
        train=dataclasses.replace(tr.cfg.train,
                                  guard_rearm_cancel_on_degrade=True))
    tr._compiled.clear()
    tr.lr_scale = 1.0
    tr._good = None
    tr._anchor = None
    tr._deep_anchor = None
    tr._guard_windows = 0
    tr._guard_rollbacks = 0
    tr._guard_total_rollbacks = 0
    tr._guard_best_step = -1
    tr._guard_suspect = False
    tr._guard_ema_floor = None
    tr._guard_ek_floor = None
    tr._guard_degraded_at = None
    tr._guard_rearms_used = 0
    tr._guard_rearmed_at = None
    tr._guard_trip_best_steps = []
    tr.loss_ema.reset()
    tr.ek_ema.reset()
    tr.mask_ema.reset()
    tr.step = 0


def feed(tr, loss, step_advance=1, ek=1e-4):
    tr.step += step_advance
    return tr._consume_metrics(metrics(loss, ek=ek))


def test_healthy_windows_checkpoint_and_never_trip(trainer):
    tr = trainer
    reset(tr)
    for i in range(5):
        out = feed(tr, 0.05)
        assert "rolled_back" not in out
    assert tr.lr_scale == 1.0
    assert tr._good is not None and tr._good["step"] == tr.step
    assert tr._anchor is not None


def test_spike_rolls_back_and_halves_scale(trainer):
    tr = trainer
    reset(tr)
    for _ in range(3):
        feed(tr, 0.05)
    good_step = tr.step
    key_before = np.asarray(tr.key).copy()
    out = feed(tr, 1e6)   # hard band: >100× EMA and >20 absolute
    assert out.get("rolled_back") is True
    assert tr.step == good_step
    assert tr.lr_scale == 0.5
    # retry must not redraw the identical batch: key perturbed
    assert not np.array_equal(np.asarray(tr.key), key_before)
    # EMA not poisoned by the spike
    assert tr.loss_ema.value < 0.1


def test_nonfinite_loss_trips(trainer):
    tr = trainer
    reset(tr)
    feed(tr, 0.05)
    out = feed(tr, float("nan"))
    assert out.get("rolled_back") is True
    assert math.isfinite(tr.loss_ema.value)


def test_repeat_failure_escalates_to_anchor(trainer):
    tr = trainer
    reset(tr)
    # first healthy window at step 1 → becomes the anchor; then advance
    # far enough that the next checkpoints are ≥64 past it
    feed(tr, 0.05)
    anchor_step = tr.step
    feed(tr, 0.05, step_advance=70)
    recent_step = tr.step
    # tier 1: rollback to the freshest good
    feed(tr, 1e6)
    assert tr.step == recent_step
    # tier 2 (no healthy window in between): escalate to the anchor
    feed(tr, 1e6)
    assert tr.step == anchor_step
    assert tr.lr_scale == 0.25


def test_scale_restores_after_clean_windows(trainer):
    tr = trainer
    reset(tr)
    for _ in range(3):
        feed(tr, 0.05)
    feed(tr, 1e6)
    assert tr.lr_scale == 0.5
    for _ in range(8):
        feed(tr, 0.05)
    assert tr.lr_scale == 1.0


def test_bad_first_window_not_checkpointed(trainer):
    tr = trainer
    reset(tr)
    out = feed(tr, float("inf"))
    assert tr._good is None
    assert "rolled_back" not in out or out.get("rolled_back") is True
    # EMA untouched → a later healthy window starts the guard cleanly
    assert not tr.loss_ema._initialized
    out = feed(tr, 0.05)
    assert tr._good is not None


def test_guard_disable_flag(trainer):
    tr = trainer
    reset(tr)
    import dataclasses
    orig = tr.cfg
    tr.cfg = dataclasses.replace(
        orig, train=dataclasses.replace(orig.train, divergence_guard=False))
    try:
        feed(tr, 0.05)
        out = feed(tr, 1e6)
        assert "rolled_back" not in out
        assert tr.lr_scale == 1.0
    finally:
        tr.cfg = orig


def test_rollback_cap_raises_in_raise_mode(trainer):
    tr = trainer
    reset(tr)
    import dataclasses
    orig = tr.cfg
    tr.cfg = dataclasses.replace(orig, train=dataclasses.replace(
        orig.train, guard_terminal="raise"))
    try:
        feed(tr, 0.05)
        with pytest.raises(RuntimeError, match="divergence guard"):
            for _ in range(30):
                feed(tr, 1e6)
    finally:
        tr.cfg = orig


def test_rollback_cap_degrades_then_finishes(trainer):
    """Default terminal mode: at the trip cap the run does NOT die — it
    drops the RGB+ 4th channel (the one replay-proven stabilizer), resets
    the update scale, and keeps training. Only a SECOND cap in degraded
    mode raises."""
    tr = trainer
    reset(tr)
    feed(tr, 0.05)
    for _ in range(tr.cfg.train.guard_max_trips + 1):
        feed(tr, 1e6)
    # degraded: rgbplus off, counters re-armed, full update scale
    assert not tr.cfg.flags.apply_rgbplus
    assert tr.lr_scale == 1.0
    assert tr._guard_rollbacks == 0
    # training continues normally in degraded mode
    out = feed(tr, 0.05)
    assert "rolled_back" not in out
    # a second cap with no lever left must terminate
    with pytest.raises(RuntimeError, match="degraded"):
        for _ in range(tr.cfg.train.guard_max_trips + 2):
            feed(tr, 1e6)


def test_oscillation_livelock_terminates(trainer):
    """Regression for the guarded-run livelock
    (runs/RUN_r2_composite10k_guarded.log): a healthy window that merely
    re-treads rolled-back ground reset the consecutive-rollback count, so
    the 24-trip cap was unreachable and the PRNG perturb alternated
    between two fold values — the same two batches replayed forever. Now
    only progress past the best-ever step re-arms the cap, and every
    retry perturbs with a monotonic counter, so a no-progress oscillation
    must terminate and no two retries redraw the same stream."""
    tr = trainer
    reset(tr)
    feed(tr, 0.05)                          # good at step 1
    keys = []
    with pytest.raises(RuntimeError, match="divergence guard"):
        for _ in range(200):
            feed(tr, 1e6, step_advance=32)  # trip at best+32, roll back
            keys.append(np.asarray(tr.key).copy())
            feed(tr, 0.05, step_advance=0)  # heal WITHOUT new progress
    # two caps: one entering degraded mode, one terminating it
    assert len(keys) < 2 * 30, \
        "no-progress oscillation must hit the trip cap"
    uniq = {k.tobytes() for k in keys}
    assert len(uniq) == len(keys), "retry PRNG streams must never repeat"


def test_progress_rearms_tier1(trainer):
    """Genuine progress past the best-ever step drains the trip count, so
    a later isolated spike retries from the freshest checkpoint again
    (tier 1), not the anchor."""
    tr = trainer
    reset(tr)
    for _ in range(3):
        feed(tr, 0.05, step_advance=70)
    feed(tr, 1e6)                      # tier-1 trip
    assert tr._guard_rollbacks == 1
    feed(tr, 0.05, step_advance=70)    # beyond best → re-armed
    assert tr._guard_rollbacks == 0
    recent = tr.step
    feed(tr, 1e6)
    assert tr.step == recent           # tier 1 again


def test_deep_anchor_escalation(trainer):
    """Past 4 near-consecutive trips the guard escalates to the deep
    (>=256-step-lagging) anchor — the escape when even the 64-lag anchor
    predates the poisoning."""
    tr = trainer
    reset(tr)
    feed(tr, 0.05)                       # step 1 — first good
    deep_step = tr.step
    feed(tr, 0.05, step_advance=70)      # anchor retires to deep later
    feed(tr, 0.05, step_advance=70)
    feed(tr, 0.05, step_advance=200)     # force anchor turnover ≥256
    feed(tr, 0.05, step_advance=70)
    assert tr._deep_anchor is not None
    assert tr._deep_anchor["step"] == deep_step
    for _ in range(5):
        feed(tr, 1e6)
    assert tr.step == deep_step
    assert tr._guard_rollbacks >= 5


def test_soft_spike_forgiven_once(trainer):
    """Round-3 probe evidence (runs/PROBE_fp16emu.log): the unstable
    window throws transient single-batch spikes (1-20 absolute) that
    training recovers from on its own; tripping on each one
    rollback-thrashed the window. A single soft-band sync is therefore
    forgiven — no rollback, no checkpoint, EMAs untouched — and only a
    second consecutive soft sync rolls back."""
    tr = trainer
    reset(tr)
    for _ in range(3):
        feed(tr, 0.05)
    good_step = tr.step
    out = feed(tr, 5.0)              # soft: >10×EMA, >1 abs, <20 abs
    assert out.get("rolled_back") is True   # window not consumed…
    assert tr.lr_scale == 1.0               # …but no rollback either
    assert tr.step == good_step + 1
    assert tr.loss_ema.value < 0.1          # EMA unpoisoned
    out = feed(tr, 0.05)             # recovered → forgiven
    assert "rolled_back" not in out
    assert tr.lr_scale == 1.0
    # two soft syncs in a row = treated as a runaway
    feed(tr, 5.0)
    out = feed(tr, 5.0)
    assert out.get("rolled_back") is True
    assert tr.lr_scale == 0.5


def test_ema_ceiling_catches_gradual_blowup(trainer):
    """A blow-up growing slower than the soft ratio per sync poisons the
    EMA itself and slips every relative check (RUN_r2c trained through to
    loss 1574 that way). The guard trips once the EMA exceeds
    guard_ema_ceiling × its best-ever value."""
    tr = trainer
    reset(tr)
    loss = 0.05
    tripped = False
    for _ in range(400):
        out = feed(tr, loss)
        if out.get("rolled_back"):
            tripped = True
            break
        loss *= 1.2   # +20% per sync: always < 10× the trailing EMA
    assert tripped, "gradual blow-up must trip the EMA ceiling"
    assert tr.loss_ema.value < 60.0 * tr._guard_ema_floor


def test_degraded_mode_rearms_after_clean_progress(trainer):
    """The instability window is transient, so degraded (no-rgbplus) mode
    re-enables the RGB+ channel after guard_rearm_steps of clean
    progress instead of finishing thousands of steps under-supervised.
    (cancel_on_degrade off here to exercise the multi-re-arm budget; the
    default cancellation path has its own test below.)"""
    import dataclasses
    tr = trainer
    reset(tr)
    tr.cfg = dataclasses.replace(
        tr.cfg, train=dataclasses.replace(
            tr.cfg.train, guard_rearm_cancel_on_degrade=False))
    feed(tr, 0.05)
    for _ in range(tr.cfg.train.guard_max_trips + 1):
        feed(tr, 1e6)
    assert not tr.cfg.flags.apply_rgbplus
    assert tr._guard_degraded_at is not None
    # clean progress but short of the re-arm horizon: still degraded
    feed(tr, 0.05, step_advance=tr.cfg.train.guard_rearm_steps // 2)
    assert not tr.cfg.flags.apply_rgbplus
    # past the horizon: re-armed
    feed(tr, 0.05, step_advance=tr.cfg.train.guard_rearm_steps)
    assert tr.cfg.flags.apply_rgbplus
    assert tr._guard_rearms_used == 1
    assert tr._guard_degraded_at is None
    # a re-trip degrades again (no raise — rgbplus was back on). The
    # re-arm-detonation fast path re-degrades on the FIRST trip; later
    # trips roll the step back toward the deep anchor, so the clean
    # advance must clear degraded_at + rearm_steps from a rolled-back
    # step — use 3x the horizon.
    for _ in range(tr.cfg.train.guard_max_trips + 1):
        feed(tr, 1e6)
    assert not tr.cfg.flags.apply_rgbplus
    # second re-arm allowed, third is not
    feed(tr, 0.05, step_advance=3 * tr.cfg.train.guard_rearm_steps)
    assert tr.cfg.flags.apply_rgbplus and tr._guard_rearms_used == 2
    for _ in range(tr.cfg.train.guard_max_trips + 1):
        feed(tr, 1e6)
    feed(tr, 0.05, step_advance=3 * tr.cfg.train.guard_rearm_steps)
    assert not tr.cfg.flags.apply_rgbplus, "re-arms are bounded"


def test_thrash_detector_goes_terminal(trainer):
    """RUN_r3 slow-livelock regression: micro-progress past the best step
    re-armed the near-consecutive cap every cycle, so 31 trips with ~90
    steps of net progress never fired the terminal mode. If the last
    guard_max_trips trips advance the best step by < guard_thrash_span,
    the guard must go terminal (degrade) even though each cycle made
    nominal progress."""
    tr = trainer
    reset(tr)
    feed(tr, 0.05)
    cap = tr.cfg.train.guard_max_trips
    for _ in range(cap + 2):
        # a few steps of genuine progress, then a hard trip — the
        # oscillation signature; progress/cycle far below thrash_span/cap
        feed(tr, 0.05, step_advance=5)
        feed(tr, 1e6)
        if not tr.cfg.flags.apply_rgbplus:
            break
    assert not tr.cfg.flags.apply_rgbplus, \
        "thrash must trigger degraded mode despite per-cycle progress"


def test_slow_but_real_progress_never_thrash_trips(trainer):
    """Counter-case: trips spread over MORE than guard_thrash_span of
    net progress are isolated spikes, not thrash — no terminal."""
    tr = trainer
    reset(tr)
    feed(tr, 0.05)
    span = tr.cfg.train.guard_thrash_span
    for _ in range(tr.cfg.train.guard_max_trips + 2):
        feed(tr, 0.05, step_advance=span // 4)
        feed(tr, 1e6)
    assert tr.cfg.flags.apply_rgbplus, "well-spread trips must not degrade"


def test_rearm_detonation_redegrades_immediately(trainer):
    """RUN_r3 regression: re-arming the RGB+ channel at step 2697
    detonated within 40 steps (degraded-phase albedo drift put the state
    outside the re-armed channel's stability basin), and the guard then
    burned 25 trips thrashing the window. A trip within 256 steps of a
    re-arm must re-degrade on the FIRST trip."""
    tr = trainer
    reset(tr)
    feed(tr, 0.05)
    for _ in range(tr.cfg.train.guard_max_trips + 1):
        feed(tr, 1e6)
    assert not tr.cfg.flags.apply_rgbplus
    feed(tr, 0.05, step_advance=tr.cfg.train.guard_rearm_steps + 1)
    assert tr.cfg.flags.apply_rgbplus          # re-armed
    assert tr._guard_rearmed_at == tr.step
    rearm_step = tr.step
    feed(tr, 0.05, step_advance=30)
    out = feed(tr, 1e6, step_advance=10)       # detonation ~40 past re-arm
    assert out.get("rolled_back") is True
    assert not tr.cfg.flags.apply_rgbplus, \
        "one trip shortly after a re-arm must re-degrade immediately"
    assert tr._guard_rollbacks == 0            # trip budget NOT burned
    # the restored state is the fresh pre-detonation checkpoint, not the
    # deep anchor
    assert tr.step >= rearm_step


def test_ema_ceiling_has_absolute_arm(trainer):
    """RUN_r3 trips 62-81 regression: a low best-ever floor (honest or
    poisoned) made the 50x ceiling fire on every sync once the EMA
    honestly drifted to ~0.03 — sub-soft_abs losses can never be a
    blow-up. The ceiling only arms above guard_soft_abs."""
    tr = trainer
    reset(tr)
    for _ in range(3):
        feed(tr, 0.0006)                 # floor captured very low
    assert tr._guard_ema_floor == pytest.approx(0.0006, rel=1e-3)
    # drift gently up to ~0.05 — a 80x EMA rise, but absolutely healthy;
    # each sync is < 10x the trailing EMA so no soft trips either
    loss = 0.0006
    while loss < 0.05:
        loss *= 1.15
        out = feed(tr, loss)
        assert "rolled_back" not in out, \
            f"healthy sub-abs drift must never trip (loss={loss:.4g})"


def test_rollback_preserves_uninitialized_ema(trainer):
    """An uninitialized EMA checkpointed by seed_guard must come back
    UNINITIALIZED from a rollback — restoring it as set(0.0) made the
    EMA warm up from zero and warm-up values poisoned the ceiling floor
    (RUN_r3)."""
    tr = trainer
    reset(tr)
    tr.step = 100
    tr.seed_guard()                       # post-resume seed, EMA cold
    assert tr._good is not None
    out = feed(tr, 1e6)                   # blown first sync → rollback
    assert out.get("rolled_back") is True
    assert not tr.loss_ema._initialized, \
        "rollback must not initialize the EMA at 0.0"
    # first healthy sync initializes the EMA at the honest level
    feed(tr, 0.05)
    assert tr.loss_ema.value == pytest.approx(0.05)
    assert tr._guard_ema_floor == pytest.approx(0.05)


def test_zero_loss_dead_run_trips(trainer):
    """RUN_r3 attempt-3 regression: a resume into a collapsed state
    'trained' 500+ steps at loss=0.000000 (no valid samples — emptied
    occupancy grid). An exactly-zero color loss with a healthy reference
    is a dead run, not a perfect fit."""
    tr = trainer
    reset(tr)
    for _ in range(3):
        feed(tr, 0.05)
    good_step = tr.step
    out = feed(tr, 0.0)
    assert out.get("rolled_back") is True
    assert tr.step == good_step


def test_snapshot_roundtrips_degraded_state(trainer, tmp_path):
    """RUN_r3 attempt-2 regression: a rolling snapshot saved from a
    guard-degraded (no-rgbplus) trajectory was resumed with rgbplus ON
    and detonated within 32 steps — degraded-phase albedo params can sit
    outside the RGB+ channel's stability basin. The snapshot must carry
    the degraded flag + re-arm budget + full EMA state across a resume."""
    import dataclasses
    from rnb_neus2_tpu.train import snapshot as snap
    tr = trainer
    reset(tr)
    for _ in range(3):
        feed(tr, 0.05)
    # drive into degraded mode
    for _ in range(tr.cfg.train.guard_max_trips + 1):
        feed(tr, 1e6)
    assert not tr.cfg.flags.apply_rgbplus
    ema_val, ema_updates = tr.loss_ema.value, tr.loss_ema.updates
    path = str(tmp_path / "degraded.msgpack")
    snap.save_snapshot(path, tr)
    # simulate a fresh process: default config has rgbplus ON
    reset(tr)
    assert tr.cfg.flags.apply_rgbplus
    snap.restore_trainer(tr, snap.load_snapshot(path))
    assert not tr.cfg.flags.apply_rgbplus, \
        "resume must come back up degraded"
    assert tr._guard_degraded_at is not None
    assert tr.loss_ema.value == pytest.approx(ema_val)
    assert tr.loss_ema.updates == ema_updates
    # the guard is seeded: an immediate post-resume blow-up can roll back
    assert tr._good is not None
    # a user --no-rgbplus run is NOT marked guard-degraded
    reset(tr)
    feed(tr, 0.05)
    tr.cfg = dataclasses.replace(
        tr.cfg, flags=dataclasses.replace(tr.cfg.flags, apply_rgbplus=False))
    path2 = str(tmp_path / "user_norgbplus.msgpack")
    snap.save_snapshot(path2, tr)
    assert not bool(np.asarray(snap.load_snapshot(path2)["guard_degraded"]))


def test_cold_ema_rejects_blown_first_sync(trainer):
    """Cold-EMA hole (live RUN_r3): a resumed run's first metrics sync
    arrived already blown (481876) and, with no EMA reference, the old
    guard accepted and EMA-fed it — blinding every relative check for
    the rest of the run. With no reference the absolute bands apply:
    a large finite loss must not be consumed."""
    tr = trainer
    reset(tr)
    out = feed(tr, 481876.0)          # first sync, EMA uninitialized
    assert out.get("rolled_back") is True
    assert not tr.loss_ema._initialized
    assert tr._good is None
    # a sane first sync afterwards starts the guard normally
    out = feed(tr, 0.05)
    assert "rolled_back" not in out
    assert tr.loss_ema.value == pytest.approx(0.05)


def test_ek_creep_degrades_before_the_loss_blows(trainer):
    """Guard v4 (RUN_r3b regression): an RGB+ poisoning kept the color
    loss inside every band for ~700 steps while the eikonal EMA crept
    0.0046 → 0.086 (the SDF stopped being a distance function) and only
    THEN detonated at 4e6. The ek-creep channel must restore the lagging
    anchor and degrade RGB+ while the loss still looks healthy."""
    tr = trainer
    reset(tr)
    # healthy plateau forms the ek floor
    for _ in range(4):
        feed(tr, 0.05, step_advance=70, ek=0.005)
    assert tr._guard_ek_floor == pytest.approx(0.005)
    anchor_step = tr._anchor["step"]
    # creep: loss stays perfectly healthy, ek rises far past
    # max(5 x floor, 0.02); the EMA (half-life 50) needs several windows
    tripped = False
    for _ in range(400):
        out = feed(tr, 0.05, step_advance=16, ek=0.5)
        if not tr.cfg.flags.apply_rgbplus:
            tripped = True
            break
    assert tripped, "ek creep under a healthy loss must degrade"
    assert out.get("rolled_back") is True
    # restored the lagging anchor, not the freshest (just-under-ceiling)
    # checkpoint; its pre-creep ek EMA came back with it
    assert tr.step <= anchor_step or tr.ek_ema.value < 0.02
    assert tr.ek_healthy()
    # trip budget untouched — creep-degrade is terminal, not a trip
    assert tr.lr_scale == 1.0


def test_ek_creep_inert_while_degraded(trainer):
    """In degraded mode the creep channel must NOT trip (RGB+ is already
    off — the only creep engine ever observed; the loss bands remain the
    defense), so a degraded run with a drifting ek level keeps going."""
    tr = trainer
    reset(tr)
    for _ in range(3):
        feed(tr, 0.05, step_advance=70, ek=0.005)
    for _ in range(tr.cfg.train.guard_max_trips + 1):
        feed(tr, 1e6)
    assert not tr.cfg.flags.apply_rgbplus
    for _ in range(60):
        out = feed(tr, 0.05, step_advance=16, ek=0.5)
        assert "rolled_back" not in out
    assert not tr.cfg.flags.apply_rgbplus


def test_rollback_restores_ek_ema(trainer):
    """A rollback that restores params but keeps the post-creep ek EMA
    would re-trip the ceiling on the next sync regardless of the restored
    state's health — the EMAs must ride the guard checkpoints."""
    tr = trainer
    reset(tr)
    for _ in range(3):
        feed(tr, 0.05, step_advance=70, ek=0.004)
    ek_at_checkpoint = tr.ek_ema.value
    # a window with elevated ek (below the abs floor → no creep trip),
    # then a hard loss spike
    feed(tr, 0.05, step_advance=1, ek=0.018)
    assert tr.ek_ema.value > ek_at_checkpoint
    feed(tr, 1e6)
    # tier-1 restore = the freshest checkpoint (ek 0.018 window included)
    # → roll a SECOND consecutive failure to the anchor, whose ek EMA
    # predates the elevated window
    feed(tr, 1e6, step_advance=0)
    assert tr.ek_ema.value == pytest.approx(ek_at_checkpoint, rel=1e-3)


def test_failed_rearm_cancels_remaining_budget(trainer):
    """Guard v4 default: a re-armed RGB+ stretch that ends in another
    degrade (cap or creep) proves re-arming poisons this run — the
    remaining re-arm budget is cancelled instead of repeating a
    23-minute experiment (RUN_r3b)."""
    tr = trainer
    reset(tr)
    feed(tr, 0.05)
    for _ in range(tr.cfg.train.guard_max_trips + 1):
        feed(tr, 1e6)
    assert not tr.cfg.flags.apply_rgbplus
    feed(tr, 0.05, step_advance=tr.cfg.train.guard_rearm_steps + 1)
    assert tr.cfg.flags.apply_rgbplus and tr._guard_rearms_used == 1
    # survive past the detonation fast-path window, then cap out again
    feed(tr, 0.05, step_advance=300)
    for _ in range(tr.cfg.train.guard_max_trips + 2):
        feed(tr, 1e6)
    assert not tr.cfg.flags.apply_rgbplus
    assert tr._guard_rearms_used == tr.cfg.train.guard_max_rearms, \
        "a failed re-arm must cancel the remaining budget"
    # and a long clean stretch must NOT re-arm again
    feed(tr, 0.05, step_advance=4 * tr.cfg.train.guard_rearm_steps)
    assert not tr.cfg.flags.apply_rgbplus


def test_ek_gate_blocks_rearm(trainer):
    """Re-arming is a bet that the window has passed; a field whose ek
    EMA is still elevated (> max(2 x floor, abs)) loses it immediately —
    hold the re-arm until the geometry has re-annealed."""
    tr = trainer
    reset(tr)
    for _ in range(3):
        feed(tr, 0.05, step_advance=70, ek=0.005)
    for _ in range(tr.cfg.train.guard_max_trips + 1):
        feed(tr, 1e6)
    assert not tr.cfg.flags.apply_rgbplus
    # elevate the ek EMA BEFORE the re-arm horizon elapses (short step
    # advances), then cross the horizon with it still elevated → blocked
    for _ in range(40):
        feed(tr, 0.05, step_advance=10, ek=0.08)
    for _ in range(10):
        feed(tr, 0.05, step_advance=200, ek=0.08)
    assert not tr.cfg.flags.apply_rgbplus
    # ek re-anneals → re-arm proceeds
    for _ in range(300):
        feed(tr, 0.05, step_advance=10, ek=0.005)
        if tr.cfg.flags.apply_rgbplus:
            break
    assert tr.cfg.flags.apply_rgbplus


def test_snapshot_roundtrips_ek_state(trainer, tmp_path):
    """The ek EMA and both best-ever floors must survive a snapshot
    resume: without the floor, resuming a sick snapshot seeds the floor
    AT the sick level and the creep trip is blind for the whole run."""
    from rnb_neus2_tpu.train import snapshot as snap
    tr = trainer
    reset(tr)
    for _ in range(4):
        feed(tr, 0.05, step_advance=10, ek=0.006)
    ek_val, ek_floor = tr.ek_ema.value, tr._guard_ek_floor
    ema_floor = tr._guard_ema_floor
    path = str(tmp_path / "ekstate.msgpack")
    snap.save_snapshot(path, tr)
    reset(tr)
    snap.restore_trainer(tr, snap.load_snapshot(path))
    assert tr.ek_ema.value == pytest.approx(ek_val)
    assert tr._guard_ek_floor == pytest.approx(ek_floor)
    assert tr._guard_ema_floor == pytest.approx(ema_floor)
