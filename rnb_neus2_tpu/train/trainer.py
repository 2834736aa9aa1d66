"""The training engine: jitted step, occupancy updates, adaptive batching.

Replaces the reference's Testbed::train / train_nerf / train_nerf_step host
orchestration (src/testbed.cu:2776-2870, src/testbed_nerf.cu:3560-4123):

- one fused jitted step = sample rays → march → network → loss → grad →
  Adam → param EMA (the reference runs 5+ kernel launches + an optimizer
  graph; XLA fuses the lot);
- occupancy-grid refresh every clamp(step/16, 1, 16) steps
  (testbed.cu:2801-2821) as a second jitted function;
- progressive hash-level unlocking by passing the step into the encoding
  (testbed.cu:2788-2793);
- adaptive rays/batch: the reference rescales rays_per_batch to hit the
  2^18-sample budget (testbed_nerf.cu:3554-3555); we bucket R to powers of
  two (the flat sample buffer S stays fixed) and additionally bucket the
  static active-level count, one cached compile per (R, levels) pair.
"""

from __future__ import annotations

import functools
import math
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TestbedConfig, TARGET_BATCH_SIZE
from ..grid import occupancy
from ..io.dataset import TrainingDataset
from ..models.neus_field import NeusField, init_params
from ..render.losses import training_loss
from ..utils.diagnostics import LossGraph
from ..utils.meters import Ema
from . import error_map
from . import optimizer as opt
from .sampler import sample_ray_batch


def effective_lr_scale(train_cfg, step, lr_scale):
    """Compose the guard's reactive update scale with the feed-forward
    stabilizer window (TrainConfig.stab_*): ×stab_scale for traced steps
    in [stab_start, stab_end). Shared by Trainer and ParallelTrainer so
    both jitted bodies apply identical schedules."""
    if train_cfg.stab_scale >= 1.0 \
            or train_cfg.stab_end <= train_cfg.stab_start:
        return lr_scale
    in_win = (step >= train_cfg.stab_start) & (step < train_cfg.stab_end)
    return lr_scale * jnp.where(in_win, train_cfg.stab_scale, 1.0)


def valid_level_for_step(grid_cfg, step: jnp.ndarray) -> jnp.ndarray:
    """jnp twin of HashGridConfig.valid_levels (grid.h:1430-1436)."""
    L = grid_cfg.n_levels
    v = jnp.ceil(grid_cfg.base_valid_level_scale * L
                 + grid_cfg.valid_level_scale
                 * jnp.maximum(0, step - grid_cfg.base_training_step))
    v = jnp.minimum(L, v.astype(jnp.int32))
    return jnp.where(step <= 0, L, v)


class Trainer:
    """Single-scene training driver (host loop; device math is all jitted)."""

    def __init__(self, dataset: TrainingDataset, cfg: TestbedConfig,
                 params: Optional[Dict[str, Any]] = None):
        from ..utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()
        self.dataset = dataset
        self.cfg = cfg
        self.field = NeusField(cfg.grid, cfg.network)
        key = jax.random.PRNGKey(cfg.train.seed)
        self.key, k_init = jax.random.split(key)
        self.params = params if params is not None else init_params(
            k_init, cfg.grid, cfg.network)
        self.tx = opt.make_optimizer(cfg.optimizer, self.params)
        self.opt_state = opt.init_state(cfg.optimizer, self.params)
        self.occ = occupancy.init_state(cfg.train.occ_grid_size)
        self.step = 0
        # adaptive batch: start at the reference's 2^12 rays (testbed.h:908)
        self.n_rays = cfg.train.initial_rays_per_batch
        self.loss_ema = Ema(half_life_steps=50)
        self.ek_ema = Ema(half_life_steps=50)
        self.mask_ema = Ema(half_life_steps=50)
        self.step_ms = Ema(half_life_steps=50)
        self.loss_graph = LossGraph()
        self._compiled: Dict[int, Any] = {}
        # error-map importance sampling (testbed.cu:3600-3725):
        # first rebuild after 128 steps, interval ×1.5 each time
        ew, eh = error_map.resolution_for(
            dataset.n_images, cfg.train.initial_rays_per_batch, 128,
            dataset.resolution)
        self.emap = error_map.init_state(dataset.n_images, ew, eh)
        self._emap_interval = 128
        self._emap_counter = 0
        # Divergence guard (no reference analog — the CUDA testbed just
        # trains on; see DESIGN.md "Full-scale divergence"): keep a
        # device-side copy of the last healthy state; when a metrics sync
        # sees the color loss explode (two consecutive soft hits, one hard
        # hit, non-finite, or the EMA creeping past its ceiling — see
        # TrainConfig guard_* knobs), roll back and halve the update
        # scale, restoring it ×2 after 8 clean windows. lr_scale
        # multiplies the FINAL Adam update inside the jitted step (a
        # traced scalar — no recompile).
        self.lr_scale = 1.0
        self._good: Optional[dict] = None
        self._anchor: Optional[dict] = None
        self._deep_anchor: Optional[dict] = None
        self._guard_windows = 0
        self._guard_rollbacks = 0
        # monotonic trip counter: the PRNG perturb must differ on EVERY
        # retry. Keying it off the consecutive-rollback count livelocked a
        # full-scale run (one healthy window between trips reset the count,
        # so the fold value alternated 2,3,2,3 — two deterministic replays
        # repeated forever; runs/RUN_r2_composite10k_guarded.log)
        self._guard_total_rollbacks = 0
        # the furthest step a healthy checkpoint has ever reached: only
        # genuine progress past it re-arms tier-1 / drains the trip cap —
        # a healthy window that merely re-reaches old ground (the livelock
        # signature) must not
        self._guard_best_step = -1
        # one soft (spike-band) sync is forgiven — see guard_soft_* in
        # TrainConfig; True means the PREVIOUS sync was already soft
        self._guard_suspect = False
        # lowest loss EMA the run has ever reached (gradual-blow-up
        # backstop); monotone, deliberately NOT restored on rollback
        self._guard_ema_floor: Optional[float] = None
        # degraded-mode re-arm bookkeeping
        self._guard_degraded_at: Optional[int] = None
        self._guard_rearms_used = 0
        # step at which the RGB+ channel was last re-armed: a trip soon
        # after a re-arm means the re-arm itself detonated (degraded-mode
        # training leaves the predicted albedo unconstrained, so it can
        # drift toward the √(3−Σa²) singular manifold — RUN_r3: re-arm at
        # 2697, loss 7.7e5 by 2736). Re-degrade immediately instead of
        # burning the whole trip budget on an unwinnable window.
        self._guard_rearmed_at: Optional[int] = None
        # best-ever step recorded at each trip — the thrash detector
        # (guard_thrash_span) reads net progress across the last N trips
        self._guard_trip_best_steps: list = []
        # lowest eikonal EMA the run has ever reached. The eikonal term is
        # the guard's geometry-health channel: RUN_r3b showed an RGB+
        # poisoning that kept the color loss inside every band for ~700
        # steps while the ek EMA crept 0.0046 → 0.086 (the SDF stopped
        # being a distance function), and only THEN detonated (4e6 at step
        # 3840). Loss-only checkpoints kept advancing into the creep, so
        # every rollback restored an already-sick state and the trip
        # budget thrashed away 23 minutes. guard_ek_ceiling/_abs trip on
        # the creep itself. Monotone, NOT restored on rollback.
        self._guard_ek_floor: Optional[float] = None

    # ------------------------------------------------------------------
    # jitted pieces
    # ------------------------------------------------------------------

    def _level_bucket(self) -> int:
        """Smallest static level count covering the current unlock state
        (one compile per bucket; the traced mask handles exactness within
        a bucket)."""
        L = self.cfg.grid.n_levels
        active = self.cfg.grid.valid_levels(self.step)
        for b in (max(L // 3, 1), max(2 * L // 3, 2), L):
            if active <= b:
                return b
        return L

    def _make_step_fn(self, n_rays: int, n_active: int):
        return jax.jit(self._raw_step_fn(n_rays, n_active))

    def _raw_step_fn(self, n_rays: int, n_active: int):
        """The un-jitted single-step body (jitted directly for the
        per-step path; embedded in a lax.scan by _make_chunk_fn)."""
        cfg = self.cfg
        field = self.field
        tx = self.tx
        n_slots = cfg.train.target_batch_size

        def step_fn(params, opt_state, emap, bitfield, key, step,
                    lr_scale):
            batch, samples, pos, (img, xy) = sample_ray_batch(
                self.dataset, bitfield, key, n_rays, n_slots, cfg.march,
                emap_state=emap, light_salt=cfg.train.light_prng_salt,
                emap_image_prop=cfg.train.sample_image_proportional_to_error,
                emap_focal_prop=(
                    cfg.train.sample_focal_plane_proportional_to_error))
            vl = valid_level_for_step(cfg.grid, step)
            anneal = jnp.where(
                cfg.loss.anneal_end <= 0, 1.0,
                jnp.minimum(1.0, step / max(cfg.loss.anneal_end, 1)))

            def loss_fn(p):
                out = field.apply_chunked(p, pos, vl,
                                          cfg.train.field_chunk, n_active)
                return training_loss(out, samples, batch, cfg.flags,
                                     cfg.loss, anneal)

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            if cfg.loss.fp16_grad_emulation:
                # the reference accumulates parameter gradients in fp16 at
                # the ×LOSS_SCALE scale (grid scatters + MLP GEMMs are
                # network_precision_t; adam.h:88 divides it back out)
                from ..render.losses import quantize_grads_fp16
                grads = quantize_grads_fp16(grads)

            if cfg.train.fractional_from_step is not None:
                rgb_scale = (step < cfg.train.fractional_from_step
                             ).astype(jnp.float32)
            else:
                rgb_scale = jnp.float32(1.0)
            params, opt_state = opt.apply_updates(
                tx, cfg.optimizer, params, grads, opt_state, rgb_scale,
                effective_lr_scale(cfg.train, step, lr_scale))
            metrics = dict(metrics)
            emap = error_map.splat(emap, img, xy,
                                   metrics.pop("_per_ray_color_logged"))
            metrics["n_valid_total"] = jnp.sum(samples.n_valid)
            metrics["n_rays_kept"] = jnp.sum(
                samples.ray_kept.astype(jnp.int32))
            metrics["loss_total"] = loss
            return params, opt_state, emap, metrics

        return step_fn

    def _occ_update_fn(self, n_active: int, subsampled: bool = False):
        """Full sweep before step 256; after that the reference evaluates
        only G³/4 uniform + G³/4 occupancy-biased cells per refresh
        (training_prep_nerf, testbed_nerf.cu:4131-4137) — half the field
        evaluations, so we do the same."""
        key = ("occ", n_active, subsampled)
        if key in self._compiled:
            return self._compiled[key]
        occ_fn = jax.jit(self._raw_occ_fn(n_active, subsampled))
        self._compiled[key] = occ_fn
        return occ_fn

    def _occ_n_active(self, n_active: int) -> int:
        """Statically-active encode levels for refresh density evals —
        optionally capped by TrainConfig.occ_refresh_levels (the cap
        statically removes the top hashed levels' gathers from the
        refresh's 1M-point forward; see the config docstring)."""
        cap = self.cfg.train.occ_refresh_levels
        return n_active if cap is None else min(n_active, cap)

    def _raw_occ_fn(self, n_active: int, subsampled: bool):
        field = self.field
        n_active = self._occ_n_active(n_active)
        decay = self.cfg.train.density_grid_decay

        gsize = self.cfg.train.occ_grid_size
        n_cells = gsize ** 3
        n_quarter = max(n_cells // 4, 1)
        M = n_cells // 2 if subsampled else n_cells
        # the per-corner 1-D encode has no padded index intermediates, so
        # the old 2^17 memory-bounding chunk only buys lax.map scan
        # overhead (~400 ms per refresh in device traces); one chunk up to
        # 2^20 points runs the whole refresh as a single fusion stream
        chunk = min(M, 1 << 20)
        n_chunks = -(-M // chunk)

        def occ_fn(params, occ_state, key, step):
            vl = valid_level_for_step(self.cfg.grid, step)
            if subsampled:
                pos, idx = occupancy.sample_update_cells(
                    key, occ_state, gsize, n_quarter, n_quarter)
            else:
                pos = occupancy.cell_positions(key, gsize)
            dens = jax.lax.map(
                lambda p: field.density(params, p, vl, n_active),
                pos.reshape(n_chunks, chunk, 3)).reshape(-1)
            if subsampled:
                return occupancy.update_sampled(occ_state, idx, dens, decay)
            return occupancy.update(occ_state, dens, decay)

        return occ_fn

    def _make_chunk_fn(self, n_rays: int, n_active: int, chunk: int):
        """[occupancy refresh + `chunk` training steps] as ONE jitted call.

        Per-step jit dispatch over the axon tunnel costs ~50 ms of host/RPC
        gap (device traces, DESIGN.md kernel war round 3) — ~9% of the step
        at full size. In steady state (step ≥ 256) the refresh cadence is a
        constant 16 (testbed.cu:2801), so the natural fusion unit is
        [refresh, 16 × step] under one jit with the steps in a lax.scan:
        identical math and PRNG stream to the per-step path (the key is
        split in the same order), dispatch cost amortized 16×. The
        adaptive-rays controller already only acts on sync boundaries in
        async mode, so chunk-granular adaptation matches existing
        semantics. Used by train_steps; train_step keeps the per-step path
        (tests, logging, non-aligned phases)."""
        key = ("chunk", n_rays, n_active, chunk)
        if key in self._compiled:
            return self._compiled[key]
        raw_step = self._raw_step_fn(n_rays, n_active)
        raw_occ = self._raw_occ_fn(n_active, subsampled=True)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def chunk_fn(params, opt_state, emap, occ_state, key, step0,
                     lr_scale):
            key, k_occ = jax.random.split(key)
            occ_state = raw_occ(params, occ_state, k_occ, step0)

            def body(carry, i):
                params, opt_state, emap, key = carry
                key, k = jax.random.split(key)
                params, opt_state, emap, metrics = raw_step(
                    params, opt_state, emap, occ_state.bitfield, k,
                    step0 + i, lr_scale)
                return (params, opt_state, emap, key), metrics

            (params, opt_state, emap, key), ms = jax.lax.scan(
                body, (params, opt_state, emap, key),
                jnp.arange(chunk, dtype=jnp.int32))
            last = jax.tree_util.tree_map(lambda x: x[-1], ms)
            return params, opt_state, emap, occ_state, key, last

        self._compiled[key] = chunk_fn
        return chunk_fn

    # ------------------------------------------------------------------
    # host loop
    # ------------------------------------------------------------------

    def _bucket(self) -> int:
        """Rays per batch bucketed to a power of two (bounds recompiles;
        the sample buffer S stays fixed at the target budget)."""
        lo = int(math.log2(max(self.cfg.train.initial_rays_per_batch, 64)))
        return 1 << max(lo - 3,
                        min(18, int(round(math.log2(max(self.n_rays, 1))))))

    def train_step_async(self):
        """One step with NO host synchronization: metrics stay on device.

        The reference's CUDA stream naturally pipelines steps; under jit
        dispatch the equivalent is avoiding per-step host readbacks (which
        serialize the device queue, badly so over remote-device
        transports). The adaptive-batch controller consumes the latest
        FETCHED metrics, so adaptation lags by however many steps the
        caller lets queue — harmless, the signal is slow-moving.
        """
        cadence = occupancy.update_cadence(self.step)
        if self.step % cadence == 0:
            self.key, k = jax.random.split(self.key)
            self.occ = self._occ_update_fn(self._level_bucket(),
                                           subsampled=self.step >= 256)(
                self.params, self.occ, k, jnp.int32(self.step))
        r = self._bucket()
        lb = self._level_bucket()
        if (r, lb) not in self._compiled:
            self._compiled[(r, lb)] = self._make_step_fn(r, lb)
        self.key, k = jax.random.split(self.key)
        self.params, self.opt_state, self.emap, metrics = \
            self._compiled[(r, lb)](
                self.params, self.opt_state, self.emap, self.occ.bitfield,
                k, jnp.int32(self.step), jnp.float32(self.lr_scale))
        self.step += 1
        self._emap_counter += 1
        if self._emap_counter >= self._emap_interval:
            self.emap = error_map.rebuild(self.emap)
            self._emap_counter = 0
            self._emap_interval = int(self._emap_interval * 1.5)
        metrics["rays_per_batch"] = r
        return metrics

    # ------------------------------------------------------------------
    # divergence guard
    # ------------------------------------------------------------------

    def seed_guard(self) -> None:
        """Seed the divergence guard with the CURRENT state as the first
        healthy checkpoint. Called after a snapshot resume: the restored
        state is by definition a healthy resume point, and without a
        seed a run that blows up before its first healthy metrics sync
        has nothing to roll back to — it silently trains on the blown
        state forever (live RUN_r3 attempt 3: 400+ steps of rejected
        windows, EMAs frozen at 0, no log line)."""
        if self.cfg.train.divergence_guard:
            self._good = self._snapshot_state()

    def _snapshot_state(self) -> dict:
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        return {
            "params": copy(self.params), "opt_state": copy(self.opt_state),
            "emap": copy(self.emap), "occ": copy(self.occ),
            "key": jnp.copy(self.key), "step": self.step,
            "n_rays": self.n_rays, "emap_counter": self._emap_counter,
            "emap_interval": self._emap_interval,
            # full EMA state, not just the value: restoring value-only
            # re-initialized an UNWARM EMA at 0.0 (set() marks it
            # initialized), so post-rollback it warmed up from zero and
            # the warm-up values poisoned the guard's best-ever floor
            # (RUN_r3 trips 62-81: ceiling ~0.03, every honest sync
            # tripped)
            "loss_ema": (self.loss_ema.value, self.loss_ema._initialized,
                         self.loss_ema.updates),
            # ek/mask EMAs ride along too: a rollback that restores params
            # but keeps the post-creep ek EMA would re-trip the ek ceiling
            # on the very next sync regardless of the restored state's
            # actual health (RUN_r3b pattern)
            "ek_ema": (self.ek_ema.value, self.ek_ema._initialized,
                       self.ek_ema.updates),
            "mask_ema": (self.mask_ema.value, self.mask_ema._initialized,
                         self.mask_ema.updates),
        }

    def _checkpoint_good(self) -> None:
        state = self._snapshot_state()
        # the anchor lags the recent checkpoint by >= 64 steps: a blow-up
        # builds below the loss threshold for ~20 steps before any sync
        # sees it (measured onset, DESIGN.md "Full-scale divergence"), so
        # the freshest checkpoint can already carry the seed — repeated
        # failure escalates to the anchor, which predates it
        if self._anchor is None \
                or state["step"] - self._anchor["step"] >= 64:
            # the anchor being retired has itself survived >= 64 further
            # steps — promote it to the deep (>= 256-lagging) anchor so a
            # poisoning that predates even the anchor has an escape
            if self._deep_anchor is None or (
                    self._anchor is not None
                    and self._anchor["step"] - self._deep_anchor["step"]
                    >= 256):
                self._deep_anchor = self._anchor or self._good or state
            self._anchor = self._good or state
        self._good = state
        if state["step"] > self._guard_best_step:
            self._guard_best_step = state["step"]
            self._guard_rollbacks = 0

    def _restore(self, g: dict) -> None:
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        self.params = copy(g["params"])
        self.opt_state = copy(g["opt_state"])
        self.emap = copy(g["emap"])
        self.occ = copy(g["occ"])
        self.key = jnp.copy(g["key"])
        self.step = g["step"]
        self.n_rays = g["n_rays"]
        self._emap_counter = g["emap_counter"]
        self._emap_interval = g["emap_interval"]
        for name, ema in (("loss_ema", self.loss_ema),
                          ("ek_ema", self.ek_ema),
                          ("mask_ema", self.mask_ema)):
            if name not in g:      # state dict from an older layout
                continue
            value, initialized, updates = g[name]
            if initialized:
                ema.set(value, updates=updates)
            else:
                ema.reset()

    def _rollback(self, bad_loss: float) -> None:
        bad_step = self.step
        # first failure: retry from the freshest healthy window. A repeat
        # failure (no healthy window in between) means that state was
        # already poisoned — escalate to the lagging anchor, and past 4
        # near-consecutive trips to the deep (>= 256-lagging) anchor.
        if self._guard_rollbacks == 0:
            g = self._good
        elif self._guard_rollbacks < 4:
            g = self._anchor or self._good
        else:
            g = self._deep_anchor or self._anchor or self._good
        self._restore(g)
        # perturb the stream: state+key restore is otherwise deterministic,
        # so a retry would redraw the exact batch sequence that spiked. The
        # counter is monotonic over the whole run — every retry must see a
        # genuinely new stream (a counter that ever repeats livelocks).
        self._guard_total_rollbacks += 1
        self.key = jax.random.fold_in(g["key"], self._guard_total_rollbacks)
        self._good = g
        self.lr_scale = max(self.lr_scale * 0.5, 1.0 / 32.0)
        self._guard_windows = 0
        self._guard_rollbacks += 1
        self._guard_suspect = False
        import logging
        logging.getLogger("rnb_neus2_tpu.train").warning(
            "divergence guard: loss %.3g at step ~%d; rolled back to "
            "step %d, update scale now %.4g (trip %d)", bad_loss, bad_step,
            g["step"], self.lr_scale, self._guard_total_rollbacks)
        # re-arm detonation: a trip within 256 steps of an rgbplus re-arm
        # means the degraded-phase albedo drift put the state outside the
        # re-armed channel's stability basin — re-degrade NOW from the
        # state this rollback just restored (pre-detonation, still
        # rgbplus-clean) rather than thrashing through the trip budget
        if self._guard_rearmed_at is not None \
                and self.cfg.flags.apply_rgbplus \
                and bad_step - self._guard_rearmed_at <= 256:
            self._enter_degraded_mode(restore=False)
            return
        # terminal triggers: (a) near-consecutive trips with NO progress
        # past the best step; (b) thrash — the last guard_max_trips trips
        # collectively advanced the best step by < guard_thrash_span
        # (RUN_r3: micro-progress of ~30 steps/cycle re-armed (a) forever
        # while the run slow-livelocked through the unstable window)
        cap = self.cfg.train.guard_max_trips
        self._guard_trip_best_steps.append(self._guard_best_step)
        hist = self._guard_trip_best_steps
        thrash = len(hist) > cap and (
            self._guard_best_step - hist[-cap - 1]
            < self.cfg.train.guard_thrash_span)
        if self._guard_rollbacks > cap or thrash:
            if self.cfg.train.guard_terminal == "raise":
                raise RuntimeError(
                    f"divergence guard: {cap} "
                    + ("rollbacks with net progress below "
                       f"{self.cfg.train.guard_thrash_span} steps"
                       if thrash else "near-consecutive rollbacks")
                    + " — training is unstable even at the minimum "
                    "update scale")
            self._enter_degraded_mode()

    def _enter_degraded_mode(self, restore: bool = True) -> None:
        """Guard terminal mode "degrade": the run must FINISH. Restore the
        deepest available anchor and disable the RGB+ 4th channel (the
        only lever every divergence replay shows holds —
        runs/REPLAY_k0_norgbplus.log; a supported reference mode,
        main.cu --no-rgbplus). Re-armed after guard_rearm_steps of clean
        progress (_maybe_rearm_rgbplus) — the instability window is
        transient. Recompile on flip (flags are static in the jit).

        restore=False: the caller (_rollback's re-arm-detonation path)
        already restored a pre-detonation state; keep it rather than
        falling back to the deeper anchor."""
        import dataclasses
        import logging
        if not self.cfg.flags.apply_rgbplus:
            # already degraded and STILL tripping the cap — no further
            # lever exists; dying beats an unbounded rollback livelock
            raise RuntimeError(
                "divergence guard: trip cap reached again in degraded "
                "(no-rgbplus) mode — training is unstable with every "
                "known lever applied")
        if restore:
            g = self._deep_anchor or self._anchor or self._good
            if g is not None:
                self._restore(g)
        # a re-armed stretch that ends back here has demonstrated that
        # re-arming poisons THIS run (RUN_r3b: re-arm at 2928 → ek creep
        # from ~3500 → detonation at 3840 → 30 trips / 23 min of thrash
        # before re-degrading from a sick state) — cancel the remaining
        # re-arm budget instead of repeating the experiment
        if self._guard_rearmed_at is not None \
                and self.cfg.train.guard_rearm_cancel_on_degrade \
                and self._guard_rearms_used < self.cfg.train.guard_max_rearms:
            logging.getLogger("rnb_neus2_tpu.train").warning(
                "divergence guard: the re-armed RGB+ stretch ended in a "
                "degrade — cancelling the remaining re-arm budget")
            self._guard_rearms_used = self.cfg.train.guard_max_rearms
        self.cfg = dataclasses.replace(
            self.cfg, flags=dataclasses.replace(
                self.cfg.flags, apply_rgbplus=False))
        self._compiled.clear()
        self._guard_degraded_at = self.step
        self._guard_rearmed_at = None
        self._guard_rollbacks = 0
        self._guard_windows = 0
        self._guard_trip_best_steps = []
        # with the rgbplus engine removed, full-lr training is inside the
        # stability basin on every replay — restore the scale so the
        # remaining steps learn at production speed (the guard stays
        # armed and will back off again if this proves wrong)
        self.lr_scale = 1.0
        logging.getLogger("rnb_neus2_tpu.train").error(
            "divergence guard: trip cap reached — entering DEGRADED mode "
            "at step %d: RGB+ 4th channel off (re-arm after %d clean "
            "steps, %d re-arms left), update scale restored to 1.",
            self.step, self.cfg.train.guard_rearm_steps,
            self.cfg.train.guard_max_rearms - self._guard_rearms_used)

    def _maybe_rearm_rgbplus(self) -> None:
        """The instability window is transient (probe: spikes stop past
        ~step 1800), so a guard-degraded run re-enables the RGB+ channel
        after guard_rearm_steps of genuine progress instead of finishing
        the remaining thousands of steps under-supervised. Bounded by
        guard_max_rearms; a re-trip just degrades again."""
        if self._guard_degraded_at is None \
                or self.cfg.flags.apply_rgbplus \
                or self._guard_rearms_used >= self.cfg.train.guard_max_rearms \
                or self.step < (self._guard_degraded_at
                                + self.cfg.train.guard_rearm_steps):
            return
        # only re-arm from an ek-healthy state: re-arming is a bet that
        # the instability window has passed, and a field whose eikonal
        # level is still elevated loses that bet immediately
        if self._guard_ek_floor is not None and self.ek_ema._initialized \
                and self.ek_ema.value > max(2.0 * self._guard_ek_floor,
                                            self.cfg.train.guard_ek_abs):
            return
        import dataclasses
        import logging
        self.cfg = dataclasses.replace(
            self.cfg, flags=dataclasses.replace(
                self.cfg.flags, apply_rgbplus=True))
        self._compiled.clear()
        self._guard_rearms_used += 1
        self._guard_degraded_at = None
        self._guard_rearmed_at = self.step
        self._guard_trip_best_steps = []
        logging.getLogger("rnb_neus2_tpu.train").warning(
            "divergence guard: %d clean steps in degraded mode — RGB+ "
            "4th channel re-armed at step %d (re-arm %d/%d)",
            self.cfg.train.guard_rearm_steps, self.step,
            self._guard_rearms_used, self.cfg.train.guard_max_rearms)

    def _ek_creep(self) -> bool:
        """True when the eikonal EMA has crept past guard_ek_ceiling × its
        best-ever level (and past the guard_ek_abs noise floor). This is
        the geometry-health channel: an RGB+ poisoning can keep the color
        loss inside every band for hundreds of steps while the SDF stops
        being a distance function (RUN_r3b: ek EMA 0.0046 → 0.086 over
        steps ~3500-4300 before the first 4e6 loss spike)."""
        t = self.cfg.train
        if not t.divergence_guard or t.guard_ek_ceiling <= 0 \
                or self._guard_ek_floor is None \
                or not self.ek_ema._initialized:
            return False
        return self.ek_ema.value > max(
            t.guard_ek_ceiling * self._guard_ek_floor, t.guard_ek_abs)

    def ek_healthy(self) -> bool:
        """Public: False when _ek_creep holds. Gates the rolling snapshot
        (cli/testbed.py) — a loss-healthy but ek-sick state is not a
        resume point worth overwriting the last good generation with
        (RUN_r3b: both rolling generations were overwritten with ek-0.08
        states saved mid-thrash)."""
        return not self._ek_creep()

    def _guard_check(self, loss_color: float) -> bool:
        """True = healthy. Call with the freshly synced loss BEFORE the
        EMAs are updated with it.

        Three-band policy (round-3 probe evidence, PROBE_fp16emu.log —
        the unstable window throws recoverable single-batch spikes the
        old single-threshold guard rollback-thrashed on):
        - HARD (non-finite, > max(hard_ratio·EMA, hard_abs), or the EMA
          itself past ceiling × its best-ever floor): roll back now.
        - SOFT (> max(soft_ratio·EMA, soft_abs)): forgive once — don't
          checkpoint, don't feed the EMAs, keep training; a second
          consecutive soft sync rolls back (a true runaway doubles every
          ~3 steps, so by the next sync it is hard anyway).
        - otherwise healthy."""
        if not self.cfg.train.divergence_guard:
            return True
        t = self.cfg.train
        # eikonal creep: checked BEFORE the loss bands because the whole
        # point is that the loss still looks healthy. Only acts while the
        # RGB+ channel is on — every observed creep was RGB+-driven, and
        # in degraded mode the loss bands remain the (sufficient) defense.
        if self._ek_creep() and self._good is not None \
                and self.cfg.flags.apply_rgbplus:
            import logging
            ek_now = self.ek_ema.value
            g = self._anchor or self._good
            self._restore(g)   # also restores the pre-creep ek EMA
            logging.getLogger("rnb_neus2_tpu.train").error(
                "divergence guard: eikonal EMA %.4g crept past %.4g "
                "(best-ever %.4g) — geometry degrading under a healthy "
                "loss; restored step %d and degrading RGB+ now",
                ek_now,
                max(t.guard_ek_ceiling * (self._guard_ek_floor or 0.0),
                    t.guard_ek_abs),
                self._guard_ek_floor or float("nan"), g["step"])
            self._enter_degraded_mode(restore=False)
            return False
        ref = self.loss_ema.value
        have_ref = math.isfinite(ref) and ref > 0.0
        # cold-EMA hole (live RUN_r3): without a reference the old guard
        # accepted ANY finite loss and fed it to the EMA — a blown first
        # sync after resume poisoned the EMA at 481876 and blinded every
        # relative check. With no reference, fall back to the absolute
        # bands alone (a healthy normalized loss is ~0.05; > hard_abs is
        # never healthy).
        hard = not math.isfinite(loss_color) or (
            loss_color > max(t.guard_hard_ratio * ref, t.guard_hard_abs)
            if have_ref else loss_color > t.guard_hard_abs)
        # dead run: an exactly-zero color loss at full scale means no ray
        # produced a valid sample (emptied occupancy grid / collapsed
        # field) — live RUN_r3 attempt 3 "trained" 500+ steps at
        # loss=0.000000 with frozen EMAs. Only meaningful once a healthy
        # reference exists (early warm-up windows can legitimately be ~0).
        if not hard and loss_color == 0.0 and (have_ref or self.step > 512):
            hard = True
        if not hard and self._guard_ema_floor is not None and have_ref \
                and ref > max(t.guard_ema_ceiling * self._guard_ema_floor,
                              t.guard_soft_abs):
            # gradual blow-up: each window passed the relative checks but
            # the EMA itself has crept far past the run's best level.
            # The absolute arm (> soft_abs) keeps natural mid-training
            # loss drift (0.008 → 0.04 composite bump) from tripping it —
            # a healthy normalized loss is ~0.05, and the backstop exists
            # for the RUN_r2c failure mode (EMA crept to 1574).
            hard = True
        soft = not hard and (
            loss_color > max(t.guard_soft_ratio * ref, t.guard_soft_abs)
            if have_ref else loss_color > t.guard_soft_abs)
        if soft and not self._guard_suspect:
            self._guard_suspect = True
            return False
        if hard or soft:
            self._guard_suspect = False
            # before the first healthy window there is nothing to restore;
            # still refuse to checkpoint / feed the EMAs a bad loss
            if self._good is not None:
                self._rollback(loss_color)
            else:
                import logging
                logging.getLogger("rnb_neus2_tpu.train").warning(
                    "divergence guard: loss %.3g at step ~%d with NO "
                    "healthy checkpoint to restore — window rejected, "
                    "training continues on the current state", loss_color,
                    self.step)
            return False
        self._guard_suspect = False
        self._maybe_rearm_rgbplus()
        # NOTE: the trip count is NOT reset here — only _checkpoint_good
        # resets it, and only on progress past _guard_best_step. A healthy
        # window that merely re-treads rolled-back ground (fail/heal/fail
        # oscillation) kept re-arming tier-1 and made the 24-trip cap
        # unreachable — the guarded-run livelock
        # (runs/RUN_r2_composite10k_guarded.log).
        self._guard_windows += 1
        if self.lr_scale < 1.0 and self._guard_windows >= 8:
            self.lr_scale = min(1.0, self.lr_scale * 2.0)
            self._guard_windows = 0
        # NOTE: _checkpoint_good runs in _consume_metrics AFTER the EMA
        # updates so the snapshot carries the post-window EMA — restoring
        # a pre-update EMA (0.0 on the first checkpoint) would disarm the
        # relative threshold for one window
        return True

    def _consume_metrics(self, metrics) -> Dict[str, float]:
        r = metrics.pop("rays_per_batch")
        out = {k2: float(v) for k2, v in metrics.items()}
        out["rays_per_batch"] = r
        if not self._guard_check(out["loss_color"]):
            out["rolled_back"] = True
            return out
        # counter basis (TrainConfig.adapt_to_kept): the reference's
        # controller divides by the COMPACTED contributing count
        # (testbed_nerf.cu:3532-3558); legacy rebuild behavior divides by
        # the pre-termination valid count
        n_basis = out["n_samples_kept"] if self.cfg.train.adapt_to_kept \
            else out["n_valid_total"]
        if n_basis > 0:
            target = self.cfg.train.target_batch_size
            self.n_rays = int(np.clip(
                r * target / n_basis,
                self.cfg.train.initial_rays_per_batch // 8,
                self.cfg.train.max_rays_per_batch))
        self.loss_ema.update(out["loss_color"])
        self.ek_ema.update(out["loss_ek"])
        self.mask_ema.update(out["loss_mask"])
        self.loss_graph.update(out["loss_color"])
        if self.cfg.train.divergence_guard:
            # best-ever EMA level (gradual-blow-up backstop); monotone by
            # design — surviving a rollback is the point
            v = self.loss_ema.value
            if math.isfinite(v) and v > 0.0 and (
                    self._guard_ema_floor is None
                    or v < self._guard_ema_floor):
                self._guard_ema_floor = v
            ek = self.ek_ema.value
            if math.isfinite(ek) and ek > 0.0 and (
                    self._guard_ek_floor is None
                    or ek < self._guard_ek_floor):
                self._guard_ek_floor = ek
            self._checkpoint_good()
        return out

    def train_steps(self, n: int, sync_every: int = 10
                    ) -> Dict[str, float]:
        """Run n steps, syncing metrics only every sync_every steps.

        In steady state (step ≥ 256, refresh cadence 16, no error-map
        rebuild due) steps are dispatched as fused 16-step scan chunks
        (_make_chunk_fn) — same math and PRNG stream, 16× less per-step
        dispatch overhead. Metric consumption is deferred to sync
        boundaries so chunk dispatches pipeline on the device queue."""
        out: Dict[str, float] = {}
        pending = None
        done = 0
        last_sync = 0
        chunk = self.cfg.train.fused_steps
        while done < n:
            eligible = (chunk > 1 and self.step >= 256
                        and self.step % 16 == 0 and chunk % 16 == 0
                        and n - done >= chunk
                        and self._emap_counter + chunk < self._emap_interval)
            if eligible:
                r, lb = self._bucket(), self._level_bucket()
                fn = self._make_chunk_fn(r, lb, chunk)
                (self.params, self.opt_state, self.emap, self.occ,
                 self.key, metrics) = fn(
                    self.params, self.opt_state, self.emap, self.occ,
                    self.key, jnp.int32(self.step),
                    jnp.float32(self.lr_scale))
                self.step += chunk
                self._emap_counter += chunk
                metrics = dict(metrics)
                metrics["rays_per_batch"] = r
                pending = metrics
                done += chunk
            else:
                pending = self.train_step_async()
                done += 1
            if done - last_sync >= sync_every or done >= n:
                out = self._consume_metrics(pending)
                last_sync = done
        return out

    def train_step(self) -> Dict[str, float]:
        t0 = time.perf_counter()
        cadence = occupancy.update_cadence(self.step)
        if self.step % cadence == 0:
            self.key, k = jax.random.split(self.key)
            self.occ = self._occ_update_fn(self._level_bucket(),
                                           subsampled=self.step >= 256)(
                self.params, self.occ, k, jnp.int32(self.step))

        r = self._bucket()
        lb = self._level_bucket()
        if (r, lb) not in self._compiled:
            self._compiled[(r, lb)] = self._make_step_fn(r, lb)
        self.key, k = jax.random.split(self.key)
        self.params, self.opt_state, self.emap, metrics = \
            self._compiled[(r, lb)](
                self.params, self.opt_state, self.emap, self.occ.bitfield,
                k, jnp.int32(self.step), jnp.float32(self.lr_scale))
        self.step += 1

        # error-map CDF rebuild cadence (testbed.cu:3670-3723)
        self._emap_counter += 1
        if self._emap_counter >= self._emap_interval:
            self.emap = error_map.rebuild(self.emap)
            self._emap_counter = 0
            self._emap_interval = int(self._emap_interval * 1.5)

        # adaptive rays/batch (testbed_nerf.cu:3554-3555) + EMAs +
        # divergence guard, shared with the fused path
        metrics = dict(metrics)
        metrics["rays_per_batch"] = r
        out = self._consume_metrics(metrics)
        self.step_ms.update((time.perf_counter() - t0) * 1e3)
        return out

    def train(self, n_steps: int, log_every: int = 100, logger=None):
        for _ in range(n_steps):
            out = self.train_step()
            if logger and self.step % log_every == 0:
                logger.info(
                    f"iteration={self.step} loss={self.loss_ema.value:.6f} "
                    f"ek={self.ek_ema.value:.4f} mask={self.mask_ema.value:.4f} "
                    f"rays={out['rays_per_batch']} "
                    f"step_ms={self.step_ms.value:.1f}")
        return self

    @property
    def inference_params(self):
        """EMA params, used for rendering and mesh extraction like the
        reference's inference_params (trainer.h)."""
        return self.opt_state.ema_params
