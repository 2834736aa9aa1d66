"""Configuration tree for the TPU testbed.

Mirrors the reference's three config tiers (SURVEY §5.6): CLI flags
(`src/main.cu:90-258`), the JSON network config (`configs/nerf/base.json`)
and engine constants (`src/testbed_nerf.cu:47-72`, `nerf.h:24-26`).
Dataclasses here are hashable/static so they can be closed over by jit.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# Engine constants (reference: src/testbed_nerf.cu:47-72, nerf.h:24-26)
# ---------------------------------------------------------------------------

NERF_GRIDSIZE = 128            # occupancy grid resolution per cascade
NERF_STEPS = 1024              # finest number of steps per unit length
NERF_CASCADES = 8
SQRT3 = math.sqrt(3.0)
STEPSIZE = SQRT3 / NERF_STEPS  # minimum ray-march step
MIN_CONE_STEPSIZE = STEPSIZE
MAX_CONE_STEPSIZE = STEPSIZE * (1 << (NERF_CASCADES - 1)) * NERF_STEPS / NERF_GRIDSIZE
NERF_MIN_OPTICAL_THICKNESS = 0.1   # occupancy threshold (non-SDF_GRID build)
TRANSMITTANCE_EPSILON = 1e-4       # ray termination (testbed_nerf.cu:1494)
# Cone angle: testbed.h:717 declares 1/256, but the dataset-load path
# ALWAYS overwrites it with `aabb_scale <= 1 ? 0 : 1/256`
# (testbed_nerf.cu:3214, 3331) — and the RNb pipeline always runs
# aabb_scale = 1, so the reference trains with cone 0: UNIFORM
# dt = √3/1024 regardless of camera distance (~611 samples through the
# cube). Rounds 1-4 of this rebuild trained at 1/256 (a parity bug: ~4×
# coarser sampling at the composite scene's camera distance, geometric
# far-side thinning); round 5 fixed the default to the reference rule.
DEFAULT_CONE_ANGLE = 0.0
CONE_ANGLE_AABB_GT1 = 1.0 / 256.0


def cone_angle_for_aabb(aabb_scale: float) -> float:
    """testbed_nerf.cu:3214: cone = 0 for aabb_scale ≤ 1, else 1/256."""
    return 0.0 if aabb_scale <= 1.0 else CONE_ANGLE_AABB_GT1
TARGET_BATCH_SIZE = 1 << 18        # samples per training step (testbed.cu:2858)
MAX_RAYS_PER_BATCH = 1 << 18
INITIAL_RAYS_PER_BATCH = 1 << 12   # testbed.h:908


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    """Multiresolution hash grid (configs/nerf/base.json:30-41)."""

    n_levels: int = 14
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    top_resolution: int = 2048
    # progressive level unlocking (grid.h:1430-1436)
    valid_level_scale: float = 0.02
    base_valid_level_scale: float = 0.2
    base_training_step: int = 100
    aabb_scale: float = 1.0
    # TPU-first densification of mid levels. The reference caps every
    # level's table at 2^log2_hashmap_size entries (grid.h:987-999) — a
    # GPU tuning choice (tcnn wants tables hot in L2; 2^19·2·fp16 = 2 MB).
    # On TPU the gather cost is per-ROW regardless of table size
    # (DESIGN.md kernel-war round 2) and HBM is 16 GB, so a mid level can
    # afford its FULL dense table: no hash collisions, and the forward
    # fetches all 8 corners with ONE corner-redundant rows-of-16 gather
    # instead of 8 independent rows-of-F gathers (8× fewer rows on that
    # level). When set, any level whose padded dense size fits in
    # 2^dense_max_entries_log2 gets its full dense table; levels beyond
    # stay hashed at 2^log2_hashmap_size. At the default 14-level config,
    # 22 densifies L5 (1.12M entries) and L6 (3.44M) — 2 of the 9 hashed
    # levels. None = reference-exact layout.
    dense_max_entries_log2: Optional[int] = None

    @property
    def per_level_scale(self) -> float:
        # testbed.cu:2321
        return math.exp(
            math.log(self.top_resolution * self.aabb_scale / self.base_resolution)
            / (self.n_levels - 1)
        )

    def level_scales(self) -> Tuple[float, ...]:
        """Integer lattice scale per level: resolution − 1 (grid.h:979-982).

        Computed in float32 like the reference (exp2f/log2f), which matters at
        the top level: 2^(13·log2(s))·16−1 must land exactly on 2047.
        """
        import numpy as np

        s = np.float32(self.per_level_scale)
        out = []
        for lvl in range(self.n_levels):
            scale = np.exp2(np.float32(lvl) * np.log2(s)) * np.float32(
                self.base_resolution) - np.float32(1.0)
            resolution = int(np.ceil(scale)) + 1
            out.append(float(resolution - 1))
        return tuple(out)

    def level_resolutions(self) -> Tuple[int, ...]:
        return tuple(int(s) + 1 for s in self.level_scales())

    def level_table_sizes(self) -> Tuple[int, ...]:
        """Entries per level: min(next_mult(res³, 8), 2^T) (grid.h:987-999);
        dense_max_entries_log2 lifts the cap for levels whose full dense
        table fits under it (see the field docstring)."""
        sizes = []
        for res in self.level_resolutions():
            dense = res ** 3
            dense = -(-dense // 8) * 8  # next multiple of 8
            if (self.dense_max_entries_log2 is not None
                    and dense <= (1 << self.dense_max_entries_log2)):
                sizes.append(dense)
            else:
                sizes.append(min(dense, 1 << self.log2_hashmap_size))
        return tuple(sizes)

    def level_offsets(self) -> Tuple[int, ...]:
        offs, acc = [], 0
        for s in self.level_table_sizes():
            offs.append(acc)
            acc += s
        offs.append(acc)
        return tuple(offs)

    @property
    def n_table_entries(self) -> int:
        return self.level_offsets()[-1]

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    def valid_levels(self, step: int) -> int:
        """Progressive unlocking (grid.h:1430-1436)."""
        if step <= 0:
            return self.n_levels
        v = math.ceil(
            self.base_valid_level_scale * self.n_levels
            + self.valid_level_scale * max(0, step - self.base_training_step)
        )
        return min(self.n_levels, int(v))


@dataclasses.dataclass(frozen=True)
class NetworkConfig:
    """SDF + RGB MLP shapes (configs/nerf/base.json:42-75, nerf_network.h:40-66)."""

    sdf_hidden_layers: int = 1
    sdf_width: int = 64
    rgb_hidden_layers: int = 2
    rgb_width: int = 64
    n_output_dims: int = 16         # both MLPs emit 16-wide padded outputs
    sdf_bias: float = -0.1          # nerf_network.h:75 via base.json
    variance_init: float = 0.3      # nerf_network.h:72, testbed.cu:692
    # MLP/jacobian-chain compute dtype. The reference computes its
    # fully-fused MLPs in fp16 with fp32 masters (LOSS_SCALE=128,
    # testbed.h:237); "bfloat16" is the TPU-native equivalent and needs
    # no loss scaling (fp32-range exponent). A/B on v5e showed no step
    # speedup (846 vs 851 ms — the step is gather/scatter-bound, not
    # MXU-bound), so fp32 stays the default for numeric headroom; flip
    # this when the arithmetic share of the step grows.
    compute_dtype: str = "float32"
    # Stochastic corner backward for the hash-grid: 0 = exact 8-corner
    # scatter (the reference's kernel_grid_backward_grid semantics,
    # grid.h:~400). K>0 scatters only K importance-sampled corners per
    # sample on every level (unbiased estimator, K/8 of the scatter
    # elements — the dominant v5e step cost; see
    # hash_encoding.make_encode_with_jacobian_cv). Default K=1 after both
    # gates passed at K=1 too: quality (composite-scene Chamfer-L1 ratio
    # 0.924 vs exact, identical completeness —
    # runs/ab_stoch_chamfer_cpu_k1.json; K=2 ratio 0.946) and speed
    # (v5e full-size step, same-session A/B: exact 532.5 -> K=2 351.4 ->
    # K=1 296.0 ms — tools/profiling/ab_stoch_corner.py).
    # `--stoch-corner-bwd 0` restores the exact backward.
    stoch_corner_bwd: int = 1
    # input widths (nerf_network.h:46-61): [xyz | hash feats] -> next mult of 16
    @property
    def sdf_input_dim(self) -> int:
        return 48                   # next_multiple(3 + 28, 16) observed = 48

    @property
    def rgb_input_dim(self) -> int:
        # [sdf_feat(16) | dir_enc(16, zeros) | xyz(3) | dsdf_dxyz(3)] -> 48
        return 48


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """EMA → ExponentialDecay → Adam chain (configs/nerf/base.json:4-28)."""

    learning_rate: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.99
    epsilon: float = 1e-15
    l2_reg: float = 1e-6            # applied to matrix (MLP) params only
    ema_decay: float = 0.95         # parameter EMA for inference
    decay_start: int = 20000
    decay_interval: int = 10000
    decay_base: float = 0.33
    # tcnn-exact sparse Adam for non-matrix params (hash table, variance):
    # a slot whose gradient is EXACTLY zero this step is skipped entirely —
    # no moment decay, no per-param debias-step increment, no weight update
    # (adam.h:112-118 early return; per-param `param_steps` debias
    # adam.h:188-190). Dense Adam instead applies a decaying momentum tail
    # to every previously-kicked hash slot (~10x the initial step summed
    # over the tail at β .9/.99) that the reference's frozen slots never
    # see. False = dense optax Adam (rounds 1-2 behavior).
    sparse_adam: bool = True


@dataclasses.dataclass(frozen=True)
class RenderFlags:
    """Per-run mode flags (src/main.cu:283-440; defaults = pipeline defaults).

    Reference default behavior: L2 on (unless --lone), rgbplus on (unless
    --no-rgbplus), relu/bce/supernormal/opti-lights off, albedo on (unless
    --no-albedo).
    """

    apply_l2: bool = True
    apply_rgbplus: bool = True
    apply_supernormal: bool = False
    apply_relu: bool = False
    apply_bce: bool = False
    apply_light_opti: bool = False
    apply_no_albedo: bool = False

    def replace(self, **kw) -> "RenderFlags":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """hyperparams section (configs/nerf/base.json:77-91, testbed.h:490-491)."""

    mask_loss_weight: float = 1.0
    ek_loss_weight: float = 0.01
    anneal_end: int = 0             # 0 → cos_anneal_ratio ≡ 1
    # Diagnostic stop-gradient switches (divergence attribution, see
    # DESIGN.md "Full-scale divergence"): cut dL/d∇sdf through the
    # alpha path (true_cos) or the shading path (n·l) respectively.
    # Reference semantics = both False.
    debug_stopgrad_alpha_normal: bool = False
    debug_stopgrad_shading_normal: bool = False
    debug_stopgrad_alpha_sdf: bool = False
    # Lower clamp on the √(3−Σa²) jacobian denominator of the RGB+ 4th
    # channel (the PREDICTED albedo only — the target channel carries no
    # gradient). 0.0 = the reference's bare +1e−5 shift
    # (testbed_nerf.cu:1942-1947), which admits ~1e5× gradients as the
    # predicted albedo approaches white and drives the full-scale
    # divergence attributed in DESIGN.md. Gradients are bit-identical to
    # the reference whenever √(3−Σa²)+1e−5 ≥ floor. Diagnostic knob
    # only: replays of the full-scale step-1400 state diverge at the
    # SAME ~step-1500 onset with floors 0.05 AND 0.5 (runs/
    # REPLAY_k2_floor005.log, REPLAY_k2_floor05.log), so the
    # near-singular magnitude is not the blow-up's lever — the rgbplus
    # coupling itself is outside the lr-1e-3 stability basin at full
    # scale, and the divergence guard (trainer.py) is the defense.
    # Default stays reference-exact.
    rgbplus_grad_floor: float = 0.0
    # Reproduce the reference's RGB+ L2 jacobian VERBATIM inside the
    # clamped region (testbed_nerf.cu:1934-1940): −2aᵢ/(a₄+1e−5) even
    # where the forward √max(0, 3−Σa²) is flat at 0. Default False = the
    # round-4 root-cause fix: a true sub-gradient that vanishes for
    # 3−Σa² ≤ 0. The reference's in-clamp slope is the named driver of
    # the full-scale divergence: with a negative 4th-channel target
    # (GT shading < 0) and positive sample shading it rewards GROWING
    # the albedo (the forward channel never moves), a positive feedback
    # loop through the exp activation that grows hash entries
    # geometrically at any update scale (×1.3/step measured — see
    # runs/r4_10k/DISSECT_TRAIN_2400.log and the floor replays above,
    # which capped the magnitude but not the wrong-sign region and
    # diverged at the same onset). Outside the clamp the gradient is
    # bit-identical either way.
    rgbplus_ref_jacobian: bool = False
    # Emulate the reference's fp16 loss-gradient chain. The CUDA testbed
    # computes dL/doutput in float but STORES it as fp16
    # (tcnn::network_precision_t) scaled by LOSS_SCALE=128
    # (testbed.h:237, testbed_nerf.cu:1960-2083), and accumulates every
    # parameter gradient (hash-table scatter, MLP GEMMs) in fp16 at that
    # scale before Adam divides the 128 back out (adam.h:88). The fp32
    # rebuild removed that quantization; this knob restores it at the two
    # boundaries the reference has: (a) the network-output cotangents
    # (albedo_raw / sdf / grad / variance) and (b) the final parameter
    # gradients, each mapped g → fp16(clip(128·g, ±65504))/128. Values
    # whose scaled magnitude exceeds fp16's max are saturated rather than
    # becoming inf (a float→half overflow in CUDA yields inf, which would
    # permanently NaN the reference's Adam moments — so a run the
    # reference survives never overflows, and the clamp is the honest
    # upper envelope of the fp16-representable dynamics). Sub-normal
    # flushing and 11-bit rounding are bit-faithful.
    fp16_grad_emulation: bool = False
    # Emulate the reference's rollover-padded compacted backward
    # (testbed_nerf.cu:4044-4068 + fill_rollover_and_rescale,
    # neus2_tcnn common_device.h:526-535): the CUDA loss kernel compacts
    # the n contributing (pre-termination) samples, then pads the fixed
    # 2^18 network batch by REPEATING them — coords verbatim, dL/doutput
    # rows rescaled by n/2^18. Each contributing sample j therefore
    # carries effective gradient weight 1 + c_j·(n/S) where
    # c_j = ⌊(S−1−rank_j)/n⌋ is its number of padded copies — a
    # sample-dependent ≤2× reweighting the fp32 rebuild (which backs
    # through the flat ladder with zero cotangents past termination)
    # does not have. The ONLY remaining gradient-path difference vs the
    # reference after the fp16 chain + sparse Adam (both exonerated and
    # productized); parity-hypothesis knob, validated via the
    # snapshot-replay matrix. Rank order is our slot order (the
    # reference's is its atomicAdd compaction order — nondeterministic).
    rollover_grad_emulation: bool = False


@dataclasses.dataclass(frozen=True)
class MarchConfig:
    """Training ray-march shapes (TPU static-shape budget)."""

    n_ladder: int = 1024            # max t-ladder points per ray (= NERF_STEPS)
    max_samples_per_ray: int = 1024 # hard cap, = reference NERF_STEPS
    cone_angle: float = DEFAULT_CONE_ANGLE
    # training rays snap to pixel centers by default (testbed.h:650;
    # --disable-snap-to-center turns it off, testbed.cu:307-310)
    snap_to_pixel_centers: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    max_steps: int = 10000
    target_batch_size: int = TARGET_BATCH_SIZE
    initial_rays_per_batch: int = INITIAL_RAYS_PER_BATCH
    max_rays_per_batch: int = MAX_RAYS_PER_BATCH
    density_grid_decay: float = 0.95
    occ_grid_size: int = NERF_GRIDSIZE
    # field-evaluation chunk (lax.map); the analytic-jacobian field no
    # longer triggers the XLA-TPU fused-backward compiler crash, so the
    # default runs unchunked (chunk ≥ batch = direct apply); kept as a
    # memory-bounding knob for huge inference batches
    field_chunk: int = 1 << 18
    seed: int = 42
    # fractional training (--fractional-training): after this step only SDF
    # (density MLP + hash grid + variance) params keep updating
    fractional_from_step: Optional[int] = None
    # error-map-proportional ray sampling (testbed.h:663-664): the
    # reference DEFAULTS BOTH OFF — the error map is always accumulated
    # (testbed_nerf.cu:3673 "low-overhead enough to warrant always being
    # on", i.e. for visualization and the GUI), but neither main.cu nor
    # the RNb pipeline ever flips these, so training samples pixels
    # UNIFORMLY with stratified image choice. Round 1 had CDF sampling
    # unconditionally on — combined with the reference's no-pdf-division
    # splat this is a positive feedback loop (hot texels sampled more →
    # accumulate more raw loss → sampled more) that measurably diverges
    # full-scale runs. Exposed as the same two knobs as pyngp.
    sample_image_proportional_to_error: bool = False
    sample_focal_plane_proportional_to_error: bool = False
    # salt folded into the per-ray light-choice PRNG stream only. The
    # reference draws the light index with curand(clock64()) — a
    # NON-deterministic stream (testbed_nerf.cu light pick) — so any
    # counter-based stream is a documented divergence; varying this salt
    # A/B-quantifies the divergence's effect on the loss trajectory
    # (tests/test_train_e2e.py::test_light_prng_divergence_within_noise).
    light_prng_salt: int = 0
    # steady-state steps fused into one jitted [occupancy refresh +
    # lax.scan] chunk by Trainer.train_steps (must stay a multiple of the
    # steady refresh cadence 16, testbed.cu:2801). Amortizes the per-step
    # jit dispatch/RPC gap (~50 ms over the axon tunnel). 1 = always
    # per-step. Math and PRNG stream are identical either way.
    fused_steps: int = 16
    # Occupancy-refresh encode truncation: cap the number of
    # statically-active hash-grid levels used by the refresh's density
    # evals (None = all levels, reference-exact: the CUDA refresh runs
    # the full network, testbed_nerf.cu:3424-3495). The occupancy grid
    # is 128³ — levels above ~2× its Nyquist rate (res 256 = level 9 of
    # the default ladder) add sub-cell detail the 0/1 cell bit cannot
    # express, while the refresh's 1M-point forward pays the full
    # hashed-gather floor for them (~56 ms/step amortized, DESIGN.md
    # kernel war round 3). TPU-first knob; flip the default only with
    # measured bitfield-agreement + Chamfer evidence.
    occ_refresh_levels: Optional[int] = None
    # Feed-forward stabilizer window: multiply the Adam update by
    # stab_scale for steps in [stab_start, stab_end). The full-scale
    # composite runs throw recoverable single-batch spikes in a
    # transient window (~steps 1400-1800 measured; guard trips observed
    # 1536-2200 across RUN_r2*/RUN_r3* — DESIGN.md "Full-scale
    # divergence") that the reactive guard can only handle by
    # rollback-thrashing, while the replay matrix shows lr 1e-4 rides
    # straight through it (runs/REPLAY_k0_lr1e4.log: stable where the
    # 1e-3 control detonates to 3e7 at step ~1545). A feed-forward
    # schedule cannot thrash: it is applied inside the jitted step from
    # the traced step index, so it costs no recompiles and composes
    # with the guard's reactive lr_scale. No reference analog (the CUDA
    # testbed trains through the blow-up and eats the 0.237 Chamfer,
    # RUN_r2c train-through control); disable with stab_scale=1.0 or
    # --no-stab-window for reference-exact dynamics.
    #
    # Round 5: DEFAULT OFF (stab_scale 1.0, reference-exact dynamics).
    # The window was a workaround for instabilities whose root causes
    # are now fixed (r4: the RGB+ in-clamp jacobian subgradient; r5: the
    # 2^18x-too-stiff eikonal divisor — DESIGN.md round-5 chapter). The
    # instability lived exactly where an over-stiff eikonal fought the
    # data terms; with the reference's normalization the full-scale runs
    # train clean at lr 1e-3 like the CUDA testbed does
    # (testbed.cu:2823-2838). Re-enable with --stab-window for forensics.
    stab_start: int = 1200
    stab_end: int = 2400
    stab_scale: float = 1.0
    # Adaptive rays/batch counter semantics: the reference rescales
    # rays_per_batch by target/measured where measured is the COMPACTED
    # (contributing, pre-termination) sample count
    # (testbed_nerf.cu:3532-3558 measured_batch_size = compacted
    # counter) — so its 2^18 budget is 2^18 samples that actually
    # receive gradient. The rebuild's controller historically divided
    # by the pre-termination VALID count (march output), which packs
    # fewer contributing samples per step once surfaces form and
    # termination bites. True = reference counter semantics (divide by
    # n_samples_kept); False = legacy valid-count semantics.
    adapt_to_kept: bool = False
    # Divergence guard (Trainer._guard_check): roll back to the last
    # healthy device-side state (repeat failure escalates to an anchor
    # checkpoint lagging >= 64 steps, since a blow-up builds below the
    # loss threshold for ~20 steps) and halve the update scale when a
    # metrics sync sees the color loss explode (>10× EMA and >1
    # absolute, or non-finite); scale restores ×2 per 8 clean windows,
    # floor 1/32 of the base lr. No reference
    # analog (the CUDA testbed trains on through a blow-up); motivated by
    # a measured intrinsic instability of the full-scale system — the
    # RGB+ 4th-channel √(3−Σa²) gradient is singular as predicted albedo
    # approaches white, and at lr 1e-3 with 2048-res levels the coupled
    # system crossed into exponential blow-up at step ~1430 on the
    # composite scene with the EXACT backward (DESIGN.md "Full-scale
    # divergence"). Healthy runs never trip it.
    divergence_guard: bool = True
    # Terminal behavior once the guard has tripped guard_max_trips times
    # without progress past the best healthy step:
    #   "degrade" (default): restore the deepest anchor, permanently turn
    #     the RGB+ 4th channel OFF for the remainder (the one lever every
    #     replay shows holds — runs/REPLAY_k0_norgbplus.log; --no-rgbplus
    #     is a supported reference mode, main.cu:--no-rgbplus) and pin
    #     the update scale at its floor. A production 10k run finishes
    #     with a usable (if slightly less constrained) reconstruction
    #     instead of dying at step ~1600.
    #   "raise": the round-2 behavior — RuntimeError.
    guard_terminal: str = "degrade"
    guard_max_trips: int = 24
    # Spike/runaway discrimination (round-3 probe evidence,
    # runs/PROBE_fp16emu.log): the unstable window ~step 1400-1800 throws
    # TRANSIENT single-batch spikes of 1-20× absolute that training
    # recovers from on its own, while a true runaway doubles every ~3
    # steps — by the next metrics sync (16-32 steps) it is >1000× and
    # unmistakable. Tripping on every spike rollback-thrashed the window
    # (30+ rollbacks to the same anchor). So: a loss in the SOFT band
    # (> soft_ratio × EMA and > soft_abs) defers — the window is not
    # checkpointed and the EMAs are not fed, but training continues; only
    # a second consecutive soft sync, or a HARD hit
    # (> hard_ratio × EMA and > hard_abs, or non-finite), rolls back.
    guard_soft_ratio: float = 10.0
    guard_soft_abs: float = 1.0
    guard_hard_ratio: float = 100.0
    guard_hard_abs: float = 20.0
    # Gradual-blow-up backstop: a blow-up that grows slower than the soft
    # ratio per sync window poisons the EMA itself and slips through every
    # relative check (measured: runs/RUN_r2c_composite10k.log trained
    # through to loss 1574 that way). Trip when the loss EMA exceeds
    # guard_ema_ceiling × the best (lowest) EMA the run has ever reached.
    guard_ema_ceiling: float = 50.0
    # Degraded-mode re-arm: the instability window is transient (probe:
    # healthy from ~step 1800 on), so a permanent no-rgbplus finish gives
    # away supervision for no reason. After guard_rearm_steps of genuine
    # progress in degraded mode, re-enable the RGB+ channel (at most
    # guard_max_rearms times per run; a re-trip just degrades again).
    guard_rearm_steps: int = 1024
    guard_max_rearms: int = 2
    # Thrash detector (RUN_r3: 31 trips with ~90 steps of net progress
    # in 11 minutes — each micro-advance past the best step re-armed the
    # near-consecutive cap, so the terminal mode never fired and the run
    # slow-livelocked through the window). If the last guard_max_trips
    # trips collectively advanced the best healthy step by less than
    # guard_thrash_span steps, the window is unpassable at full
    # supervision — go terminal (degrade/raise) immediately.
    guard_thrash_span: int = 512
    # Eikonal-creep channel (guard v4). An RGB+ poisoning can keep the
    # color loss inside every band for hundreds of steps while the SDF
    # stops being a distance function: RUN_r3b's re-armed stretch crept
    # the ek EMA 0.0046 → 0.086 over steps ~3500-4300 before the first
    # loss spike (4e6 at 3840), so loss-gated checkpoints kept advancing
    # into the sickness and every rollback restored a poisoned state.
    # Trip when the ek EMA exceeds guard_ek_ceiling × its best-ever
    # (lowest) level AND the guard_ek_abs noise floor (healthy full-scale
    # plateau ≈ 0.005-0.009; spiky-but-recoverable windows stay < 2×
    # their floor). The trip restores the lagging anchor and degrades
    # RGB+ immediately. 0 disables.
    guard_ek_ceiling: float = 5.0
    guard_ek_abs: float = 0.02
    # A re-armed RGB+ stretch that ends in another degrade has shown that
    # re-arming poisons this run — cancel the remaining re-arm budget
    # (RUN_r3b: the repeat experiment cost 30 trips / 23 min and degraded
    # from a sick state).
    guard_rearm_cancel_on_degrade: bool = True


@dataclasses.dataclass(frozen=True)
class TestbedConfig:
    __test__ = False  # not a pytest class despite the name

    grid: HashGridConfig = dataclasses.field(default_factory=HashGridConfig)
    network: NetworkConfig = dataclasses.field(default_factory=NetworkConfig)
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    flags: RenderFlags = dataclasses.field(default_factory=RenderFlags)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    march: MarchConfig = dataclasses.field(default_factory=MarchConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    @staticmethod
    def from_network_json(path: str, aabb_scale: float = 1.0) -> "TestbedConfig":
        """Build from a reference-style network config JSON (base.json keys)."""
        with open(path) as f:
            cfg = json.load(f)
        enc = cfg.get("encoding", {})
        grid = HashGridConfig(
            n_levels=enc.get("n_levels", 14),
            n_features_per_level=enc.get("n_features_per_level", 2),
            log2_hashmap_size=enc.get("log2_hashmap_size", 19),
            base_resolution=enc.get("base_resolution", 16),
            top_resolution=enc.get("top_resolution", 2048),
            valid_level_scale=enc.get("valid_level_scale", 0.02),
            base_valid_level_scale=enc.get("base_valid_level_scale", 0.2),
            base_training_step=enc.get("base_training_step", 100),
            aabb_scale=aabb_scale,
        )
        net = cfg.get("network", {})
        rgb = cfg.get("rgb_network", {})
        network = NetworkConfig(
            sdf_hidden_layers=net.get("n_hidden_layers", 1),
            sdf_width=net.get("n_neurons", 64),
            rgb_hidden_layers=rgb.get("n_hidden_layers", 2),
            rgb_width=rgb.get("n_neurons", 64),
            sdf_bias=net.get("sdf_bias", -0.1),
        )
        # walk nested optimizer chain
        opt_json = cfg.get("optimizer", {})
        ema_decay = opt_json.get("decay", 0.95)
        nested = opt_json.get("nested", {})
        decay_start = nested.get("decay_start", 20000)
        decay_interval = nested.get("decay_interval", 10000)
        decay_base = nested.get("decay_base", 0.33)
        adam = nested.get("nested", nested)
        optimizer = OptimizerConfig(
            learning_rate=adam.get("learning_rate", 1e-3),
            beta1=adam.get("beta1", 0.9),
            beta2=adam.get("beta2", 0.99),
            epsilon=adam.get("epsilon", 1e-15),
            l2_reg=adam.get("l2_reg", 1e-6),
            ema_decay=ema_decay,
            decay_start=decay_start,
            decay_interval=decay_interval,
            decay_base=decay_base,
        )
        hyper = cfg.get("hyperparams", {})
        loss = LossConfig(
            mask_loss_weight=hyper.get("mask_loss_weight", 1.0),
            ek_loss_weight=hyper.get("ek_loss_weight", 0.01),
            anneal_end=hyper.get("anneal_end", 0),
        )
        return TestbedConfig(grid=grid, network=network, optimizer=optimizer,
                             loss=loss,
                             march=MarchConfig(
                                 cone_angle=cone_angle_for_aabb(aabb_scale)))
