"""Training loss: the forward-only restatement of the reference's giant
fused loss kernel (`src/testbed_nerf.cu:1396-2097`).

The reference computes per-ray targets, composites the prediction, then
re-walks every sample hand-deriving dL/d(16-wide network output) — ~700
lines of manual calculus. Here the whole thing is a differentiable forward:

  total = ( Σ_rays color_loss + mask_w · Σ_rays mask_bce ) / n_rays
          + ek_w · Σ_kept_samples (‖∇sdf‖ − 1)² / target_batch_size

`jax.grad` of this reproduces the reference's gradients (including the
second-order path through ∇sdf). Scaling notes, verified against the kernel:

- color and mask terms are divided by n_rays (loss_scale = LOSS_SCALE/n_rays,
  :1833 — LOSS_SCALE cancels in the fp32 rebuild);
- the eikonal term is divided by the SAMPLE batch target, not n_rays: the
  loss kernel writes the ek rows at the undivided scale (:2039-2047), but
  the network backward routes slot-4 rows through
  `add_positions_view_ekloss`, which divides by `indeed_batch_size`
  (common_operation.cuh:283-296 `dst += pos / batch_size`;
  testbed_nerf.cu:4063 sets it to target_batch_size = 2^18). Rounds 1-4
  of this rebuild missed that kernel and summed the ek term undivided —
  an eikonal term ~2^18× stiffer than the reference's, measured as THE
  cause of the full-scale geometry freeze (the SDF could not deform
  against the spring; all adaptation went into the variance scalar —
  runs/r5_dissect/grad_forensics*.log: 200 same-batch Adam iterations
  move sdf@0.30 by 0.006 with the sum, by 0.14 with the reference's
  mean);
- neither the gradient nor the logged loss is divided by the sampling pdf
  (the fork comments the upstream divide out, :1780-1790); the raw per-ray
  loss is what the error map splats (:1802-1831);
- "RGB+": a 4th albedo channel 3−Σ|a| (L1) or √(3−Σa²) (L2) and the loss
  halved (:1523-1535, :1749-1752);
- albedo activation = exp(clamp(x, −10, 10)) — ENerfActivation::Exponential,
  the testbed default (testbed.h:707, network_to_rgb :337-346);
- mask: weight_sum clamped to [1e−4, 1−1e−4] with zero gradient outside
  (:1757-1777); sigmoid-BCE by default, plain BCE with --bce;
- per-ray mask gates: color masked by albedo_alpha>0.99, mask target =
  normal_alpha>0.99 (:1737, :1756).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..config import LossConfig, RenderFlags
from . import neus, shading


class RayBatch(NamedTuple):
    """Per-ray training data (R rays); samples live in a FlatSamples buffer."""

    ray_o: jnp.ndarray        # (R, 3) origins (warped/unit-cube space)
    ray_d: jnp.ndarray        # (R, 3) unit directions
    alive: jnp.ndarray        # (R,) bool: ray participates at all
    normal_gt: jnp.ndarray    # (R, 3) decoded GT normal (unit)
    albedo_gt: jnp.ndarray    # (R, 3) decoded GT albedo
    mask_color: jnp.ndarray   # (R,) albedo alpha > 0.99
    mask_gt: jnp.ndarray      # (R,) normal alpha > 0.99
    rot_c2w: jnp.ndarray      # (R, 3, 3) camera rotation
    light_idx: jnp.ndarray    # (R,) int32 in [0, 3)
    pdf: jnp.ndarray          # (R,) sampling pdf (importance sampling)
    # (S, 8) pre-gathered per-SAMPLE attrs [ray_d(3) | alive&kept(1) |
    # pad(4)]: one rows-of-8 gather in the sampler replaces the narrow
    # (S,3)/(S,1) per-attribute gathers here (XLA's TPU gather is per-row
    # bound; 3-wide rows cost ~49 ns/row — ~13 ms/step each at 2^18).
    sample_attrs: jnp.ndarray | None = None


def albedo_activation(raw: jnp.ndarray) -> jnp.ndarray:
    """Exponential activation (network_to_rgb, testbed_nerf.cu:337-346)."""
    return jnp.exp(jnp.clip(raw, -10.0, 10.0))


# The reference's fp16 loss-gradient boundary (LossConfig.fp16_grad_emulation):
# the CUDA loss kernel writes dL/doutput as fp16 scaled by LOSS_SCALE=128
# (testbed.h:237; rows cast to tcnn::network_precision_t at
# testbed_nerf.cu:1960-2083 — color/sdf/variance/shading rows carry
# loss_scale=128/n_rays, eikonal rows the undivided 128, exactly matching
# this loss's (color+mask)/n_rays + ek split, so the stored vector is
# 128 × dTotal/doutput elementwise). fp16's max finite is 65504.
LOSS_SCALE = 128.0
_FP16_MAX = 65504.0


@jax.custom_vjp
def fp16_grad_barrier(x):
    """Identity whose cotangent is quantized to the fp16 values the
    reference's backward actually carries: g → fp16(clip(128·g))/128.
    Saturating (not inf-on-overflow): a float→half overflow in CUDA makes
    inf, which would permanently NaN the reference's Adam moments — any
    run the reference survives therefore never overflows, and the clamp
    is the honest envelope of its dynamics. Underflow-to-zero and 11-bit
    mantissa rounding are bit-faithful."""
    return x


def _fp16_barrier_fwd(x):
    return x, None


def _fp16_barrier_bwd(_, g):
    gq = jnp.clip(g * LOSS_SCALE, -_FP16_MAX, _FP16_MAX)
    return (gq.astype(jnp.float16).astype(g.dtype) / LOSS_SCALE,)


fp16_grad_barrier.defvjp(_fp16_barrier_fwd, _fp16_barrier_bwd)


def quantize_grads_fp16(grads):
    """Parameter-gradient half of the emulation: the reference accumulates
    hash-table scatters and MLP weight gradients in fp16 at the ×128 scale
    (grid gradients are network_precision_t, adam.h:88 divides the scale
    back out). Applied to the final gradient tree before Adam."""
    def q(g):
        gq = jnp.clip(g * LOSS_SCALE, -_FP16_MAX, _FP16_MAX)
        return gq.astype(jnp.float16).astype(g.dtype) / LOSS_SCALE
    return jax.tree_util.tree_map(q, grads)


@jax.custom_vjp
def scale_cotangent(x, w):
    """Identity in value; the backward multiplies the cotangent by w
    (w gets no gradient). Used by the rollover-compaction emulation to
    give each sample the reference's padded-copy gradient weight."""
    return x


def _scale_cot_fwd(x, w):
    return x, w


def _scale_cot_bwd(w, g):
    return (g * w, jnp.zeros_like(w))


scale_cotangent.defvjp(_scale_cot_fwd, _scale_cot_bwd)


def rollover_weights(keep: jnp.ndarray) -> jnp.ndarray:
    """Per-slot gradient weight of the reference's rollover-padded
    compacted backward (LossConfig.rollover_grad_emulation): the n kept
    samples fill a fixed S-row network batch, rows [n, S) repeating row
    (i mod n) with dL/doutput rescaled by n/S
    (fill_rollover_and_rescale, neus2_tcnn common_device.h:526-535), so
    kept sample with compaction rank r carries 1 + ⌊(S−1−r)/n⌋·(n/S).
    Non-kept slots get 1 (their cotangent is already zero)."""
    S = keep.shape[0]
    k = keep.astype(jnp.int32)
    n = jnp.maximum(jnp.sum(k), 1)
    rank = jnp.cumsum(k) - 1
    copies = (S - 1 - rank) // n
    w = 1.0 + copies.astype(jnp.float32) * (n.astype(jnp.float32) / S)
    return jnp.where(keep, w, 1.0)


@functools.lru_cache(maxsize=None)
def _make_guarded_sqrt(floor: float, clamped_subgradient: bool = True):
    """√max(x,0) with the derivative regularized by +1e−5 in the
    denominator, like the reference's hand-written jacobian
    (testbed_nerf.cu:1942-1947). At the Xavier init albedo ≈ exp(0) = 1, so
    3−Σa² sits exactly at 0 and the unguarded derivative is +∞.

    clamped_subgradient (DEFAULT, a deliberate fix of an upstream bug):
    zero the derivative where the forward is clamped (x ≤ 0). The
    reference's jacobian −2aᵢ/(a₄+1e−5) keeps reporting a slope inside the
    flat region, so whenever the 4th-channel target is negative (GT shading
    < 0) and the sample's shading is positive, the backward claims that
    GROWING the albedo moves the (actually frozen-at-0) channel toward its
    target — a positive feedback loop through the exp albedo activation
    (gradient ∝ a) that grows hash entries geometrically at ANY update
    scale. Measured live: runs/r4_10k/DISSECT_TRAIN_2400.log — hash-table
    update norms ×1.3/step, albedo → e¹⁰ at one spot, forward loss 1.4e7
    within 300 steps of a guard-approved healthy state. A true sub-gradient
    of √max(x,0) vanishes in the clamp region and breaks the loop; outside
    the clamp the gradient is EXACTLY the reference's.

    The reference's +1e−5 shift still admits ~1e5× gradients as predicted
    albedo → white; `floor` additionally clamps the denominator from below
    (whenever √(3−Σa²) ≥ floor the gradient is EXACTLY the reference's).
    floor = 0 + clamped_subgradient=False reproduces the reference
    verbatim (LossConfig.rgbplus_ref_jacobian / --rgbplus-ref-jacobian)."""

    @jax.custom_vjp
    def f(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    def fwd(x):
        y = jnp.sqrt(jnp.maximum(x, 0.0))
        return y, (y, x)

    def bwd(res, g):
        y, x = res
        d = g * 0.5 / jnp.maximum(y + 1e-5, floor)
        if clamped_subgradient:
            d = jnp.where(x > 0.0, d, 0.0)
        return (d,)

    f.defvjp(fwd, bwd)
    return f


def rgbplus_channel(a3: jnp.ndarray, flags: RenderFlags,
                    grad_floor: float = 0.0,
                    ref_jacobian: bool = False) -> jnp.ndarray:
    """4th albedo channel (testbed_nerf.cu:1523-1535)."""
    if not flags.apply_rgbplus:
        return jnp.zeros_like(a3[..., 0])
    if flags.apply_l2:
        return _make_guarded_sqrt(grad_floor, not ref_jacobian)(
            3.0 - jnp.sum(a3 * a3, axis=-1))
    return 3.0 - jnp.sum(jnp.abs(a3), axis=-1)


def make_albedo4(a3: jnp.ndarray, flags: RenderFlags,
                 grad_floor: float = 0.0,
                 ref_jacobian: bool = False) -> jnp.ndarray:
    if flags.apply_no_albedo:
        ones = jnp.ones_like(a3)
        return jnp.concatenate([ones, jnp.zeros_like(a3[..., :1])], axis=-1)
    return jnp.concatenate(
        [a3, rgbplus_channel(a3, flags, grad_floor, ref_jacobian)[..., None]],
        axis=-1)


def color_loss_fn(pred4: jnp.ndarray, target4: jnp.ndarray,
                  flags: RenderFlags) -> jnp.ndarray:
    """Summed 4-component L1 or L2 (testbed_nerf.cu:280-298)."""
    d = pred4 - target4
    if flags.apply_l2:
        loss = jnp.sum(d * d, axis=-1)
    else:
        loss = jnp.sum(jnp.abs(d), axis=-1)
    if flags.apply_rgbplus:
        loss = loss / 2.0
    return loss


def mask_losses(weight_sum: jnp.ndarray, mask_gt: jnp.ndarray,
                flags: RenderFlags) -> jnp.ndarray:
    """BCE on the (clamped) accumulated weight (testbed_nerf.cu:1756-1777).

    Clamping to [1e−4, 1−1e−4] with stop-gradient at the rails reproduces the
    reference's explicit zeroing of gradient_weight_sum outside the range.
    """
    ws = jnp.clip(weight_sum, 1e-4, 1.0 - 1e-4)
    if flags.apply_bce:
        return -(mask_gt * jnp.log(ws) + (1.0 - mask_gt) * jnp.log(1.0 - ws))
    sig = jax.nn.sigmoid(ws)
    return -(mask_gt * jnp.log(sig) + (1.0 - mask_gt) * jnp.log(1.0 - sig))


def training_loss(field_out: Dict[str, jnp.ndarray], samples, batch: RayBatch,
                  flags: RenderFlags, cfg: LossConfig,
                  cos_anneal_ratio=1.0,
                  n_rays_divisor: int | None = None,
                  ek_samples_divisor: int | None = None
                  ) -> tuple[jnp.ndarray, Dict]:
    """Total differentiable loss for one globally-compacted batch.

    samples: ops.ray_march.FlatSamples with S static slots.
    field_out: NeusField.apply on the (S, 3) sample positions.

    Compositing runs directly in the flat layout: the per-ray exclusive
    cumulative transmittance is a segmented log-space prefix sum
    (cumsum(log(1−α)) re-based at each ray's first slot) and all per-ray
    reductions are segment_sums keyed by ray_id. This keeps the network and
    loss on ONE static shape regardless of how rays share the budget —
    the TPU equivalent of the reference's compacted sample buffer.
    """
    S = samples.t.shape[0]
    R = batch.alive.shape[0]
    sdf = field_out["sdf"]
    grad = field_out["grad"]
    albedo_raw = field_out["albedo_raw"]
    variance = field_out["variance"]

    rid = jnp.minimum(samples.ray_id, R - 1)       # clipped gather index
    in_seg = samples.ray_id < R                    # slot belongs to a ray
    ray_alive = batch.alive & samples.ray_kept
    if batch.sample_attrs is not None:
        # pre-gathered in the sampler (one rows-of-8 gather, see RayBatch)
        dirs = batch.sample_attrs[:, 0:3]
        s_ray_alive = batch.sample_attrs[:, 3] > 0.5
    else:
        dirs = batch.ray_d[rid]
        s_ray_alive = ray_alive[rid]
    s_alive = s_ray_alive & in_seg & samples.valid

    def keep_mask(sdf_, grad_, inv_s_):
        """valid & pre-termination mask (shared by the main path below
        and the rollover emulation's stop-gradient preview)."""
        tc = jnp.sum(dirs * grad_, axis=-1)
        a = neus.sdf_to_alpha(sdf_, tc, samples.dt, inv_s_,
                              cos_anneal_ratio)
        a = jnp.where(s_alive, a, 0.0)
        lw_ = jnp.log1p(-jnp.minimum(a, 1.0 - 1e-7))
        ce = jnp.concatenate([jnp.zeros((1,), lw_.dtype),
                              jnp.cumsum(lw_)[:-1]])
        base = ce[jnp.minimum(samples.seg_start, S - 1)]
        return s_alive & (jnp.exp(ce - base[rid]) >= 1e-4)

    if cfg.rollover_grad_emulation:
        # the reference's rollover-padded compacted backward (see
        # LossConfig.rollover_grad_emulation): weight each kept sample's
        # output cotangent by its padded-copy count. keep is recomputed
        # below from the barriered values — identical, XLA CSEs it.
        sg = jax.lax.stop_gradient
        w_roll = rollover_weights(keep_mask(
            sg(sdf), sg(grad), jnp.exp(10.0 * sg(variance))))
        sdf = scale_cotangent(sdf, w_roll)
        grad = scale_cotangent(grad, w_roll[:, None])
        albedo_raw = scale_cotangent(albedo_raw, w_roll[:, None])
        variance = scale_cotangent(
            jnp.broadcast_to(variance, sdf.shape[:1]), w_roll)
    if cfg.fp16_grad_emulation:
        # the reference's dL/doutput rows, stored as fp16 ×128
        # (testbed_nerf.cu:1960-2083): rows 0-2 = albedo_raw, 3 = sdf,
        # 4-6 + 8-10 = ∇sdf (we quantize their summed cotangent; the
        # reference sums the two fp16 row groups inside its fp16
        # backward), 7 = variance. Composed OUTSIDE the rollover barrier
        # so the backward quantizes the cotangent first, then applies
        # the rollover weight — the reference's write-fp16-then-rescale
        # order.
        sdf = fp16_grad_barrier(sdf)
        grad = fp16_grad_barrier(grad)
        albedo_raw = fp16_grad_barrier(albedo_raw)
        # row 7 is written per-sample and reduce_sum'd in fp32
        # (nerf_network.h:327-340) — broadcast so each sample's dL/dv is
        # quantized before the sum, like the reference
        variance = fp16_grad_barrier(
            jnp.broadcast_to(variance, sdf.shape[:1]))
    inv_s = jnp.exp(10.0 * variance)

    # ---- per-sample alpha ------------------------------------------------
    grad_for_alpha = jax.lax.stop_gradient(grad) \
        if cfg.debug_stopgrad_alpha_normal else grad
    true_cos = jnp.sum(dirs * grad_for_alpha, axis=-1)
    sdf_for_alpha = jax.lax.stop_gradient(sdf) \
        if cfg.debug_stopgrad_alpha_sdf else sdf
    alpha = neus.sdf_to_alpha(sdf_for_alpha, true_cos, samples.dt, inv_s,
                              cos_anneal_ratio)
    alpha = jnp.where(s_alive, alpha, 0.0)

    # ---- segmented exclusive transmittance -------------------------------
    # clamp so a fully-opaque sample doesn't poison the log-prefix sum;
    # T ≤ 1e−7 is far below the 1e−4 kill threshold so semantics are intact
    lw = jnp.log1p(-jnp.minimum(alpha, 1.0 - 1e-7))
    cum = jnp.cumsum(lw)
    cum_excl = jnp.concatenate([jnp.zeros((1,), lw.dtype), cum[:-1]])
    seg_base = cum_excl[jnp.minimum(samples.seg_start, S - 1)]     # (R,)
    trans = jnp.exp(cum_excl - seg_base[rid])
    keep = s_alive & (trans >= 1e-4)
    w = jnp.where(keep, alpha * trans, 0.0)

    # ---- shading ----------------------------------------------------------
    light_cam = shading.per_ray_lights(batch.normal_gt, batch.light_idx,
                                       flags.apply_supernormal,
                                       flags.apply_light_opti)
    light_world = jnp.einsum("rij,rj->ri", batch.rot_c2w, light_cam)

    grad_for_shade = jax.lax.stop_gradient(grad) \
        if cfg.debug_stopgrad_shading_normal else grad
    shade_pred = shading.shade(grad_for_shade, light_world[rid],
                               flags.apply_relu)
    albedo4 = make_albedo4(albedo_activation(albedo_raw), flags,
                           cfg.rgbplus_grad_floor,
                           cfg.rgbplus_ref_jacobian)             # (S,4)

    # slots are ray-ordered by construction (march_flat compaction), so
    # the segment ids are sorted — lets XLA skip the general scatter path
    seg_ids = jnp.where(in_seg, samples.ray_id, R)
    pred4 = jax.ops.segment_sum(
        w[:, None] * albedo4 * shade_pred[:, None], seg_ids,
        num_segments=R + 1, indices_are_sorted=True)[:R]
    weight_sum = jax.ops.segment_sum(w, seg_ids, num_segments=R + 1,
                                     indices_are_sorted=True)[:R]

    shade_gt = shading.shade(batch.normal_gt, light_cam, flags.apply_relu)
    target4 = make_albedo4(batch.albedo_gt, flags) * shade_gt[:, None]

    # ---- color ------------------------------------------------------------
    color = color_loss_fn(pred4, target4, flags) * batch.mask_color \
        * ray_alive
    # no pdf division anywhere — the fork keeps the importance weighting in
    # both the gradient and the logged loss (testbed_nerf.cu:1780-1790)
    color_logged = jax.lax.stop_gradient(color)

    # ---- mask --------------------------------------------------------------
    mask = mask_losses(weight_sum, batch.mask_gt.astype(jnp.float32), flags) \
        * ray_alive

    # ---- eikonal (kept samples, unnormalized) ------------------------------
    gnorm = jnp.sqrt(jnp.sum(grad * grad, axis=-1) + 1e-6)
    ek = jnp.sum(jnp.where(keep, (gnorm - 1.0) ** 2, 0.0))

    # n_rays_divisor lets a data-parallel shard normalize by the GLOBAL ray
    # count so that psum of per-shard gradients equals the single-chip one;
    # ek_samples_divisor is the eikonal analog (GLOBAL sample-batch target).
    n_rays = jnp.asarray(n_rays_divisor or R, jnp.float32)
    ek_div = jnp.asarray(ek_samples_divisor or S, jnp.float32)
    total = (jnp.sum(color) + cfg.mask_loss_weight * jnp.sum(mask)
             ) / n_rays + cfg.ek_loss_weight * ek / ek_div

    n_kept = jnp.sum(keep)
    metrics = {
        # raw per-ray loss, splatted into the error map by the trainer
        # (the reference deposits exactly this mean_loss,
        # testbed_nerf.cu:1802-1831); popped before scalar logging
        "_per_ray_color_logged": color_logged,
        "loss_color": jnp.sum(color_logged) / n_rays,
        "loss_mask": jnp.sum(mask) / n_rays,
        "loss_ek": ek / jnp.maximum(n_kept.astype(jnp.float32), 1.0),
        "weight_sum_mean": jnp.sum(weight_sum) / jnp.maximum(
            jnp.sum(ray_alive.astype(jnp.float32)), 1.0),
        "n_samples_kept": n_kept,
        "n_rays_alive": jnp.sum(ray_alive.astype(jnp.int32)),
        "inv_s": jnp.max(inv_s),
    }
    return total, metrics
