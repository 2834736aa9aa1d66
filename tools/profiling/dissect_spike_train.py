"""Train-forward spike dissection (round-4 root-cause hunt, part 2).

Part 1 (dissect_spike.py) showed the guard-approved step-2400 state is
forward-healthy across 200 fresh batches — so the poison is CREATED by
a handful of training steps from that state (live-run trips recurred at
effective update scales down to 2.5e-5). This tool trains forward with
the guard OFF, running the frozen-params forward diagnostic on every
batch BEFORE its update is applied; at the first spike it

  1. re-runs the diag on the same batch with the PREVIOUS step's params
     (poison in the params, or intrinsic to the batch?), and
  2. prints per-parameter-group update norms for the steps leading in,

naming both the exploding forward term and the parameter group whose
movement created it.

Usage: python tools/profiling/dissect_spike_train.py \
           --snapshot runs/r4_10k/forensic_unstable_2400.msgpack \
           --scene runs/r4_10k [--steps 300] [--lr-scale 1.0]
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import argparse
import dataclasses

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", required=True)
    ap.add_argument("--scene", default="/root/repo/runs/r4_10k")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr-scale", type=float, default=1.0)
    ap.add_argument("--spike", type=float, default=0.3,
                    help="diag loss_color above this = spike")
    args = ap.parse_args()

    from rnb_neus2_tpu.config import TestbedConfig
    from rnb_neus2_tpu.grid import occupancy
    from rnb_neus2_tpu.io.dataset import load_transform_json
    from rnb_neus2_tpu.render import neus, shading
    from rnb_neus2_tpu.render.losses import (albedo_activation,
                                             color_loss_fn, make_albedo4)
    from rnb_neus2_tpu.train import snapshot as snap
    from rnb_neus2_tpu.train.sampler import sample_ray_batch
    from rnb_neus2_tpu.train.trainer import Trainer, valid_level_for_step

    ds = load_transform_json(args.scene)
    cfg = TestbedConfig()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, fused_steps=1,
                                       divergence_guard=False,
                                       # isolate from the feed-forward
                                       # stabilizer so scales compose only
                                       # through --lr-scale
                                       stab_scale=1.0))
    tr = Trainer(ds, cfg)
    snap.restore_trainer(tr, snap.load_snapshot(args.snapshot))
    tr.lr_scale = args.lr_scale
    print(f"resumed at step {tr.step}, n_rays={tr.n_rays}, "
          f"lr_scale={args.lr_scale}", flush=True)

    n_rays = tr._bucket()
    n_active = tr._level_bucket()
    n_slots = cfg.train.target_batch_size
    field = tr.field
    flags = cfg.flags
    lcfg = cfg.loss

    def diag(params, bitfield, key, step):
        batch, samples, pos, (img, xy) = sample_ray_batch(
            ds, bitfield, key, n_rays, n_slots, cfg.march,
            emap_state=None, light_salt=cfg.train.light_prng_salt)
        vl = valid_level_for_step(cfg.grid, step)
        out = field.apply_chunked(params, pos, vl,
                                  cfg.train.field_chunk, n_active)
        sdf, grad = out["sdf"], out["grad"]
        a3 = albedo_activation(out["albedo_raw"])
        inv_s = jnp.exp(10.0 * out["variance"])

        S = samples.t.shape[0]
        R = batch.alive.shape[0]
        rid = jnp.minimum(samples.ray_id, R - 1)
        in_seg = samples.ray_id < R
        ray_alive = batch.alive & samples.ray_kept
        dirs = batch.ray_d[rid]
        s_alive = ray_alive[rid] & in_seg & samples.valid

        true_cos = jnp.sum(dirs * grad, axis=-1)
        alpha = neus.sdf_to_alpha(sdf, true_cos, samples.dt, inv_s, 1.0)
        alpha = jnp.where(s_alive, alpha, 0.0)
        lw = jnp.log1p(-jnp.minimum(alpha, 1.0 - 1e-7))
        cum_excl = jnp.concatenate([jnp.zeros((1,), lw.dtype),
                                    jnp.cumsum(lw)[:-1]])
        seg_base = cum_excl[jnp.minimum(samples.seg_start, S - 1)]
        trans = jnp.exp(cum_excl - seg_base[rid])
        keep = s_alive & (trans >= 1e-4)
        w = jnp.where(keep, alpha * trans, 0.0)

        light_cam = shading.per_ray_lights(batch.normal_gt, batch.light_idx,
                                           flags.apply_supernormal,
                                           flags.apply_light_opti)
        light_world = jnp.einsum("rij,rj->ri", batch.rot_c2w, light_cam)
        shade_pred = shading.shade(grad, light_world[rid], flags.apply_relu)
        albedo4 = make_albedo4(a3, flags, lcfg.rgbplus_grad_floor)

        seg_ids = jnp.where(in_seg, samples.ray_id, R)
        pred4 = jax.ops.segment_sum(
            w[:, None] * albedo4 * shade_pred[:, None], seg_ids,
            num_segments=R + 1, indices_are_sorted=True)[:R]
        shade_gt = shading.shade(batch.normal_gt, light_cam, flags.apply_relu)
        target4 = make_albedo4(batch.albedo_gt, flags) * shade_gt[:, None]
        color = color_loss_fn(pred4, target4, flags) * batch.mask_color \
            * ray_alive

        gnorm = jnp.sqrt(jnp.sum(grad * grad, axis=-1))
        top_v, top_i = jax.lax.top_k(color, 6)
        worst = top_i[0]
        on_ray = (samples.ray_id == worst)
        ray_max = lambda v: jnp.max(jnp.where(on_ray, v, -jnp.inf))
        score = jnp.where(on_ray & keep,
                          w * jnp.abs(shade_pred) * jnp.max(albedo4, -1),
                          -jnp.inf)
        j = jnp.argmax(score)
        return {
            "loss_color": jnp.sum(color) / R,
            "max_ray_color": top_v[0],
            "n_spiky_rays": jnp.sum(color > 10.0),
            "max_gnorm_kept": jnp.max(jnp.where(keep, gnorm, 0.0)),
            "max_a3_kept": jnp.max(jnp.where(
                keep, jnp.sqrt(jnp.sum(a3 * a3, -1)), 0.0)),
            "max_shade_kept": jnp.max(jnp.where(keep, jnp.abs(shade_pred),
                                                0.0)),
            "inv_s": jnp.max(inv_s),
            "worst_img": img[worst], "worst_xy": xy[worst],
            "worst_pred4": pred4[worst], "worst_target4": target4[worst],
            "worst_ray_gnorm": ray_max(jnp.where(keep, gnorm, 0.0)),
            "worst_ray_a3": ray_max(jnp.where(
                keep, jnp.sqrt(jnp.sum(a3 * a3, -1)), 0.0)),
            "worst_ray_shade": ray_max(jnp.where(keep, jnp.abs(shade_pred),
                                                 -jnp.inf)),
            "worst_pos": pos[j],
            "worst_sample": jnp.stack([sdf[j], gnorm[j],
                                       jnp.sqrt(jnp.sum(a3[j] * a3[j])),
                                       shade_pred[j], w[j], alpha[j]]),
        }

    jd = jax.jit(diag)

    def group_flat(p):
        flat = {}
        ht = p["hash_table"]
        if isinstance(ht, (list, tuple)):
            for i, t in enumerate(ht):
                flat[f"hash_L{i}"] = t
        else:
            flat["hash_table"] = ht
        for name in ("sdf_mlp", "rgb_mlp", "variance"):
            leaves = jax.tree_util.tree_leaves(p[name])
            for i, t in enumerate(leaves):
                flat[f"{name}_{i}"] = t
        return flat

    @jax.jit
    def _norms(p):
        return {k: jnp.linalg.norm(v.astype(jnp.float32))
                for k, v in group_flat(p).items()}

    def group_norms(p):
        return {k: float(v) for k, v in jax.device_get(_norms(p)).items()}

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    prev_params = copy(tr.params)
    prev_hist = []  # (step, norms-delta) of recent updates

    r = tr._bucket()
    lb = tr._level_bucket()
    step_fn = tr._compiled.get((r, lb)) or tr._make_step_fn(r, lb)
    tr._compiled[(r, lb)] = step_fn

    for i in range(args.steps):
        cadence = occupancy.update_cadence(tr.step)
        if tr.step % cadence == 0:
            tr.key, k = jax.random.split(tr.key)
            tr.occ = tr._occ_update_fn(lb, subsampled=tr.step >= 256)(
                tr.params, tr.occ, k, jnp.int32(tr.step))
        tr.key, k = jax.random.split(tr.key)
        d = jax.device_get(jd(tr.params, tr.occ.bitfield, k,
                              jnp.int32(tr.step)))
        spike = float(d["loss_color"]) > args.spike
        if i % 10 == 0 or spike:
            print(f"step={tr.step} loss={float(d['loss_color']):.4f} "
                  f"maxray={float(d['max_ray_color']):.4g} "
                  f"nspiky={int(d['n_spiky_rays'])} "
                  f"gnorm={float(d['max_gnorm_kept']):.4g} "
                  f"a3={float(d['max_a3_kept']):.4g} "
                  f"shade={float(d['max_shade_kept']):.4g} "
                  f"inv_s={float(d['inv_s']):.4g}", flush=True)
        if spike:
            print("\n===== SPIKE =====")
            print(f"  worst ray img={d['worst_img']} xy={d['worst_xy']}")
            print(f"  pred4={d['worst_pred4']}\n  target4={d['worst_target4']}")
            print(f"  ray maxes: gnorm={float(d['worst_ray_gnorm']):.5g} "
                  f"a3={float(d['worst_ray_a3']):.5g} "
                  f"shade={float(d['worst_ray_shade']):.5g}")
            print(f"  worst sample pos={d['worst_pos']} "
                  f"[sdf,gnorm,a3,shade,w,alpha]={d['worst_sample']}")
            dprev = jax.device_get(jd(prev_params, tr.occ.bitfield, k,
                                      jnp.int32(tr.step)))
            print(f"  SAME batch at PREV params: "
                  f"loss={float(dprev['loss_color']):.4f} "
                  f"maxray={float(dprev['max_ray_color']):.4g} "
                  f"gnorm={float(dprev['max_gnorm_kept']):.4g}")
            n_now = group_norms(tr.params)
            n_prev = group_norms(prev_params)
            moved = sorted(((abs(n_now[g] - n_prev[g]), g)
                            for g in n_now), reverse=True)[:8]
            print("  last update's biggest param-group |Δnorm|:")
            for dn, g in moved:
                print(f"    {g:14s} Δ={dn:.6g} (|prev|={n_prev[g]:.6g})")
            if prev_hist:
                print("  recent update Δnorm history (top group/step):")
                for s, top in prev_hist[-6:]:
                    print(f"    step {s}: {top}")
            print("===== continuing =====\n", flush=True)

        prev_params = copy(tr.params)
        n_before = group_norms(tr.params)
        tr.params, tr.opt_state, tr.emap, _m = step_fn(
            tr.params, tr.opt_state, tr.emap, tr.occ.bitfield, k,
            jnp.int32(tr.step), jnp.float32(tr.lr_scale))
        n_after = group_norms(tr.params)
        top = max(((abs(n_after[g] - n_before[g]), g) for g in n_after))
        prev_hist.append((tr.step, f"{top[1]} Δ={top[0]:.5g}"))
        tr.step += 1


if __name__ == "__main__":
    main()
