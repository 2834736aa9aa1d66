"""Frozen-params forward-spike dissection (round-4 root-cause hunt).

Evidence so far: guard trips recur from restored healthy states at
effective update scales down to 2.5e-5 and on fresh PRNG streams
(RUN_r4 trips 1-8), while a deep-anchor restore (-240 steps) trains
cleanly — so the spike lives in the FORWARD pass of a state already
declared healthy: a localized poisoned field region that only some ray
batches sample. This tool finds it and names the exploding term.

Loads a forensic snapshot, freezes params, sweeps N sampler keys through
a forward-only diagnostic twin of render/losses.training_loss
(decomposed: per-ray color, |∇sdf| along kept samples, albedo magnitude,
shading magnitude, weight mass), and dumps the worst batch's worst rays
plus per-sample stats along the single worst ray.

Usage: python tools/profiling/dissect_spike.py \
           --snapshot runs/r4_10k/forensic_unstable_2400.msgpack \
           --scene runs/r4_10k [--n-batches 200]
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", required=True)
    ap.add_argument("--scene", default="/root/repo/runs/r4_10k")
    ap.add_argument("--n-batches", type=int, default=200)
    ap.add_argument("--topk", type=int, default=6)
    args = ap.parse_args()

    from rnb_neus2_tpu.config import TestbedConfig
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
        cfg, train=dataclasses.replace(cfg.train, fused_steps=1))
    tr = Trainer(ds, cfg)
    snap.restore_trainer(tr, snap.load_snapshot(args.snapshot))
    print(f"resumed at step {tr.step}, n_rays={tr.n_rays}", flush=True)

    n_rays = tr._bucket()
    n_active = tr._level_bucket()
    n_slots = cfg.train.target_batch_size
    field = tr.field
    flags = cfg.flags
    lcfg = cfg.loss
    step = jnp.int32(tr.step)
    K = args.topk

    def diag(params, bitfield, key):
        batch, samples, pos, (img, xy) = sample_ray_batch(
            ds, bitfield, key, n_rays, n_slots, cfg.march,
            emap_state=None, light_salt=cfg.train.light_prng_salt)
        vl = valid_level_for_step(cfg.grid, step)
        out = field.apply_chunked(params, pos, vl,
                                  cfg.train.field_chunk, n_active)
        sdf, grad = out["sdf"], out["grad"]
        albedo_raw, variance = out["albedo_raw"], out["variance"]
        inv_s = jnp.exp(10.0 * variance)

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
        a3 = albedo_activation(albedo_raw)
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
        gnorm_kept = jnp.where(keep, gnorm, 0.0)
        a3norm = jnp.sqrt(jnp.sum(a3 * a3, axis=-1))

        top_v, top_i = jax.lax.top_k(color, K)
        per_ray = {
            "top_color": top_v, "top_ray": top_i,
            "top_img": img[top_i], "top_xy": xy[top_i],
            "top_pred4": pred4[top_i], "top_target4": target4[top_i],
        }
        # samples of the single worst ray
        worst = top_i[0]
        on_ray = (samples.ray_id == worst)
        def ray_max(v):
            return jnp.max(jnp.where(on_ray, v, -jnp.inf))
        scalars = {
            "loss_color": jnp.sum(color) / R,
            "max_ray_color": top_v[0],
            "max_gnorm_kept": jnp.max(gnorm_kept),
            "max_gnorm_alive": jnp.max(jnp.where(s_alive, gnorm, 0.0)),
            "max_a3norm_kept": jnp.max(jnp.where(keep, a3norm, 0.0)),
            "max_shade_kept": jnp.max(jnp.where(keep, jnp.abs(shade_pred),
                                                0.0)),
            "max_w": jnp.max(w),
            "inv_s": jnp.max(inv_s),
            "worst_ray_max_gnorm": ray_max(jnp.where(keep, gnorm, 0.0)),
            "worst_ray_max_a3": ray_max(jnp.where(keep, a3norm, 0.0)),
            "worst_ray_max_shade": ray_max(
                jnp.where(keep, jnp.abs(shade_pred), 0.0)),
            "worst_ray_max_w": ray_max(w),
            "worst_ray_n_kept": jnp.sum(on_ray & keep),
        }
        # position of the worst ray's largest-weighted sample — localizes
        # the poison region in world space
        score = jnp.where(on_ray & keep,
                          w * jnp.abs(shade_pred) *
                          jnp.max(albedo4, axis=-1), -jnp.inf)
        j = jnp.argmax(score)
        scalars["worst_pos"] = pos[j]
        scalars["worst_sample"] = jnp.stack(
            [sdf[j], gnorm[j], a3norm[j], shade_pred[j], w[j], alpha[j]])
        return scalars, per_ray

    jd = jax.jit(diag)
    key = jax.random.PRNGKey(4242)
    results = []
    for i in range(args.n_batches):
        key, k = jax.random.split(key)
        scalars, per_ray = jd(tr.params, tr.occ.bitfield, k)
        scalars = {kk: jax.device_get(v) for kk, v in scalars.items()}
        results.append((i, scalars, jax.device_get(per_ray)))
        if i % 20 == 0 or scalars["loss_color"] > 0.2:
            print(f"[{i:4d}] loss={scalars['loss_color']:.4f} "
                  f"maxray={scalars['max_ray_color']:.3g} "
                  f"gnorm={scalars['max_gnorm_kept']:.3g} "
                  f"a3={scalars['max_a3norm_kept']:.3g} "
                  f"shade={scalars['max_shade_kept']:.3g} "
                  f"inv_s={scalars['inv_s']:.3g}", flush=True)

    results.sort(key=lambda r: -float(r[1]["loss_color"]))
    print("\n===== worst 5 batches =====")
    for i, s, p in results[:5]:
        print(f"\nbatch {i}: loss_color={s['loss_color']:.5f} "
              f"max_ray_color={s['max_ray_color']:.4g}")
        for kk in ("max_gnorm_kept", "max_gnorm_alive", "max_a3norm_kept",
                   "max_shade_kept", "max_w", "inv_s"):
            print(f"  {kk:18s} = {float(s[kk]):.5g}")
        print(f"  worst ray: img={p['top_img'][0]} xy={p['top_xy'][0]} "
              f"n_kept={int(s['worst_ray_n_kept'])}")
        print(f"    pred4={p['top_pred4'][0]} target4={p['top_target4'][0]}")
        print(f"    ray maxes: gnorm={float(s['worst_ray_max_gnorm']):.4g} "
              f"a3={float(s['worst_ray_max_a3']):.4g} "
              f"shade={float(s['worst_ray_max_shade']):.4g} "
              f"w={float(s['worst_ray_max_w']):.4g}")
        print(f"    worst sample pos={s['worst_pos']} "
              f"[sdf,gnorm,a3,shade,w,alpha]={s['worst_sample']}")
        print(f"  top{len(p['top_color'])} ray colors: "
              f"{[round(float(v), 4) for v in p['top_color']]}")

    healthy = sorted(float(r[1]["loss_color"]) for r in results)
    print(f"\nmedian loss over {len(results)} batches: "
          f"{healthy[len(healthy)//2]:.5f}; "
          f"p90={healthy[int(len(healthy)*0.9)]:.5f}; max={healthy[-1]:.5f}")
    with open("/root/repo/runs/r4_10k/dissect_spike.json", "w") as f:
        json.dump([{**{k2: (v.tolist() if hasattr(v, "tolist") else v)
                       for k2, v in s.items()}, "batch": i}
                   for i, s, _ in results[:10]], f, indent=1, default=str)


if __name__ == "__main__":
    main()
