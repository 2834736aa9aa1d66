"""Missing-geometry dissector (VERDICT r4 task #1).

Every full-scale run reconstructs only |x-0.5| <~ 0.13 of a scene that
extends to 0.23 (torus ring / box extremities never appear; completeness
pinned at ~0.14 while accuracy is 0.02-0.07). This instruments a
production-config training run with probes that answer, per region
(torus ring, box corners, sphere top, inner blob):

  - does occupancy ever light up there, and when does it die?
  - what is the SDF doing there (is supervision pulling it negative)?
  - what fraction of rays through GT-mask pixels of that region still
    march ANY samples (the dead-ray mask-loss hole,
    train/sampler.py:90 `alive &= n_valid > 0`)?
  - weight_sum for those rays (mask BCE gradient is zeroed outside
    [1e-4, 1-1e-4], testbed_nerf.cu:1756-1777).

Writes one JSON line per probe step to --out.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/root/repo/runs/composite_scene")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--probe-every", type=int, default=48)
    ap.add_argument("--out", default="/root/repo/runs/r5_dissect/growth.jsonl")
    ap.add_argument("--no-stab", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import os
    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    import jax
    import jax.numpy as jnp
    from rnb_neus2_tpu.cli import testbed as tb
    from rnb_neus2_tpu.io.dataset import load_transform_json
    from rnb_neus2_tpu.train.trainer import Trainer
    from rnb_neus2_tpu.testing.synthetic import composite_sdf
    from rnb_neus2_tpu.ops import ray_march
    from rnb_neus2_tpu.render import neus
    from rnb_neus2_tpu.geom.camera import rays_from_pixels
    from rnb_neus2_tpu.grid import occupancy

    argv = ["--scene", args.scene, "--maxiter", str(args.steps), "--no-gui"]
    if args.no_stab:
        argv.append("--no-stab-window")
    p = tb.build_argparser().parse_args(argv)
    cfg = tb.make_config(p)
    dataset = load_transform_json(args.scene)
    trainer = Trainer(dataset, cfg)

    # ---- region probes (unit-cube coords) --------------------------------
    G = cfg.train.occ_grid_size
    ax = (np.arange(G) + 0.5) / G
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    centers = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    # cell index layout matches grid/occupancy.py: x + G*(y + G*z)
    cell_of = (np.round(centers * G - 0.5).astype(int))
    flat_idx = cell_of[:, 0] + G * (cell_of[:, 1] + G * cell_of[:, 2])

    def torus_sdf(pp):
        q = pp - np.array([0.50, 0.46, 0.40])
        qxy = np.linalg.norm(q[..., :2], axis=-1) - 0.17
        return np.sqrt(qxy**2 + q[..., 2]**2) - 0.055

    def box_sdf(pp):
        b = np.abs(pp - np.array([0.52, 0.62, 0.40])) \
            - np.array([0.10, 0.055, 0.045])
        return (np.linalg.norm(np.maximum(b, 0), axis=-1)
                + np.minimum(np.max(b, axis=-1), 0.0)) - 0.02

    def sphere_sdf(pp):
        return np.linalg.norm(pp - np.array([0.50, 0.54, 0.56]),
                              axis=-1) - 0.14

    d_t, d_b, d_s = torus_sdf(centers), box_sdf(centers), sphere_sdf(centers)
    r_c = np.linalg.norm(centers - 0.5, axis=-1)
    regions = {
        # shell within 0.02 of each GT surface, restricted to its OUTER part
        # (farther than 0.16 from scene center -- the part that never grows)
        "ring": flat_idx[(np.abs(d_t) < 0.02) & (r_c > 0.16)],
        "box": flat_idx[(np.abs(d_b) < 0.02) & (r_c > 0.16)],
        "sph_out": flat_idx[(np.abs(d_s) < 0.02) & (r_c > 0.16)],
        "inner": flat_idx[(composite_sdf(centers) < 0.02) & (r_c < 0.12)],
    }
    for k, v in regions.items():
        print(f"region {k}: {len(v)} cells")

    # SDF probe points: torus tube-center circle + box corners + sphere top
    th = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    ring_pts = np.stack([0.50 + 0.17 * np.cos(th),
                         0.46 + 0.17 * np.sin(th),
                         np.full(8, 0.40)], axis=-1)
    box_pts = np.array([[0.52 + sx * 0.10, 0.62 + sy * 0.055, 0.40 + sz * 0.045]
                        for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
    probe_pts = jnp.asarray(np.concatenate([
        ring_pts, box_pts, [[0.50, 0.54, 0.70], [0.50, 0.54, 0.42]]]),
        jnp.float32)  # last two: sphere top, inner point

    # ---- probe rays: pixels whose GT alpha==1 AND whose first GT surface
    # hit lies in the outer region (r>0.16) -- these rays MUST composite
    # the missing geometry. Use frames' stored alpha via dataset arrays.
    alphas = np.asarray(dataset.alpha_normal)  # (N, H, W)
    H, W = alphas.shape[1], alphas.shape[2]
    rng = np.random.default_rng(0)
    sel_img, sel_xy = [], []
    cams = dataset.cameras
    for i in range(dataset.n_images):
        ys, xs = np.nonzero(alphas[i] > 0.99)
        if len(ys) == 0:
            continue
        pick = rng.choice(len(ys), size=min(400, len(ys)), replace=False)
        xy = np.stack([(xs[pick] + 0.5) / W, (ys[pick] + 0.5) / H], axis=-1)
        sel_img.append(np.full(len(pick), i))
        sel_xy.append(xy)
    sel_img = np.concatenate(sel_img)
    sel_xy = np.concatenate(sel_xy)
    ro, rd = rays_from_pixels(cams, jnp.asarray(sel_img),
                              jnp.asarray(sel_xy, jnp.float32))
    ro_n, rd_n = np.asarray(ro), np.asarray(rd)
    # first GT hit per ray (analytic sphere trace)
    t = np.full(len(ro_n), 0.05, np.float32)
    for _ in range(128):
        s = composite_sdf(ro_n + t[:, None] * rd_n)
        t = np.where(s > 5e-5, t + np.maximum(s, 1e-4), t)
    hitp = ro_n + t[:, None] * rd_n
    r_hit = np.linalg.norm(hitp - 0.5, axis=-1)
    outer_rays = r_hit > 0.16
    inner_rays = r_hit <= 0.12
    print(f"probe rays: {outer_rays.sum()} outer, {inner_rays.sum()} inner "
          f"of {len(ro_n)}")
    # pad to power-of-two-ish fixed shape for one compiled probe fn
    Rp = len(ro_n)
    ro_j, rd_j = jnp.asarray(ro_n), jnp.asarray(rd_n)

    n_slots = 1 << 17
    field = trainer.field

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def probe_rays_fn(params, bitfield):
        u0 = jnp.zeros((Rp,), jnp.float32)
        samples = ray_march.march_flat(ro_j, rd_j, bitfield, u0,
                                       cfg.march.n_ladder, n_slots,
                                       cfg.march.cone_angle)
        rid = jnp.minimum(samples.ray_id, Rp - 1)
        pos = jnp.clip(ro_j[rid] + samples.t[:, None] * rd_j[rid], 0.0, 1.0)
        out = field.apply_chunked(params, pos, None, 4096)
        inv_s = jnp.exp(10.0 * params["variance"][0])
        tc = jnp.sum(rd_j[rid] * out["grad"], axis=-1)
        a = neus.sdf_to_alpha(out["sdf"], tc, samples.dt, inv_s, 1.0)
        in_seg = samples.ray_id < Rp
        a = jnp.where(in_seg & samples.valid, a, 0.0)
        lw = jnp.log1p(-jnp.minimum(a, 1.0 - 1e-7))
        cum = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(lw)[:-1]])
        base = cum[jnp.minimum(samples.seg_start, n_slots - 1)]
        trans = jnp.exp(cum - base[rid])
        w = jnp.where(in_seg & samples.valid & (trans >= 1e-4), a * trans, 0.)
        seg = jnp.where(in_seg, samples.ray_id, Rp)
        wsum = jax.ops.segment_sum(w, seg, num_segments=Rp + 1,
                                   indices_are_sorted=True)[:Rp]
        return wsum, samples.n_valid

    @jax.jit
    def probe_sdf_fn(params):
        npts = probe_pts.shape[0]
        pad = -(-npts // 64) * 64
        pp = jnp.concatenate([probe_pts,
                              jnp.zeros((pad - npts, 3))])[:pad]
        return field.sdf(params, pp)[:npts]

    t0 = time.time()
    fout = open(args.out, "w")

    def probe(step):
        params = trainer.params
        occ = trainer.occ
        dens = np.asarray(occ.density)
        bits = np.asarray(occ.bitfield)
        wsum, nval = probe_rays_fn(params, occ.bitfield)
        wsum, nval = np.asarray(wsum), np.asarray(nval)
        sdfs = np.asarray(probe_sdf_fn(params))
        rec = {
            "step": step,
            "t": round(time.time() - t0, 1),
            "inv_s": float(np.exp(10.0 * np.asarray(
                params["variance"])[0])),
            "mean_density": float(np.asarray(occ.mean_density)),
            "sdf_ring": [round(float(s), 4) for s in sdfs[:8]],
            "sdf_box": [round(float(s), 4) for s in sdfs[8:16]],
            "sdf_sph_top": round(float(sdfs[16]), 4),
            "sdf_inner": round(float(sdfs[17]), 4),
        }
        for k, idx in regions.items():
            rec[f"occ_{k}"] = round(float(bits[idx].mean()), 4)
            rec[f"dens_{k}"] = round(float(dens[idx].mean()), 5)
        for name, m in (("outer", outer_rays), ("inner", inner_rays)):
            rec[f"wsum_{name}"] = round(float(wsum[m].mean()), 4)
            rec[f"wsum_{name}_dead"] = round(
                float((wsum[m] < 1e-4).mean()), 4)
            rec[f"rays_{name}_novalid"] = round(
                float((nval[m] == 0).mean()), 4)
        fout.write(json.dumps(rec) + "\n")
        fout.flush()
        print(json.dumps(rec))

    probe(0)
    done = 0
    while done < args.steps:
        n = min(args.probe_every, args.steps - done)
        trainer.train_steps(n, sync_every=16)
        done += n
        probe(done)
        print(f"  loss_ema={trainer.loss_ema.value:.5f} "
              f"mask={trainer.mask_ema.value:.4f} rays={trainer.n_rays}")
    fout.close()
    from rnb_neus2_tpu.train import snapshot as snap
    snap.save_snapshot(args.out.replace(".jsonl", "_final.msgpack"), trainer)


if __name__ == "__main__":
    main()
