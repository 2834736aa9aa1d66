"""Testbed CLI — flag-compatible with the reference executable
(src/main.cu:90-258) so the orchestration layer and Meshroom node work
unchanged:

  testbed --scene DIR --maxiter N --no-gui [--mask-weight W] [--lone]
          [--supernormal] [--no-rgbplus] [--bce] [--relu] [--opti-lights]
          [--no-albedo] [--save-mesh] [--save-snapshot] [--snapshot PATH]
          [--resolution R] [--save-each K] [--fractional-training N]
          [--free-memory] [--network CONFIG] [--disable-snap-to-center]

Behavioral mapping (main.cu:283-470):
- default loss = L2 unless --lone; rgbplus on unless --no-rgbplus;
- mesh written to <scene>/output/mesh_<maxiter>.obj at --resolution
  (default 512);
- snapshot to <scene>/output/snapshot_<maxiter>.msgpack;
- stdout `iteration=N loss=X` every 100 steps (main.cu:447-449);
- --snapshot resumes training state (main.cu:304-314);
- --no-gui accepted for parity (this implementation is always headless).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser("testbed",
                                description="TPU RNb-NeuS2 testbed")
    p.add_argument("--scene", required=True)
    p.add_argument("--maxiter", type=int, default=10000)
    p.add_argument("--network", default="")
    p.add_argument("--mask-weight", type=float, default=1.0)
    p.add_argument("--save-mesh", action="store_true")
    p.add_argument("--save-snapshot", action="store_true")
    p.add_argument("--snapshot", default="")
    p.add_argument("--no-albedo", action="store_true")
    p.add_argument("--lone", action="store_true", help="L1 loss")
    p.add_argument("--supernormal", action="store_true")
    p.add_argument("--opti-lights", action="store_true")
    p.add_argument("--no-rgbplus", action="store_true")
    p.add_argument("--bce", action="store_true")
    p.add_argument("--relu", action="store_true")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--fractional-training", type=int, default=None)
    p.add_argument("--save-each", type=int, default=0)
    p.add_argument("--free-memory", action="store_true")
    p.add_argument("--no-gui", action="store_true")
    p.add_argument("--disable-snap-to-center", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    # TPU-specific extras (not in the reference)
    p.add_argument("--n-chips", type=int, default=0,
                   help="0 = all local devices (data-parallel)")
    p.add_argument("--target-batch-size", type=int, default=0,
                   help="sample budget per step (0 = reference 2^18)")
    p.add_argument("--occ-grid-size", type=int, default=0,
                   help="occupancy grid resolution (0 = reference 128)")
    p.add_argument("--n-ladder", type=int, default=0,
                   help="ray-march ladder length (0 = reference 1024)")
    p.add_argument("--cone-angle", type=float, default=None,
                   help="ray-march cone angle (default: reference rule — "
                        "0 for aabb_scale <= 1, testbed_nerf.cu:3214; "
                        "rounds 1-4 trained at 1/256, kept as an A/B "
                        "override)")
    p.add_argument("--stoch-corner-bwd", type=int, default=None,
                   help="K>0: unbiased K-corner stochastic hash-grid "
                        "backward (default: config, K=2); 0 = exact "
                        "8-corner")
    p.add_argument("--fp16-grad-emu", type=int, default=None,
                   help="1/0: emulate the reference's fp16 loss-gradient "
                        "chain (LOSS_SCALE=128 fp16 dL/doutput + fp16 "
                        "parameter-gradient accumulation, testbed.h:237); "
                        "default: config")
    p.add_argument("--rgbplus-ref-jacobian", action="store_true",
                   help="control arm: the reference's RGB+ L2 jacobian "
                        "verbatim inside the clamped region "
                        "(testbed_nerf.cu:1934-1940) instead of the "
                        "true-subgradient fix (LossConfig."
                        "rgbplus_ref_jacobian)")
    p.add_argument("--dense-max-entries-log2", type=int, default=0,
                   help="densify hash-grid levels whose full dense table "
                        "fits in 2^N entries (no collisions, 1 gather row "
                        "per sample instead of 8 on those levels; "
                        "0 = reference-exact 2^19 cap everywhere)")
    p.add_argument("--occ-refresh-levels", type=int, default=0,
                   help="cap the hash-grid levels used by occupancy-"
                        "refresh density evals (0 = all levels, "
                        "reference-exact; the 128^3 grid resolves no "
                        "sub-cell detail from the top levels)")
    p.add_argument("--rollover-grad-emu", type=int, default=None,
                   help="1/0: emulate the reference's rollover-padded "
                        "compacted backward (duplicated, n/S-rescaled "
                        "gradient rows for padding; "
                        "testbed_nerf.cu:4044-4068); default: config")
    p.add_argument("--adapt-to-kept", type=int, default=None,
                   help="1/0: adaptive rays/batch divides by the "
                        "contributing (post-termination) sample count "
                        "like the reference's compacted counter "
                        "(testbed_nerf.cu:3532-3558); default: config")
    p.add_argument("--stab-window", nargs=3, type=float, default=None,
                   metavar=("START", "END", "SCALE"),
                   help="feed-forward stabilizer: multiply the Adam "
                        "update by SCALE for steps in [START, END) "
                        "(default: config, 1200 2400 0.1 — the measured "
                        "full-scale unstable window)")
    p.add_argument("--no-stab-window", action="store_true",
                   help="disable the stabilizer window (reference-exact "
                        "update dynamics at every step)")
    p.add_argument("--snapshot-each", type=int, default=0,
                   help="write output/snapshot_latest.msgpack every N "
                        "steps (atomic; crash/outage resume point)")
    p.add_argument("--trace-steps", type=int, default=0,
                   help="wrap N mid-training steps in a jax.profiler "
                        "device trace (headless analog of the reference "
                        "GUI's profiling panels)")
    p.add_argument("--trace-dir", default="",
                   help="trace output dir (default <scene>/output/trace)")
    p.add_argument("--render-path", default="",
                   help="camera-path JSON (render/camera_path.py layout); "
                        "renders a fly-through after training")
    p.add_argument("--render-frames", type=int, default=60,
                   help="frames along --render-path")
    p.add_argument("--render-scale", type=float, default=1.0,
                   help="internal render scale for the fly-through")
    return p


def default_network_config() -> str:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, "configs", "nerf", "base.json")


def make_config(args):
    from ..config import RenderFlags, TestbedConfig, TrainConfig

    cfg_path = args.network or default_network_config()
    if not os.path.isabs(cfg_path) and not os.path.exists(cfg_path):
        cand = os.path.join(os.path.dirname(default_network_config()),
                            cfg_path)
        if os.path.exists(cand):
            cfg_path = cand
    cfg = TestbedConfig.from_network_json(cfg_path)
    flags = RenderFlags(
        apply_l2=not args.lone,
        apply_rgbplus=not args.no_rgbplus,
        apply_supernormal=args.supernormal,
        apply_relu=args.relu,
        apply_bce=args.bce,
        apply_light_opti=args.opti_lights,
        apply_no_albedo=args.no_albedo,
    )
    loss = dataclasses.replace(cfg.loss, mask_loss_weight=args.mask_weight)
    if args.fp16_grad_emu is not None:
        loss = dataclasses.replace(
            loss, fp16_grad_emulation=bool(args.fp16_grad_emu))
    if args.rollover_grad_emu is not None:
        loss = dataclasses.replace(
            loss, rollover_grad_emulation=bool(args.rollover_grad_emu))
    if args.rgbplus_ref_jacobian:
        loss = dataclasses.replace(loss, rgbplus_ref_jacobian=True)
    train_kw = dict(max_steps=args.maxiter, seed=args.seed,
                    fractional_from_step=args.fractional_training)
    if args.target_batch_size:
        train_kw["target_batch_size"] = args.target_batch_size
        train_kw["initial_rays_per_batch"] = max(
            args.target_batch_size // 32, 64)
    if args.occ_grid_size:
        train_kw["occ_grid_size"] = args.occ_grid_size
    if args.occ_refresh_levels:
        train_kw["occ_refresh_levels"] = args.occ_refresh_levels
    if args.adapt_to_kept is not None:
        train_kw["adapt_to_kept"] = bool(args.adapt_to_kept)
    if args.no_stab_window:
        train_kw["stab_scale"] = 1.0
    elif args.stab_window is not None:
        s0, s1, sc = args.stab_window
        train_kw.update(stab_start=int(s0), stab_end=int(s1),
                        stab_scale=float(sc))
    train = dataclasses.replace(cfg.train, **train_kw)
    march = cfg.march
    if args.n_ladder:
        march = dataclasses.replace(march, n_ladder=args.n_ladder)
    if args.cone_angle is not None:
        march = dataclasses.replace(march, cone_angle=args.cone_angle)
    if args.disable_snap_to_center:
        march = dataclasses.replace(march, snap_to_pixel_centers=False)
    network = cfg.network
    if args.stoch_corner_bwd is not None:
        network = dataclasses.replace(
            network, stoch_corner_bwd=args.stoch_corner_bwd)
    grid = cfg.grid
    if args.dense_max_entries_log2:
        grid = dataclasses.replace(
            grid, dense_max_entries_log2=args.dense_max_entries_log2)
    return dataclasses.replace(cfg, flags=flags, loss=loss, train=train,
                               march=march, network=network, grid=grid)


def run(args) -> int:
    from ..io.dataset import load_transform_json
    from ..mesh import extract, writer
    from ..train import snapshot as snap
    from ..train.trainer import Trainer
    from ..utils.meters import Logger

    logger = Logger()
    scene = args.scene.rstrip("/")
    out_dir = os.path.join(scene, "output")
    os.makedirs(out_dir, exist_ok=True)

    dataset = load_transform_json(scene)
    logger.info(f"Loaded {dataset.n_images} views "
                f"{dataset.resolution[0]}x{dataset.resolution[1]}")

    cfg = make_config(args)
    import jax
    n_avail = len(jax.devices())
    n_chips = args.n_chips or n_avail
    if n_chips > 1 and n_avail > 1:
        from ..parallel.trainer import ParallelTrainer
        trainer = ParallelTrainer(dataset, cfg, n_chips=min(n_chips,
                                                            n_avail))
        logger.info(f"Data-parallel over {trainer.n_dev} devices")
    else:
        trainer = Trainer(dataset, cfg)

    if args.snapshot:
        if not os.path.exists(args.snapshot):
            logger.error(f"Snapshot path {args.snapshot} does not exist.")
            return 1
        data = snap.load_snapshot(args.snapshot)
        # rebuild with the snapshot's config but THIS run's flags
        snap.restore_trainer(trainer, data)
        logger.info(f"Loaded snapshot at step {trainer.step}")

    def save_mesh_now(tag):
        m = extract.extract_mesh(trainer.field, trainer.inference_params,
                                 resolution=args.resolution,
                                 meta=dataset.meta)
        path = os.path.join(out_dir, f"mesh_{tag}.obj")
        writer.save_mesh(path, m["V"], m["F"], m["N"], m["C"])
        logger.info(f"Saved mesh to {path} "
                    f"({len(m['V'])} verts, {len(m['F'])} faces)")

    _snap_writer = None
    trace_at = None
    if args.trace_steps:
        # trace a mid-run window: past the occupancy warm-up so the
        # steady-state step (the thing worth profiling) is what lands
        # in the trace
        trace_at = min(max(256, trainer.step + 32),
                       max(args.maxiter - args.trace_steps, 0))

    while trainer.step < args.maxiter:
        if trace_at is not None and trainer.step >= trace_at:
            import jax.profiler
            tdir = args.trace_dir or os.path.join(out_dir, "trace")
            n = min(args.trace_steps, args.maxiter - trainer.step)
            with jax.profiler.trace(tdir):
                trainer.train_steps(n, sync_every=max(n, 1))
            logger.info(f"Wrote a {n}-step device trace to {tdir}")
            trace_at = None
            continue
        # advance to the next log/mesh boundary without per-step host
        # syncs (device-queue pipelining; see Trainer.train_step_async)
        boundaries = [args.maxiter,
                      (trainer.step // 100 + 1) * 100]
        if args.save_each:
            boundaries.append(
                (trainer.step // args.save_each + 1) * args.save_each)
        if args.snapshot_each:
            boundaries.append((trainer.step // args.snapshot_each + 1)
                              * args.snapshot_each)
        if trace_at is not None and trace_at > trainer.step:
            boundaries.append(trace_at)
        target = min(boundaries)
        trainer.train_steps(target - trainer.step, sync_every=25)
        if trainer.step % 100 == 0 or trainer.step >= args.maxiter:
            # reference logs `iteration=N loss=X` (main.cu:447-449); the
            # extra EMAs are this testbed's observability additions
            logger.info(f"iteration={trainer.step} "
                        f"loss={trainer.loss_ema.value:.6f} "
                        f"mask={trainer.mask_ema.value:.4f} "
                        f"ek={trainer.ek_ema.value:.4f} "
                        f"rays={trainer.n_rays}")
        if args.save_each and trainer.step % args.save_each == 0 \
                and trainer.step < args.maxiter:
            save_mesh_now(trainer.step)
        if args.snapshot_each \
                and trainer.step % args.snapshot_each == 0 \
                and trainer.step < args.maxiter:
            latest = os.path.join(out_dir, "snapshot_latest.msgpack")
            loss_now = trainer.loss_ema.value
            if not trainer.ek_healthy():
                # loss-healthy but geometry-sick (eikonal EMA past the
                # guard ceiling): not a resume point worth overwriting
                # the last good generation with (RUN_r3b overwrote both
                # generations with ek-0.08 states saved mid-thrash)
                logger.error(
                    f"iteration={trainer.step}: ek EMA "
                    f"{trainer.ek_ema.value:.4g} is past the guard "
                    "ceiling; skipping rolling snapshot")
            elif not trainer.loss_ema._initialized or \
                    not (loss_now == loss_now and loss_now < 1e6):
                # diverged/NaN — or EMA never initialized, i.e. no
                # healthy window consumed since (re)start (live RUN_r3: a
                # resume that blew up pre-first-sync kept EMA at 0.0 and
                # overwrote BOTH rolling generations with blown params).
                # Never overwrite the last good rolling snapshot: a
                # healthy resume point is worth more than a fresher
                # broken one.
                logger.error(
                    f"iteration={trainer.step}: loss={loss_now} is "
                    "divergent; skipping rolling snapshot")
            else:
                # async: on-device copy now, background thread pulls +
                # serializes + rotates latest → latest.prev (keeping one
                # generation back for crash/divergence recovery). The
                # synchronous write cost ~1.2 s every 200 steps — the
                # biggest single item in the production-vs-bench gap
                # (DESIGN.md reconciliation).
                if _snap_writer is None:
                    _snap_writer = snap.AsyncSnapshotWriter()
                _snap_writer.submit(latest, trainer, logger)

    if _snap_writer is not None:
        _snap_writer.join()
    if args.save_mesh:
        save_mesh_now(args.maxiter)
    if args.save_snapshot:
        path = os.path.join(out_dir, f"snapshot_{args.maxiter}.msgpack")
        logger.info("Saving Snapshot !")
        logger.info(path)
        snap.save_snapshot(path, trainer)

    if args.render_path:
        from ..io.image_io import save_image
        from ..render.camera_path import CameraPath
        from ..render.renderer import render_view
        import numpy as np

        cpath = CameraPath.load(args.render_path)
        frames_dir = os.path.join(out_dir, "flythrough")
        os.makedirs(frames_dir, exist_ok=True)
        cams = dataset.cameras
        import jax.numpy as jnp
        V = cams.rot_c2w.shape[0]
        for i, m in enumerate(cpath.frames(args.render_frames)):
            cams_m = cams._replace(
                rot_c2w=jnp.broadcast_to(jnp.asarray(m[:3, :3]), (V, 3, 3)),
                origin=jnp.broadcast_to(jnp.asarray(m[:3, 3]), (V, 3)))
            outr = render_view(trainer.field, trainer.inference_params,
                               cams_m, 0, trainer.occ.bitfield, cfg.march,
                               render_scale=args.render_scale)
            rgba = np.concatenate(
                [outr["albedo"], outr["alpha"][..., None]], axis=-1)
            save_image(rgba, os.path.join(frames_dir, f"{i:05d}.png"),
                       bit_depth=8)
        logger.info(f"Rendered {args.render_frames} fly-through frames "
                    f"to {frames_dir}")
    return 0


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    return run(args)


if __name__ == "__main__":
    sys.exit(main())
