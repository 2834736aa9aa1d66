"""Full-scale stability probe: train the full default config on the
composite scene to --steps, surviving remote-device tunnel drops by
resuming from the rolling snapshot in-process (fresh jax runtimes need a
fresh process only when the runtime wedges, so each retry re-execs).

Purpose: divergence attribution at full scale (the 2^18-batch, 14-level,
res-2048 regime where small-config A/Bs cannot reproduce blow-ups —
the K=2 w-mixture stochastic backward diverged at step ~1500 there
while every small-scale gate passed). Each probe gets an isolated
symlinked scene clone so probes of different settings don't share
output/ state.

Usage: python tools/run_stability_probe.py --k 2 --steps 3000
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import argparse
import logging
import os
import subprocess
import time

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
log = logging.getLogger("probe")

SRC = "/root/repo/runs/composite_scene"


def make_clone(tag: str) -> str:
    clone = f"/root/repo/runs/probe_{tag}"
    os.makedirs(clone, exist_ok=True)
    for name in ("transform.json", "normals", "albedos"):
        dst = os.path.join(clone, name)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, name), dst)
    return clone


def wait_for_tunnel(deadline_s: float = 3600.0) -> None:
    import socket
    t0 = time.time()
    while time.time() - t0 < deadline_s:
        try:
            with socket.create_connection(("127.0.0.1", 8103), timeout=3):
                return
        except OSError:
            time.sleep(30)
    raise SystemExit("tunnel unreachable for an hour; giving up")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, required=True,
                    help="stoch_corner_bwd K (0 = exact)")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--tag", default=None)
    ap.add_argument("--fp16-emu", type=int, default=None,
                    help="1/0: fp16 loss-gradient-chain emulation")
    ap.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                    help="extra testbed CLI args, verbatim")
    args = ap.parse_args()
    tag = args.tag or f"k{args.k}"
    scene = make_clone(tag)
    out = os.path.join(scene, "output")

    from rnb_neus2_tpu.cli import pipeline, testbed

    attempt = int(os.environ.get("_RNB_PROBE_ATTEMPT", "0"))
    argv = ["--scene", scene, "--maxiter", str(args.steps), "--no-gui",
            "--snapshot-each", "200", "--stoch-corner-bwd", str(args.k)]
    if args.fp16_emu is not None:
        argv += ["--fp16-grad-emu", str(args.fp16_emu)]
    argv += args.extra
    snap_path, snap_step = pipeline._latest_snapshot_step(out)
    if snap_path and 0 <= snap_step < args.steps:
        argv += ["--snapshot", snap_path]
        log.info("resuming from step %d", snap_step)
    try:
        rc = testbed.main(argv)
    except Exception as e:
        log.warning("attempt %d failed: %s", attempt + 1, e)
        _, step_now = pipeline._latest_snapshot_step(out)
        made_progress = step_now > snap_step
        if attempt >= 8 and not made_progress:
            raise
        wait_for_tunnel()
        os.environ["_RNB_PROBE_ATTEMPT"] = \
            "0" if made_progress else str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    log.info("probe done rc=%d", rc)
    sys.exit(rc)


if __name__ == "__main__":
    main()
