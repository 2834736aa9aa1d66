"""FULL-config surface-quality gate (fullscale tier; VERDICT r3 item #7).

The reduced-config gate (test_chamfer_gate.py) runs in minutes but cannot
catch a full-scale-only regression — which is exactly where the product
historically failed (guard-degraded 10k runs, runs/RUN_r3c). This gate
asserts on the PRODUCT artifact: the chamfer.json written by the one-log
train→mesh→chamfer pipeline (tools/run_composite_10k.py — the reference's
contract, src/main.cu:455-461 + rnb_neus2/pipeline.py:178-219) at the full
default config (14 levels, 2^18-sample batches, 10k steps, 512³ MC).

Because the full pipeline needs the real TPU chip for ~1-2 h, the gate
validates the most recent recorded artifact rather than retraining inside
pytest; set RNB_FULLSCALE_TRAIN=1 to force the full pipeline run here
(hours — it IS the product). Runs are produced by:

    python tools/run_composite_10k.py --scene /root/repo/runs/r4_10k

Thresholds: 0.15 is far above seed noise at the healthy level (~0.09
Chamfer-L1: runs/ab_stoch_chamfer_cpu_3seed_full.json) and far below the
0.237 a diverged train-through run produced (runs/chamfer_r3_trainthrough
.json). The stage-2 assert encodes the two-stage rationale: optimised
lights must not degrade the surface.
"""

import glob
import json
import os
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.fullscale]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACTS = sorted(
    glob.glob(os.path.join(REPO, "runs", "*", "output", "chamfer.json")),
    key=os.path.getmtime)


def _load_latest():
    if os.environ.get("RNB_FULLSCALE_TRAIN") == "1":
        scene = os.path.join(REPO, "runs", "fullscale_gate")
        os.makedirs(scene, exist_ok=True)
        for name in ("albedos", "normals", "transform.json"):
            link = os.path.join(scene, name)
            if not os.path.lexists(link):
                os.symlink(os.path.join("..", "composite_scene", name),
                           link)
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "run_composite_10k.py"),
             "--scene", scene], check=True, timeout=4 * 3600)
        path = os.path.join(scene, "output", "chamfer.json")
    elif ARTIFACTS:
        # newest artifact from a FULL-scale (>= 10k step) run — shorter
        # validation runs (e.g. the 4000-step v2-scene arms) also write
        # chamfer.json and may be newer, but they are supplementary
        # evidence, not the product contract this gate holds
        path = None
        for cand in reversed(ARTIFACTS):
            with open(cand) as f:
                if json.load(f).get("max_steps", 0) >= 10000:
                    path = cand
                    break
        if path is None:
            pytest.skip("no >=10k-step chamfer.json artifact recorded")
    else:
        pytest.skip("no full-scale chamfer.json artifact recorded yet; "
                    "run tools/run_composite_10k.py (or set "
                    "RNB_FULLSCALE_TRAIN=1) first")
    with open(path) as f:
        return json.load(f), path


def test_fullscale_chamfer_gate():
    result, path = _load_latest()
    assert result["max_steps"] >= 10000, (path, result)
    assert result["mesh_vertices"] > 10000, (path, result)
    # Round-5 recalibration: with the eikonal-divisor root-cause fix the
    # full 10k pipeline measures Chamfer-L1 0.0105, completeness 0.0018,
    # accuracy 0.019 (runs/composite_scene/output/chamfer.json, r5 run;
    # silhouette IoU 0.992). Thresholds at ~4x the measured level so the
    # gate catches any regression of the round-1..4 class (completeness
    # was pinned at 0.14-0.18 for four rounds) while staying seed-robust.
    assert result["chamfer_l1"] < 0.05, (path, result)
    assert result["completeness"] < 0.02, (path, result)
    # the missing-geometry signature: completeness >> accuracy. A healthy
    # full-surface run has completeness BELOW accuracy; 2x is the alarm.
    assert result["completeness"] <= 2.0 * result["accuracy"], (path, result)


def test_fullscale_stage2_not_worse():
    result, path = _load_latest()
    if "stage1_chamfer_l1" not in result:
        pytest.skip(f"{path} predates stage-1 chamfer recording")
    # stage 2 (opti-lights) must hold or improve the stage-1 surface
    # (reference two-stage rationale, rnb_neus2/pipeline.py); small
    # tolerance for mesh-extraction noise at equal quality
    assert (result["chamfer_l1"]
            <= result["stage1_chamfer_l1"] * 1.10 + 1e-3), (path, result)
