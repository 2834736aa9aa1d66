"""Absolute surface-quality gate (slow tier).

Round-2 VERDICT: the suite asserted only relative Chamfer ratios, so a
quality regression that preserved ratios would pass. This trains the
composite analytic scene at the reduced-but-hashed config of the
standing CPU A/B protocol (tools/profiling/ab_stoch_chamfer_cpu.py) and
gates on an ABSOLUTE Chamfer-L1 against the analytic GT surface.

Calibration (round 5, post eikonal-divisor fix + cone=0 + scaled focal):
this protocol measures Chamfer-L1 0.0152 / completeness 0.0094 at 900
steps (runs/r5_dissect/ab_ekfix.jsonl, arm v1_ref). Gate at ~3x that.
Historical context: rounds 1-4 measured 0.084-0.129 here with
completeness pinned at 0.14-0.18 — the missing-geometry failure the
round-5 root cause (DESIGN.md) eliminated; the old 0.15 threshold was
calibrated to that broken level.
"""

import numpy as np
import pytest

from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig,
                                  TestbedConfig, TrainConfig)
from rnb_neus2_tpu.mesh.extract import extract_mesh
from rnb_neus2_tpu.mesh.metrics import chamfer_distance
from rnb_neus2_tpu.testing.synthetic import (composite_dataset,
                                             composite_gt_mesh)
from rnb_neus2_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow  # ~6 min composite-scene training


def test_absolute_chamfer_gate():
    # focal scales with width (900 is the 512-wide value): round 5 found
    # the unscaled focal left the 80-px views covering only the central
    # +/-0.07 of the world — completeness was pinned at ~0.14 by the
    # viewing frustum, not by training quality
    ds = composite_dataset(n_views=12, width=80, height=96,
                           focal=900.0 * 80 / 512)
    cfg = TestbedConfig(
        grid=HashGridConfig(n_levels=8, top_resolution=256,
                            log2_hashmap_size=15),
        train=TrainConfig(target_batch_size=1 << 13,
                          initial_rays_per_batch=256,
                          occ_grid_size=64, seed=0),
        march=MarchConfig(n_ladder=1024),   # production cone=0 default
    )
    tr = Trainer(ds, cfg)
    last = {}
    for _ in range(900):
        last = tr.train_step()
    assert np.isfinite(last["loss_color"])

    m = extract_mesh(tr.field, tr.inference_params, resolution=128,
                     meta=ds.meta)
    Vg, Fg = composite_gt_mesh(192)
    Vg = (Vg - 0.5) / 0.5
    ch = chamfer_distance(m["V"], m["F"], Vg, Fg)
    # Round-5 recalibration (eikonal-divisor fix + cone=0 + scaled focal):
    # this exact protocol measures chamfer_l1 0.0152 / completeness 0.0094
    # (runs/r5_dissect/ab_ekfix.jsonl arm v1_ref). ~3x headroom.
    assert ch["chamfer_l1"] < 0.05, ch
    # completeness guards against "accurate but hollow" regressions — the
    # rounds-1..4 failure pinned it at 0.14-0.18
    assert ch["completeness"] < 0.04, ch
