#!/bin/bash
# Round-5 perf campaign (run when the TPU is free).
# The step budget is measured from the trained production snapshot —
# the adaptation warm-up regime the r4 tools measured is NOT the
# steady state under cone=0 (DESIGN.md "Kernel war, round 5").
set -x
cd /root/repo
python -u tools/profiling/_step_budget_r5.py \
    --snapshot runs/composite_scene/output/snapshot_10000.msgpack \
    > runs/STEP_BUDGET_r5.log 2>&1
python -u tools/profiling/ab_occ_refresh_levels.py \
    --snapshot runs/composite_scene/output/snapshot_10000.msgpack \
    > runs/AB_occ_levels_r5.log 2>&1
python -u bench.py > runs/BENCH_r5_local.json 2>&1
tail -1 runs/BENCH_r5_local.json
