#!/bin/bash
# Round-5 perf campaign (run when the TPU is free; ~40-60 min total).
# Re-grounds the step budget at the POST-FIX production config (cone=0,
# ek mean-normalized, stab off), then runs the two measured escape
# routes the round-4 budget named (dense mid-levels, occ-refresh level
# cap), then the bench.
set -x
cd /root/repo
python -u tools/profiling/_step_budget_r4.py   > runs/STEP_BUDGET_r5.log 2>&1
python -u tools/profiling/ab_dense_levels.py 0 22 24 > runs/AB_dense_levels_r5.log 2>&1
python -u tools/profiling/ab_occ_refresh_levels.py  > runs/AB_occ_levels_r5.log 2>&1
python -u bench.py                             > runs/BENCH_r5_pre.json 2>&1
tail -1 runs/BENCH_r5_pre.json
