#!/bin/bash
# Round-3 perf measurement campaign. Waits for the 10k run (pid in
# /tmp/run10k.pid) to finish, then runs the chip-bound A/Bs back-to-back:
#   1. occupancy-refresh encode-level cap A/B (ms/refresh + bitfield
#      agreement), params from the completed run's trained snapshot —
#      the gate for flipping TrainConfig.occ_refresh_levels.
#   2. stochastic-corner backward 3-arm speed A/B (exact/K=2/K=1) in ONE
#      invocation — closes the ADVICE "same-session" caveat on the
#      exact-arm figure.
#   3. bench.py at current defaults (fresh vs_baseline).
# Measurement only — no defaults are flipped here; results are read and
# acted on by hand. Each stage bounded; failures non-fatal.
set -u
cd /root/repo
RUNPID=$(cat /tmp/run10k.pid 2>/dev/null || echo "")
if [ -n "$RUNPID" ]; then
  echo "[campaign] waiting for 10k run pid $RUNPID" >> /tmp/campaign.log
  while kill -0 "$RUNPID" 2>/dev/null; do sleep 30; done
fi
echo "[campaign] chip free at $(date); starting" >> /tmp/campaign.log

SNAP=runs/r3c_10k/output/snapshot_latest.msgpack
[ -f "$SNAP" ] || SNAP=runs/r3b_10k/output/snapshot_latest.msgpack

timeout 3000 python tools/profiling/ab_occ_refresh_levels.py \
  --snapshot "$SNAP" > runs/AB_occ_levels_r3.log 2>&1
echo "[campaign] occ A/B rc=$? at $(date)" >> /tmp/campaign.log

timeout 4500 python tools/profiling/ab_stoch_corner.py 0 2 1 \
  > runs/AB_stoch_3arm_samesession.log 2>&1
echo "[campaign] stoch A/B rc=$? at $(date)" >> /tmp/campaign.log

timeout 3000 python tools/profiling/ab_dense_levels.py 0 22 \
  > runs/AB_dense_levels.log 2>&1
echo "[campaign] dense-levels A/B rc=$? at $(date)" >> /tmp/campaign.log

timeout 3000 python bench.py > runs/BENCH_r3_defaults.log 2>&1
echo "[campaign] bench rc=$? at $(date)" >> /tmp/campaign.log
echo "[campaign] done at $(date)" >> /tmp/campaign.log
