#!/bin/bash
# Poll the axon remote-compile tunnel; when it answers, launch the honest
# 10k-step two-stage composite run (VERDICT round-1 item #4) in the background.
# Writes its own pid to /tmp/run10k.pid so the session can stop it cleanly.
set -u
LOG=/root/repo/runs/RUN_r2_composite10k.log
for attempt in 1 2 3; do
  while true; do
    if curl -s -m 3 -o /dev/null http://127.0.0.1:8103/; then
      echo "[watch] tunnel answered at $(date)" >> /tmp/tunnel_watch.log
      break
    fi
    sleep 60
  done
  # quick sanity: can JAX actually see the device?
  if ! timeout 300 python -c "import jax; assert any(d.platform != 'cpu' for d in jax.devices()), jax.devices(); print('device ok', jax.devices())" >> /tmp/tunnel_watch.log 2>&1; then
    echo "[watch] jax device check failed at $(date); waiting" >> /tmp/tunnel_watch.log
    sleep 120
    continue
  fi
  cd /root/repo
  python tools/run_composite_10k.py > "$LOG" 2>&1 &
  echo $! > /tmp/run10k.pid
  echo "[watch] attempt $attempt: launched run pid $(cat /tmp/run10k.pid) at $(date)" >> /tmp/tunnel_watch.log
  wait $(cat /tmp/run10k.pid)
  rc=$?
  echo "[watch] run exited rc=$rc at $(date)" >> /tmp/tunnel_watch.log
  if [ $rc -eq 0 ]; then
    echo "[watch] run SUCCEEDED" >> /tmp/tunnel_watch.log
    # post-run TPU checklist, unattended (each bounded; failures non-fatal)
    echo "[watch] ab_stoch_corner:" >> /tmp/tunnel_watch.log
    timeout 3000 python tools/profiling/ab_stoch_corner.py 0 2 1 \
      > /tmp/ab_stoch_corner.log 2>&1
    tail -5 /tmp/ab_stoch_corner.log >> /tmp/tunnel_watch.log
    echo "[watch] bench:" >> /tmp/tunnel_watch.log
    timeout 3000 python bench.py > /tmp/bench_r2.log 2>&1
    tail -2 /tmp/bench_r2.log >> /tmp/tunnel_watch.log
    exit 0
  fi
done
echo "[watch] giving up after 3 attempts" >> /tmp/tunnel_watch.log
exit 1
