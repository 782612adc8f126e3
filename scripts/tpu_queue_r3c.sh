#!/bin/bash
# Round-3 TPU run queue v3: the axon relay (remote-compile endpoint
# 127.0.0.1:8113) died mid-round, taking the TPU with it. This queue POLLS
# for tunnel recovery, then serializes the prioritized runs. Runs that
# would overrun QUEUE_END are trimmed/skipped so the chip is free for the
# driver's end-of-round bench.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

QUEUE_END=${QUEUE_END:-1787014800}
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/queue.log; }

tcp_probe() {
  python - <<'PY'
import socket, sys
s = socket.socket(); s.settimeout(3)
try:
    s.connect(("127.0.0.1", 8113)); sys.exit(0)
except Exception:
    sys.exit(1)
PY
}

tpu_probe() {  # full client probe: device claim + one executed op
  timeout 180 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones((4,4)).sum()))" >> /tmp/tpu_probe.out 2>&1
}

log "queue v3: waiting for TPU tunnel recovery"
while :; do
  now=$(date +%s)
  if [ "$now" -gt "$QUEUE_END" ]; then log "queue v3: deadline passed, giving up"; exit 0; fi
  if tcp_probe; then
    log "tcp 8113 open, confirming with device probe"
    if tpu_probe; then log "TPU BACK at $(date +%H:%M:%S)"; break; fi
    log "device probe failed, re-polling"
  fi
  sleep 45
done

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 cap=$2; shift 2
  local now; now=$(date +%s)
  if [ $((now + cap)) -gt "$QUEUE_END" ]; then
    cap=$((QUEUE_END - now))
    if [ "$cap" -lt 600 ]; then log "SKIP $name (deadline)"; return; fi
    log "TRIM $name cap -> ${cap}s (deadline)"
  fi
  log "START $name (cap ${cap}s)"
  timeout "$cap" "$@" > "/tmp/$name.out" 2>&1
  log "END $name rc=$?"
  sleep 5
}

run uz768     2400 python zoo/breakout_grid/config/breakout_grid_unizero_768_config.py
run c4resume  2700 python zoo/board_games/connect4/config/connect4_muzero_resume_config.py
run scalezero 4500 python zoo/multitask/config/pendulum_suite_scalezero_config.py
run memory100 3300 python zoo/memory/config/memory100_unizero_config.py
run gomoku    3000 python zoo/board_games/gomoku/config/gomoku_alphazero_bot_mode_config.py
run freeway   2700 python zoo/minatar/config/freeway_muzero_config.py
run invaders  2700 python zoo/minatar/config/space_invaders_efficientzero_config.py

# ALWAYS warm the persistent XLA compile cache for the driver's bench run
log "START benchwarm"
timeout 280 python bench.py > /tmp/benchwarm.out 2>&1
log "END benchwarm rc=$? ($(tail -c 300 /tmp/benchwarm.out))"
log "queue v3 done"
