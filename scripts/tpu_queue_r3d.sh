#!/bin/bash
# Round-3 TPU run queue v4 (post-restart): the sandbox restarted and the
# tunnel came BACK — serialize the remaining capability runs directly
# (no recovery polling needed). Runs that would overrun QUEUE_END are
# trimmed/skipped so the chip is free for the driver's end-of-round bench.
# Every entry trains with continuous JSONL logging, so a timeout-capped
# run still leaves a learning curve in its exp dir.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

QUEUE_END=${QUEUE_END:-1787032380}
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/queue.log; }

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 cap=$2; shift 2
  local now; now=$(date +%s)
  if [ $((now + cap)) -gt "$QUEUE_END" ]; then
    cap=$((QUEUE_END - now))
    if [ "$cap" -lt 420 ]; then log "SKIP $name (deadline)"; return; fi
    log "TRIM $name cap -> ${cap}s (deadline)"
  fi
  log "START $name (cap ${cap}s)"
  timeout "$cap" "$@" > "/tmp/$name.out" 2>&1
  log "END $name rc=$?"
  sleep 3
}

run uz768     780 python zoo/breakout_grid/config/breakout_grid_unizero_768_config.py
run memory100 720 python zoo/memory/config/memory100_unizero_config.py
run freeway   660 python zoo/minatar/config/freeway_muzero_config.py
run invaders  540 python zoo/minatar/config/space_invaders_efficientzero_config.py

# bench.py already ran clean this session (3.99M sims/s, rc=0) and the
# persistent XLA compile cache is warm — leave the chip free after the
# queue for the driver's end-of-round bench.
log "queue v4 done"
