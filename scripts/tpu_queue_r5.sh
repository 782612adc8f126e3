#!/bin/bash
# Round-5 TPU run queue: spool-driven (see tpu_queue_r4b.sh) PLUS the hard
# "drain + warm" end phase the round-4 verdict prescribed (missing #1 /
# weak #1): round 4's official BENCH read 0.0 because a builder job still
# held the chip when the driver's bench ran. This queue guarantees:
#   - no job starts unless it can finish before DRAIN_AT;
#   - any job still alive at DRAIN_AT is killed;
#   - bench.py is then run once to warm the persistent compile cache
#     (result recorded in BENCH_WARM_r05.json);
#   - the chip is left IDLE for the driver's end-of-round bench.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

SPOOL=${SPOOL:-/tmp/queue_jobs.txt}
# default drain: 10.2h from start (round is ~12h; leaves >1.5h margin)
DRAIN_AT=${DRAIN_AT:-$(($(date +%s) + 36720))}
log() { echo "[$(date -u +%H:%M:%S)] $*" >> /tmp/queue.log; }

# wait for an in-flight job from a previous runner (e.g. the connect4 aug
# run carried over from round 4)
for f in /tmp/c4aug.pid /tmp/queue_inflight.pid; do
  if [ -f "$f" ] && kill -0 "$(cat "$f")" 2>/dev/null; then
    log "r5 waiting for in-flight $(basename "$f" .pid)"
    while kill -0 "$(cat "$f")" 2>/dev/null; do
      if [ "$(date +%s)" -ge "$((DRAIN_AT))" ]; then
        log "drain reached while waiting; killing $(basename "$f" .pid)"
        kill "$(cat "$f")" 2>/dev/null
        sleep 20
      fi
      sleep 15
    done
  fi
done

log "queue r5 start (drain at $(date -u -d @$DRAIN_AT +%H:%M:%S) UTC)"
while true; do
  now=$(date +%s)
  [ "$now" -ge "$DRAIN_AT" ] && { log "drain time reached"; break; }
  line=$(head -n1 "$SPOOL" 2>/dev/null)
  [ -z "$line" ] && { sleep 30; continue; }   # idle-wait: spool may be refilled
  tail -n +2 "$SPOOL" > "$SPOOL.tmp" && mv "$SPOOL.tmp" "$SPOOL"
  case "$line" in \#*) continue;; esac
  name=$(echo "$line" | awk '{print $1}')
  cap=$(echo "$line" | awk '{print $2}')
  [ "$name" = "QUIT" ] && { log "QUIT sentinel"; break; }
  cmd=$(echo "$line" | cut -d' ' -f3-)
  if [ $((now + cap)) -gt "$DRAIN_AT" ]; then
    cap=$((DRAIN_AT - now))
    if [ "$cap" -lt 420 ]; then log "SKIP $name (drain deadline)"; continue; fi
    log "TRIM $name cap -> ${cap}s"
  fi
  log "START $name (cap ${cap}s)"
  timeout --kill-after=60 "$cap" bash -c "echo \$\$ > /tmp/$name.pid; exec env $cmd" > "/tmp/$name.out" 2>&1
  log "END $name rc=$?"
  rm -f "/tmp/$name.pid"
  sleep 3
done

# ---------------------------------------------------------- drain + warm
log "DRAIN: ensuring chip is free"
for f in /tmp/*.pid; do
  [ -f "$f" ] || continue
  p=$(cat "$f")
  if kill -0 "$p" 2>/dev/null; then
    log "drain kill $(basename "$f" .pid) ($p)"
    kill "$p" 2>/dev/null
  fi
done
sleep 30
log "WARM: bench.py cache-warm run"
timeout 420 python bench.py > /root/repo/BENCH_WARM_r05.json 2>/tmp/bench_warm.err
log "WARM result: $(cat /root/repo/BENCH_WARM_r05.json 2>/dev/null | head -c 300)"
# second run confirms the cached-compile fast path the driver will hit
timeout 300 python bench.py > /tmp/bench_warm2.json 2>>/tmp/bench_warm.err
log "WARM2 result: $(cat /tmp/bench_warm2.json 2>/dev/null | head -c 300)"
log "queue r5 done — chip idle for the driver"
