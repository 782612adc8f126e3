#!/bin/bash
# Round-4b TPU run queue: spool-driven (see tpu_queue_r4.sh). Fixes the
# env-var-prefix job format: jobs run via `exec env <cmd>` so lines like
#   name 1200 VAR=x python script.py
# work (plain `exec VAR=x ...` execs the assignment string and rc=127s).
# Also waits for any job left in flight by a previous runner before
# starting (pid files /tmp/<name>.pid).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

SPOOL=${SPOOL:-/tmp/queue_jobs.txt}
QUEUE_END=${QUEUE_END:-$(($(date +%s) + 32400))}   # default: 9h from start
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/queue.log; }

# wait for an in-flight job from a previous runner
for f in /tmp/uzbg256v2.pid /tmp/queue_inflight.pid; do
  if [ -f "$f" ] && kill -0 "$(cat "$f")" 2>/dev/null; then
    log "r4b waiting for in-flight $(basename "$f" .pid)"
    while kill -0 "$(cat "$f")" 2>/dev/null; do sleep 15; done
  fi
done

log "queue r4b start (end=$(date -d @$QUEUE_END +%H:%M:%S))"
while true; do
  now=$(date +%s)
  [ "$now" -ge "$QUEUE_END" ] && { log "deadline reached"; break; }
  line=$(head -n1 "$SPOOL" 2>/dev/null)
  [ -z "$line" ] && { sleep 30; continue; }   # idle-wait: spool may be refilled
  tail -n +2 "$SPOOL" > "$SPOOL.tmp" && mv "$SPOOL.tmp" "$SPOOL"
  case "$line" in \#*) continue;; esac
  name=$(echo "$line" | awk '{print $1}')
  cap=$(echo "$line" | awk '{print $2}')
  [ "$name" = "QUIT" ] && { log "QUIT sentinel"; break; }
  cmd=$(echo "$line" | cut -d' ' -f3-)
  if [ $((now + cap)) -gt "$QUEUE_END" ]; then
    cap=$((QUEUE_END - now))
    if [ "$cap" -lt 420 ]; then log "SKIP $name (deadline)"; continue; fi
    log "TRIM $name cap -> ${cap}s"
  fi
  log "START $name (cap ${cap}s)"
  timeout "$cap" bash -c "echo \$\$ > /tmp/$name.pid; exec env $cmd" > "/tmp/$name.out" 2>&1
  log "END $name rc=$?"
  rm -f "/tmp/$name.pid"
  sleep 3
done
log "queue r4b done"
