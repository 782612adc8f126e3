#!/bin/bash
# Round-4 TPU run queue: spool-driven so jobs can be reprioritized while
# the queue runs. Jobs live in /tmp/queue_jobs.txt, one per line:
#   <name> <timeout_s> <command...>
# The runner pops the FIRST line atomically before each run, so editing
# the remaining lines (append/delete/reorder) takes effect immediately.
# Lines starting with '#' are skipped. The queue exits when the spool is
# empty or QUEUE_END passes. Each run writes /tmp/<name>.out and its pid
# to /tmp/<name>.pid so a single stuck/flat run can be killed without
# touching the queue.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

SPOOL=${SPOOL:-/tmp/queue_jobs.txt}
QUEUE_END=${QUEUE_END:-$(($(date +%s) + 30600))}   # default: 8.5h from start
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/queue.log; }

log "queue r4 start (end=$(date -d @$QUEUE_END +%H:%M:%S))"
while true; do
  now=$(date +%s)
  [ "$now" -ge "$QUEUE_END" ] && { log "deadline reached"; break; }
  # pop first line atomically
  line=$(head -n1 "$SPOOL" 2>/dev/null)
  [ -z "$line" ] && { log "spool empty"; break; }
  tail -n +2 "$SPOOL" > "$SPOOL.tmp" && mv "$SPOOL.tmp" "$SPOOL"
  case "$line" in \#*) continue;; esac
  name=$(echo "$line" | awk '{print $1}')
  cap=$(echo "$line" | awk '{print $2}')
  cmd=$(echo "$line" | cut -d' ' -f3-)
  if [ $((now + cap)) -gt "$QUEUE_END" ]; then
    cap=$((QUEUE_END - now))
    if [ "$cap" -lt 420 ]; then log "SKIP $name (deadline)"; continue; fi
    log "TRIM $name cap -> ${cap}s"
  fi
  log "START $name (cap ${cap}s)"
  timeout "$cap" bash -c "echo \$\$ > /tmp/$name.pid; exec $cmd" > "/tmp/$name.out" 2>&1
  log "END $name rc=$?"
  rm -f "/tmp/$name.pid"
  sleep 3
done
log "queue r4 done"
