#!/bin/bash
# Post-drain CPU evaluations (round 5): after the TPU queue drains at
# 00:45 UTC and warms the bench cache, the chip must stay IDLE for the
# driver's end-of-round bench — but the CPU is free. This script waits for
# the drain, then runs the re-eval harnesses on the CPU backend (slow but
# chip-safe) for any run that finished too late for an on-chip eval slot.
# Results land in the usual <exp>/eval_verdict.json files.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
WAIT_UNTIL=${WAIT_UNTIL:-1787186820}   # 00:47 UTC
while [ "$(date +%s)" -lt "$WAIT_UNTIL" ]; do sleep 30; done
log() { echo "[$(date -u +%H:%M:%S)] $*" >> /tmp/post_drain.log; }
log "post-drain evals start"

if [ -d data_mz/connect4_muzero_ft_seed0/ckpt/ckpt_best ] || \
   [ -d data_mz/connect4_muzero_ft_seed0/ckpt/params_best ]; then
  log "c4ft eval"
  JAX_PLATFORMS=cpu C4_EVAL_EXP=data_mz/connect4_muzero_ft_seed0 \
    C4_EVAL_EPISODES=32 C4_EVAL_CKPTS=ckpt_best,params_best \
    timeout 5400 python scripts/eval_connect4_best.py >> /tmp/post_drain.log 2>&1
  log "c4ft eval rc=$?"
fi

if [ -d data_mt/pendulum_suite_scalezero_v3_seed0/ckpt/params_best ] || \
   [ -d data_mt/pendulum_suite_scalezero_v3_seed0/ckpt/ckpt_best ]; then
  log "szv3 eval"
  JAX_PLATFORMS=cpu timeout 5400 python scripts/eval_scalezero_best.py \
    zoo/multitask/config/pendulum_suite_scalezero_v3_config.py 12 \
    >> /tmp/post_drain.log 2>&1
  log "szv3 eval rc=$?"
fi
if [ -d data_mz/tictactoe_muzero_v2_seed0/ckpt ]; then
  log "benchmark rescore (tictactoe_muzero + connect4 rows)"
  JAX_PLATFORMS=cpu LZT_BENCH_CHECK_ONLY=1 timeout 5400 \
    python zoo/eval_benchmark.py tictactoe_muzero connect4_muzero connect4_muzero_ft \
    >> /tmp/post_drain.log 2>&1
  log "benchmark rescore rc=$?"
fi
log "post-drain evals done"
