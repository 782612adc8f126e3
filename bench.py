"""Benchmark: MCTS simulations/sec/chip on the fused JAX search.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

North-star (BASELINE.json): batched mctx-style search fused with nets vs
the reference's C++ ctree + torch-CPU nets loop
(/root/reference/lzero/mcts/tree_search/mcts_ctree.py:293-366). The
reference baseline is measured once (scripts/measure_reference_baseline.py,
torch CPU) and cached in BASELINE_MEASURED.json; vs_baseline = ours / ref.

Budgeted for a COLD process on a tunneled chip (round-2 lesson: rc=124):
- primary measurement at batch=1024 (compile is cached persistently);
- JSON is emitted as soon as the first timed round completes if the
  elapsed wall-clock is already high;
- a watchdog thread force-emits the best-so-far result at T_HARD seconds
  so the driver ALWAYS gets a line even if a later compile hangs;
- batch=4096 is attempted only with ample remaining budget.
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T_START = time.perf_counter()
T_HARD = float(os.environ.get("LZT_BENCH_DEADLINE_S", "230"))  # force-emit by then

_BEST = {"result": None}
_EMITTED = threading.Event()


def _emit_and_exit():
    if _EMITTED.is_set():
        return
    _EMITTED.set()
    r = _BEST["result"]
    if r is None:
        r = {
            "metric": "mcts_sims_per_sec_per_chip",
            "value": 0.0,
            "unit": "sims/s (no measurement completed within deadline)",
            "vs_baseline": None,
        }
    print(json.dumps(r), flush=True)


def _watchdog():
    while not _EMITTED.is_set():
        if time.perf_counter() - T_START > T_HARD:
            _emit_and_exit()
            os._exit(0)
        time.sleep(1.0)


# The watchdog must be armed BEFORE jax backend init: a dead device tunnel
# can hang jax.devices()/the first compile indefinitely, and the driver
# still needs its one JSON line (round-3 lesson: the axon relay died
# mid-round and even trivial device ops blocked forever).
threading.Thread(target=_watchdog, daemon=True).start()

import jax
import jax.numpy as jnp

from lightzero_tpu.utils.jax_setup import setup_jax

setup_jax()


def elapsed():
    return time.perf_counter() - T_START


def _record(sims_per_sec, latency, batch_size, baseline):
    cur = _BEST["result"]
    if cur is not None and cur["value"] >= sims_per_sec:
        return
    _BEST["result"] = {
        "metric": "mcts_sims_per_sec_per_chip",
        "value": round(sims_per_sec, 1),
        "unit": "sims/s (batch=%d, 50 sims, 128-d latent MuZero MLP, search+nets fused)"
        % batch_size,
        "vs_baseline": round(sims_per_sec / baseline, 2) if baseline else None,
        "search_latency_ms": round(latency * 1e3, 2),
    }


def bench_search(policy, params, batch_size, num_simulations=50, num_actions=4, iters=5):
    obs = jnp.ones((batch_size, 8), jnp.float32)
    legal = jnp.ones((batch_size, num_actions), bool)
    rng = jax.random.PRNGKey(1)

    def run(rng):
        out = policy._forward_collect(
            params,
            rng,
            obs,
            legal,
            jnp.full((batch_size,), -1, jnp.int32),
            jnp.asarray(1.0, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            deterministic=False,
        )
        return out["action"], out["searched_value"]

    jit_run = jax.jit(run)
    jax.block_until_ready(jit_run(rng))  # compile (persistent-cache hit on rerun)

    # first timed round — this alone is a valid measurement
    best_dt = float("inf")
    rounds = 0
    while rounds < 3:
        t0 = time.perf_counter()
        for _ in range(iters):
            rng, r = jax.random.split(rng)
            out = jit_run(r)
        jax.block_until_ready(out)
        best_dt = min(best_dt, (time.perf_counter() - t0) / iters)
        rounds += 1
        yield batch_size * num_simulations / best_dt, best_dt


def main():
    baseline = None
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f).get("ctree_sims_per_sec")

    from lightzero_tpu.policy import MuZeroPolicy

    cfg = MuZeroPolicy.default_config()
    cfg.model.observation_shape = 8
    cfg.model.action_space_size = 4
    cfg.model.latent_state_dim = 128
    cfg.model.support_scale = 300
    cfg.num_simulations = 50
    # A/B hook for the pallas fused-traverse kernel (exact-parity tested);
    # LZT_PALLAS=1 measures the kernel path vs the default XLA path
    cfg.use_pallas_traverse = os.environ.get("LZT_PALLAS") == "1"
    policy = MuZeroPolicy(cfg)
    params = policy.model.init_params(jax.random.PRNGKey(0), batch_size=2)

    # primary: batch=1024 — record after EVERY timed round so the watchdog
    # always has a number once the first round lands
    for sims, dt in bench_search(policy, params, 1024):
        _record(sims, dt, 1024, baseline)
        if elapsed() > T_HARD - 30:
            break

    # escalate to batch=4096 with a modest remaining budget: measured on
    # this tunnel (round 5), the FIRST executable load in a process pays
    # ~100-125s of remote-compile-channel attach but each ADDITIONAL
    # cache-warm executable loads in ~20s — so after the 1024 round
    # (~165s elapsed) the 4096 round needs only ~25s, and the watchdog
    # still force-emits the 1024 number if anything drags
    if elapsed() < T_HARD - 40:
        try:
            for sims, dt in bench_search(policy, params, 4096):
                _record(sims, dt, 4096, baseline)
                if elapsed() > T_HARD - 30:
                    break
        except Exception:
            pass  # keep the batch=1024 number

    _emit_and_exit()


if __name__ == "__main__":
    main()
