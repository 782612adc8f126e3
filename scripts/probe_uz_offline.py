"""Offline-distillation probe for the flat UniZero breakout_grid runs.

Round-4 verdict: UniZero is the one family with no conv-env learning
result (v2 best 0.47 / v3 0.17 / 768 3.3 vs MuZero 30.3), while its WM
teacher-forced predictions and its train path both check out. This probe
runs the round-5 prescribed experiment: train UniZero OFFLINE on expert
data (a scripted exact-ball-sim expert that scores ~30/episode, matching
the solved MuZero run), then evaluate ONLINE through the real inference
paths. The outcome localizes the defect:

  raw-policy eval >= 15 AND search eval >= 15
      -> the entire inference stack is fine; the ONLINE loop (search
         targets / exploration / optimization) is what fails;
  raw-policy eval >= 15 but search eval low
      -> the fused search's per-node KV-cache path is defective;
  raw-policy eval low despite policy CE -> ~0
      -> the rolling-KV collect/eval inference path is defective
         (train/inference mismatch).

Reference behavior bar: UniZero learns Atari from pixels
(/root/reference/zoo/atari/config/atari_unizero_config.py:60-67).

Usage: python scripts/probe_uz_offline.py [train_steps] [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lightzero_tpu.config import Config, compile_config
from lightzero_tpu.envs.breakout_grid import BRICK_ROWS, BreakoutGridEnv, S
from lightzero_tpu.models.unizero import UniZeroModel
from lightzero_tpu.policy.muzero import TrainBatch
from lightzero_tpu.utils import POLICY_REGISTRY
import lightzero_tpu.policy.unizero  # noqa: F401

TRAIN_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/probe_uz_offline.json"
# CPU smoke mode: tiny rollouts/evals so the script compile-checks quickly
SMOKE = bool(int(os.environ.get("PROBE_SMOKE", "0")))
EVAL_T = 40 if SMOKE else 500
EVAL_EVERY = 2 if SMOKE else 1000

K = 10  # num_unroll_steps (matches the v3 run)
GAMMA = 0.997
TDN = 5

env = BreakoutGridEnv()


# ----------------------------------------------------------- scripted expert
def predict_landing(s):
    """Exact ball simulation (walls + bricks, no paddle) to the catch row."""

    def body(carry, _):
        r, c, dr, dc, bricks, landed, land_c = carry
        dc2 = jnp.where((c + dc < 0) | (c + dc >= S), -dc, dc)
        dr2 = jnp.where(r + dr < 0, -dr, dr)
        nr, nc = r + dr2, c + dc2
        in_b = (nr >= 1) & (nr < 1 + BRICK_ROWS)
        br = jnp.clip(nr - 1, 0, BRICK_ROWS - 1)
        hit = in_b & bricks[br, nc]
        bricks = bricks.at[br, nc].set(jnp.where(hit, False, bricks[br, nc]))
        dr3 = jnp.where(hit, -dr2, dr2)
        nr = jnp.where(hit, r + dr3, nr)
        at_bottom = nr >= S - 1
        land_c = jnp.where(at_bottom & ~landed, nc, land_c)
        landed = landed | at_bottom
        r2 = jnp.where(landed, r, jnp.clip(nr, 0, S - 1))
        c2 = jnp.where(landed, c, nc)
        return (
            r2, c2, jnp.where(landed, dr, dr3), jnp.where(landed, dc, dc2),
            bricks, landed, land_c,
        ), None

    init = (s.ball_r, s.ball_c, s.dr, s.dc, s.bricks, jnp.zeros((), bool), s.paddle)
    (r, c, dr, dc, b, landed, land_c), _ = jax.lax.scan(body, init, None, length=4 * S)
    return land_c


def expert_action(s):
    target = predict_landing(s)
    return jnp.where(
        s.paddle < target, 2, jnp.where(s.paddle > target, 1, 0)
    ).astype(jnp.int32)


def collect_expert(rng, n_envs=32, T=520, eps_greedy=0.05):
    """Vectorized expert rollout -> (obs, action, reward, done) arrays.
    A dash of epsilon-greedy widens the state distribution so the offline
    learner sees recoveries, not just the expert's narrow tube."""

    def one(rng):
        r0, rng = jax.random.split(rng)
        s, obs = env.reset(r0)

        def body(carry, rng_t):
            s = carry
            re, ra = jax.random.split(rng_t)
            a_star = expert_action(s)
            a_rand = jax.random.randint(ra, (), 0, 3)
            a = jnp.where(jax.random.uniform(re) < eps_greedy, a_rand, a_star)
            step = env.step(s, a.astype(jnp.int32), rng_t)
            # expert label = the EXPERT action at s (not the explored one)
            return step.state, (env.observation(s), a_star, step.reward, step.done)

        rngs = jax.random.split(rng, T)
        _, (obs_seq, act, rew, done) = jax.lax.scan(body, s, rngs)
        return obs_seq, act, rew, done

    return jax.vmap(one)(jax.random.split(rng, n_envs))


def build_dataset(obs, act, rew, done):
    """Windows of K+1 steps that do not cross an episode boundary.
    Value targets: td(n) bootstrapped on the empirical discounted return."""
    N, T = act.shape
    obs, act, rew, done = map(np.asarray, (obs, act, rew, done))
    # discounted return-to-go per position (backward scan, resets at done)
    ret = np.zeros((N, T), np.float32)
    nxt = np.zeros(N, np.float32)
    for t in range(T - 1, -1, -1):
        nxt = rew[:, t] + GAMMA * nxt * (1.0 - done[:, t])
        ret[:, t] = nxt
    # valid window starts: [t, t+K+TDN] has no done inside (conservative)
    horizon = K + TDN
    ok = np.ones((N, T), bool)
    for d in range(horizon):
        idx = np.arange(T) + d
        idx = np.clip(idx, 0, T - 1)
        ok &= ~done[:, idx]
    ok[:, T - horizon - 1 :] = False
    starts = np.argwhere(ok)
    return obs, act, rew, ret, starts


def make_batch(rng_np, obs, act, rew, ret, starts, batch_size, smooth=0.03):
    sel = starts[rng_np.randint(0, len(starts), size=batch_size)]
    b_obs = np.stack([obs[n, t : t + K + 1] for n, t in sel])
    b_act = np.stack([act[n, t : t + K] for n, t in sel])
    b_rew = np.stack([rew[n, t : t + K] for n, t in sel])
    b_val = np.stack([ret[n, t : t + K + 1] for n, t in sel])
    onehot = np.eye(3, dtype=np.float32)[np.stack([act[n, t : t + K + 1] for n, t in sel])]
    b_pol = onehot * (1 - smooth) + smooth / 3.0
    return TrainBatch(
        obs=jnp.asarray(b_obs),
        actions=jnp.asarray(b_act),
        mask=jnp.ones((batch_size, K)),
        target_reward=jnp.asarray(b_rew),
        target_value=jnp.asarray(b_val),
        target_policy=jnp.asarray(b_pol),
        weights=jnp.ones((batch_size,)),
    )


# ------------------------------------------------------------- online evals
def eval_raw_policy(policy, params, rng, n_envs=8, T=EVAL_T):
    """Greedy argmax of the policy head through the ROLLING-KV inference
    path (no search): encode obs -> infer_obs_step -> argmax -> advance
    context with infer_action_step."""
    model = policy.model

    def run(rng):
        r0, rng = jax.random.split(rng)
        s, obs = env.reset(r0)
        cache0 = policy.init_collect_state(1)

        def body(carry, rng_t):
            s, cache, ret, dead = carry
            obs = env.observation(s)[None]
            obs_e = model.apply(params, obs, method=UniZeroModel.encode_obs)
            o_out, cache = model.apply(
                params, cache, obs_e, None, method=UniZeroModel.infer_obs_step
            )
            a = jnp.argmax(o_out["policy_logits"], -1).astype(jnp.int32)
            _, cache = model.apply(
                params, cache, a, None, method=UniZeroModel.infer_action_step
            )
            step = env.step(s, a[0], rng_t)
            ret = ret + step.reward * (1.0 - dead)
            dead = jnp.maximum(dead, step.done.astype(jnp.float32))
            return (step.state, cache, ret, dead), None

        rngs = jax.random.split(rng, T)
        (s, cache, ret, dead), _ = jax.lax.scan(
            body, (s, cache0, jnp.zeros(()), jnp.zeros(())), rngs
        )
        return ret

    return jax.vmap(run)(jax.random.split(rng, n_envs))


def eval_search(policy, params, rng, n_envs=8, T=EVAL_T):
    """Full deterministic search eval through the real stateful path."""

    def run_batch(rng):
        r0, rng = jax.random.split(rng)
        rs = jax.random.split(r0, n_envs)
        s, obs = jax.vmap(env.reset)(rs)
        cache0 = policy.init_collect_state(n_envs)

        def body(carry, rng_t):
            s, cache, ret, dead = carry
            obs = jax.vmap(env.observation)(s)
            legal = jnp.ones((n_envs, 3), bool)
            to_play = jnp.full((n_envs,), -1, jnp.int32)
            out, cache = policy._forward_collect_stateful(
                params, rng_t, obs, legal, to_play,
                jnp.ones(()), jnp.zeros(()), cache, deterministic=True,
            )
            step = jax.vmap(env.step)(s, out["action"], jax.random.split(rng_t, n_envs))
            ret = ret + step.reward * (1.0 - dead)
            dead = jnp.maximum(dead, step.done.astype(jnp.float32))
            cache = policy.reset_collect_state(cache, step.done)
            return (step.state, cache, ret, dead), None

        rngs = jax.random.split(rng, T)
        (s, cache, ret, dead), _ = jax.lax.scan(
            body, (s, cache0, jnp.zeros(n_envs), jnp.zeros(n_envs)), rngs
        )
        return ret

    return run_batch(rng)


def main():
    cfg = Config(dict(
        exp_name="/tmp/probe_uz_offline",
        env=dict(type="breakout_grid"),
        policy=dict(
            type="unizero",
            model=dict(observation_shape=(10, 10, 4), obs_type="image",
                       action_space_size=3,
                       embed_dim=64 if SMOKE else 256,
                       num_layers=1 if SMOKE else 2,
                       num_heads=4 if SMOKE else 8,
                       max_tokens=24, support_scale=50,
                       # A/B hook: PROBE_CTX_WINDOW=8 mirrors the reference
                       # infer_context_length=4 inference trim
                       context_window=int(os.environ.get("PROBE_CTX_WINDOW", "0")),
                       num_channels=16 if SMOKE else 64, downsample=False),
            num_simulations=4 if SMOKE else 50,
            batch_size=8 if SMOKE else 256,
            num_unroll_steps=K, td_steps=TDN,
            learning_rate=5e-4,
            use_adaptive_entropy_weight=False,
            policy_entropy_weight=5e-3,
            predict_latent_loss_type="group_kl",
        ),
    ))
    pol_cls = POLICY_REGISTRY.get("unizero")
    pcfg = compile_config(cfg, pol_cls.default_config(), 0, save_cfg=False).policy
    policy = pol_cls(pcfg)
    rng = jax.random.PRNGKey(0)
    rng, init_rng, d_rng = jax.random.split(rng, 3)
    state = policy.init_train_state(init_rng)

    print("collecting expert data...", flush=True)
    obs, act, rew, done = collect_expert(
        d_rng, n_envs=4 if SMOKE else 32, T=60 if SMOKE else 520
    )
    print(f"  expert mean reward/step {float(np.asarray(rew).mean()):.3f}")
    obs, act, rew, ret, starts = build_dataset(obs, act, rew, done)
    print(f"  dataset windows: {len(starts)}")

    rng_np = np.random.RandomState(0)
    results = {"evals": []}
    B = int(pcfg.batch_size)
    t0 = time.time()
    for step_i in range(1, TRAIN_STEPS + 1):
        batch = make_batch(rng_np, obs, act, rew, ret, starts, B)
        state, logs, _prio = policy.forward_learn(state, batch)
        if step_i % 200 == 0 or step_i == 1:
            print(
                f"step {step_i} ploss {float(logs['policy_loss']):.3f} "
                f"vloss {float(logs['value_loss']):.3f} "
                f"rloss {float(logs['reward_loss']):.3f} "
                f"oloss {float(logs['obs_loss']):.3f} "
                f"ent {float(logs['policy_entropy']):.3f} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
        if step_i % EVAL_EVERY == 0 or step_i == TRAIN_STEPS:
            rng, r1, r2 = jax.random.split(rng, 3)
            raw = eval_raw_policy(policy, state.params, r1)
            srch = eval_search(policy, state.params, r2)
            rec = dict(
                step=step_i,
                raw_policy_eval=float(jnp.mean(raw)),
                search_eval=float(jnp.mean(srch)),
                raw_all=[float(x) for x in raw],
                search_all=[float(x) for x in srch],
                policy_loss=float(logs["policy_loss"]),
            )
            print("EVAL", rec, flush=True)
            results["evals"].append(rec)

    results["train_steps"] = TRAIN_STEPS
    # verdict over the BEST eval round: the search path exercises the full
    # stack (rolling KV + per-node search caches + heads), so a high
    # search_eval clears the whole inference stack even when the raw
    # (search-free) greedy policy is weaker — greedy argmax has no recovery
    # mechanism for off-expert-tube states, search does.
    best_search = max(e["search_eval"] for e in results["evals"])
    best_raw = max(e["raw_policy_eval"] for e in results["evals"])
    results["best_search_eval"] = best_search
    results["best_raw_policy_eval"] = best_raw
    results["verdict"] = (
        "inference stack OK (search_eval >= 15) -> online loop defect"
        if best_search >= 15
        else "search path defect (raw policy OK, search degraded)"
        if best_raw >= 15
        else "rolling-KV inference path defect"
    )
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    # durable params export: lets an online run warm-start from the
    # distilled policy (load_checkpoint_lenient restores it into a fresh
    # TrainState)
    from lightzero_tpu.utils.checkpoint import save_params_export

    export_dir = os.path.join(os.path.dirname(OUT) or ".", "probe_params_best")
    save_params_export(state, export_dir)
    print("params exported to", export_dir)
    print("VERDICT:", results["verdict"])


if __name__ == "__main__":
    main()
