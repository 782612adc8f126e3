"""Measure world-model reward hallucination under AUTOREGRESSIVE rollout.

Round-5 hypothesis for the flat online UniZero runs: teacher-forced
diagnostics are perfect (round-4 diag_uz_wm), but the SEARCH rolls the WM
autoregressively (obs_pred fed back as the next obs token,
policy/unizero.py:_recurrent_fn) and the reward/value heads are never
trained on those self-generated tokens — so the search can hallucinate
rewards, producing decisive-but-wrong visit targets (v5 telemetry: visit
entropy 0.6 while real returns stay 0.2, searched_value 1-2.5 vs true
~0.2).

This probe quantifies it: from real on-policy states (true rolling
context), roll the WM D steps with a FIXED action sequence twice —
(a) teacher-forced with the real next observations, (b) autoregressively
with obs_pred fed back — and compare both predicted reward sequences to
the true env rewards for that same action sequence.

Usage: python scripts/diag_uz_hallucination.py <ckpt> [config] [depth]
"""
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DIAG_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from lightzero_tpu.config import compile_config
from lightzero_tpu.entry.train_muzero import create_env, load_checkpoint_lenient
from lightzero_tpu.models.unizero import UniZeroModel
from lightzero_tpu.ops import inverse_scalar_transform
from lightzero_tpu.utils import POLICY_REGISTRY

CKPT = sys.argv[1] if len(sys.argv) > 1 else (
    "data_uz/breakout_grid_unizero_v5_seed0/ckpt/iteration_4096")
CONFIG = sys.argv[2] if len(sys.argv) > 2 else (
    "zoo/breakout_grid/config/breakout_grid_unizero_v5_config.py")
DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 5
T_WARM = 30   # on-policy warmup steps before each probe
N_PROBES = 40

spec = importlib.util.spec_from_file_location("diag_cfg", CONFIG)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

cfg = compile_config(mod.main_config,
                     POLICY_REGISTRY.get("unizero").default_config(), 0,
                     save_cfg=False)
policy = POLICY_REGISTRY.get(cfg.policy.type)(cfg.policy)
state = policy.init_train_state(jax.random.PRNGKey(0))
state = load_checkpoint_lenient(CKPT, target=state)
params = state.params
model = policy.model
env = create_env(cfg.env)

enc = jax.jit(lambda o: model.apply(params, o, method=UniZeroModel.encode_obs))
obs_step = jax.jit(lambda c, e: model.apply(
    params, c, e, None, method=UniZeroModel.infer_obs_step))
act_step = jax.jit(lambda c, a: model.apply(
    params, c, a, None, method=UniZeroModel.infer_action_step))


def reward_of(logits):
    return float(inverse_scalar_transform(
        logits[None], policy.reward_support)[0])


rng = jax.random.PRNGKey(3)
rows = []
for probe in range(N_PROBES):
    rng, r0 = jax.random.split(rng)
    s, obs = env.reset(r0)
    cache = policy.init_collect_state(1)
    # on-policy-ish warmup with random actions to land on a realistic state
    for t in range(int(jax.random.randint(r0, (), 5, T_WARM))):
        rng, ra, rs = jax.random.split(rng, 3)
        _, cache = obs_step(cache, enc(env.observation(s)[None]))
        a = jax.random.randint(ra, (1,), 0, env.action_space_size)
        _, cache = act_step(cache, a)
        s = env.step(s, a[0], rs).state
    # fixed random action sequence for the probe
    rng, rs = jax.random.split(rng)
    acts = np.asarray(jax.random.randint(rs, (DEPTH,), 0, env.action_space_size))

    # ground truth env rewards
    true_r, s_t = [], s
    for d in range(DEPTH):
        rng, rr = jax.random.split(rng)
        stp = env.step(s_t, jnp.asarray(acts[d]), rr)
        true_r.append(float(stp.reward))
        s_t = stp.state

    # (a) teacher-forced: real obs each step
    tf_r, cache_a, s_t = [], cache, s
    for d in range(DEPTH):
        _, cache_a = obs_step(cache_a, enc(env.observation(s_t)[None]))
        out, cache_a = act_step(cache_a, jnp.asarray(acts[d : d + 1]))
        tf_r.append(reward_of(out["reward_logits"][0]))
        rng, rr = jax.random.split(rng)
        s_t = env.step(s_t, jnp.asarray(acts[d]), rr).state

    # (b) autoregressive: obs_pred fed back (the search's rollout) — also
    # track the VALUE head at each drifted obs token (the search backs up
    # V(leaf) from exactly these tokens)
    ar_r, ar_v, cache_b = [], [], cache
    o_out, cache_b = obs_step(cache_b, enc(env.observation(s)[None]))
    root_v = float(inverse_scalar_transform(
        o_out["value_logits"], policy.value_support)[0])
    for d in range(DEPTH):
        out, cache_b = act_step(cache_b, jnp.asarray(acts[d : d + 1]))
        ar_r.append(reward_of(out["reward_logits"][0]))
        o_out2, cache_b = obs_step(cache_b, out["obs_pred"])
        ar_v.append(float(inverse_scalar_transform(
            o_out2["value_logits"], policy.value_support)[0]))
    rows.append((true_r, tf_r, ar_r, root_v, ar_v))

true = np.array([r[0] for r in rows])
tf = np.array([r[1] for r in rows])
ar = np.array([r[2] for r in rows])
root_v = np.array([r[3] for r in rows])
ar_v = np.array([r[4] for r in rows])
print(f"VALUE root (real token) mean: {root_v.mean():.3f}")
print(f"VALUE at AR-drifted tokens, depth-wise mean: {ar_v.mean(0).round(3)}")
print(f"VALUE at AR-drifted tokens, depth-wise max:  {ar_v.max(0).round(3)}")
print(f"depth-wise mean |err| teacher-forced: {np.abs(tf - true).mean(0).round(3)}")
print(f"depth-wise mean |err| autoregressive: {np.abs(ar - true).mean(0).round(3)}")
print(f"true reward rate: {true.mean():.3f}")
print(f"TF predicted rate: {tf.mean():.3f}   AR predicted rate: {ar.mean():.3f}")
# hallucination: AR predicts >0.5 where truth is 0
halluc = float(((ar > 0.5) & (true < 0.5)).mean())
miss = float(((ar < 0.5) & (true > 0.5)).mean())
print(f"AR hallucination rate (pred+1 where true 0): {halluc:.3f}")
print(f"AR miss rate (pred 0 where true +1): {miss:.3f}")
tf_h = float(((tf > 0.5) & (true < 0.5)).mean())
print(f"TF hallucination rate: {tf_h:.3f}")
