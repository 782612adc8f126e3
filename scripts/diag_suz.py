"""Root-cause diagnostic for the flat Sampled-UniZero pendulum run:
loads the run's ckpt_best on CPU and inspects, at real env states,

  1. root visit counts (uniform over K candidates == no search signal;
     policy_loss pinned at (K+1)*ln(Ks) says exactly that),
  2. per-candidate one-step (reward, next-value) from the world model —
     whether ANYTHING differentiates the sampled actions,
  3. mu / sigma of the root Gaussian.

Usage: python scripts/diag_suz.py [exp_dir]
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import importlib.util

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from lightzero_tpu.models.unizero import UniZeroModel
from lightzero_tpu.policy.sampled_muzero import gaussian_tanh_sample
from lightzero_tpu.policy.sampled_unizero import SampledUniZeroPolicy
from lightzero_tpu.envs.pendulum import PendulumEnv
from lightzero_tpu.ops import inverse_scalar_transform
from lightzero_tpu.utils.checkpoint import load_checkpoint

spec = importlib.util.spec_from_file_location(
    "cfg", "zoo/classic_control/pendulum/config/pendulum_sampled_unizero_config.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
from lightzero_tpu.config import compile_config

cfg = compile_config(m.main_config, SampledUniZeroPolicy.default_config(), 0,
                     save_cfg=False)
exp = sys.argv[1] if len(sys.argv) > 1 else cfg["exp_name"]

policy = SampledUniZeroPolicy(cfg.policy)
state = policy.init_train_state(jax.random.PRNGKey(0))
state = load_checkpoint(f"{exp}/ckpt/ckpt_best", target=state)
params = state.params
print("loaded", exp, "iter", int(state.train_iter))

env = PendulumEnv()
rng = jax.random.PRNGKey(3)
# a few states along a random rollout
s, obs = env.reset(rng)
obs_list = [obs]
for i in range(3):
    rng, a_rng, s_rng = jax.random.split(rng, 3)
    out = env.step(s, jax.random.uniform(a_rng, (), minval=-1, maxval=1), s_rng)
    s = out.state
    obs_list.append(out.obs)
obs = jnp.stack(obs_list)  # (4, 3)
B = obs.shape[0]

# --- replicate _forward_collect_stateful internals with instrumentation
model = policy.model
cache0 = policy.init_collect_state(B)
obs_e = model.apply(params, obs, method=UniZeroModel.encode_obs)
o_out, cache = model.apply(params, cache0, obs_e, policy._task_ids(B),
                           method=UniZeroModel.infer_obs_step)
mu, sigma = np.asarray(o_out["mu"]), np.asarray(o_out["sigma"])
print("root mu", mu.ravel())
print("root sigma", sigma.ravel())
pred_value = inverse_scalar_transform(o_out["value_logits"], policy.value_support)
print("root value", np.asarray(pred_value).ravel())

rng, r_rng, s_rng = jax.random.split(rng, 3)
root_actions, root_logp = gaussian_tanh_sample(r_rng, o_out["mu"], o_out["sigma"], policy.K)

# per-candidate one-step lookahead: reward + next-state value
rews, vals = [], []
for k in range(policy.K):
    a_vec = root_actions[:, k]
    a_out, c2 = model.apply(params, cache, a_vec, policy._task_ids(B),
                            method=UniZeroModel.infer_action_step)
    o2, _ = model.apply(params, c2, a_out["obs_pred"], policy._task_ids(B),
                        method=UniZeroModel.infer_obs_step)
    rews.append(np.asarray(inverse_scalar_transform(a_out["reward_logits"], policy.reward_support)))
    vals.append(np.asarray(inverse_scalar_transform(o2["value_logits"], policy.value_support)))
rews, vals = np.stack(rews, 1), np.stack(vals, 1)  # (B, K)
print("candidate actions[0]", np.asarray(root_actions)[0].ravel())
print("per-candidate reward[0]", rews[0].ravel().round(3))
print("per-candidate next-value[0]", vals[0].ravel().round(2))
print("reward spread (std over K):", rews.std(1).round(4))
print("value  spread (std over K):", vals.std(1).round(4))

# --- the real search
from lightzero_tpu.search import RootOutput, batch_puct_search

root = RootOutput(prior_logits=root_logp, value=pred_value,
                  embedding=dict(cache=cache, sampled_actions=root_actions))
search_out = batch_puct_search(
    params, s_rng, root, policy._recurrent_fn, policy.search_cfg,
    jnp.ones((B, policy.K), bool),
    to_play=jnp.full((B,), -1, jnp.int32), with_noise=False,
)
vc = np.asarray(search_out.visit_counts)
print("visit counts:\n", vc)
print("visit max/min per row:", vc.max(1), vc.min(1))
print("searched root value", np.asarray(search_out.root_value).ravel())
