"""Diagnose the flat UniZero breakout_grid runs: is the WORLD MODEL wrong
(reward/value predictions carry no action signal) or the SEARCH wiring?

Probes a trained checkpoint along on-policy trajectories:
  per state s_t (with the true rolling KV context):
    for every action a: predicted reward r_hat(s_t, a) from the WM
                        vs true env reward r(s_t, a)
  plus root policy entropy and search visit-count entropy.

If r_hat tracks r across actions but visits stay uniform -> search-side
bug. If r_hat is flat across actions -> the WM/tokenizer never learned
action-conditional dynamics (training-side issue).

Usage: JAX_PLATFORMS=cpu python scripts/diag_uz_wm.py [ckpt_dir] [T]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np

CKPT = sys.argv[1] if len(sys.argv) > 1 else "data_uz/breakout_grid_unizero768_seed0/ckpt/iteration_13000"
T = int(sys.argv[2]) if len(sys.argv) > 2 else 120
CONFIG = os.environ.get(
    "DIAG_CONFIG", "zoo/breakout_grid/config/breakout_grid_unizero_768_config.py")

spec = importlib.util.spec_from_file_location("diag_cfg", CONFIG)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from lightzero_tpu.config import Config, compile_config
from lightzero_tpu.entry.train_muzero import create_env, load_checkpoint_lenient
from lightzero_tpu.models.unizero import UniZeroModel
from lightzero_tpu.ops import inverse_scalar_transform
from lightzero_tpu.utils import POLICY_REGISTRY

cfg = compile_config(mod.main_config, POLICY_REGISTRY.get("unizero").default_config(), 0, save_cfg=False)
policy = POLICY_REGISTRY.get(cfg.policy.type)(cfg.policy)
state = policy.init_train_state(jax.random.PRNGKey(0))
state = load_checkpoint_lenient(CKPT, target=state)
params = state.params
model = policy.model
env = create_env(cfg.env)
A = env.action_space_size

rng = jax.random.PRNGKey(7)
rng, r0 = jax.random.split(rng)
es, obs = env.reset(r0)
cache = policy.init_collect_state(1)

obs_step = jax.jit(lambda c, o: model.apply(
    params, c, model.apply(params, o, method=UniZeroModel.encode_obs),
    None, method=UniZeroModel.infer_obs_step))
act_step = jax.jit(lambda c, a: model.apply(
    params, c, a, None, method=UniZeroModel.infer_action_step))
env_step = jax.jit(env.step)
collect = jax.jit(
    lambda r, o, lm, tp, c: policy._forward_collect_stateful(
        params, r, o, lm, tp, jnp.asarray(0.25), jnp.asarray(0.0), c),
)

pred_rows, true_rows, visit_ents, pol_ents, pred_vals = [], [], [], [], []
val_rows, done_rows = [], []
done_ct = 0
for t in range(T):
    o_b = obs[None]
    lm = env.legal_mask(es)[None]
    tp = jnp.full((1,), -1, jnp.int32)
    # post-obs cache for per-action probes
    o_out, cache2 = obs_step(cache, o_b)
    pol = jax.nn.softmax(o_out["policy_logits"][0])
    pol_ents.append(float(-jnp.sum(pol * jnp.log(pol + 1e-9))))
    pred_vals.append(float(inverse_scalar_transform(
        o_out["value_logits"], policy.value_support)[0]))
    # per-action predicted reward vs true reward (fixed rng for fairness)
    rng, pr = jax.random.split(rng)
    p_row, t_row, v_row, d_row = [], [], [], []
    for a in range(A):
        a_out, c3 = act_step(cache2, jnp.asarray([a], jnp.int32))
        p_row.append(float(inverse_scalar_transform(
            a_out["reward_logits"], policy.reward_support)[0]))
        # child value: predicted next-obs token -> value head (what the
        # search backs up one level down)
        o2, _ = model.apply(params, c3, a_out["obs_pred"], None,
                            method=UniZeroModel.infer_obs_step)
        v_row.append(float(inverse_scalar_transform(
            o2["value_logits"], policy.value_support)[0]))
        stp = env_step(es, jnp.asarray(a, jnp.int32), pr)
        t_row.append(float(stp.reward))
        d_row.append(bool(stp.done))
    pred_rows.append(p_row)
    true_rows.append(t_row)
    val_rows.append(v_row)
    done_rows.append(d_row)
    # true collect step (search) for visit stats + action
    rng, cr = jax.random.split(rng)
    out, cache = collect(cr, o_b, lm, tp, cache)
    v = out["visit_counts"][0].astype(jnp.float32)
    vp = v / v.sum()
    visit_ents.append(float(-jnp.sum(vp * jnp.log(vp + 1e-9))))
    a_sel = out["action"][0]
    stp = env_step(es, a_sel, pr)
    es, obs = stp.state, stp.obs
    if bool(stp.done):
        done_ct += 1
        cache = policy.reset_collect_state(cache, jnp.asarray([True]))

P = np.asarray(pred_rows)  # (T, A)
Tr = np.asarray(true_rows)
flat_p, flat_t = P.ravel(), Tr.ravel()
corr = np.corrcoef(flat_p, flat_t)[0, 1] if flat_t.std() > 0 else float("nan")
spread_p = P.max(1) - P.min(1)
spread_t = Tr.max(1) - Tr.min(1)
informative = spread_t > 0
agree = (P.argmax(1) == Tr.argmax(1))[informative]
print(f"ckpt={CKPT} T={T} episodes_done={done_ct}")
print(f"reward corr(pred,true)={corr:.3f}  "
      f"mean|pred| r_true=0: {abs(flat_p[flat_t==0]).mean():.4f}  "
      f"mean pred @ r_true=1: {flat_p[flat_t==1].mean():.4f} (n={int((flat_t==1).sum())})")
print(f"action-reward spread: pred {spread_p.mean():.4f} vs true {spread_t.mean():.4f}; "
      f"argmax-agreement on informative states: "
      f"{agree.mean() if len(agree) else float('nan'):.3f} (n={int(informative.sum())})")
print(f"root policy entropy mean={np.mean(pol_ents):.3f} (uniform={np.log(A):.3f})  "
      f"visit entropy mean={np.mean(visit_ents):.3f}")
print(f"pred value mean={np.mean(pred_vals):.3f} min={np.min(pred_vals):.3f} max={np.max(pred_vals):.3f}")
# CRITICAL states: some action ends the episode (ball drop), others don't.
V = np.asarray(val_rows)  # (T, A) child values
Dn = np.asarray(done_rows)  # (T, A) true done flags
crit = Dn.any(1) & ~Dn.all(1)
if crit.any():
    vc, dc = V[crit], Dn[crit]
    # does the WM value avoid the episode-ending action?
    safe_best = np.array([v[~d].max() for v, d in zip(vc, dc)])
    doom_best = np.array([v[d].max() for v, d in zip(vc, dc)])
    print(f"critical states n={crit.sum()}: mean child-value safe={safe_best.mean():.3f} "
          f"vs episode-ending={doom_best.mean():.3f}; "
          f"WM prefers safe action: {(safe_best > doom_best).mean():.2f}")
else:
    print("no 1-step-critical states encountered")
print(f"child-value spread mean={(V.max(1)-V.min(1)).mean():.4f}")
