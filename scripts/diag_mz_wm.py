"""MuZero twin of diag_uz_wm.py: probe the SOLVED breakout_grid MuZero
checkpoint's per-action predicted rewards / child values at on-policy
states, especially 1-step-critical ones (some action drops the ball).
Contrast with the flat UniZero runs to localize where UniZero's
action-value signal is lost.

Usage: python scripts/diag_mz_wm.py [ckpt_dir] [T]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np

CKPT = sys.argv[1] if len(sys.argv) > 1 else "data_mz/breakout_grid_muzero_seed0/ckpt/ckpt_best"
T = int(sys.argv[2]) if len(sys.argv) > 2 else 150
CONFIG = os.environ.get(
    "DIAG_CONFIG", "zoo/breakout_grid/config/breakout_grid_muzero_config.py")

spec = importlib.util.spec_from_file_location("diag_cfg", CONFIG)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from lightzero_tpu.config import compile_config
from lightzero_tpu.entry.train_muzero import create_env, load_checkpoint_lenient
from lightzero_tpu.models.muzero import MuZeroModel
from lightzero_tpu.ops import inverse_scalar_transform
from lightzero_tpu.utils import POLICY_REGISTRY

ptype = mod.main_config["policy"]["type"]
cfg = compile_config(mod.main_config, POLICY_REGISTRY.get(ptype).default_config(), 0, save_cfg=False)
policy = POLICY_REGISTRY.get(ptype)(cfg.policy)
state = policy.init_train_state(jax.random.PRNGKey(0))
state = load_checkpoint_lenient(CKPT, target=state)
params = state.params
model = policy.model
env = create_env(cfg.env)
A = env.action_space_size

rng = jax.random.PRNGKey(7)
rng, r0 = jax.random.split(rng)
es, obs = env.reset(r0)

init_inf = jax.jit(lambda o: model.apply(params, o, method=MuZeroModel.initial_inference))
rec_inf = jax.jit(lambda l, a: model.apply(params, l, a, method=MuZeroModel.recurrent_inference))
env_step = jax.jit(env.step)
collect = lambda r, o, lm, tp: policy.forward_collect(
    params, r, o, lm, tp, temperature=0.25, epsilon=0.0)  # jits internally

pred_rows, true_rows, val_rows, done_rows, pol_ents, visit_ents, pred_vals = [], [], [], [], [], [], []
done_ct = 0
for t in range(T):
    o_b = obs[None]
    lm = env.legal_mask(es)[None]
    tp = jnp.full((1,), -1, jnp.int32)
    root = init_inf(o_b)
    pol = jax.nn.softmax(root.policy_logits[0])
    pol_ents.append(float(-jnp.sum(pol * jnp.log(pol + 1e-9))))
    pred_vals.append(float(inverse_scalar_transform(root.value_logits, policy.value_support)[0]))
    rng, pr = jax.random.split(rng)
    p_row, t_row, v_row, d_row = [], [], [], []
    for a in range(A):
        out = rec_inf(root.latent, jnp.asarray([a], jnp.int32))
        p_row.append(float(inverse_scalar_transform(out.reward_logits, policy.reward_support)[0]))
        v_row.append(float(inverse_scalar_transform(out.value_logits, policy.value_support)[0]))
        stp = env_step(es, jnp.asarray(a, jnp.int32), pr)
        t_row.append(float(stp.reward))
        d_row.append(bool(stp.done))
    pred_rows.append(p_row); true_rows.append(t_row)
    val_rows.append(v_row); done_rows.append(d_row)
    rng, cr = jax.random.split(rng)
    out = collect(cr, o_b, lm, tp)
    v = out["visit_counts"][0].astype(jnp.float32)
    vp = v / v.sum()
    visit_ents.append(float(-jnp.sum(vp * jnp.log(vp + 1e-9))))
    stp = env_step(es, out["action"][0], pr)
    es, obs = stp.state, stp.obs
    if bool(stp.done):
        done_ct += 1

P, Tr = np.asarray(pred_rows), np.asarray(true_rows)
V, Dn = np.asarray(val_rows), np.asarray(done_rows)
flat_p, flat_t = P.ravel(), Tr.ravel()
corr = np.corrcoef(flat_p, flat_t)[0, 1] if flat_t.std() > 0 else float("nan")
print(f"ckpt={CKPT} T={T} episodes_done={done_ct}")
print(f"reward corr(pred,true)={corr:.3f}  mean|pred| r_true=0: "
      f"{abs(flat_p[flat_t==0]).mean():.4f}  mean pred @ r_true=1: "
      f"{flat_p[flat_t==1].mean() if (flat_t==1).any() else float('nan'):.4f} (n={int((flat_t==1).sum())})")
print(f"root policy entropy mean={np.mean(pol_ents):.3f} (uniform={np.log(A):.3f})  "
      f"visit entropy mean={np.mean(visit_ents):.3f}")
print(f"pred value mean={np.mean(pred_vals):.3f} min={np.min(pred_vals):.3f} max={np.max(pred_vals):.3f}")
crit = Dn.any(1) & ~Dn.all(1)
if crit.any():
    vc, dc = V[crit], Dn[crit]
    safe_best = np.array([v[~d].max() for v, d in zip(vc, dc)])
    doom_best = np.array([v[d].max() for v, d in zip(vc, dc)])
    print(f"critical states n={crit.sum()}: mean child-value safe={safe_best.mean():.3f} "
          f"vs episode-ending={doom_best.mean():.3f}; model prefers safe action: "
          f"{(safe_best > doom_best).mean():.2f}")
else:
    print("no 1-step-critical states encountered")
print(f"child-value spread mean={(V.max(1)-V.min(1)).mean():.4f}")
