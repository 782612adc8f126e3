"""Overfit probe for the UniZero image-path policy head.

Breakout-grid UniZero runs (768 and 256-v2) log policy_entropy pinned at
log(3) and policy_logits_max ~0.08 for 11k+ train iters while value/reward/
obs losses all train — either the stored targets are uniform (collect-side)
or the policy CE path is broken on the image path. This probe isolates the
TRAIN path: synthetic batches whose target_policy at step t is a one-hot
function of the observation at step t. If the policy CE drops well below
log(3), the train path is clean and the failure is collect-side.
"""
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from lightzero_tpu.config import Config, compile_config
from lightzero_tpu.policy.muzero import TrainBatch
from lightzero_tpu.utils.registry import POLICY_REGISTRY
import lightzero_tpu.policy.unizero  # noqa: F401  (register)

K = 5
A = 3

main_config = Config(dict(
    exp_name="/tmp/diag_uz_policy_path",
    env=dict(type="breakout_grid"),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=(10, 10, 4), obs_type="image",
                   action_space_size=A, embed_dim=64, num_layers=1,
                   num_heads=4, max_tokens=2 * K + 2, support_scale=50,
                   num_channels=16, downsample=False),
        num_simulations=4, batch_size=32, update_per_collect=1,
        num_unroll_steps=K, td_steps=K,
        use_adaptive_entropy_weight=False, policy_entropy_weight=5e-3,
        predict_latent_loss_type="group_kl",
    ),
))

pol_cls = POLICY_REGISTRY.get("unizero")
cfg = compile_config(main_config, pol_cls.default_config(), 0, save_cfg=False).policy
pol = pol_cls(cfg)
rng = jax.random.PRNGKey(0)
params = pol.init_train_state(rng).params

B = 32


def make_batch(key):
    ks = jax.random.split(key, 3)
    obs = jax.random.uniform(ks[0], (B, K + 1, 10, 10, 4))
    # decisive target: argmax over 3 coarse obs statistics per step
    stat = jnp.stack([obs[..., 0].mean((-1, -2)),
                      obs[..., 1].mean((-1, -2)),
                      obs[..., 2].mean((-1, -2))], -1)  # (B, K+1, 3)
    tp = jax.nn.one_hot(jnp.argmax(stat, -1), A)
    actions = jax.random.randint(ks[1], (B, K), 0, A)
    return TrainBatch(
        obs=obs, actions=actions, mask=jnp.ones((B, K)),
        target_reward=jnp.zeros((B, K)), target_value=jnp.zeros((B, K + 1)),
        target_policy=tp, weights=jnp.ones((B,)),
    )


opt = optax.adamw(1e-3)
opt_state = opt.init(params)


@jax.jit
def step(params, opt_state, key):
    batch = make_batch(key)

    def loss_fn(p):
        losses, extra, logs, _prio = pol._sample_losses(p, batch)
        return jnp.mean(losses) + extra, logs

    (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, logs


for i in range(401):
    rng, k = jax.random.split(rng)
    params, opt_state, logs = step(params, opt_state, k)
    if i % 50 == 0:
        print(f"iter {i:4d} policy_loss {float(logs['policy_loss']):.4f} "
              f"(uniform={(K + 1) * np.log(A):.3f}) "
              f"entropy {float(logs['policy_entropy']):.4f} "
              f"logits_max {float(logs['policy_logits_max']):.3f}")

pl = float(logs["policy_loss"])
print("VERDICT:", "TRAIN PATH LEARNS" if pl < 0.5 * (K + 1) * np.log(A)
      else "TRAIN PATH BROKEN")
