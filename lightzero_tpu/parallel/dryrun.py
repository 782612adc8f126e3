"""Multi-chip dry run, self-contained and platform-forced.

Run as ``python -m lightzero_tpu.parallel.dryrun <n_devices>``: forces the
CPU platform with ``n_devices`` virtual XLA devices (the axon plugin pins
JAX_PLATFORMS, so the env var alone is NOT enough — jax.config.update must
run before backend init), then jits the full MuZero training step over an
n-device 'dp' mesh and executes one step, verifying the sharded numerics
match the single-device step.

This is what __graft_entry__.dryrun_multichip invokes in a subprocess: the
parent process may already have initialized the TPU backend (entry()
compile check), and a JAX backend cannot be switched after first use —
round 1 failed exactly there (MULTICHIP_r01.json: libtpu mismatch because
the dryrun ran against the TPU client instead of a CPU virtual mesh).
"""
from __future__ import annotations

import os
import sys


def _force_cpu(n_devices: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    want = f"--xla_force_host_platform_device_count={n_devices}"
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def run(n_devices: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())} "
        f"({jax.devices()[0].platform})"
    )

    from lightzero_tpu.parallel import make_mesh, dp_train_step
    from lightzero_tpu.policy import MuZeroPolicy
    from lightzero_tpu.policy.muzero import TrainBatch

    cfg = MuZeroPolicy.default_config()
    cfg.model.observation_shape = 4
    cfg.model.action_space_size = 2
    cfg.model.latent_state_dim = 32
    cfg.model.support_scale = 25
    cfg.model.self_supervised_learning_loss = True
    cfg.ssl_loss_weight = 2.0
    cfg.num_simulations = 10

    B = max(8, n_devices * 2)
    K = 5
    A = 2
    cfg.batch_size = B
    policy = MuZeroPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    batch = TrainBatch(
        obs=jnp.ones((B, K + 1, 4), jnp.float32),
        actions=jnp.zeros((B, K), jnp.int32),
        mask=jnp.ones((B, K), jnp.float32),
        target_reward=jnp.ones((B, K), jnp.float32),
        target_value=jnp.ones((B, K + 1), jnp.float32),
        target_policy=jnp.full((B, K + 1, A), 1.0 / A, jnp.float32),
        weights=jnp.ones((B,), jnp.float32),
    )

    # single-device reference step (no donation: state reused below)
    ref_state, ref_logs, _ = jax.jit(policy._forward_learn)(state, batch)
    ref_loss = float(ref_logs["total_loss"])

    mesh = make_mesh(n_devices)
    step = dp_train_step(policy, mesh, donate=False)
    with mesh:
        out_state, logs, priority = step(state, batch)
    jax.block_until_ready(out_state.params)

    loss = float(logs["total_loss"])
    assert np.isfinite(loss), f"non-finite sharded loss {loss}"
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-4, err_msg="dp loss != single-device loss")
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
    dp_leaves = jax.tree_util.tree_leaves(out_state.params)
    for a, b in zip(ref_leaves, dp_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)
    n_used = {d for leaf in jax.tree_util.tree_leaves(priority) for d in leaf.devices()}
    assert len(n_used) == n_devices, f"priority sharded over {len(n_used)} != {n_devices} devices"
    print(
        f"dryrun_multichip({n_devices}): platform={jax.devices()[0].platform} "
        f"total_loss={loss:.4f} (matches single-device {ref_loss:.4f}) OK"
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("N_DEVICES", "8"))
    _force_cpu(n)
    run(n)
