"""Agent bundled-config zoo: every snapshot must compile into a policy +
env without training (role of reference lzero/agent/config/* whose configs
back the HF model zoo)."""
import numpy as np
import pytest

pytestmark = pytest.mark.unittest


def test_every_bundled_config_builds():
    import jax

    from lightzero_tpu.agent import BUNDLED_CONFIGS
    from lightzero_tpu.config import Config, compile_config
    from lightzero_tpu.entry.train_muzero import create_env
    from lightzero_tpu.utils import POLICY_REGISTRY

    n = 0
    for algo, table in BUNDLED_CONFIGS.items():
        for env_key, cfg in table.items():
            cfg = Config(dict(cfg))
            ptype = cfg.get("policy", {}).get("type", algo)
            pcls = POLICY_REGISTRY.get(ptype)
            full = compile_config(cfg, pcls.default_config(), seed=0, save_cfg=False)
            env = create_env(full.env)
            if "alphazero" in ptype:  # env-as-simulator policies take the env
                policy = pcls(full.policy, env)
            else:
                policy = pcls(full.policy)
            assert policy is not None, (algo, env_key)
            # host-env entries (gymnasium ids) return None here; JAX envs
            # must build and report a consistent action space
            if env is not None:
                A = cfg.policy.model.action_space_size
                assert env.action_space_size == A or cfg.policy.model.get(
                    "continuous_action_space", False
                ), (algo, env_key, env.action_space_size, A)
            n += 1
    assert n >= 10, f"bundled zoo shrank to {n} snapshots"


@pytest.mark.slow  # tiny end-to-end train: compile-heavy
def test_agent_train_and_deploy_with_replay(tmp_path):
    """End-to-end: tiny CartPole MuZero train + deploy(enable_save_replay)
    writes episode npz files."""
    import os

    from lightzero_tpu.agent import MuZeroAgent
    from lightzero_tpu.config import Config

    cfg = Config(dict(
        exp_name=str(tmp_path / "exp"),
        env=dict(env_id="CartPole-v0", stop_value=30, collector_env_num=2,
                 evaluator_env_num=2),
        policy=dict(
            model=dict(observation_shape=4, action_space_size=2, model_type="mlp",
                       latent_state_dim=16, support_scale=5),
            num_simulations=4, batch_size=8, update_per_collect=1,
            n_episode=2, eval_freq=10,
        ),
    ))
    agent = MuZeroAgent(cfg=cfg)
    agent.train(max_env_step=40)
    out = agent.deploy(n_episodes=1, enable_save_replay=True,
                       replay_path=str(tmp_path / "replays"))
    assert out["episode_returns"]
    files = os.listdir(tmp_path / "replays")
    assert any(f.startswith("episode_") and f.endswith(".npz") for f in files)
    d = np.load(tmp_path / "replays" / sorted(files)[0])
    assert d["obs"].shape[0] == d["actions"].shape[0] == d["rewards"].shape[0] > 0
