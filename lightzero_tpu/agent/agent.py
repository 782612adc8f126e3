"""High-level Agent API.

Capability-parity rebuild of reference lzero/agent (agent/muzero.py:29):
``Agent(env_id or cfg).train(step)`` / ``.deploy()`` / ``.batch_evaluate()``
with bundled per-env default configs, so a user can train/evaluate without
writing a config file.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax

from lightzero_tpu.config import Config
from lightzero_tpu.agent.configs import BUNDLED_CONFIGS as _ZOO

# legacy aliases kept for backward compatibility; the canonical bundled
# snapshot zoo lives in lightzero_tpu/agent/configs.py (role of
# lzero/agent/config/<algo>/<env>.py)
_LEGACY_CONFIGS: Dict[str, Dict[str, Config]] = {
    "muzero": {
        "CartPole-v0": Config(
            dict(
                env=dict(env_id="CartPole-v0", stop_value=195, collector_env_num=8,
                         evaluator_env_num=3, n_evaluator_episode=3),
                policy=dict(
                    model=dict(observation_shape=4, action_space_size=2, model_type="mlp",
                               latent_state_dim=128, self_supervised_learning_loss=True),
                    num_simulations=25, batch_size=256, update_per_collect=100,
                    n_episode=8, eval_freq=100, ssl_loss_weight=2, learning_rate=0.003,
                ),
            )
        ),
        "Pendulum-v1": Config(
            dict(
                env=dict(env_id="Pendulum-v1", stop_value=-250, collector_env_num=8,
                         evaluator_env_num=3, n_evaluator_episode=3),
                policy=dict(
                    type="sampled_muzero",
                    model=dict(observation_shape=3, action_space_size=1, latent_state_dim=128),
                    num_simulations=50, num_of_sampled_actions=20, batch_size=256,
                    update_per_collect=100, n_episode=8, eval_freq=200, ssl_loss_weight=2,
                ),
            )
        ),
    },
    "efficientzero": {
        "CartPole-v0": Config(
            dict(
                env=dict(env_id="CartPole-v0", stop_value=195, collector_env_num=8,
                         evaluator_env_num=3, n_evaluator_episode=3),
                policy=dict(
                    type="efficientzero",
                    model=dict(observation_shape=4, action_space_size=2, model_type="mlp",
                               latent_state_dim=128, lstm_hidden_size=128),
                    num_simulations=25, batch_size=256, update_per_collect=100,
                    n_episode=8, eval_freq=100,
                ),
            )
        ),
    },
    "stochastic_muzero": {
        "game_2048": Config(
            dict(
                env=dict(env_id="game_2048", stop_value=int(1e9), collector_env_num=8,
                         evaluator_env_num=3, n_evaluator_episode=3),
                policy=dict(
                    type="stochastic_muzero",
                    model=dict(observation_shape=4 * 4 * 16, action_space_size=4,
                               chance_space_size=32, latent_state_dim=256),
                    num_simulations=50, batch_size=256, update_per_collect=100,
                    n_episode=8, eval_freq=200,
                    use_ture_chance_label_in_chance_encoder=True,
                ),
            )
        ),
    },
    "unizero": {
        "CartPole-v0": Config(
            dict(
                env=dict(env_id="CartPole-v0", stop_value=195, collector_env_num=8,
                         evaluator_env_num=3, n_evaluator_episode=3),
                policy=dict(
                    type="unizero",
                    model=dict(observation_shape=4, action_space_size=2, embed_dim=64,
                               num_layers=2, num_heads=4, max_tokens=16, support_scale=25),
                    num_simulations=25, num_unroll_steps=5, batch_size=64,
                    update_per_collect=60, n_episode=8, eval_freq=100, learning_rate=0.001,
                ),
            )
        ),
    },
}


class Agent:
    """``Agent('muzero', 'CartPole-v0').train(max_env_step=...)`` →
    ``.deploy()`` / ``.batch_evaluate()``."""

    algo: str = "muzero"

    def __init__(self, env_id: Optional[str] = None, cfg: Optional[Config] = None,
                 exp_name: Optional[str] = None, seed: int = 0):
        if cfg is None:
            table = dict(_LEGACY_CONFIGS.get(self.algo, {}))
            table.update(_ZOO.get(self.algo, {}))
            if env_id not in table:
                raise KeyError(
                    f"no bundled {self.algo} config for {env_id!r}; available: "
                    f"{sorted(table)} — pass cfg= explicitly"
                )
            cfg = Config(dict(table[env_id]))
        self.cfg = Config(dict(cfg))
        if exp_name:
            self.cfg.exp_name = exp_name
        self.cfg.setdefault("exp_name", f"data_agent/{self.algo}_{env_id}_seed{seed}")
        self.seed = seed
        self.policy = None
        self.state = None

    def train(self, max_env_step: int = int(1e5), max_train_iter: int = int(1e9)) -> Dict:
        ptype = self.cfg.get("policy", {}).get("type", self.algo)
        if "alphazero" in ptype:  # env-as-simulator family uses its own entry
            from lightzero_tpu.entry import train_alphazero as entry
        else:
            from lightzero_tpu.entry import train_muzero as entry

        self.policy, self.state, stats = entry(
            self.cfg, seed=self.seed, max_env_step=max_env_step, max_train_iter=max_train_iter
        )
        return stats

    def batch_evaluate(
        self,
        n_episodes: int = 5,
        model_path: Optional[str] = None,
        save_replay_path: Optional[str] = None,
    ) -> Dict:
        from lightzero_tpu.entry.train_muzero import create_env
        from lightzero_tpu.entry import train_muzero  # noqa: F401 (registry imports)
        from lightzero_tpu.utils.checkpoint import load_checkpoint

        if self.policy is None or model_path is not None:
            from lightzero_tpu.config import compile_config
            from lightzero_tpu.utils import POLICY_REGISTRY

            ptype = self.cfg.get("policy", {}).get("type", "muzero")
            pcls = POLICY_REGISTRY.get(ptype)
            cfg = compile_config(self.cfg, pcls.default_config(), self.seed, save_cfg=False)
            self.policy = pcls(cfg.policy)
            self.state = self.policy.init_train_state(jax.random.PRNGKey(self.seed))
            if model_path:
                self.state = load_checkpoint(model_path, target=self.state)
            self._compiled_cfg = cfg
        else:
            cfg = getattr(self, "_compiled_cfg", None) or self.cfg
        env = create_env(cfg.env)
        if env is not None:
            from lightzero_tpu.workers import Evaluator

            ev = Evaluator(env, self.policy, cfg.env.get("evaluator_env_num", 3))
        else:
            from lightzero_tpu.envs.host_env import HostVecEnv
            from lightzero_tpu.workers.host_collector import HostEvaluator

            ev = HostEvaluator(
                HostVecEnv(cfg.env.env_id, cfg.env.get("evaluator_env_num", 3)), self.policy
            )
        kw = {}
        if save_replay_path is not None:
            kw["save_replay_path"] = save_replay_path
        return ev.eval(self.state.params, n_episodes=n_episodes, **kw)

    def deploy(
        self,
        n_episodes: int = 1,
        model_path: Optional[str] = None,
        enable_save_replay: bool = False,
        replay_path: Optional[str] = None,
    ) -> Dict:
        """Run deterministic episodes with the current/loaded model; with
        ``enable_save_replay`` each episode's trajectory is saved as npz
        under ``replay_path`` (reference .deploy(enable_save_replay),
        agent/muzero.py:267)."""
        import os

        save_path = None
        if enable_save_replay:
            save_path = replay_path or os.path.join(
                str(self.cfg.get("exp_name", "data_agent/deploy")), "replays"
            )
        return self.batch_evaluate(
            n_episodes=n_episodes, model_path=model_path, save_replay_path=save_path
        )


class MuZeroAgent(Agent):
    algo = "muzero"


class EfficientZeroAgent(Agent):
    algo = "efficientzero"


class UniZeroAgent(Agent):
    algo = "unizero"


class StochasticMuZeroAgent(Agent):
    algo = "stochastic_muzero"


class GumbelMuZeroAgent(Agent):
    algo = "gumbel_muzero"


class AlphaZeroAgent(Agent):
    algo = "alphazero"


class SampledAlphaZeroAgent(Agent):
    algo = "sampled_alphazero"


class SampledMuZeroAgent(Agent):
    algo = "sampled_muzero"


class SampledEfficientZeroAgent(Agent):
    algo = "sampled_efficientzero"
