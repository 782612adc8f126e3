"""Go-6x6 AlphaZero vs rule bot on the host CPU.

The axon plugin pins the platform, so ``JAX_PLATFORMS=cpu`` is ignored; the
CPU backend must be selected via ``jax.config.update`` BEFORE any device use
(same pattern as scripts/scalezero_cpu_fallback.py). Keeps the single-tenant
TPU free for the queue while this board run shares the 1-core host.
"""
import jax

jax.config.update("jax_platforms", "cpu")

from zoo.board_games.go.config.go6_alphazero_bot_mode_config import main_config
from lightzero_tpu.entry import train_alphazero

if __name__ == "__main__":
    train_alphazero(main_config, seed=0, max_env_step=int(1e6))
