"""lightzero_tpu — a TPU-native (JAX/XLA/Pallas/pjit) MCTS+RL framework.

A from-scratch rebuild of the capability surface of opendilab/LightZero
(reference: /root/reference, see SURVEY.md): the MCTS+RL algorithm family
(AlphaZero, MuZero + variants, EfficientZero, Sampled/Gumbel/Stochastic
MuZero, UniZero), self-play collection, game-segment replay with reanalyze,
and an environment zoo — re-designed TPU-first:

- the search is a batched, fixed-budget, array-based MCTS whose
  select→expand→backup loop is fused with network inference inside a single
  jit-compiled `lax.scan` (replacing the reference's C++ pointer trees +
  Python latent pools + per-simulation GPU round trips,
  lzero/mcts/tree_search/mcts_ctree.py:293-366);
- models are flax modules with pure-function train steps;
- data parallelism / multitask scale-out uses `jax.sharding.Mesh` + psum
  collectives instead of torch.distributed DDP.
"""

__version__ = "0.1.0"

from lightzero_tpu.config.core import Config, compile_config
