"""Version metadata (reference lzero/config/meta.py)."""

__TITLE__ = "lightzero_tpu"
__VERSION__ = "0.1.0"
__DESCRIPTION__ = "TPU-native MCTS+RL framework (LightZero capability surface)"
__AUTHOR__ = "lightzero_tpu contributors"
