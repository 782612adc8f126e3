"""Packaging (role of the reference setup.py; no native extensions needed —
the compute path is JAX/XLA, see README)."""
from setuptools import find_packages, setup

setup(
    name="lightzero_tpu",
    version="0.1.0",
    description="TPU-native MCTS+RL framework (LightZero capability surface, JAX/XLA)",
    packages=find_packages(include=["lightzero_tpu", "lightzero_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "numpy",
    ],
    extras_require={
        "envs": ["gymnasium"],
        "atari": ["gymnasium", "ale-py"],
        "dev": ["pytest"],
    },
)
