from lightzero_tpu.agent.agent import (
    Agent,
    MuZeroAgent,
    EfficientZeroAgent,
    UniZeroAgent,
    StochasticMuZeroAgent,
    GumbelMuZeroAgent,
    AlphaZeroAgent,
    SampledAlphaZeroAgent,
    SampledMuZeroAgent,
    SampledEfficientZeroAgent,
)
from lightzero_tpu.agent.configs import BUNDLED_CONFIGS
