from lightzero_tpu.agent.agent import (
    Agent,
    MuZeroAgent,
    EfficientZeroAgent,
    UniZeroAgent,
    StochasticMuZeroAgent,
)
