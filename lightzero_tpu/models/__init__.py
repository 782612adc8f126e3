from lightzero_tpu.models.common import (
    NetworkOutput,
    MLPTorso,
    SimNorm,
    RepresentationNetworkMLP,
    DynamicsNetworkMLP,
    PredictionNetworkMLP,
    RepresentationNetworkConv,
    DynamicsNetworkConv,
    PredictionNetworkConv,
)
from lightzero_tpu.models.muzero import MuZeroModel, MuZeroParams
