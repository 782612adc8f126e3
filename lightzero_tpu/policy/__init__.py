from lightzero_tpu.policy.muzero import MuZeroPolicy, TrainState, TrainBatch
