from lightzero_tpu.reward_model.rnd import RNDRewardModel
