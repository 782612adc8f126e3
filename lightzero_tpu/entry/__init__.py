from lightzero_tpu.entry.train_muzero import train_muzero, eval_muzero
