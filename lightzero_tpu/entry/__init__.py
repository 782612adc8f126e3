from lightzero_tpu.entry.train_muzero import train_muzero, eval_muzero

# UniZero shares the same loop via policy-type dispatch (reference keeps a
# separate train_unizero entry, lzero/entry/train_unizero.py; here the type
# field selects the policy so one entry serves both)
train_unizero = train_muzero
eval_unizero = eval_muzero

from lightzero_tpu.entry.train_alphazero import train_alphazero, eval_alphazero
from lightzero_tpu.entry.train_muzero_multitask import train_muzero_multitask
from lightzero_tpu.entry.train_multitask_balance import train_multitask_balance
from lightzero_tpu.entry.train_muzero_with_reward_model import train_muzero_with_reward_model
from lightzero_tpu.entry.eval_offline import eval_offline

# ReZero = the shared loop with buffer_reanalyze_freq > 0 (reference keeps a
# separate train_rezero entry, lzero/entry/train_rezero.py)
train_rezero = train_muzero

# Segment pipeline = the shared loop with policy.num_segments set: each
# collect round gathers num_segments x game_segment_length env steps and
# flushes partial episodes as truncated (reference train_muzero_segment.py /
# muzero_segment_collector.py; UniZero variant train_unizero_segment.py)
train_muzero_segment = train_muzero
train_unizero_segment = train_muzero

# Gym envs route through the host adapter inside the shared loop (reference
# keeps dedicated train/eval_muzero_with_gym_env entries)
train_muzero_with_gym_env = train_muzero
eval_muzero_with_gym_env = eval_muzero

# Multitask reference names: the ddp-segment entries map to the
# jax.distributed/task-partition multitask entry; the balance variant to
# the curriculum entry; the _eval variant to offline eval over the exp dir
train_muzero_multitask_segment_ddp = train_muzero_multitask
train_unizero_multitask_segment_ddp = train_muzero_multitask
train_unizero_multitask_balance_segment_ddp = train_multitask_balance
train_unizero_multitask_segment_eval = eval_offline


def train_unizero_with_loss_landscape(cfg, *args, **kwargs):
    """Shared loop + post-training loss-landscape analysis (reference
    lzero/entry/train_unizero_with_loss_landscape.py)."""
    if isinstance(cfg, (list, tuple)):
        cfg = cfg[0]
    cfg["policy"]["analysis_loss_landscape"] = True
    return train_muzero(cfg, *args, **kwargs)
