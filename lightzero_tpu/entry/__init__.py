from lightzero_tpu.entry.train_muzero import train_muzero, eval_muzero

# UniZero shares the same loop via policy-type dispatch (reference keeps a
# separate train_unizero entry, lzero/entry/train_unizero.py; here the type
# field selects the policy so one entry serves both)
train_unizero = train_muzero
eval_unizero = eval_muzero

from lightzero_tpu.entry.train_alphazero import train_alphazero
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
