from lightzero_tpu.buffers.game_buffer import GameBuffer, EpisodeRecord
