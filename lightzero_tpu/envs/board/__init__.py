from lightzero_tpu.envs.board.tictactoe import TicTacToeEnv
