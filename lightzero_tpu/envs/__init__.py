from lightzero_tpu.envs.base import JaxEnv, EnvStep
from lightzero_tpu.envs import cartpole  # registers 'cartpole'
from lightzero_tpu.envs.board import tictactoe  # registers 'tictactoe'
from lightzero_tpu.envs import game_2048  # registers 'game_2048'
from lightzero_tpu.envs import pendulum  # registers 'pendulum'
from lightzero_tpu.envs import memory_env  # registers 'memory'
from lightzero_tpu.envs.board import connect4  # registers 'connect4'
from lightzero_tpu.envs.board import gomoku  # registers 'gomoku'
from lightzero_tpu.envs import breakout_grid  # registers "breakout_grid"
from lightzero_tpu.envs.board import go  # registers "go"
from lightzero_tpu.envs.board import chess  # registers "chess"
from lightzero_tpu.envs import bsuite_like  # registers "deep_sea", "catch"
from lightzero_tpu.envs import minatar_like  # registers asterix/freeway/space_invaders/seaquest _grid
