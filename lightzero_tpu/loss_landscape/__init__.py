from lightzero_tpu.loss_landscape.core import (
    random_direction,
    loss_surface_1d,
    loss_surface_2d,
    loss_landscape_api,
)
