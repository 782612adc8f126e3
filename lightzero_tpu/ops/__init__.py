from lightzero_tpu.ops.scaling import (
    DiscreteSupport,
    scalar_transform,
    inverse_scalar_transform,
    logits_to_scalar,
    phi_transform,
    cross_entropy_loss,
    visit_count_temperature,
)
from lightzero_tpu.ops.action import (
    select_action,
    sample_from_visit_counts,
    scale_gradient,
)
