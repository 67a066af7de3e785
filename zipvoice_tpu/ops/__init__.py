from zipvoice_tpu.ops.scaling import (  # noqa: F401
    bias_norm,
    swoosh_l,
    swoosh_r,
    limit_param_value,
    penalize_abs_values_gt,
    balancer,
    whiten,
)
