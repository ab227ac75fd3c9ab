from fine_grained_gaussian_process_forcasting_tpu.ops.attention import (
    scaled_dot_attention,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.autocorrelation import (
    auto_correlation,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.probsparse import (
    prob_sparse_attention,
)

__all__ = ["scaled_dot_attention", "auto_correlation", "prob_sparse_attention"]
