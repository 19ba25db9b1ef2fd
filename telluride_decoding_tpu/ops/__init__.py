"""Fused numeric primitives used across the framework."""

from telluride_decoding_tpu.ops.pearson import (
    pearson_correlation,
    pearson_correlation_first,
    pearson_correlation_second,
    pearson_loss,
    correlation_matrix,
)
from telluride_decoding_tpu.ops.fused_frontend import (
    fused_envelope_lagstack,
    fused_envelope_lagstack_reference,
)
from telluride_decoding_tpu.ops.covariance import (
    MomentStats,
    moments_from_arrays,
    blocked_moments,
)
from telluride_decoding_tpu.ops.lagstack import (
    lag_stack,
    lag_stack_np,
    lag_stack_reference,
    stacked_width,
)
