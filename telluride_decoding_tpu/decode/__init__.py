"""Streaming correlation decoding, reductions, and separation metrics."""

from telluride_decoding_tpu.decode.metrics import (
    calculate_dprime,
    average_data,
)
