"""Streaming correlation decoding, reductions, and separation metrics."""

from telluride_decoding_tpu.decode.metrics import (
    calculate_dprime,
    average_data,
)
from telluride_decoding_tpu.decode.result_store import (
    NumpyStore,
    TwoResultStore,
    WindowedDataStore,
)
from telluride_decoding_tpu.decode.infer_decoder import (
    CCADecoder,
    CorrelationParamsTuple,
    Decoder,
    LinearRegressionDecoder,
    ModelParamsTuple,
    NumpyEncoder,
    create_decoder,
)
