"""Signal preprocessing: parallel IIR filters, resampling, audio features."""

from telluride_decoding_tpu.signal.filters import (
    butter_sos,
    sosfilt,
    sosfilt_zi,
    streaming_state_init,
)
from telluride_decoding_tpu.signal.preprocess import (
    AudioFeatures,
    Preprocessor,
)
from telluride_decoding_tpu.signal.audio_stores import (
    AudioIntensityStore,
    AudioLoudnessMick,
)
