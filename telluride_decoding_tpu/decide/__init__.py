"""Attention decision layer: WTA, stepped, state-space decoders."""

from telluride_decoding_tpu.decide.attention_decoder import (
    AttentionDecoder,
    StateSpaceAttentionDecoder,
    StepAttentionDecoder,
    create_attention_decoder,
)
