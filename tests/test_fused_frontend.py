"""Fused envelope+lagstack kernel vs its XLA reference and vs
AudioFeatures (the reference semantics). Kernel runs in interpreter
mode on CPU; the compiled path is exercised on real TPU hardware by
the bench/verify flows."""

import numpy as np
import pytest

from telluride_decoding_tpu.ops.fused_frontend import (
    fused_envelope_lagstack,
    fused_envelope_lagstack_reference,
)
from telluride_decoding_tpu.signal import AudioFeatures


class TestReferenceSemantics:

    def test_matches_audio_features_intensity(self, rng):
        audio = rng.randn(32000).astype(np.float32)
        out = np.asarray(fused_envelope_lagstack_reference(
            audio, 16000, 100, window=2.0, exponent=np.log10(2)))
        af = AudioFeatures('a', 16000, 100, window=2.0,
                           exponent=np.log10(2))
        want = af.compute_intensity(audio[:, None])
        assert out.shape == want.shape
        np.testing.assert_allclose(out[:, 0], want[:, 0], atol=1e-4)

    def test_lag_columns_are_shifted_envelope(self, rng):
        audio = rng.randn(8000).astype(np.float32)
        env = np.asarray(fused_envelope_lagstack_reference(
            audio, 8000, 100, window=1.0))[:, 0]
        stacked = np.asarray(fused_envelope_lagstack_reference(
            audio, 8000, 100, window=1.0, pre=2, post=1))
        assert stacked.shape == (100, 4)
        np.testing.assert_allclose(stacked[:, 2], env, atol=1e-6)
        np.testing.assert_allclose(stacked[2:, 0], env[:-2], atol=1e-6)
        np.testing.assert_array_equal(stacked[:2, 0], 0)  # Zero edges.
        np.testing.assert_allclose(stacked[:-1, 3], env[1:], atol=1e-6)


class TestPallasKernel:

    @pytest.mark.parametrize('pre,post', [(0, 0), (3, 2), (4, 4)])
    def test_matches_reference(self, rng, pre, post):
        audio = rng.randn(32000).astype(np.float32)
        args = dict(window=2.0, exponent=float(np.log10(2)),
                    pre=pre, post=post)
        got = np.asarray(fused_envelope_lagstack(
            audio, 16000, 100, interpret=True, **args))
        want = np.asarray(fused_envelope_lagstack_reference(
            audio, 16000, 100, **args))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_small_decimation_ratio(self, rng):
        audio = rng.randn(1000).astype(np.float32)
        got = np.asarray(fused_envelope_lagstack(
            audio, 200, 100, window=2.0, pre=1, post=1, interpret=True,
            out_tile=64))
        want = np.asarray(fused_envelope_lagstack_reference(
            audio, 200, 100, window=2.0, pre=1, post=1))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_multiple_tiles(self, rng):
        # num_out spans several out_tiles; tile boundaries must be
        # seamless.
        audio = rng.randn(64000).astype(np.float32)
        got = np.asarray(fused_envelope_lagstack(
            audio, 16000, 100, window=2.0, pre=2, post=2,
            out_tile=128, interpret=True))
        want = np.asarray(fused_envelope_lagstack_reference(
            audio, 16000, 100, window=2.0, pre=2, post=2))
        assert got.shape == (400, 5)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_constant_signal_envelope(self):
        audio = np.full(16000, 2.0, np.float32)
        got = np.asarray(fused_envelope_lagstack(
            audio, 16000, 100, window=1.0, interpret=True))
        # RMS of a constant 2.0 is 2.0 (interior frames).
        np.testing.assert_allclose(got[5:-5, 0], 2.0, atol=1e-4)
