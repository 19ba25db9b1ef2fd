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

    def test_bucketed_padding_matches_unpadded(self, rng):
        # Bucketed mode: zero-pad to a shape bucket, pass the true
        # lengths as traced scalars; values over the valid range must
        # match the unpadded call exactly (window clamps at the TRUE
        # end, not the padded end).
        import jax.numpy as jnp
        n = 30000
        audio = rng.randn(n).astype(np.float32)
        padded = np.zeros((1 << 16,), np.float32)
        padded[:n] = audio
        num_out = int(round(n / 16000 * 100))
        got = np.asarray(fused_envelope_lagstack(
            padded, 16000, 100, window=2.0, pre=2, post=1,
            interpret=True, valid_len=jnp.int32(n),
            valid_out=jnp.int32(num_out)))
        want = np.asarray(fused_envelope_lagstack_reference(
            audio, 16000, 100, window=2.0, pre=2, post=1))
        assert want.shape == (num_out, 4)
        np.testing.assert_allclose(got[:num_out], want, atol=1e-4)
        # The envelope past the true end is zero; rows just past it
        # only carry lag-shifted copies of valid frames (pre columns),
        # and beyond the pre reach everything is zero.
        np.testing.assert_array_equal(got[num_out:, 2:], 0)
        np.testing.assert_array_equal(got[num_out + 2:], 0)


class TestIngestWiring:
    """compute_intensity routes through the fused kernel on TPU; the
    cumsum fallback must be value-identical (VERDICT r1 item 3)."""

    def _intensity(self, audio, monkeypatch, mode):
        monkeypatch.setenv('TDT_FUSED_FRONTEND', mode)
        af = AudioFeatures('loud', 16000, 100, window=2.0,
                           exponent=float(np.log10(2)))
        return af.compute_intensity(audio), af

    def test_fused_path_matches_cumsum(self, rng, monkeypatch):
        audio = rng.randn(30000).astype(np.float32)
        got, af_fused = self._intensity(audio, monkeypatch, 'interpret')
        want, af_plain = self._intensity(audio, monkeypatch, '0')
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)
        # Streaming state is maintained identically, so a SECOND call
        # (which falls back to the cumsum path with carried buffer)
        # continues the same stream.
        more = rng.randn(8000).astype(np.float32)
        np.testing.assert_allclose(af_fused.compute_intensity(more),
                                   af_plain.compute_intensity(more),
                                   atol=1e-4)

    def test_fallback_cases_use_cumsum(self, rng, monkeypatch):
        monkeypatch.setenv('TDT_FUSED_FRONTEND', 'interpret')
        # Multi-channel input: not a single stream -> cumsum path.
        af = AudioFeatures('a', 16000, 100, window=2.0)
        stereo = rng.randn(16000, 2).astype(np.float32)
        out = af.compute_intensity(stereo)
        assert out.shape == (100, 2)
        # Upsampling with window<=1: audio_resample no-ops.
        af2 = AudioFeatures('b', 50, 100, window=1.0)
        x = rng.randn(100, 1).astype(np.float32)
        np.testing.assert_allclose(af2.compute_intensity(x),
                                   np.abs(x), atol=1e-6)

    def test_ingested_records_value_identical(self, rng, monkeypatch,
                                              tmp_path):
        # End-to-end: the same audio ingested to TFRecords with the
        # fused kernel vs the cumsum path yields value-identical files.
        from telluride_decoding_tpu.data import records
        audio = np.abs(rng.randn(64000)).astype(np.float32)
        out = {}
        for mode in ('interpret', '0'):
            monkeypatch.setenv('TDT_FUSED_FRONTEND', mode)
            af = AudioFeatures('loud', 16000, 64, window=1.0,
                               exponent=float(np.log10(2)))
            intensity = np.asarray(af.compute_intensity(audio),
                                   np.float32)
            path = str(tmp_path / ('t_%s.tfrecords' % mode))
            records.convert_data_to_tfrecords(
                {'intensity': intensity}, path)
            out[mode] = records.read_tfrecords(path)['intensity']
        assert out['interpret'].shape == out['0'].shape == (256, 1)
        np.testing.assert_allclose(out['interpret'], out['0'], atol=1e-4)
