"""Pins the round-5 data/io/signal review fixes.

Covers: float64 accumulation in the windowed-mean resampler (a float32
prefix sum lost ~18 mantissa bits at the tail of long recordings), the
gather-based window sums in the fused-frontend SPEC function (same
cancellation class), the loud error for a missing attended_field (was
silent zeros — fabricated labels), and the reference-protocol
offset-only quirk now scoped to the TFRecord source where the
reference actually has it (its TestBrainData honors input_offset,
reference brain_data.py:581-584 vs :761-763).
"""
import numpy as np
import pytest


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


class TestLongRecordingEnvelopePrecision:

    def _exact_windowed_mean(self, data, fs_in, fs_out, window):
        n_out = int(round(data.shape[0] / fs_in * fs_out))
        half = 0.5 * window / fs_out
        t = np.arange(n_out) / fs_out
        t1 = np.maximum(0, np.round(fs_in * (t - half))).astype(int)
        t2 = np.minimum(data.shape[0],
                        np.round(fs_in * (t + half))).astype(int)
        out = np.empty((n_out, data.shape[1]))
        for i in range(n_out):
            seg = data[t1[i]:max(t2[i], t1[i] + 1)].astype(np.float64)
            out[i] = seg.mean(axis=0)
        return out

    def test_audio_resample_tail_accuracy(self, rng):
        # 2 minutes of 16 kHz float32: the old float32 cumsum lost
        # percent-level accuracy at the tail (measured 6% at 10 min);
        # with float64 accumulation the tail matches the per-window
        # float64 mean to float32 roundoff.
        from telluride_decoding_tpu.signal.preprocess import (
            AudioFeatures)
        fs_in, fs_out = 16000.0, 64.0
        data = np.abs(rng.randn(int(fs_in) * 120, 1)
                      ).astype(np.float32)
        af = AudioFeatures('loudness', fs_in, fs_out, window=1)
        got = af.audio_resample(data)
        want = self._exact_windowed_mean(data, fs_in, fs_out, 1)
        tail = slice(-64, None)
        np.testing.assert_allclose(got[tail], want[tail], rtol=2e-5)

    def test_spec_function_tail_accuracy(self, rng):
        # Same property for the Pallas kernel's semantic spec: its
        # windowed sums are per-window gathers now, not a differenced
        # float32 prefix sum.
        from telluride_decoding_tpu.ops.fused_frontend import (
            fused_envelope_lagstack_reference)
        fs_in, fs_out = 16000.0, 64.0
        audio = rng.randn(int(fs_in) * 60).astype(np.float32)
        env = np.asarray(fused_envelope_lagstack_reference(
            audio, fs_in, fs_out, window=1))[:, 0]
        want = self._exact_windowed_mean(
            (audio ** 2)[:, None].astype(np.float32),
            fs_in, fs_out, 1)[:, 0] ** 0.5
        tail = slice(-64, None)
        np.testing.assert_allclose(env[tail], want[tail], rtol=2e-4)


class TestAttendedFieldValidation:

    def test_missing_attended_field_raises(self, rng, tmp_path):
        from telluride_decoding_tpu.data import brain_data, records
        d = tmp_path / 'rec'
        d.mkdir()
        records.convert_data_to_tfrecords(
            {'eeg': rng.randn(50, 3).astype(np.float32),
             'intensity': rng.randn(50, 1).astype(np.float32)},
            str(d / 'trial01.tfrecords'))
        bd = brain_data.TFExampleData(
            'eeg', 'intensity', 100.0, final_batch_size=16,
            attended_field='attenion',  # typo'd
            data_dir=str(d), train_file_pattern='trial01',
            validate_file_pattern='trial01',
            test_file_pattern='trial01')
        with pytest.raises(ValueError, match='attenion'):
            bd.load_arrays('train')

    def test_empty_attended_field_still_zeros(self, rng, tmp_path):
        from telluride_decoding_tpu.data import brain_data, records
        d = tmp_path / 'rec'
        d.mkdir()
        records.convert_data_to_tfrecords(
            {'eeg': rng.randn(50, 3).astype(np.float32),
             'intensity': rng.randn(50, 1).astype(np.float32)},
            str(d / 'trial01.tfrecords'))
        bd = brain_data.TFExampleData(
            'eeg', 'intensity', 100.0, final_batch_size=16,
            attended_field='',
            data_dir=str(d), train_file_pattern='trial01',
            validate_file_pattern='trial01',
            test_file_pattern='trial01')
        _, _, _, attended = bd.load_arrays('train')
        assert not attended.any()


class TestOffsetQuirkScoping:

    def test_test_brain_data_honors_offset_under_reference_protocol(
            self, rng):
        # The reference's TestBrainData applies input_offset even with
        # zero context (brain_data.py:581-584); only its TFRecord path
        # ignores the offset-only case. reference_protocol must not
        # disable the offset here.
        from telluride_decoding_tpu.data.brain_data import TestBrainData
        x = np.arange(40, dtype=np.float32)[:, None]
        y = np.arange(40, dtype=np.float32)[:, None] * 10
        plain = TestBrainData('input', 'output', 100.0,
                              final_batch_size=8, shuffle_buffer_size=0,
                              input_offset=3)
        plain.preserve_test_data(x, y)
        ref = TestBrainData('input', 'output', 100.0,
                            final_batch_size=8, shuffle_buffer_size=0,
                            input_offset=3, reference_protocol=True)
        ref.preserve_test_data(x, y)
        a1, _, o1, _ = plain.load_arrays('test')
        a2, _, o2, _ = ref.load_arrays('test')
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(o1, o2)
        assert a1[0, 0] == 3.0  # offset really applied

    def test_tfexample_quirk_preserved(self, rng, tmp_path):
        # The TFRecord source must KEEP ignoring the offset-only case
        # under the reference protocol (bug-faithful A/B).
        from telluride_decoding_tpu.data import brain_data, records
        d = tmp_path / 'rec'
        d.mkdir()
        x = np.arange(40, dtype=np.float32)[:, None]
        records.convert_data_to_tfrecords(
            {'eeg': x, 'intensity': x * 10},
            str(d / 'trial01.tfrecords'))

        def make(protocol):
            return brain_data.TFExampleData(
                'eeg', 'intensity', 100.0, final_batch_size=8,
                attended_field='', input_offset=3,
                reference_protocol=protocol,
                data_dir=str(d), train_file_pattern='trial01',
                validate_file_pattern='trial01',
                test_file_pattern='trial01')

        a_ref, _, _, _ = make(True).load_arrays('test')
        a_def, _, _, _ = make(False).load_arrays('test')
        assert a_ref[0, 0] == 0.0   # quirk: offset ignored
        assert a_def[0, 0] == 3.0   # default protocol honors it
