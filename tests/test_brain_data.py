"""Data-layer tests: record I/O round trips and context exactness.

Mirrors the reference's value-exact pipeline tests
(test/brain_data_test.py:96-176,400-468): linearly increasing integer
data makes every context window checkable element-wise.
"""

import os

import numpy as np
import pytest

from telluride_decoding_tpu.data import brain_data, records
from telluride_decoding_tpu.ops.lagstack import lag_stack_np


def make_test_brain_data(num_frames=30, pre=0, post=0, in2_pre=0,
                         in2_post=0, offset=0, batch=10, shuffle=0):
    bd = brain_data.TestBrainData(
        'input', 'output', 100.0,
        pre_context=pre, post_context=post,
        in2_pre_context=in2_pre, in2_post_context=in2_post,
        input_offset=offset,
        final_batch_size=batch, shuffle_buffer_size=shuffle)
    base = np.arange(num_frames, dtype=np.float32)
    in1 = np.stack([base, base + 1000], axis=1)     # 2 channels
    in2 = (base + 2000)[:, None]
    out = (base + 3000)[:, None]
    bd.preserve_test_data(in1, out, input2_data=in2)
    return bd, in1, in2, out


class TestContextExactness:

    def test_no_context_passthrough(self):
        bd, in1, in2, out = make_test_brain_data()
        x1, x2, y, a = bd.load_arrays('train')
        np.testing.assert_array_equal(x1, in1)
        np.testing.assert_array_equal(x2, in2)
        np.testing.assert_array_equal(y, out)
        assert a.shape == (30, 1)

    def test_pre_context_values(self):
        bd, in1, _, _ = make_test_brain_data(pre=2)
        x1, _, y, _ = bd.load_arrays('train')
        assert x1.shape == (30, 6)
        # Frame n holds [in1[n-2], in1[n-1], in1[n]] with zero padding.
        np.testing.assert_array_equal(x1[0], [0, 0, 0, 0, 0, 1000])
        np.testing.assert_array_equal(x1[1], [0, 0, 0, 1000, 1, 1001])
        np.testing.assert_array_equal(x1[5], [3, 1003, 4, 1004, 5, 1005])
        assert y.shape == (30, 1)

    def test_post_context_values(self):
        bd, _, _, _ = make_test_brain_data(post=1)
        x1, _, _, _ = bd.load_arrays('train')
        assert x1.shape == (30, 4)
        np.testing.assert_array_equal(x1[0], [0, 1000, 1, 1001])
        np.testing.assert_array_equal(x1[29], [29, 1029, 0, 0])

    def test_in2_context(self):
        bd, _, _, _ = make_test_brain_data(in2_pre=1, in2_post=1)
        _, x2, _, _ = bd.load_arrays('train')
        assert x2.shape == (30, 3)
        np.testing.assert_array_equal(x2[0], [0, 2000, 2001])
        np.testing.assert_array_equal(x2[10], [2009, 2010, 2011])

    def test_positive_input_offset(self):
        # Positive offset drops frames from the start of input_1
        # (reference brain_data.py:459-470), shortening all streams.
        bd, in1, in2, out = make_test_brain_data(offset=3)
        x1, x2, y, _ = bd.load_arrays('train')
        assert x1.shape[0] == 27
        np.testing.assert_array_equal(x1, in1[3:])
        np.testing.assert_array_equal(x2, in2[:27])
        np.testing.assert_array_equal(y, out[:27])

    def test_negative_input_offset(self):
        bd, in1, in2, out = make_test_brain_data(offset=-3)
        x1, x2, y, _ = bd.load_arrays('train')
        assert x1.shape[0] == 27
        np.testing.assert_array_equal(x1, in1[:27])
        np.testing.assert_array_equal(x2, in2[3:])
        np.testing.assert_array_equal(y, out[3:])

    def test_lag_stack_np_matches_naive(self):
        x = np.random.RandomState(0).randn(50, 3).astype(np.float32)
        pre, post = 4, 2
        got = lag_stack_np(x, pre, post)
        padded = np.concatenate([np.zeros((pre, 3), np.float32), x,
                                 np.zeros((post, 3), np.float32)])
        want = np.concatenate(
            [padded[k:k + 50] for k in range(pre + 1 + post)], axis=1)
        np.testing.assert_array_equal(got, want)


class TestBatching:

    def test_batch_shapes_and_drop_remainder(self):
        bd, _, _, _ = make_test_brain_data(num_frames=25, batch=10)
        batches = list(bd.create_dataset('program_test'))
        assert len(batches) == 2  # 25 frames -> 2 full batches of 10.
        inputs, y = batches[0]
        assert inputs['input_1'].shape == (10, 2)
        assert inputs['input_2'].shape == (10, 1)
        assert inputs['attended_speaker'].shape == (10, 1)
        assert y.shape == (10, 1)

    def test_program_test_not_shuffled(self):
        bd, in1, _, _ = make_test_brain_data(batch=10, shuffle=1000)
        batches = list(bd.create_dataset('program_test'))
        np.testing.assert_array_equal(batches[0][0]['input_1'], in1[:10])

    def test_train_shuffled_but_aligned(self):
        bd, _, _, _ = make_test_brain_data(batch=10, shuffle=1000)
        (inputs, y), = list(bd.create_dataset('train'))[:1]
        # Shuffled: not the identity order.
        assert not np.array_equal(inputs['input_1'][:, 0], np.arange(10))
        # But rows stay aligned across streams.
        np.testing.assert_array_equal(inputs['input_1'][:, 0] + 3000,
                                      y[:, 0])
        np.testing.assert_array_equal(inputs['input_1'][:, 0] + 2000,
                                      inputs['input_2'][:, 0])

    def test_mixup_batch_breaks_alignment(self):
        bd, _, _, _ = make_test_brain_data(batch=30)
        (inputs, y), = list(bd.create_dataset('train', mixup_batch=True))
        assert not np.array_equal(inputs['input_1'][:, 0] + 3000, y[:, 0])
        # Same multiset of values though.
        np.testing.assert_array_equal(np.sort(y[:, 0]),
                                      np.arange(30) + 3000)

    def test_mismatch_batch_labels(self):
        bd, _, _, _ = make_test_brain_data(num_frames=40, batch=40)
        (inputs, y), = list(
            bd.create_dataset('program_test', mismatch_batch=True))
        assert y.shape == (40, 1)
        np.testing.assert_array_equal(y[:20, 0], 0)
        np.testing.assert_array_equal(y[20:, 0], 1)
        # Matched half keeps its pairing.
        np.testing.assert_array_equal(
            inputs['input_1'][:20, 0] + 2000, inputs['input_2'][:20, 0])

    def test_repeat_count(self):
        bd, _, _, _ = make_test_brain_data(num_frames=20, batch=10)
        bd.repeat_count = 3
        batches = list(bd.create_dataset('train'))
        assert len(batches) == 6


class TestFileFiltering:

    def _bd(self, tmp_path, names):
        d = tmp_path / 'records'
        d.mkdir()
        data = {'eeg': np.arange(12, dtype=np.float32).reshape(4, 3),
                'env': np.ones((4, 1), np.float32)}
        for n in names:
            records.convert_data_to_tfrecords(data, str(d / n))
        return d

    def test_walk_and_pattern(self, tmp_path):
        d = self._bd(tmp_path, ['s01_t1.tfrecords', 's01_t2.tfrecords',
                                's02_t1.tfrecords', 'x-bad-y.tfrecords',
                                'notes.txt'])
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, data_dir=str(d), data_pattern='s01')
        files = bd.all_files()
        assert len(files) == 2
        assert all('s01' in f for f in files)

    def test_allbut(self, tmp_path):
        d = self._bd(tmp_path, ['t01.tfrecords', 't02.tfrecords',
                                't03.tfrecords', 't04.tfrecords'])
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, data_dir=str(d),
            train_file_pattern='allbut', validate_file_pattern='t01',
            test_file_pattern='t02')
        train = bd.filter_file_names('train')
        assert len(train) == 2
        assert all('t03' in f or 't04' in f for f in train)
        assert len(bd.filter_file_names('test')) == 1

    def test_allbut_requires_patterns(self, tmp_path):
        d = self._bd(tmp_path, ['t01.tfrecords', 't02.tfrecords'])
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, data_dir=str(d),
            train_file_pattern='allbut')
        with pytest.raises(ValueError):
            bd.filter_file_names('train')

    def test_allbut_nn(self, tmp_path):
        d = self._bd(tmp_path, ['t0%d.tfrecords' % i for i in range(1, 7)])
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, data_dir=str(d),
            train_file_pattern='allbut_2', validate_file_pattern='t01',
            test_file_pattern='t02')
        assert len(bd.filter_file_names('train')) == 2

    def test_end_to_end_tfexample(self, tmp_path):
        d = self._bd(tmp_path, ['t01.tfrecords'])
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, data_dir=str(d), pre_context=1,
            test_file_pattern='t01', final_batch_size=4,
            shuffle_buffer_size=0)
        assert bd.input_fields_width(1) == 6
        assert bd.output_field_width() == 1
        (inputs, y), = list(bd.create_dataset('test'))
        assert inputs['input_1'].shape == (4, 6)
        np.testing.assert_array_equal(inputs['input_1'][1],
                                      [0, 1, 2, 3, 4, 5])


class TestOnTheFlyPreprocessing:
    """in_fields may carry Preprocessor param strings — the reference's
    parse_and_select_from_tfrecord2 TODO (brain_data.py:841-877),
    finished here: per-file preprocessing before lag stacking."""

    def _write(self, tmp_path, rng, names, n=400, channels=4):
        d = tmp_path / 'records'
        d.mkdir()
        per_file = {}
        for name in names:
            data = {'eeg': rng.randn(n, channels).astype(np.float32),
                    'env': rng.randn(n, 1).astype(np.float32)}
            records.convert_data_to_tfrecords(data, str(d / name))
            per_file[name] = data
        return d, per_file

    def test_highpass_matches_offline_preprocessing(self, tmp_path, rng):
        from telluride_decoding_tpu.signal.preprocess import Preprocessor
        from telluride_decoding_tpu.ops.lagstack import lag_stack_np
        d, per_file = self._write(tmp_path, rng,
                                  ['t01.tfrecords', 't02.tfrecords'])
        spec = 'eeg(highpass_cutoff=2)'
        bd = brain_data.TFExampleData(
            spec, 'env', 100.0, data_dir=str(d), pre_context=2,
            test_file_pattern='t0', shuffle_buffer_size=0)
        assert bd.in1_fields == ['eeg']  # Base name, for feature lookup.
        in1, _, out, _ = bd.load_arrays('test')
        # Offline: a fresh Preprocessor per file, then lag stacking —
        # value-identical to the on-the-fly reader.
        parts = []
        for f in bd.filter_file_names('test'):
            raw = per_file[os.path.basename(f)]['eeg']
            pp = Preprocessor(spec, 100.0, 100.0)
            parts.append(lag_stack_np(
                np.asarray(pp.process(raw, reset=True), np.float32), 2, 0))
        want = np.concatenate(parts, axis=0)
        assert in1.shape == want.shape
        np.testing.assert_allclose(in1, want, atol=1e-5)
        # The filtering actually did something.
        flat = brain_data.TFExampleData(
            'eeg', 'env', 100.0, data_dir=str(d), pre_context=2,
            test_file_pattern='t0', shuffle_buffer_size=0)
        assert np.abs(in1 - flat.load_arrays('test')[0]).max() > 1e-3

    def test_channel_selection_changes_width(self, tmp_path, rng):
        d, _ = self._write(tmp_path, rng, ['t01.tfrecords'])
        bd = brain_data.TFExampleData(
            'eeg(highpass_cutoff=0;channel_numbers=1-2)', 'env', 100.0,
            data_dir=str(d), pre_context=1, test_file_pattern='t01',
            shuffle_buffer_size=0)
        assert bd.input_fields_width(1) == 2 * 2  # 2 channels x 2 lags.
        in1, _, _, _ = bd.load_arrays('test')
        assert in1.shape[1] == 4

    def test_out_field_preprocessing(self, tmp_path, rng):
        from telluride_decoding_tpu.signal.preprocess import Preprocessor
        d, per_file = self._write(tmp_path, rng, ['t01.tfrecords'])
        bd = brain_data.TFExampleData(
            'eeg', 'env(highpass_cutoff=2)', 100.0, data_dir=str(d),
            test_file_pattern='t01', shuffle_buffer_size=0)
        assert bd.out_field == 'env'
        assert bd.output_field_width() == 1
        _, _, out, _ = bd.load_arrays('test')
        pp = Preprocessor('env(highpass_cutoff=2)', 100.0, 100.0)
        want = np.asarray(pp.process(
            per_file['t01.tfrecords']['env'], reset=True), np.float32)
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_channel_only_spec_works(self, tmp_path, rng):
        # highpass_cutoff is optional (the reference's param parser
        # KeyErrors without it, preprocess.py:582-584 — fixed here).
        d, _ = self._write(tmp_path, rng, ['t01.tfrecords'])
        bd = brain_data.TFExampleData(
            'eeg(channel_numbers=0,3)', 'env', 100.0, data_dir=str(d),
            test_file_pattern='t01', shuffle_buffer_size=0)
        in1, _, _, _ = bd.load_arrays('test')
        assert in1.shape[1] == 2

    def test_bad_spec_fails_eagerly(self, tmp_path, rng):
        d, _ = self._write(tmp_path, rng, ['t01.tfrecords'])
        with pytest.raises(ValueError):
            brain_data.TFExampleData(
                'eeg(nonsense)', 'env', 100.0, data_dir=str(d),
                test_file_pattern='t01')
        with pytest.raises(ValueError):  # Unknown key.
            brain_data.TFExampleData(
                'eeg(bogus_param=1)', 'env', 100.0, data_dir=str(d),
                test_file_pattern='t01')
        with pytest.raises(ValueError):
            brain_data.TFExampleData(
                'eeg(highpass_cutoff=2)', 'env', 0.0, data_dir=str(d),
                test_file_pattern='t01')


class TestRecordsIO:

    def test_float_int_bytes_roundtrip(self, tmp_path):
        path = str(tmp_path / 'mix.tfrecords')
        ex = {'f': np.array([1.5, -2.25], np.float32),
              'i': np.array([3, -4, 1 << 40], np.int64)}
        records.write_tfrecords(path, iter([records.encode_example(ex)]))
        count, bad = records.count_tfrecords(path)
        assert (count, bad) == (1, False)
        back = records.parse_example(next(records.iter_tfrecords(path)))
        np.testing.assert_array_equal(back['f'], ex['f'])
        np.testing.assert_array_equal(back['i'], ex['i'])

    def test_corrupt_detection(self, tmp_path):
        path = str(tmp_path / 'c.tfrecords')
        ex = {'f': np.zeros(4, np.float32)}
        records.write_tfrecords(path, iter([records.encode_example(ex)] * 3))
        with open(path, 'rb') as f:
            raw = bytearray(f.read())
        raw[20] ^= 0xFF  # Flip a payload byte.
        with open(path, 'wb') as f:
            f.write(bytes(raw))
        count, bad = records.count_tfrecords(path)
        assert bad

    def test_reference_fixture_interop(self, reference_test_data):
        f = os.path.join(reference_test_data, 'meg',
                         'subj01_1ksamples.tfrecords')
        if not os.path.exists(f):
            pytest.skip('meg fixture missing')
        count, bad = records.count_tfrecords(f)
        assert count == 1001 and not bad
        specs = records.discover_feature_shapes(f)
        assert specs['meg'].shape == [148]
        assert specs['envelope'].shape == [1]


class TestBytesFeatures:
    """bytes-list features round-trip through the TF-free codec (the
    reference stores string features the same way, ingest.py:1118)."""

    def test_bytes_roundtrip(self, tmp_path):
        path = str(tmp_path / 'b.tfrecords')
        payloads = [records.encode_example(
            {'f': np.asarray([0.5, 1.5], np.float32),
             'label': np.asarray([b'speaker%d' % i])})
            for i in range(3)]
        records.write_tfrecords(path, iter(payloads))
        got = [records.parse_example(p)
               for p in records.iter_tfrecords(path)]
        assert len(got) == 3
        assert got[1]['label'][0] == b'speaker1'
        np.testing.assert_allclose(got[2]['f'], [0.5, 1.5])

    def test_unicode_strings_encode_as_utf8(self):
        ex = records.encode_example(
            {'name': np.asarray(['héllo'], object)})
        parsed = records.parse_example(ex)
        assert parsed['name'][0].decode('utf-8') == 'héllo'
