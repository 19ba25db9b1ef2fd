"""Regression tests for the round-4 second review pass (migrate
family detection, keras_h5 sidecar gating, sweep-engine pad honoring,
subject-parallel streaming over-pad subjects)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(13)


def _fake_saved_model(tmp_path, monkeypatch, tensors):
    """Stages an on-disk stub + patched bundle reader for migrate."""
    from telluride_decoding_tpu.models import migrate
    d = tmp_path / 'saved_model'
    os.makedirs(d / 'variables', exist_ok=True)
    (d / 'variables' / 'variables.index').write_bytes(b'')
    monkeypatch.setattr(migrate, 'read_tensor_bundle',
                        lambda prefix: tensors)
    return str(d)


class TestMigrateFamilyDetection:

    def test_zero_hidden_classifier_refused(self, tmp_path, rng,
                                            monkeypatch):
        """A classifier with --hidden_units '' checkpoints as ONE
        dense kernel — shape-identical to plain linear. The embedded
        flags JSON must win: loading it as linear would silently drop
        the sigmoid and the input_1/input_2 concat."""
        from telluride_decoding_tpu.models.migrate import (
            load_reference_saved_model)
        meta = json.dumps({'dnn_regressor': 'classifier',
                           'hidden_units': ''})
        tensors = {
            'telluride_metadata/.ATTRIBUTES/VARIABLE_VALUE':
                np.array([meta.encode('utf-8')], object),
            'variables/0/.ATTRIBUTES/VARIABLE_VALUE':
                rng.randn(12, 1).astype(np.float32),
            'variables/1/.ATTRIBUTES/VARIABLE_VALUE':
                rng.randn(1).astype(np.float32),
        }
        path = _fake_saved_model(tmp_path, monkeypatch, tensors)
        with pytest.raises(ValueError, match='classifier'):
            load_reference_saved_model(path)

    def test_fullyconnected_metadata_refused(self, tmp_path, rng,
                                             monkeypatch):
        from telluride_decoding_tpu.models.migrate import (
            load_reference_saved_model)
        meta = json.dumps({'dnn_regressor': 'fullyconnected'})
        tensors = {
            'telluride_metadata/.ATTRIBUTES/VARIABLE_VALUE':
                np.array([meta.encode('utf-8')], object),
            'dense/kernel/.ATTRIBUTES/VARIABLE_VALUE':
                rng.randn(12, 1).astype(np.float32),
        }
        path = _fake_saved_model(tmp_path, monkeypatch, tensors)
        with pytest.raises(ValueError, match='fullyconnected'):
            load_reference_saved_model(path)

    def test_linear_metadata_still_loads(self, tmp_path, rng,
                                         monkeypatch):
        from telluride_decoding_tpu.models.migrate import (
            load_reference_saved_model)
        meta = json.dumps({'dnn_regressor': 'linear'})
        kernel = rng.randn(6, 1).astype(np.float32)
        bias = rng.randn(1).astype(np.float32)
        tensors = {
            'telluride_metadata/.ATTRIBUTES/VARIABLE_VALUE':
                np.array([meta.encode('utf-8')], object),
            'variables/0/.ATTRIBUTES/VARIABLE_VALUE': kernel,
            'variables/1/.ATTRIBUTES/VARIABLE_VALUE': bias,
        }
        path = _fake_saved_model(tmp_path, monkeypatch, tensors)
        model = load_reference_saved_model(path)
        np.testing.assert_array_equal(model.params['w'], kernel)

    def test_malformed_positional_checkpoint_clean_error(
            self, tmp_path, rng, monkeypatch):
        """A 4-variable positional checkpoint with a scalar entry must
        raise the 'Unrecognized reference model' ValueError, not an
        IndexError from indexing shapes before checking ndim."""
        from telluride_decoding_tpu.models.migrate import (
            load_reference_saved_model)
        tensors = {
            'variables/0/.ATTRIBUTES/VARIABLE_VALUE':
                np.float32(1.0).reshape(()),
            'variables/1/.ATTRIBUTES/VARIABLE_VALUE':
                np.float32(2.0).reshape(()),
            'variables/2/.ATTRIBUTES/VARIABLE_VALUE':
                rng.randn(3, 2).astype(np.float32),
            'variables/3/.ATTRIBUTES/VARIABLE_VALUE':
                rng.randn(3, 2).astype(np.float32),
        }
        path = _fake_saved_model(tmp_path, monkeypatch, tensors)
        with pytest.raises(ValueError, match='Unrecognized reference'):
            load_reference_saved_model(path)


class TestKerasSidecarGate:

    def test_sidecar_written_without_metadata(self, tmp_path, rng):
        """telluride_inputs/telluride_output must round-trip through
        the H5 sidecar even when telluride_metadata is unset (the
        SavedModel exporter persists each independently)."""
        h5py = pytest.importorskip('h5py')
        del h5py
        from telluride_decoding_tpu.io.keras_h5 import export_keras_h5
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelLinearRegression)
        model = BrainModelLinearRegression(input_width=4,
                                           output_width=1)
        model.params = {'w': rng.randn(4, 1).astype(np.float32),
                        'b': np.zeros((1,), np.float32)}
        model.telluride_inputs = json.dumps({'input_1': [None, 4]})
        model.telluride_output = json.dumps([None, 1])
        path = str(tmp_path / 'm.h5')
        export_keras_h5(model, path)
        sidecar = str(tmp_path / 'm.telluride.json')
        assert os.path.exists(sidecar)
        side = json.load(open(sidecar))
        assert side['telluride_inputs'] == model.telluride_inputs
        assert side['telluride_output'] == model.telluride_output
        assert side['telluride_metadata'] == ''


class TestEnginePadHonoring:

    def _files(self, rng, num, length, d=3):
        xs = [rng.randn(length, d).astype(np.float32)
              for _ in range(num)]
        ys = [(x[:, :1] * 0.5 + 0.01 *
               rng.randn(length, 1).astype(np.float32)) for x in xs]
        return xs, ys

    def test_uniform_cohort_shares_one_moments_compile(self, rng):
        """Subjects with internally-uniform but DIFFERENT shapes must
        compile the padded moments program once when cohort pads are
        declared (the no-padding fast path only applies when shapes
        already equal the pads)."""
        from telluride_decoding_tpu.sweep import engine
        before = engine._stacked_moments._cache_size()
        base = None
        for num, length in ((3, 50), (4, 60), (2, 40)):
            xs, ys = self._files(rng, num, length)
            stats = engine.per_file_stats(xs, ys, want_syy=True,
                                          pad_files_to=4,
                                          pad_frames_to=60)
            assert stats.count.shape[0] == 4
            if base is None:
                base = engine._stacked_moments._cache_size() - before
        assert engine._stacked_moments._cache_size() - before == base

    def test_padded_stats_match_unpadded(self, rng):
        """File-axis pads carry exact zero statistics; the real files'
        stats are unchanged by padding."""
        from telluride_decoding_tpu.sweep import engine
        xs, ys = self._files(rng, 3, 50)
        plain = engine.per_file_stats(xs, ys, want_syy=True)
        padded = engine.per_file_stats(xs, ys, want_syy=True,
                                       pad_files_to=6,
                                       pad_frames_to=80)
        import jax
        jax.tree.map(
            lambda p, u: np.testing.assert_allclose(
                np.asarray(p)[:3], np.asarray(u), rtol=1e-5,
                atol=1e-5),
            padded, plain)
        jax.tree.map(
            lambda p: np.testing.assert_array_equal(
                np.asarray(p)[3:], 0.0), padded)

    def test_ctx_padded_stats_match(self, rng):
        from telluride_decoding_tpu.sweep import engine
        import jax
        ctx = engine.ContextSpec(0, 2, 0, 0)
        n = 40
        xs = [rng.randn(n + ctx.x_post, 3).astype(np.float32)
              for _ in range(3)]
        ys = [rng.randn(n, 1).astype(np.float32) for _ in range(3)]
        plain = engine.per_file_stats(xs, ys, want_syy=True,
                                      context=ctx)
        padded = engine.per_file_stats(xs, ys, want_syy=True,
                                       pad_files_to=5,
                                       pad_frames_to=55, context=ctx)
        assert padded.count.shape[0] == 5
        jax.tree.map(
            lambda p, u: np.testing.assert_allclose(
                np.asarray(p)[:3], np.asarray(u), rtol=1e-5,
                atol=1e-5),
            padded, plain)

    def test_subject_parallel_streaming_overpad_subject(self, rng):
        """A streamed subject exceeding the declared pad_files_to must
        compute correctly through the subject-sharded mesh path (the
        group re-pads to its own maximum) instead of crashing in
        make_array_from_single_device_arrays."""
        import jax
        from telluride_decoding_tpu.sweep import engine
        if jax.device_count() < 2:
            pytest.skip('needs a multi-device mesh')
        subjects = {}
        for i, num_files in enumerate((2, 5, 3)):
            xs, ys = self._files(rng, num_files, 40)
            subjects['s%d' % i] = (xs, ys)
        mesh = engine.default_mesh('subject')
        lambdas = [1e-4, 1e-1]
        serial = engine.multi_subject_sweep(
            dict(subjects), lambdas, subject_parallel=False)
        streamed = engine.multi_subject_sweep(
            iter(subjects.items()), lambdas, subject_parallel=True,
            mesh=mesh, pad_files_to=3, pad_frames_to=40)
        for name in subjects:
            np.testing.assert_allclose(
                streamed[name].correlations,
                serial[name].correlations, rtol=1e-4, atol=1e-5)


class TestReferenceProtocolCorners:

    def test_reference_protocol_reshuffles_each_epoch(self, rng):
        """Which frames survive the drop is realized once, but
        multi-epoch SGD iteration must still reshuffle WITHIN them —
        the reference reshuffles every epoch (shuffle after repeat)."""
        from telluride_decoding_tpu.data.brain_data import TestBrainData
        n = 600
        eeg = rng.randn(n, 2).astype(np.float32)
        inten = rng.randn(n, 1).astype(np.float32)
        bd = TestBrainData('input_1', 'output', 100.0,
                           final_batch_size=128, repeat_count=2,
                           shuffle_buffer_size=1000,
                           reference_protocol=True)
        bd.preserve_test_data(eeg, inten)
        ds = bd.create_dataset('train')
        batches = [x['input_1'].copy() for x, _ in ds]
        per_epoch = len(batches) // 2
        assert per_epoch == 512 // 128     # drop_remainder realized.
        epoch1 = np.concatenate(batches[:per_epoch])
        epoch2 = np.concatenate(batches[per_epoch:])
        # Same SET of kept frames...
        assert (sorted(map(tuple, epoch1.tolist()))
                == sorted(map(tuple, epoch2.tolist())))
        # ...in a different order.
        assert not np.array_equal(epoch1, epoch2)

    def test_offset_only_honored_on_memory_data_both_protocols(
            self, rng):
        """The reference's offset-only quirk is specific to its
        TFRecord path (reference brain_data.py:760-763 gates windowing
        on nonzero pre/post context); its in-memory TestBrainData
        gates on `... or input_offset` (brain_data.py:581-584) and so
        HONORS a lone input_offset. The rebuild scopes the bug-faithful
        skip to TFExampleData (_reference_offset_quirk); memory-backed
        data applies the offset under BOTH protocols. (This test
        originally asserted the quirk on TestBrainData — wrong per the
        reference source; the TFRecord-side quirk is pinned in
        test_review_fixes9.py::TestOffsetQuirkScoping.)"""
        from telluride_decoding_tpu.data.brain_data import TestBrainData

        def build(reference_protocol):
            bd = TestBrainData('input_1', 'output', 100.0,
                               final_batch_size=64, input_offset=5,
                               shuffle_buffer_size=0,
                               reference_protocol=reference_protocol)
            n = 200
            r = np.random.RandomState(3)
            eeg = r.randn(n, 2).astype(np.float32)
            inten = np.arange(n, dtype=np.float32).reshape(-1, 1)
            bd.preserve_test_data(eeg, inten)
            x, _, out, _ = bd.load_arrays('train')
            return eeg, x, out

        eeg, x_ref, _ = build(reference_protocol=True)
        np.testing.assert_array_equal(x_ref, eeg[5:])  # Shifted.
        eeg, x_def, _ = build(reference_protocol=False)
        np.testing.assert_array_equal(x_def, eeg[5:])  # Shifted.


class TestThirdReviewBatch:

    def test_fit_arrays_not_pinned_when_training_raises(self, rng,
                                                        monkeypatch):
        """An exception inside the jitted trainer must not leave the
        assembled corpus pinned on the instance (memory is scarcest
        exactly then)."""
        from telluride_decoding_tpu.data.brain_data import TestBrainData
        from telluride_decoding_tpu.models import brain_model
        bd = TestBrainData('input_1', 'output', 100.0,
                           final_batch_size=32)
        bd.preserve_test_data(rng.randn(200, 3).astype(np.float32),
                              rng.randn(200, 1).astype(np.float32))
        model = brain_model.BrainModelDNN(input_width=3,
                                           output_width=1,
                                           num_hidden_list=[4],
                                           batch_norm=True)

        def boom(*a, **k):
            raise RuntimeError('trainer exploded')
        monkeypatch.setattr(brain_model.optax, 'adam', boom)
        with pytest.raises(RuntimeError, match='trainer exploded'):
            model.fit(bd.create_dataset('train'))
        assert getattr(model, '_fit_arrays', None) is None

    def test_audio_resample_passthrough_is_stateless(self, rng):
        """fs_out >= fs_in with window <= 1: streaming chunks pass
        through once each (the reference re-emits the whole history
        and grows its buffer without bound)."""
        from telluride_decoding_tpu.signal.preprocess import (
            AudioFeatures)
        af = AudioFeatures('a', 64, 64, window=1)
        c1 = rng.randn(50, 1)
        c2 = rng.randn(30, 1)
        o1 = af.audio_resample(c1)
        o2 = af.audio_resample(c2)
        assert o1.shape[0] == 50 and o2.shape[0] == 30
        np.testing.assert_array_equal(o2, c2)
        assert af._buff is None or af._buff.shape[0] == 0

    def test_audio_resample_zero_tail_keep_is_bounded(self, rng):
        """Sub-sample half-windows (e.g. 100 -> 64 Hz, window 1) must
        keep an EMPTY tail, not the whole history (data[-0:])."""
        from telluride_decoding_tpu.signal.preprocess import (
            AudioFeatures)
        af = AudioFeatures('a', 100, 64, window=1)
        total = 0
        for _ in range(5):
            total += af.audio_resample(rng.randn(100, 1)).shape[0]
            assert af._buff.shape[0] == 0
        assert total == pytest.approx(5 * 64, abs=5)

    def test_reref_does_not_mutate_caller_and_accepts_ints(self):
        from telluride_decoding_tpu.signal.preprocess import (
            Preprocessor)
        pp = Preprocessor('eeg', 64, 64, ref_channels=[[0]],
                          channels_to_ref=[[1, 2]])
        x = (np.arange(30).reshape(10, 3) * 7 % 11).astype(np.int16)
        before = x.copy()
        out = pp.process(x)
        np.testing.assert_array_equal(x, before)   # Caller unchanged.
        assert out.dtype in (np.float32, np.float64)
        np.testing.assert_allclose(out[:, 1], before[:, 1] - before[:, 0])

    def test_param_string_validates_like_kwargs(self):
        from telluride_decoding_tpu.signal.preprocess import (
            Preprocessor)
        with pytest.raises(ValueError, match='highpass_cutoff'):
            Preprocessor('eeg(highpass_cutoff=-1)', 64, 64)
        with pytest.raises(ValueError, match='highpass_order'):
            Preprocessor('eeg(highpass_cutoff=2;highpass_order=0)',
                         64, 64)

    def test_trial_name_suffix_stripped_once(self):
        from telluride_decoding_tpu.io.ingest import (BrainExperiment,
                                                      BrainTrial)
        assert (BrainTrial('story.wav_take2.wav').trial_name
                == 'story.wav_take2')
        assert (BrainExperiment.delete_suffix('x.wav.wav', '.wav')
                == 'x.wav')

    def test_edf_without_dir_raises_ioerror(self, tmp_path):
        from telluride_decoding_tpu.io import ingest
        trial = ingest.BrainTrial('t1')
        edf = ingest.EdfBrainDataFile('missing.edf')
        with pytest.raises(IOError, match='directory is required'):
            trial.load_brain_data(None, edf)

    def test_ssd_traces_seeded_like_reference(self, rng):
        """z_dyn/eta_dyn start with k_w zero entries (reference
        attention_decoder.py:244-248) so trace index aligns with call
        index for analysis scripts."""
        from telluride_decoding_tpu.decide.attention_decoder import (
            create_attention_decoder)
        dec = create_attention_decoder('ssd', window_step=100,
                                       frame_rate=100.0,
                                       ssd_offset=2.0)
        k_w = dec.k_w
        assert len(dec.z_dyn) == k_w and len(dec.eta_dyn) == k_w
        r = np.exp(rng.randn(k_w + 5) * 0.3 - 1.0)
        dec.tune(r, r * 0.5)
        for i in range(k_w + 5):
            dec.attention(r[i], 0.5 * r[i])
        assert len(dec.z_dyn) == (k_w + 5) + 1


def _varint(n):
    out = b''
    while True:
        b = n & 0x7f
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _ld(field, payload):
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


class TestRecordsProtoEdgeCases:

    def test_unknown_varint_field_in_map_entry(self):
        """Unknown non-length-delimited fields (wire type 0) in a
        Features map entry must be skipped by wire type, not have
        their VALUE misread as a byte length."""
        import struct
        from telluride_decoding_tpu.data import records
        floats = struct.pack('<3f', 1.0, 2.0, 3.0)
        feature = _ld(2, _ld(1, floats))          # FloatList.value
        entry = (_varint((3 << 3) | 0) + _varint(300)   # unknown varint
                 + _ld(1, b'eeg') + _ld(2, feature))
        example = _ld(1, _ld(1, entry))           # Example.features.map
        parsed = records.parse_example(memoryview(example))
        np.testing.assert_array_equal(parsed['eeg'],
                                      np.asarray([1., 2., 3.], '<f4'))

    def test_split_float_list_submessages_merge(self):
        """Repeated embedded float_list submessages MERGE (proto field
        semantics); returning only the first silently truncates rows
        from non-TF writers."""
        import struct
        from telluride_decoding_tpu.data import records
        f1 = struct.pack('<2f', 1.0, 2.0)
        f2 = struct.pack('<2f', 3.0, 4.0)
        feature = _ld(2, _ld(1, f1)) + _ld(2, _ld(1, f2))
        entry = _ld(1, b'eeg') + _ld(2, feature)
        example = _ld(1, _ld(1, entry))
        parsed = records.parse_example(memoryview(example))
        np.testing.assert_array_equal(parsed['eeg'],
                                      np.asarray([1., 2., 3., 4.], '<f4'))

    def test_bytes_list_skips_unknown_varint(self):
        from telluride_decoding_tpu.data import records
        blist = (_varint((9 << 3) | 0) + _varint(7)   # unknown varint
                 + _ld(1, b'abc'))
        feature = _ld(1, blist)                   # BytesList
        entry = _ld(1, b'name') + _ld(2, feature)
        example = _ld(1, _ld(1, entry))
        parsed = records.parse_example(memoryview(example))
        assert parsed['name'].tolist() == [b'abc']


class TestInferDecoderEdgeCases:

    def test_empty_transform_dataset_returns_empty_windows(self, rng):
        """A mixup dataset shorter than one minibatch yields zero
        batches; the iterator path must return empty results like the
        fast path, not crash in np.concatenate."""
        from telluride_decoding_tpu.data.brain_data import TestBrainData
        from telluride_decoding_tpu.decode import infer_decoder
        bd = TestBrainData('input_1', 'output', 100.0,
                           final_batch_size=200)
        bd.preserve_test_data(rng.randn(150, 2).astype(np.float32),
                              rng.randn(150, 1).astype(np.float32))
        ds = bd.create_dataset('train', mixup_batch=True)
        assert ds.has_batch_transforms
        dec = infer_decoder.LinearRegressionDecoder(
            lambda d: d['input_1'][:, :1], reduction='first')
        scores, labels = dec.test_by_window_means(ds, 50)
        assert scores.shape == (0,) and labels.shape == (0,)

    def test_window_means_equals_full_path(self, rng):
        from telluride_decoding_tpu.data.brain_data import TestBrainData
        from telluride_decoding_tpu.decode import infer_decoder
        bd = TestBrainData('input_1', 'output', 100.0,
                           final_batch_size=64)
        bd.preserve_test_data(rng.randn(500, 2).astype(np.float32),
                              rng.randn(500, 1).astype(np.float32))
        ds = bd.create_dataset('program_test')
        dec = infer_decoder.LinearRegressionDecoder(
            lambda d: d['input_1'][:, :1], reduction='first')
        s, l = dec.frame_scores(ds)
        for w in (10, 100):
            ws, wl = infer_decoder.Decoder.window_means(s, l, w)
            full_s, full_l = dec.test_by_window_means(ds, w)
            np.testing.assert_array_equal(ws, full_s)
            np.testing.assert_array_equal(wl, full_l)


class TestGdriveCachePoisoning:

    def test_empty_body_not_cached(self, tmp_path):
        from telluride_decoding_tpu.cli import regression_data
        empty = tmp_path / 'empty.bin'
        empty.write_bytes(b'')
        out = tmp_path / 'cache' / 'data.mat'
        got = regression_data.download_from_gdrive(
            'file://' + str(empty), str(out))
        assert got is None
        assert not out.exists()
