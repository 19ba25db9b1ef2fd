"""Round-3 review fixes over io/ + utils/ (each pinned here).

Findings: EDF record_duration 8-char truncation drifting read-back
sample rates; EDF odd-byte truncation crash; BDF '24BIT' reserved
marker; EdfBrainDataFile None-channel-index returning the whole
matrix; degenerate-std z-score guard that could never fire; mono-audio
trigger-channel IndexError; mode-histogram fs=0/max_time interaction;
remove_close_times on empty input; results parser crash on truncated
lines; snappy per-byte Python loop on non-overlapping copies.
"""

import io as _io
import os

import numpy as np
import pytest

from telluride_decoding_tpu.io import edf as edf_io
from telluride_decoding_tpu.io import ingest


class TestEdfFixes:

    def test_fractional_record_duration_roundtrips_exactly(
            self, tmp_path, rng):
        """1/30 s records: the written header value must be what spr
        was computed from, so read-back rates are exact (was: '%g'
        truncation put a 10 ppm drift on every rate)."""
        path = str(tmp_path / 'f.edf')
        sig = rng.randn(300).astype(np.float64)
        edf_io.write_edf(path, [sig], ['ch1'], [300.0],
                         record_duration=1.0 / 30.0)
        got = edf_io.read_edf(path)
        assert got['sample_rates'][0] == pytest.approx(300.0, abs=1e-9)

    def test_truncated_at_odd_byte_reads_complete_records(
            self, tmp_path, rng):
        path = str(tmp_path / 't.edf')
        sig = rng.randn(500).astype(np.float64)
        edf_io.write_edf(path, [sig], ['ch1'], [100.0])
        raw = open(path, 'rb').read()
        with open(path, 'wb') as f:
            f.write(raw[:-3])           # Kill mid-sample (odd offset).
        got = edf_io.read_edf(path)     # Was: frombuffer ValueError.
        assert got['signal_list'][0].shape[0] >= 400

    def test_bdf_reserved_field_carries_24bit_marker(self, tmp_path,
                                                     rng):
        path = str(tmp_path / 'b.bdf')
        edf_io.write_edf(path, [rng.randn(256)], ['ch1'], [256.0],
                         bdf=True)
        raw = open(path, 'rb').read()
        assert raw[192:236].decode('ascii').startswith('24BIT')
        # And our own reader still round-trips it.
        got = edf_io.read_edf(path)
        assert got['signal_list'][0].shape[0] == 256

    def test_missing_edf_channel_raises(self, tmp_path, rng):
        path = str(tmp_path / 'c.edf')
        edf_io.write_edf(path, [rng.randn(100)], ['EEG1'], [100.0])
        f = ingest.EdfBrainDataFile(os.path.basename(path))
        f.load_all_data(os.path.dirname(path))
        with pytest.raises(ValueError, match='not in EDF signals'):
            f.signal_values('nope')
        with pytest.raises(ValueError, match='not in EDF signals'):
            f.signal_fs('nope')
        assert f.signal_values('EEG1').shape[0] == 100
        assert float(f.signal_fs('EEG1')) == pytest.approx(100.0)


class TestIngestFixes:

    def test_mono_audio_trigger_channel_raises_cleanly(self):
        trial = ingest.BrainTrial('t')
        trial.load_sound(np.abs(np.random.RandomState(0).randn(100, 1)),
                         sound_fs=100.0)
        with pytest.raises(ValueError, match='Trigger channel'):
            trial.find_audio_trigger_times()

    def test_remove_close_times_empty(self):
        out = ingest.remove_close_times(np.array([]))
        assert out.shape == (0,)

    def test_mode_histogram_without_fs_honors_max_time(self):
        # fs=0 (documented 'returned in samples'): max_time must window
        # in the given units, not multiply to zero and drop every pair.
        offset = ingest.find_temporal_offset_via_mode_histogram(
            [1.0, 2.0, 3.0], [1.5, 2.5, 3.5], max_time=1.0)
        assert offset == 0   # int truncation of +0.5 mode bins.

    def test_mode_histogram_no_pairs_is_descriptive(self):
        with pytest.raises(ValueError, match='No trigger-time pairs'):
            ingest.find_temporal_offset_via_mode_histogram(
                [0.0], [100.0], max_time=1.0)

    def test_zscore_near_zero_std_guard(self):
        exp = ingest.BrainExperiment(
            {'t1': [{'f': np.full((10, 1), 3.0, np.float32)}]},
            frame_rate=10.0)
        exp.load_all_data()
        trial = next(exp.iterate_trials())
        trial.model_features['f'] = np.full((10, 1), 3.0, np.float32)
        exp.zscore_all_features('f', 3.0, 1e-30)   # Near-zero std.
        out = trial.model_features['f']
        assert np.max(np.abs(out)) < 1.0           # Not ~1e30.


class TestUtilsFixes:

    def test_results_parser_tolerates_truncated_lines(self, tmp_path):
        from telluride_decoding_tpu.utils.results import parse_results_file
        p = tmp_path / 'results.txt'
        p.write_text('Parameters: a=1;b=2\n'
                     'Final_Testing/incomplete\n'          # No colon.
                     'Final_Testing/loss: 0.5\n'
                     'Final_Test/partial\n'                # No colon.
                     'Final_Test/acc: 0.9 0.8\n')
        params, metrics = parse_results_file(str(p))
        assert params['a'] == '1'
        assert metrics['loss'] == 0.5

    def test_snappy_nonoverlapping_copy_fast_path(self):
        from telluride_decoding_tpu.io.tf_checkpoint import (
            snappy_decompress)
        # Build a snappy stream: literal 'abcd' then copy(len=4,
        # offset=4) -> 'abcdabcd'; then an overlapping copy(len=6,
        # offset=2) -> + 'cdcdcd'... run-length semantics.
        payload = bytearray()
        payload.append(12)                 # preamble varint: total=12
        payload.append((4 - 1) << 2)       # literal, len 4
        payload += b'abcd'
        payload.append((1 << 0) | ((4 - 4) << 2) | (0 << 5))  # copy1
        payload.append(4)                  # offset 4
        payload.append((1 << 0) | ((4 - 4) << 2) | (0 << 5))  # copy1
        payload.append(2)                  # offset 2 (overlapping)
        out = snappy_decompress(bytes(payload))
        assert out == b'abcdabcdcdcd'


class TestDecodeSignalFixes:
    """Round-3 review fixes over decode/ + decide/ + signal/."""

    def test_two_result_store_pre_context_stays_aligned(self):
        """With pre_context > 0 the first (zero-padded) window must
        pair with the first label window, not be dropped (was:
        permanent one-step mislabeling inherited from the reference's
        nested-loop pairing)."""
        from telluride_decoding_tpu.decode.result_store import (
            TwoResultStore)
        store = TwoResultStore(window_width=10, window_step=5,
                               pre_context=4)
        s1 = np.arange(100, dtype=np.float32)[:, None]
        s2 = np.arange(1000, 1100, dtype=np.float32)[:, None]
        pairs = []
        for start in range(0, 100, 7):
            store.add_data(s1[start:start + 7], s2[start:start + 7])
            pairs.extend(store.next_window())
        # Window i of stream 1 covers [i*5 - 4, i*5 + 6) (centered,
        # zeros before the stream start); window i of stream 2 covers
        # [i*5, i*5 + 10) (causal).
        assert len(pairs) > 10
        for i, (w1, w2) in enumerate(pairs):
            want1 = np.concatenate(
                [np.zeros(max(0, 4 - i * 5)),
                 np.arange(max(0, i * 5 - 4), i * 5 + 6)])
            np.testing.assert_array_equal(w1[:, 0], want1)
            np.testing.assert_array_equal(
                w2[:, 0], 1000 + np.arange(i * 5, i * 5 + 10))

    def test_lda_reduction_without_model_raises_clearly(self):
        from telluride_decoding_tpu.decode.infer_decoder import Decoder
        rng = np.random.RandomState(42)
        dec = Decoder(lambda d: np.asarray(d['input_1'][:, :2]),
                      reduction='lda')
        dec.add_data_correlator(rng.randn(50, 2), rng.randn(50, 2))
        with pytest.raises(ValueError, match='LDA model'):
            dec.infer_one({'input_1': rng.randn(20, 4),
                           'input_2': rng.randn(20, 1)},
                          rng.randn(20, 2))

    def test_sosfilt_one_compile_across_lengths(self, rng):
        """Ragged recordings share ONE compiled filter program (frame
        axis padded to a bucket) and still match scipy exactly,
        including the carried state at the true end."""
        import scipy.signal
        from telluride_decoding_tpu.signal import filters
        sos = filters.butter_sos(4, 8.0, 'highpass', 100.0)
        sizes_before = filters._sosfilt_core._cache_size()
        for n in (333, 1000, 4096, 5000):
            x = rng.randn(n, 3).astype(np.float32)
            y, zf = filters.sosfilt(sos, x)
            want_y, want_zf = scipy.signal.sosfilt(
                sos, x.astype(np.float64), axis=0,
                zi=np.zeros((sos.shape[0], 2, 3)))
            np.testing.assert_allclose(np.asarray(y), want_y,
                                       atol=2e-4)
            np.testing.assert_allclose(np.asarray(zf), want_zf,
                                       atol=2e-4)
        grew = filters._sosfilt_core._cache_size() - sizes_before
        assert grew <= 2, grew   # One bucket (<=4096) + one (8192).

    def test_dprime_keeps_float64(self):
        from telluride_decoding_tpu.decode.metrics import (
            calculate_dprime)
        d1 = np.float64([1.0 + 1e-12, 1.0, 1.0 - 1e-12])
        d2 = np.float64([1.0 + 3e-12, 1.0 + 2e-12, 1.0 + 1e-12])
        got = calculate_dprime(d1, d2)
        want = (d2.mean() - d1.mean()) / np.sqrt(
            (d1.var() + d2.var()) / 2.0)
        assert got == pytest.approx(float(want), rel=1e-9)

    def test_ssd_constants_cached_until_tune(self):
        from telluride_decoding_tpu.decide.attention_decoder import (
            StateSpaceAttentionDecoder)
        dec = StateSpaceAttentionDecoder(20, 1, 10, 4.0)
        c1 = dec._constants()
        assert dec._constants() is c1
        dec.tune_log_normal_priors(
            np.abs(np.random.RandomState(0).randn(500)) + 0.1,
            np.abs(np.random.RandomState(1).randn(500)) * 0.3 + 0.05)
        assert dec._constants() is not c1


class TestModelsSolversFixes:
    """Round-3 review fixes over models/ + solvers/ + ops/."""

    def test_shrinkage_recovers_planted_weights(self, rng):
        """Blankertz/LW blends use the NORMALIZED eigenvalue mean; the
        reference's unnormalized-scatter mu made the identity term ~N
        times the covariance and collapsed weights toward zero."""
        from telluride_decoding_tpu.solvers.ridge import (
            calculate_linear_regressor_parameters)
        w = rng.randn(4, 1).astype(np.float32)
        for n in (500, 5000):
            x = rng.randn(n, 4).astype(np.float32)
            y = x @ w + 0.1 * rng.randn(n, 1).astype(np.float32)
            for lamb in (-1, 0.05):
                sol = calculate_linear_regressor_parameters(
                    x, y, lamb=lamb, use_ridge=False)
                np.testing.assert_allclose(np.asarray(sol.w), w,
                                           atol=0.1)

    def test_pearson_width_mismatch_raises(self, rng):
        from telluride_decoding_tpu.ops.pearson import (
            pearson_correlation, pearson_correlation_second)
        with pytest.raises(ValueError, match='equal widths'):
            pearson_correlation(rng.randn(50, 3), rng.randn(50, 1))
        with pytest.raises(ValueError, match='2 output dimensions'):
            pearson_correlation_second(rng.randn(50, 1),
                                       rng.randn(50, 1))

    def test_sgd_fit_uses_all_frames(self, rng):
        """n=96, batch_size=64: the floor division trained on only 64
        frames/epoch. A linearly-solvable problem must now converge
        with frames that only appear in the remainder batch."""
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelDNN)
        n = 96
        x = rng.randn(n, 3).astype(np.float32)
        w = rng.randn(3, 1).astype(np.float32)
        y = x @ w
        model = BrainModelDNN(input_width=3, output_width=1,
                              num_hidden_list=[])
        model.compile(learning_rate=0.05)
        data = [({'input_1': x, 'input_2': x[:, :1]}, y)]
        model.fit(data, epochs=300, batch_size=64)
        res = model.evaluate(data)
        assert res['pearson_correlation_first'] > 0.98

    def test_evaluate_reports_compiled_pearson_loss(self, rng):
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelDNN)
        from telluride_decoding_tpu.ops.pearson import pearson_loss
        x = rng.randn(200, 3).astype(np.float32)
        y = (x[:, :1] * 2.0).astype(np.float32)
        data = [({'input_1': x, 'input_2': x[:, :1]}, y)]
        model = BrainModelDNN(input_width=3, output_width=1,
                              num_hidden_list=[4])
        model.compile(learning_rate=0.01, loss='pearson')
        model.fit(data, epochs=5, batch_size=100)
        res = model.evaluate(data)
        pred = model.predict(data)
        want = float(np.sum(np.asarray(pearson_loss(y, pred))))
        assert res['loss'] == pytest.approx(want, abs=1e-4)
        # And mse compile still reports mse.
        model2 = BrainModelDNN(input_width=3, output_width=1,
                               num_hidden_list=[4])
        model2.compile(learning_rate=0.01)
        model2.fit(data, epochs=2, batch_size=100)
        res2 = model2.evaluate(data)
        pred2 = model2.predict(data)
        assert res2['loss'] == pytest.approx(
            float(np.mean((pred2 - y) ** 2)), abs=1e-5)

    def test_lda_bucketed_one_compile_and_parity(self, rng):
        from telluride_decoding_tpu.solvers import lda as lda_mod
        sizes_before = lda_mod._lda_fit_kernel._cache_size()
        results = []
        for n in (333, 1000, 2048):
            x = np.concatenate([rng.randn(n, 2) + [2, 0],
                                rng.randn(n, 2) - [2, 0]]).astype(
                                    np.float32)
            y = np.concatenate([np.zeros(n), np.ones(n)])
            m = lda_mod.ScaledLinearDiscriminantAnalysis()
            out = m.fit_transform(x, y)
            results.append(out)
            # Class means map exactly to 0/1 regardless of padding.
            assert np.mean(out[:n, 0]) == pytest.approx(0.0, abs=1e-4)
            assert np.mean(out[n:, 0]) == pytest.approx(1.0, abs=1e-4)
        grew = lda_mod._lda_fit_kernel._cache_size() - sizes_before
        assert grew <= 2, grew    # 1024-ish buckets: 2048 and 4096.

    def test_lda_restored_variance_ratio_raises_clearly(self, rng):
        from telluride_decoding_tpu.solvers.lda import (
            ScaledLinearDiscriminantAnalysis)
        x = np.concatenate([rng.randn(50, 2) + [2, 0],
                            rng.randn(50, 2) - [2, 0]]).astype(
                                np.float32)
        y = np.concatenate([np.zeros(50), np.ones(50)])
        src = ScaledLinearDiscriminantAnalysis()
        src.fit(x, y)
        dst = ScaledLinearDiscriminantAnalysis()
        dst.model_parameters = src.model_parameters
        with pytest.raises(ValueError, match='Eigenvalues unavailable'):
            dst.explained_variance_ratio()
        # The restored projection itself still works.
        np.testing.assert_allclose(dst.transform(x), src.transform(x),
                                   atol=1e-5)


class TestDataCliFixes:
    """Round-3 review fixes over data/ + cli/ + parallel/."""

    def test_spec_dataset_sizes_without_materializing(self, tmp_path,
                                                      rng):
        from telluride_decoding_tpu.data import brain_data, records
        d = tmp_path / 'r'
        d.mkdir()
        records.convert_data_to_tfrecords(
            {'eeg': rng.randn(50, 4).astype(np.float32),
             'env': rng.randn(50, 2).astype(np.float32)},
            str(d / 't00.tfrecords'))
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, pre_context=2, post_context=2,
            data_dir=str(d), train_file_pattern='t')
        spec = bd.spec_dataset()
        spec_in, spec_out = spec.element_spec
        assert spec_in['input_1'][0] == 4 * 5
        assert spec_out[0] == 2
        assert spec.num_frames == 0          # Nothing materialized.

    def test_run_decoding_experiment_never_loads_dense_train_when_streaming(
            self, tmp_path, rng, monkeypatch):
        """With auto-streaming active, the driver must NOT materialize
        the dense lag-stacked train split anywhere (was: a full copy
        was built at data_discovery just to read shapes)."""
        from telluride_decoding_tpu.cli import decoding
        from telluride_decoding_tpu.data import brain_data, records
        d = tmp_path / 'r'
        d.mkdir()
        for t in range(3):
            eeg = rng.randn(400, 4).astype(np.float32)
            records.convert_data_to_tfrecords(
                {'eeg': eeg, 'intensity': eeg[:, :1] * 2.0},
                str(d / ('t%02d.tfrecords' % t)))
        monkeypatch.setenv('TDT_STREAMING_AUTO_BYTES', '1')
        orig = brain_data.BrainData.load_arrays
        train_loads = []

        def spy(self, mode, temporal_context=True):
            if mode == 'train':
                train_loads.append(mode)
            return orig(self, mode, temporal_context)

        monkeypatch.setattr(brain_data.BrainData, 'load_arrays', spy)
        flags_ = decoding.DecodingOptions().set_from_dict(dict(
            tfexample_dir=str(d),
            input_field='eeg', output_field='intensity',
            attended_field='', dnn_regressor='linear',
            regularization_lambda=1e-4, pre_context=0, post_context=4,
            batch_size=100,
            train_file_pattern='allbut', validate_file_pattern='t02',
            test_file_pattern='t02', shuffle_buffer_size=0,
            summary_dir=str(tmp_path / 's'),
            saved_model_dir=str(tmp_path / 'm')))
        _, test_results, _ = decoding.run_decoding_experiment(flags_)
        assert test_results['pearson_correlation_first'] > 0.97
        assert not train_loads, 'dense train split was materialized'

    def test_cohort_routes_sgd_models_to_general_path(
            self, tmp_path, rng, monkeypatch):
        """A requested DNN/DCCA cohort must NOT silently run a ridge
        sweep (wrong-model science with a correct-looking CSV): it
        routes through the API-parity per-model jackknife."""
        from telluride_decoding_tpu.cli import cohort, decoding
        from telluride_decoding_tpu.sweep import engine
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            dnn_regressor='dcca'))
        called = {}

        def fake_general(flags_, subjects, lambdas, **kwargs):
            called['subjects'] = dict(subjects)
            return {'s': engine.SweepResult(
                np.ones((1, 2)), np.asarray([1e-4]), ['f0', 'f1'])}

        monkeypatch.setattr(cohort, 'general_cohort_results',
                            fake_general)
        monkeypatch.setattr(
            engine, 'multi_subject_sweep',
            lambda *a, **k: pytest.fail(
                'sweep engine must not run for dcca'))
        results, (mean, _) = cohort.run_cohort_sweep(
            my_flags, {'s': '/nonexistent'}, [1e-4])
        assert called['subjects'] == {'s': '/nonexistent'}
        assert mean.shape == (1,) and mean[0] == 1.0

    def test_serve_stream_orients_each_audio_independently(
            self, tmp_path, rng):
        from telluride_decoding_tpu.cli import serve
        from test_serve import _toy_model_dir   # pytest adds tests/ to sys.path.
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng, pre=0,
                                            post=0)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        want = serve.serve_stream(model_dir, eeg, a1, a2,
                                  chunk_size=40, reduction='first',
                                  window_width=100, window_step=100)
        # audio2 flat [N] (np.savez-style dropped trailing dim).
        got = serve.serve_stream(model_dir, eeg, a1, a2[:, 0],
                                 chunk_size=40, reduction='first',
                                 window_width=100, window_step=100)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g['score1'] == pytest.approx(w['score1'], abs=1e-6)

    def test_corrupt_varint_raises_corrupt_record_error(self):
        from telluride_decoding_tpu.data import records
        # 0x80-continuation bytes forever: runaway varint.
        bad = bytes([0x80] * 12)
        with pytest.raises(records.CorruptRecordError,
                           match='varint'):
            records.parse_example(bad)

    def test_regression_cli_honors_max_test_count(self, tmp_path, rng):
        import subprocess, sys
        d = tmp_path / 'r'
        d.mkdir()
        from telluride_decoding_tpu.data import records
        w = rng.randn(4, 1).astype(np.float32)
        for t in range(4):
            eeg = rng.randn(200, 4).astype(np.float32)
            records.convert_data_to_tfrecords(
                {'eeg': eeg, 'intensity': eeg @ w},
                str(d / ('t%02d.tfrecords' % t)))
        repo = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        env = dict(os.environ, PALLAS_AXON_POOL_IPS='',
                   JAX_PLATFORMS='cpu',
                   PYTHONPATH=repo + os.pathsep + os.environ.get(
                       'PYTHONPATH', ''))
        env.pop('XLA_FLAGS', None)
        proc = subprocess.run(
            [sys.executable, '-m',
             'telluride_decoding_tpu.cli.regression',
             '--test_name', 'telluride4_linear',
             '--tfexample_dir', str(d), '--output_field', 'intensity',
             '--post_context', '2', '--max_test_count', '2',
             '--regularization_list', '1e-4',
             '--results_csv_file', str(tmp_path / 'r.csv'),
             '--summary_base_dir', str(tmp_path / 's')],
            env=env, capture_output=True, text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-3000:]
        import csv as _csv
        rows = list(_csv.reader(open(tmp_path / 'r.csv')))
        assert len(rows[0]) == 1 + 2     # lambda + TWO held-out files.


class TestSweepNativeEntryFixes:
    """Round-3 review fixes over sweep/, _native/, and entry scripts."""

    def test_checkpoint_assemble_tolerates_nan_correlations(
            self, tmp_path):
        """A tile containing legitimately-NaN correlations (shrinkage
        at lambda=0 on rank-deficient data) must still assemble once
        all tiles exist (was: NaN doubled as the missing sentinel)."""
        from telluride_decoding_tpu.sweep.checkpoint import (
            SweepCheckpoint)
        ckpt = SweepCheckpoint(str(tmp_path), [0.0, 1.0],
                               ['f0', 'f1'])
        tile = np.array([[np.nan, 0.5]])
        ckpt.save_tile('l0-1', tile, slice(0, 1), slice(0, 2))
        assert ckpt.assemble() is None          # Missing second tile.
        ckpt.save_tile('l1-2', np.array([[0.7, 0.8]]),
                       slice(1, 2), slice(0, 2))
        out = ckpt.assemble()
        assert out is not None
        assert np.isnan(out[0, 0]) and out[0, 1] == 0.5
        assert out[1, 0] == 0.7

    def test_native_lib_loads_without_source(self, tmp_path,
                                             monkeypatch):
        """A prebuilt .so with the .cc missing must load, not silently
        fall back to the pure-Python codec."""
        import shutil
        from telluride_decoding_tpu import _native
        lib0 = _native.lib()
        if lib0 is None:
            pytest.skip('native build unavailable')
        so_copy = tmp_path / 'libtdt_records.so'
        shutil.copy(_native._SO, so_copy)
        monkeypatch.setattr(_native, '_SO', str(so_copy))
        monkeypatch.setattr(_native, '_SRC',
                            str(tmp_path / 'missing.cc'))
        monkeypatch.setattr(_native, '_LIB', None)
        monkeypatch.setattr(_native, '_TRIED', False)
        assert _native.lib() is not None

    def test_dryrun_multichip_single_device(self):
        """dryrun_multichip(1) must not NaN out (leave-one-out with
        one file trained on zero frames)."""
        import subprocess, sys
        repo = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        env = dict(os.environ, PALLAS_AXON_POOL_IPS='',
                   JAX_PLATFORMS='cpu', _GRAFT_DRYRUN_CHILD='1')
        env.pop('XLA_FLAGS', None)
        proc = subprocess.run(
            [sys.executable, '-c',
             'import sys; sys.path.insert(0, %r); '
             'import __graft_entry__ as g; g.dryrun_multichip(1)'
             % repo],
            env=env, capture_output=True, text=True, timeout=600)
        assert proc.returncode == 0, (proc.stdout + proc.stderr)[-2000:]
        assert 'dryrun_multichip OK' in proc.stdout
