"""Bounded-memory streaming dataset path (VERDICT r1 item 6).

streaming_moments accumulates per-file covariance statistics with one
raw file of host memory at a time and the lag stack applied on device
(the reference's streaming equivalent is the tf.data interleave
pipeline, brain_data.py:725-760). Pins: value parity with the dense
load_arrays path, fit parity for the linear and CCA models, and a
peak-RSS ceiling measured in a clean subprocess.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from telluride_decoding_tpu.data import brain_data, records
from telluride_decoding_tpu.ops.covariance import moments_from_arrays


def _write_files(tmp_path, rng, lengths, channels=4, out_width=2):
    d = tmp_path / 'records'
    d.mkdir()
    for i, n in enumerate(lengths):
        records.convert_data_to_tfrecords(
            {'eeg': rng.randn(n, channels).astype(np.float32),
             'env': rng.randn(n, out_width).astype(np.float32)},
            str(d / ('t%02d.tfrecords' % i)))
    return str(d)


class TestStreamingMoments:

    def test_matches_dense_output_moments(self, tmp_path, rng):
        d = _write_files(tmp_path, rng, [400, 517, 301])
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, pre_context=2, post_context=1,
            data_dir=d, train_file_pattern='t')
        in1, _, out, _ = bd.load_arrays('train')
        dense = moments_from_arrays(in1, out)
        stream = bd.streaming_moments('train', y_source='output')
        for field in dense._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(dense, field)),
                np.asarray(getattr(stream, field)), rtol=1e-5, atol=1e-3)

    def test_matches_dense_input2_moments(self, tmp_path, rng):
        d = _write_files(tmp_path, rng, [256, 300])
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, pre_context=3,
            in2_fields='env', in2_pre_context=1, in2_post_context=2,
            data_dir=d, train_file_pattern='t')
        in1, in2, _, _ = bd.load_arrays('train')
        dense = moments_from_arrays(in1, in2, want_syy=True)
        stream = bd.streaming_moments('train', y_source='input_2',
                                      want_syy=True)
        for field in dense._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(dense, field)),
                np.asarray(getattr(stream, field)), rtol=1e-5, atol=1e-3)

    def test_input_offset_fallback(self, tmp_path, rng):
        d = _write_files(tmp_path, rng, [300, 280])
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, pre_context=1, input_offset=3,
            data_dir=d, train_file_pattern='t')
        in1, _, out, _ = bd.load_arrays('train')
        dense = moments_from_arrays(in1, out)
        stream = bd.streaming_moments('train', y_source='output')
        np.testing.assert_allclose(np.asarray(dense.sxx),
                                   np.asarray(stream.sxx),
                                   rtol=1e-5, atol=1e-3)
        assert float(stream.count) == in1.shape[0]

    def test_ragged_streams_match_dense(self, rng):
        """A file whose output stream is SHORTER than in1: the dense
        path lag-stacks the full in1 and only then zip-truncates, so
        rows near the cut carry real post-context frames from beyond
        the truncation point. (Regression: the streaming path
        truncated first and zero-filled those frames, and ignored
        in2/attended lengths in the row count.)"""

        class RaggedData(brain_data.BrainData):
            def __init__(self, streams, **kw):
                self._streams = streams
                super().__init__('in1', 'out', 100.0, **kw)

            def _get_data_file_names(self):
                self._cached_file_names = sorted(self._streams)

            def file_arrays(self, filename, cache=True):
                return self._streams[filename]

        def make_file(n_in1, n_out):
            return (rng.randn(n_in1, 3).astype(np.float32),
                    rng.randn(n_out, 1).astype(np.float32),
                    rng.randn(n_out, 2).astype(np.float32),
                    np.zeros((n_out, 1), np.float32))

        streams = {'f0': make_file(120, 100), 'f1': make_file(87, 87)}
        bd = RaggedData(streams, pre_context=2, post_context=3,
                        train_file_pattern='f')
        in1, _, out, _ = bd.load_arrays('train')
        dense = moments_from_arrays(in1, out)
        stream = bd.streaming_moments('train', y_source='output')
        assert float(stream.count) == in1.shape[0]
        for field in dense._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(dense, field)),
                np.asarray(getattr(stream, field)), rtol=1e-5,
                atol=1e-3)

    def test_streaming_does_not_populate_file_cache(self, tmp_path,
                                                    rng):
        """The bounded-memory guarantee ('peak host memory is one raw
        file') must not be defeated by the decoded-file cache."""
        d = _write_files(tmp_path, rng, [64, 80])
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, pre_context=1, data_dir=d,
            train_file_pattern='t')
        brain_data.TFExampleData._file_cache.clear()
        bd.streaming_moments('train', y_source='output')
        list(bd.iter_file_arrays('train'))
        assert not brain_data.TFExampleData._file_cache

    def test_iter_file_arrays_covers_all_frames(self, tmp_path, rng):
        d = _write_files(tmp_path, rng, [100, 150, 120])
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, pre_context=1, data_dir=d,
            train_file_pattern='t')
        total = sum(s[0].shape[0]
                    for _, s in bd.iter_file_arrays('train'))
        assert total == 370


class TestStreamingFits:

    def test_linear_fit_streaming_matches_fit(self, tmp_path, rng):
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelLinearRegression)
        d = _write_files(tmp_path, rng, [500, 430], channels=6,
                         out_width=1)
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, pre_context=2, post_context=2,
            data_dir=d, train_file_pattern='t', shuffle_buffer_size=0)
        dense_model = BrainModelLinearRegression(
            input_width=30, output_width=1, regularization_lambda=0.01)
        dense_model.fit(bd.create_dataset('train'))
        stream_model = BrainModelLinearRegression(
            input_width=30, output_width=1, regularization_lambda=0.01)
        stream_model.fit_streaming(bd)
        np.testing.assert_allclose(stream_model.w_estimate,
                                   dense_model.w_estimate,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(stream_model.b_estimate,
                                   dense_model.b_estimate,
                                   rtol=1e-3, atol=1e-4)

    def test_cca_fit_streaming_matches_fit(self, tmp_path, rng):
        from telluride_decoding_tpu.models.cca import BrainModelCCA
        d = _write_files(tmp_path, rng, [600, 550], channels=6,
                         out_width=3)
        bd = brain_data.TFExampleData(
            'eeg', 'ones', 100.0, pre_context=1, post_context=1,
            in2_fields='env', data_dir=d, train_file_pattern='t',
            shuffle_buffer_size=0)
        dense = BrainModelCCA(cca_dims=2, regularization_lambda=0.1,
                              input1_width=18, input2_width=3)
        dense.fit(bd.create_dataset('train'))
        stream = BrainModelCCA(cca_dims=2, regularization_lambda=0.1,
                               input1_width=18, input2_width=3)
        stream.fit_streaming(bd)
        np.testing.assert_allclose(stream.eigenvalues, dense.eigenvalues,
                                   atol=1e-4)
        # Rotations match up to the sign ambiguity of eigenvectors.
        for a, b in ((stream.rot_x, dense.rot_x),
                     (stream.rot_y, dense.rot_y)):
            signs = np.sign(np.sum(a * b, axis=0))
            np.testing.assert_allclose(a * signs, b, atol=1e-3)


def _write_learnable(tmp_path, rng, lengths, channels=4, noise=0.1):
    """Files where env = 0.7 * eeg[:, 0] + noise — learnable by any
    regressor, for functional SGD gates."""
    d = tmp_path / 'learnable'
    d.mkdir()
    for i, n in enumerate(lengths):
        eeg = rng.randn(n, channels).astype(np.float32)
        env = (0.7 * eeg[:, :1] +
               noise * rng.randn(n, 1).astype(np.float32))
        records.convert_data_to_tfrecords(
            {'eeg': eeg, 'env': env.astype(np.float32)},
            str(d / ('t%02d.tfrecords' % i)))
    return str(d)


class TestSgdStreamingFits:
    """Bounded-memory SGD fit (round-3 verdict weak #4: 'SGD models
    have no bounded-memory path'): per-file minibatch streaming with a
    jitted single-batch update; one file on the host, one batch on
    device."""

    def _data(self, tmp_path, rng, lengths=(500, 430, 380)):
        d = _write_learnable(tmp_path, rng, list(lengths), channels=4)
        return brain_data.TFExampleData(
            'eeg', 'env', 100.0, pre_context=2, post_context=2,
            data_dir=d, train_file_pattern='t',
            test_file_pattern='t00', shuffle_buffer_size=0)

    def test_dnn_streaming_learns_and_matches_dense_quality(
            self, tmp_path, rng):
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelDNN)
        from telluride_decoding_tpu.ops import pearson
        bd = self._data(tmp_path, rng)
        in1, _, out, _ = bd.load_arrays('test')

        def r_of(model):
            pred = model({'input_1': in1})
            return float(pearson.pearson_correlation_first(out, pred))

        dense = BrainModelDNN(input_width=20, output_width=1,
                              num_hidden_list=[])
        dense.compile(learning_rate=1e-2)
        dense.fit(bd.create_dataset('train'), epochs=40, batch_size=128)
        stream = BrainModelDNN(input_width=20, output_width=1,
                               num_hidden_list=[])
        stream.compile(learning_rate=1e-2)
        history = stream.fit_streaming(bd, epochs=40, batch_size=128)
        assert len(history['loss']) == 40
        # Both batch streams (global-permutation dense vs bounded
        # per-file streaming) must reach the problem's ceiling.
        assert r_of(dense) > 0.9
        assert r_of(stream) > 0.9

    def test_streaming_fit_is_deterministic(self, tmp_path, rng):
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelDNN)
        import jax
        bd = self._data(tmp_path, rng, lengths=(300, 280))
        runs = []
        for _ in range(2):
            m = BrainModelDNN(input_width=20, output_width=1,
                              num_hidden_list=[6])
            m.compile(learning_rate=1e-2)
            m.fit_streaming(bd, epochs=3, batch_size=64, seed=5)
            runs.append(jax.tree.map(np.asarray, m.params))
        flat_a = jax.tree.leaves(runs[0])
        flat_b = jax.tree.leaves(runs[1])
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(a, b)

    def test_bn_popstats_streaming_matches_dense(self, tmp_path, rng):
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelDNN)
        bd = self._data(tmp_path, rng, lengths=(400, 350))
        model = BrainModelDNN(input_width=20, output_width=1,
                              num_hidden_list=[8, 6], batch_norm=True)
        model.compile(learning_rate=1e-2)
        model.fit(bd.create_dataset('train'), epochs=3, batch_size=128)
        dense_bn = [(np.asarray(e['mean']), np.asarray(e['var']))
                    for e in model.params['bn']]
        model._set_population_stats_streaming(bd, 'train')
        stream_bn = [(np.asarray(e['mean']), np.asarray(e['var']))
                     for e in model.params['bn']]
        # The layer-by-layer streamed passes recompute exactly what the
        # dense single-pass collect computed (population stats ==
        # full-split batch stats), up to float summation order.
        for (dm, dv), (sm, sv) in zip(dense_bn, stream_bn):
            np.testing.assert_allclose(sm, dm, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(sv, dv, rtol=1e-4, atol=1e-5)

    def test_classifier_streaming_learns(self, tmp_path, rng):
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelClassifier)
        d = tmp_path / 'cls'
        d.mkdir()
        for i, n in enumerate((600, 500)):
            eeg = rng.randn(n, 4).astype(np.float32)
            env = rng.randn(n, 2).astype(np.float32)
            label = (eeg[:, :1] + 0.5 * env[:, :1] > 0).astype(
                np.float32)
            records.convert_data_to_tfrecords(
                {'eeg': eeg, 'env': env, 'label': label},
                str(d / ('t%02d.tfrecords' % i)))
        bd = brain_data.TFExampleData(
            'eeg', 'label', 100.0, in2_fields='env', data_dir=str(d),
            train_file_pattern='t', test_file_pattern='t00',
            shuffle_buffer_size=0)
        model = BrainModelClassifier(input_width=4, input2_width=2,
                                     output_width=1,
                                     num_hidden_list=[8])
        model.compile(learning_rate=1e-2)
        model.fit_streaming(bd, epochs=25, batch_size=128)
        res = model.evaluate(bd.create_dataset('test'))
        assert res['accuracy'] > 0.85, res

    def test_dcca_streaming_finds_correlated_pair(self, tmp_path, rng):
        from telluride_decoding_tpu.models.cca import BrainModelDCCA
        from telluride_decoding_tpu.ops import pearson
        d = tmp_path / 'dcca'
        d.mkdir()
        for i, n in enumerate((500, 450)):
            latent = rng.randn(n, 1).astype(np.float32)
            eeg = np.concatenate(
                [latent + 0.3 * rng.randn(n, 1),
                 rng.randn(n, 3)], axis=1).astype(np.float32)
            env = np.concatenate(
                [latent + 0.3 * rng.randn(n, 1),
                 rng.randn(n, 1)], axis=1).astype(np.float32)
            records.convert_data_to_tfrecords(
                {'eeg': eeg, 'env': env,
                 'ones': np.ones((n, 1), np.float32)},
                str(d / ('t%02d.tfrecords' % i)))
        bd = brain_data.TFExampleData(
            'eeg', 'ones', 100.0, in2_fields='env', data_dir=str(d),
            train_file_pattern='t', test_file_pattern='t00',
            shuffle_buffer_size=0)
        model = BrainModelDCCA(input1_width=4, input2_width=2,
                               cca_dims=1, hidden_units=[6])
        model.compile(learning_rate=1e-2)
        model.fit_streaming(bd, epochs=15, batch_size=128)
        in1, in2, _, _ = bd.load_arrays('test')
        outputs = model({'input_1': in1, 'input_2': in2})
        r = float(pearson.pearson_correlation_first(
            outputs[:, :1], outputs[:, 1:]))
        assert r > 0.5, r

    def test_corpus_smaller_than_batch_trains(self, tmp_path, rng):
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelDNN)
        bd = self._data(tmp_path, rng, lengths=(60, 50))
        model = BrainModelDNN(input_width=20, output_width=1,
                              num_hidden_list=[])
        model.compile(learning_rate=1e-2)
        history = model.fit_streaming(bd, epochs=2, batch_size=4096)
        # The whole corpus is one short batch per epoch — it must
        # still train, not silently drop everything.
        assert len(history['loss']) == 2
        assert model.params is not None

    def test_cli_streaming_fit_routes_sgd_models(self, tmp_path, rng,
                                                 monkeypatch):
        from telluride_decoding_tpu.cli import decoding
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelDNN)
        bd = self._data(tmp_path, rng, lengths=(300, 280))
        model = BrainModelDNN(input_width=20, output_width=1,
                              num_hidden_list=[])
        model.compile(learning_rate=1e-2)
        calls = []
        orig = BrainModelDNN.fit_streaming
        monkeypatch.setattr(
            BrainModelDNN, 'fit_streaming',
            lambda self, *a, **k: (calls.append(k),
                                   orig(self, *a, **k))[1])
        opts = decoding.DecodingOptions(streaming_fit=True)
        decoding.train_and_test(opts, bd, model, epochs=2)
        assert calls and calls[0].get('epochs') == 2
        # Without --streaming_fit, SGD models stay dense even when the
        # auto-streaming estimate trips (semantics change, so opt-in).
        monkeypatch.setenv('TDT_STREAMING_AUTO_BYTES', '1')
        calls.clear()
        model2 = BrainModelDNN(input_width=20, output_width=1,
                               num_hidden_list=[])
        model2.compile(learning_rate=1e-2)
        opts2 = decoding.DecodingOptions()
        decoding.train_and_test(opts2, bd, model2, epochs=1)
        assert not calls


RSS_SCRIPT = r"""
import os, resource, sys
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, %(repo)r)
from telluride_decoding_tpu.data import brain_data, records

d = %(tmp)r
rng = np.random.RandomState(0)
for i in range(48):
    n = 4000 + 37 * i
    records.convert_data_to_tfrecords(
        {'eeg': rng.randn(n, 32).astype(np.float32),
         'env': rng.randn(n, 1).astype(np.float32)},
        os.path.join(d, 't%%02d.tfrecords' %% i))
bd = brain_data.TFExampleData(
    'eeg', 'env', 100.0, pre_context=31, post_context=32,
    data_dir=d, train_file_pattern='t')
# Baseline AFTER dataset writing + jax warm-up so the measured delta
# is the streaming accumulation itself (absolute RSS varies with
# machine load / allocator arena sizing).
import jax.numpy as jnp
float(jnp.sum(jnp.ones((8, 8))))
base_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
stats = bd.streaming_moments('train', y_source='output')
assert np.all(np.isfinite(np.asarray(stats.sxx)))
# Dense equivalent: 48 files x ~4900 frames x (64*32) cols x 4 B
# ~= 1.9 GB of lag-stacked float32 the streaming path never holds.
peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
print('PEAK_MB %%.1f BASE_MB %%.1f' %% (peak_mb, base_mb))
"""


class TestBoundedMemory:

    def test_peak_rss_stays_bounded(self, tmp_path):
        """Cohort-scale streaming accumulation must not materialize the
        lag-stacked corpus (~1.9 GB dense); the subprocess gives a
        clean high-water mark."""
        env = dict(os.environ, PALLAS_AXON_POOL_IPS='',
                   JAX_PLATFORMS='cpu')
        env.pop('XLA_FLAGS', None)  # No 8-device mesh in the child.
        script = RSS_SCRIPT % {
            'repo': os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            'tmp': str(tmp_path)}
        proc = subprocess.run([sys.executable, '-c', script], env=env,
                              capture_output=True, text=True,
                              timeout=300)
        assert proc.returncode == 0, proc.stderr[-2000:]
        fields = proc.stdout.strip().split()
        peak = float(fields[fields.index('PEAK_MB') + 1])
        base = float(fields[fields.index('BASE_MB') + 1])
        # One streamed file's stacked block is ~40 MB (plus XLA
        # workspace); the dense path would add 1.9 GB+ for the corpus
        # alone. A 500 MB delta ceiling proves the bound regardless of
        # the machine-load-dependent absolute baseline.
        assert peak - base < 500, ('RSS delta %.1f MB (peak %.1f, '
                                   'base %.1f)' % (peak - base, peak,
                                                   base))


class TestByteBoundedFileCache:
    """The decoded-file cache is bounded by BYTES with LRU eviction —
    not by entry count (round-2 review: 64 jens-scale entries pinned
    multiple GB forever)."""

    def _data(self, tmp_path, rng, num_files=6, n=300):
        d = _write_files(tmp_path, rng, [n] * num_files)
        return brain_data.TFExampleData(
            'eeg', 'env', 100.0, data_dir=d, train_file_pattern='t')

    def test_cache_bytes_stay_under_budget(self, tmp_path, rng,
                                           monkeypatch):
        bd = self._data(tmp_path, rng)
        per_file = 300 * (4 + 2) * 4   # eeg + env float32.
        budget = int(2.5 * per_file)   # Fits 2 decoded files.
        monkeypatch.setattr(brain_data.TFExampleData,
                            '_FILE_CACHE_BUDGET', budget)
        brain_data.TFExampleData._file_cache.clear()
        brain_data.TFExampleData._file_cache_bytes = 0
        files = bd.all_files()
        for f in files:
            bd.file_arrays(f)
        assert brain_data.TFExampleData._file_cache_bytes <= budget
        assert len(brain_data.TFExampleData._file_cache) == 2
        # LRU: the two most recently used files survive.
        assert list(brain_data.TFExampleData._file_cache) == files[-2:]

    def test_eviction_preserves_values(self, tmp_path, rng,
                                       monkeypatch):
        bd = self._data(tmp_path, rng)
        want = [bd.file_arrays(f, cache=False)
                for f in bd.all_files()]
        monkeypatch.setattr(brain_data.TFExampleData,
                            '_FILE_CACHE_BUDGET', 300 * 6 * 4 * 3)
        brain_data.TFExampleData._file_cache.clear()
        brain_data.TFExampleData._file_cache_bytes = 0
        for _ in range(2):   # Second pass mixes hits and re-decodes.
            for f, w in zip(bd.all_files(), want):
                got = bd.file_arrays(f)
                for a, b in zip(got, w):
                    np.testing.assert_array_equal(a, b)

    def test_oversized_entry_not_cached(self, tmp_path, rng,
                                        monkeypatch):
        bd = self._data(tmp_path, rng)
        monkeypatch.setattr(brain_data.TFExampleData,
                            '_FILE_CACHE_BUDGET', 100)   # Tiny.
        brain_data.TFExampleData._file_cache.clear()
        brain_data.TFExampleData._file_cache_bytes = 0
        bd.file_arrays(bd.all_files()[0])
        assert not brain_data.TFExampleData._file_cache
        assert brain_data.TFExampleData._file_cache_bytes == 0

    def test_hit_refreshes_lru_position(self, tmp_path, rng,
                                        monkeypatch):
        bd = self._data(tmp_path, rng)
        per_file = 300 * 6 * 4
        monkeypatch.setattr(brain_data.TFExampleData,
                            '_FILE_CACHE_BUDGET', int(2.5 * per_file))
        brain_data.TFExampleData._file_cache.clear()
        brain_data.TFExampleData._file_cache_bytes = 0
        files = bd.all_files()
        bd.file_arrays(files[0])
        bd.file_arrays(files[1])
        bd.file_arrays(files[0])          # Refresh 0.
        bd.file_arrays(files[2])          # Evicts 1, not 0.
        assert files[0] in brain_data.TFExampleData._file_cache
        assert files[1] not in brain_data.TFExampleData._file_cache


class TestAutoStreamingSelection:
    """Large corpora route covariance fits through streaming_moments
    WITHOUT --streaming_fit (round-2 review: the bounded path existed
    but nothing selected it)."""

    def test_estimated_stacked_bytes_tracks_true_size(self, tmp_path,
                                                      rng):
        d = _write_files(tmp_path, rng, [400, 500], channels=8,
                         out_width=1)
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, pre_context=4, post_context=5,
            data_dir=d, train_file_pattern='t')
        in1, in2, out, att = bd.load_arrays('train')
        true_bytes = in1.nbytes + in2.nbytes + out.nbytes + att.nbytes
        est = bd.estimated_stacked_bytes('train')
        # File-size-derived estimate: right order of magnitude, and
        # biased HIGH (proto overhead inflates the frame estimate) so
        # the streaming decision is conservative.
        assert true_bytes <= est <= 4 * true_bytes

    def _run_train_and_test(self, tmp_path, rng, monkeypatch,
                            auto_bytes):
        from telluride_decoding_tpu.cli import decoding
        sub = tmp_path / ('auto%d' % auto_bytes)
        sub.mkdir()
        rng = np.random.RandomState(7)   # Same corpus for both runs.
        d = _write_files(sub, rng, [500, 430], channels=6,
                         out_width=1)
        bd = brain_data.TFExampleData(
            'eeg', 'env', 100.0, pre_context=2, post_context=2,
            data_dir=d, train_file_pattern='t',
            test_file_pattern='t00', shuffle_buffer_size=0)
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelLinearRegression)
        model = BrainModelLinearRegression(
            input_width=30, output_width=1,
            regularization_lambda=0.01)
        monkeypatch.setenv('TDT_STREAMING_AUTO_BYTES', str(auto_bytes))
        calls = []
        orig = BrainModelLinearRegression.fit_streaming
        monkeypatch.setattr(
            BrainModelLinearRegression, 'fit_streaming',
            lambda self, *a, **k: (calls.append(1),
                                   orig(self, *a, **k))[1])
        opts = decoding.DecodingOptions()
        _, test_results = decoding.train_and_test(opts, bd, model)
        return model, test_results, calls

    def test_small_corpus_stays_dense(self, tmp_path, rng,
                                      monkeypatch):
        _, _, calls = self._run_train_and_test(
            tmp_path, rng, monkeypatch, auto_bytes=1 << 30)
        assert not calls

    def test_auto_streams_when_estimate_exceeds_threshold(
            self, tmp_path, rng, monkeypatch):
        dense_model, dense_res, _ = self._run_train_and_test(
            tmp_path, rng, monkeypatch, auto_bytes=0)   # Disabled.
        stream_model, stream_res, calls = self._run_train_and_test(
            tmp_path, rng, monkeypatch, auto_bytes=1)   # Tiny gate.
        assert calls, 'expected the auto-selected streaming fit'
        np.testing.assert_allclose(stream_model.w_estimate,
                                   dense_model.w_estimate,
                                   rtol=1e-3, atol=1e-4)
        for k in dense_res:
            np.testing.assert_allclose(stream_res[k], dense_res[k],
                                       rtol=1e-4, atol=1e-5)
