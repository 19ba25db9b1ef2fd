"""Cohort driver: whole-cohort jackknife x lambda sweeps in one
command, subject axis sharded over the mesh (the reference runs this
as days of per-subject shell jobs, doc/DecodingCodelab.md:353-521)."""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest

from telluride_decoding_tpu.data import records

from conftest import write_cohort_tree as _write_cohort


class TestCohortDriver:

    def test_discover_subjects(self, tmp_path, rng):
        from telluride_decoding_tpu.cli import cohort
        root = _write_cohort(tmp_path, rng)
        found = cohort.discover_subjects(root, [])
        assert sorted(found) == ['subject00', 'subject01', 'subject02']
        explicit = cohort.discover_subjects(
            None, [os.path.join(root, 'subject01')])
        assert list(explicit) == ['subject01']
        with pytest.raises(ValueError):
            cohort.discover_subjects(None, [])

    def test_cohort_sweep_api(self, tmp_path, rng):
        from telluride_decoding_tpu.cli import cohort, decoding
        root = _write_cohort(tmp_path, rng)
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4, dnn_regressor='linear',
            train_file_pattern='allbut', shuffle_buffer_size=0))
        lambdas = [1e-5, 1e-2, 10.0]
        results, (mean, std) = cohort.run_cohort_sweep(
            my_flags, cohort.discover_subjects(root, []), lambdas,
            cohort_csv_file=str(tmp_path / 'cohort.csv'),
            results_csv_file=str(tmp_path / 'per_subject.csv'))
        assert len(results) == 3
        for res in results.values():
            assert res.correlations.shape == (3, 3)
        # Planted model: small lambdas recover it on every subject.
        assert np.all(mean[:2] > 0.97), mean
        assert mean[2] < mean[0]          # Over-regularized tail.
        rows = list(csv.reader(open(tmp_path / 'cohort.csv')))
        assert rows[0] == ['lambda', 'mean', 'std']
        assert len(rows) == 4
        per_subj = [f for f in os.listdir(tmp_path)
                    if f.startswith('per_subject_')]
        assert len(per_subj) == 3

    def test_subject_parallel_matches_serial(self, tmp_path, rng):
        from telluride_decoding_tpu.cli import cohort, decoding
        root = _write_cohort(tmp_path, rng, num_subjects=5)
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4, dnn_regressor='linear',
            train_file_pattern='allbut', shuffle_buffer_size=0))
        subjects = cohort.discover_subjects(root, [])
        serial, (mean_s, _) = cohort.run_cohort_sweep(
            my_flags, subjects, [1e-4, 1.0], subject_parallel=False)
        par, (mean_p, _) = cohort.run_cohort_sweep(
            my_flags, subjects, [1e-4, 1.0], subject_parallel=True)
        for name in serial:
            np.testing.assert_allclose(par[name].correlations,
                                       serial[name].correlations,
                                       atol=2e-4)
        np.testing.assert_allclose(mean_p, mean_s, atol=2e-4)

    def test_cli_main(self, tmp_path, rng, cpu_subprocess_env):
        """The installed entry point end to end (flags -> summary)."""
        root = _write_cohort(tmp_path, rng, num_subjects=2)
        env = cpu_subprocess_env
        proc = subprocess.run(
            [sys.executable, '-m', 'telluride_decoding_tpu.cli.cohort',
             '--cohort_dir', root,
             '--input_field', 'eeg', '--output_field', 'intensity',
             '--post_context', '4',
             '--regularization_list', '1e-5,1e-2',
             '--cohort_csv_file', str(tmp_path / 'c.csv')],
            env=env, capture_output=True, text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert 'Cohort sweep over 2 subjects' in proc.stdout
        assert 'best' in proc.stdout
        assert os.path.exists(tmp_path / 'c.csv')


class TestCohortReviewFixes:

    def test_duplicate_subject_basenames_raise(self, tmp_path):
        from telluride_decoding_tpu.cli import cohort
        a = tmp_path / 'sessA' / 's01'
        b = tmp_path / 'sessB' / 's01'
        a.mkdir(parents=True)
        b.mkdir(parents=True)
        with pytest.raises(ValueError, match='share the subject name'):
            cohort.discover_subjects(None, [str(a), str(b)])
        # The same path twice is NOT a collision.
        assert cohort.discover_subjects(None, [str(a), str(a)])

    def test_streaming_auto_bytes_scientific_notation(self, tmp_path,
                                                      rng,
                                                      monkeypatch):
        """'1e9'-style TDT_STREAMING_AUTO_BYTES must parse, not crash
        train_and_test (review fix)."""
        from telluride_decoding_tpu.cli import decoding
        from telluride_decoding_tpu.data import brain_data
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelLinearRegression)
        d = tmp_path / 'r'
        d.mkdir()
        eeg = rng.randn(300, 4).astype(np.float32)
        records.convert_data_to_tfrecords(
            {'eeg': eeg, 'intensity': eeg[:, :1] * 2.0},
            str(d / 't00.tfrecords'))
        bd = brain_data.TFExampleData(
            'eeg', 'intensity', 100.0, data_dir=str(d),
            train_file_pattern='t', test_file_pattern='t',
            shuffle_buffer_size=0)
        model = BrainModelLinearRegression(input_width=4,
                                           output_width=1,
                                           regularization_lambda=1e-6)
        for value in ('1e9', 'banana', ''):
            monkeypatch.setenv('TDT_STREAMING_AUTO_BYTES', value)
            _, res = decoding.train_and_test(
                decoding.DecodingOptions(), bd, model)
            assert res['pearson_correlation_first'] > 0.99

    def test_cohort_cca_model(self, tmp_path, rng):
        """dnn_regressor=cca routes the cohort through the CCA sweep
        (in2 stream selection + cca_dimensions wiring)."""
        from telluride_decoding_tpu.cli import cohort, decoding
        root = tmp_path / 'cohort'
        latent_w = rng.randn(2, 2).astype(np.float32)
        for s in range(2):
            d = root / ('subject%02d' % s)
            d.mkdir(parents=True)
            for t in range(3):
                n = 300 + 11 * t
                latent = rng.randn(n, 2).astype(np.float32)
                eeg = np.concatenate(
                    [latent + 0.2 * rng.randn(n, 2), rng.randn(n, 3)],
                    axis=1).astype(np.float32)
                intensity = (latent @ latent_w +
                             0.2 * rng.randn(n, 2)).astype(np.float32)
                records.convert_data_to_tfrecords(
                    {'eeg': eeg, 'intensity': intensity},
                    str(d / ('trial%02d.tfrecords' % t)))
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='ones',
            input2_field='intensity', dnn_regressor='cca',
            cca_dimensions=2, pre_context=0, post_context=0,
            train_file_pattern='allbut', shuffle_buffer_size=0))
        results, (mean, _) = cohort.run_cohort_sweep(
            my_flags, cohort.discover_subjects(str(root), []),
            [1e-2, 1.0])
        assert len(results) == 2
        for res in results.values():
            assert res.correlations.shape == (2, 3)
        assert np.all(mean > 0.5), mean   # Planted latent found.


class TestStreamingCohort:
    """The prefetching streaming loader (bounded host residency) must
    be value-identical to eager whole-cohort loading."""

    def _flags(self):
        from telluride_decoding_tpu.cli import decoding
        return decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4, dnn_regressor='linear',
            train_file_pattern='allbut', shuffle_buffer_size=0))

    def test_prescan_matches_eager_shapes(self, tmp_path, rng):
        """Record-count prescan derives the SAME shared program shape
        the eager loader would (so streaming never recompiles)."""
        from telluride_decoding_tpu.cli import cohort
        root = _write_cohort(tmp_path, rng, num_subjects=3)
        subjects = cohort.discover_subjects(root, [])
        my_flags = self._flags()
        pads = cohort.prescan_cohort(subjects, my_flags)
        assert pads is not None
        loaded, context = cohort.load_cohort(subjects, my_flags)
        x_post = context.x_post if context is not None else 0
        want_files = max(len(xs) for xs, _ in loaded.values())
        want_frames = max(x.shape[0] for xs, _ in loaded.values()
                          for x in xs) - x_post
        assert pads == (want_files, want_frames)

    def test_streaming_matches_eager(self, tmp_path, rng):
        from telluride_decoding_tpu.cli import cohort
        root = _write_cohort(tmp_path, rng, num_subjects=4)
        subjects = cohort.discover_subjects(root, [])
        my_flags = self._flags()
        lambdas = [1e-4, 1e-1, 1.0]
        eager, (mean_e, std_e) = cohort.run_cohort_sweep(
            my_flags, subjects, lambdas, subject_parallel=False,
            streaming=False)
        stream, (mean_s, std_s) = cohort.run_cohort_sweep(
            my_flags, subjects, lambdas, subject_parallel=False,
            streaming=True)
        assert sorted(stream) == sorted(eager)
        for name in eager:
            np.testing.assert_array_equal(stream[name].correlations,
                                          eager[name].correlations)
        np.testing.assert_array_equal(mean_s, mean_e)
        np.testing.assert_array_equal(std_s, std_e)

    def test_streaming_subject_parallel(self, tmp_path, rng):
        """Streaming feeds the subject-sharded mesh path group by
        group (lazy islice consumption) with identical results."""
        from telluride_decoding_tpu.cli import cohort
        root = _write_cohort(tmp_path, rng, num_subjects=5)
        subjects = cohort.discover_subjects(root, [])
        my_flags = self._flags()
        lambdas = [1e-4, 1.0]
        eager, (mean_e, _) = cohort.run_cohort_sweep(
            my_flags, subjects, lambdas, subject_parallel=True,
            streaming=False)
        stream, (mean_s, _) = cohort.run_cohort_sweep(
            my_flags, subjects, lambdas, subject_parallel=True,
            streaming=True)
        for name in eager:
            np.testing.assert_array_equal(stream[name].correlations,
                                          eager[name].correlations)
        np.testing.assert_array_equal(mean_s, mean_e)

    def test_prescan_ignores_input_offset(self, tmp_path, rng):
        """The regression/cohort loaders never apply input_offset
        (get_brain_data_object omits it, faithful to the reference),
        so the prescan shape must not subtract it either — otherwise
        every subject reaching max_count would exceed the declared pad
        and recompile."""
        from telluride_decoding_tpu.cli import cohort
        import dataclasses
        root = _write_cohort(tmp_path, rng, num_subjects=2)
        subjects = cohort.discover_subjects(root, [])
        base = self._flags()
        shifted = dataclasses.replace(base, input_offset=26)
        assert (cohort.prescan_cohort(subjects, shifted)
                == cohort.prescan_cohort(subjects, base))
        loaded, context = cohort.load_cohort(subjects, shifted)
        x_post = context.x_post if context is not None else 0
        want = (max(len(xs) for xs, _ in loaded.values()),
                max(x.shape[0] for xs, _ in loaded.values()
                    for x in xs) - x_post)
        assert cohort.prescan_cohort(subjects, shifted) == want

    def test_prefetch_thread_exits_on_abandoned_iteration(
            self, tmp_path, rng):
        """Abandoning the generator (sweep exception, early close)
        must release the prefetch thread instead of leaving it
        blocked in q.put holding a subject's arrays."""
        import threading
        import time
        from telluride_decoding_tpu.cli import cohort
        root = _write_cohort(tmp_path, rng, num_subjects=4)
        subjects = cohort.discover_subjects(root, [])
        gen = cohort.iter_cohort(subjects, self._flags())
        next(gen)                   # Worker now prefetches ahead.
        gen.close()                 # Consumer abandons mid-cohort.
        deadline = time.time() + 10
        while time.time() < deadline:
            alive = [t for t in threading.enumerate()
                     if t.name == 'tdt-cohort-prefetch' and t.is_alive()]
            if not alive:
                break
            time.sleep(0.05)
        assert not alive, 'prefetch thread still blocked after close()'

    def test_field_spec_falls_back_to_eager(self, tmp_path, rng):
        """On-the-fly field specs may change stream lengths, so the
        count-based prescan refuses and run_cohort_sweep silently
        loads eagerly (same results either way)."""
        from telluride_decoding_tpu.cli import cohort, decoding
        root = _write_cohort(tmp_path, rng, num_subjects=2)
        subjects = cohort.discover_subjects(root, [])
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg(highpass_cutoff=0.5;highpass_order=2)',
            output_field='intensity', pre_context=0, post_context=4,
            dnn_regressor='linear', train_file_pattern='allbut',
            shuffle_buffer_size=0))
        assert cohort.prescan_cohort(subjects, my_flags) is None
        results, _ = cohort.run_cohort_sweep(
            my_flags, subjects, [1e-4], streaming=True)
        assert len(results) == 2

    def test_engine_lazy_iterator_requires_pads(self):
        from telluride_decoding_tpu.sweep import engine
        gen = iter([('s0', ([np.zeros((10, 2), np.float32)] * 2,
                            [np.zeros((10, 1), np.float32)] * 2))])
        with pytest.raises(ValueError, match='lazy subject iterable'):
            engine.multi_subject_sweep(gen, [1e-3])

    def test_engine_consumes_generator_lazily(self, rng):
        """The serial pipelined loop must pull subjects one at a time
        (never materialize the iterable) — at most 2 subjects may have
        been yielded before the first subject's result is finalized."""
        from telluride_decoding_tpu.sweep import engine
        w = rng.randn(3, 1).astype(np.float32)

        def make_subject():
            xs = [rng.randn(50, 3).astype(np.float32) for _ in range(3)]
            ys = [x @ w for x in xs]
            return xs, ys

        yielded = []

        def gen():
            for i in range(5):
                yielded.append(i)
                yield ('s%d' % i, make_subject())

        results = engine.multi_subject_sweep(
            gen(), [1e-5, 1e-2], pad_files_to=3, pad_frames_to=50)
        assert len(results) == 5
        assert len(yielded) == 5
        for res in results.values():
            assert res.correlations.shape == (2, 3)
            assert np.all(res.correlations[0] > 0.99)
        # And eager equality: same data replayed through a list.

    def test_iter_cohort_prefetch_error_propagates(self, tmp_path):
        from telluride_decoding_tpu.cli import cohort
        bad = tmp_path / 'empty_subject'
        bad.mkdir()
        my_flags = self._flags()
        with pytest.raises(ValueError, match='empty list of data files'):
            list(cohort.iter_cohort({'bad': str(bad)}, my_flags))

    def test_iter_cohort_order_and_no_prefetch(self, tmp_path, rng):
        from telluride_decoding_tpu.cli import cohort
        root = _write_cohort(tmp_path, rng, num_subjects=3)
        subjects = cohort.discover_subjects(root, [])
        my_flags = self._flags()
        names = [n for n, _ in cohort.iter_cohort(subjects, my_flags,
                                                  prefetch=False)]
        assert names == list(subjects)
        names_p = [n for n, _ in cohort.iter_cohort(subjects, my_flags)]
        assert names_p == names


class TestGeneralCohort:
    """SGD families route through the API-parity per-model jackknife
    (every grid cell a training run) — one command for the whole
    cohort, same operational model the reference shell-fans."""

    def test_fullyconnected_cohort_end_to_end(self, tmp_path, rng):
        from telluride_decoding_tpu.cli import cohort, decoding
        root = _write_cohort(tmp_path, rng, num_subjects=2, trials=2,
                             n=220)
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4,
            dnn_regressor='fullyconnected', hidden_units='4',
            epoch_count=3, batch_size=100, learning_rate=0.05,
            train_file_pattern='allbut', shuffle_buffer_size=0))
        lambdas = [1e-4, 1e-2]
        results, (mean, std) = cohort.run_cohort_sweep(
            my_flags, cohort.discover_subjects(root, []), lambdas,
            cohort_csv_file=str(tmp_path / 'cohort.csv'))
        assert sorted(results) == ['subject00', 'subject01']
        for res in results.values():
            assert res.correlations.shape == (2, 2)
            assert np.isfinite(res.correlations).all()
            assert len(res.test_files) == 2
        assert mean.shape == (2,) and np.isfinite(mean).all()
        rows = list(csv.reader(open(tmp_path / 'cohort.csv')))
        assert rows[0] == ['lambda', 'mean', 'std'] and len(rows) == 3

    def test_general_matches_regression_driver(self, tmp_path, rng):
        """One subject's general-cohort grid equals the regression
        driver's own general path on the same data and seeds."""
        from telluride_decoding_tpu.cli import cohort, decoding
        from telluride_decoding_tpu.cli import regression
        root = _write_cohort(tmp_path, rng, num_subjects=1, trials=2,
                             n=220)
        opts = dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4,
            dnn_regressor='fullyconnected', hidden_units='4',
            epoch_count=3, batch_size=100, learning_rate=0.05,
            train_file_pattern='allbut', shuffle_buffer_size=0)
        subj_dir = os.path.join(root, 'subject00')
        my_flags = decoding.DecodingOptions().set_from_dict(opts)
        got = cohort.general_cohort_results(
            my_flags, {'subject00': subj_dir}, [1e-3])['subject00']
        ref_flags = decoding.DecodingOptions().set_from_dict(
            dict(opts, tfexample_dir=subj_dir, regularization_lambda=1e-3))
        bd = regression.get_brain_data_object(ref_flags)
        files = sorted(bd.all_files())
        ref_flags.validate_file_pattern = files[0]
        ref_flags.test_file_pattern = files[0]
        model = regression.get_brain_model(
            bd.create_dataset('test'), ref_flags)
        want = regression.jackknife_one_model(bd, model, None, ref_flags)
        np.testing.assert_allclose(got.correlations[0], want, rtol=1e-5)

    def test_general_checkpoint_resume(self, tmp_path, rng,
                                       monkeypatch):
        """An SGD cohort with --sweep_checkpoint_dir resumes per
        subject: a rerun restores finished grids from disk and never
        retrains (an SGD cohort is hours of training runs)."""
        from telluride_decoding_tpu.cli import cohort, decoding
        from telluride_decoding_tpu.cli import regression
        root = _write_cohort(tmp_path, rng, num_subjects=2, trials=2,
                             n=220)
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4,
            dnn_regressor='fullyconnected', hidden_units='4',
            epoch_count=2, batch_size=100, learning_rate=0.05,
            train_file_pattern='allbut', shuffle_buffer_size=0))
        ckpt_dir = str(tmp_path / 'ckpts')
        subjects = cohort.discover_subjects(root, [])
        first = cohort.general_cohort_results(
            my_flags, subjects, [1e-3, 1e-1], checkpoint_dir=ckpt_dir)
        assert sorted(os.listdir(ckpt_dir)) == [
            'general_subject00.npz', 'general_subject01.npz']
        # The rerun must not train: poison the training path.
        def _boom(*a, **k):
            raise AssertionError('resume retrained a finished subject')
        monkeypatch.setattr(regression, 'get_brain_model', _boom)
        second = cohort.general_cohort_results(
            my_flags, subjects, [1e-3, 1e-1], checkpoint_dir=ckpt_dir)
        assert sorted(second) == sorted(first)
        for name in first:
            np.testing.assert_array_equal(
                second[name].correlations, first[name].correlations)
            assert second[name].test_files == first[name].test_files
            np.testing.assert_array_equal(
                second[name].lambdas, first[name].lambdas)

    def test_general_checkpoint_mismatch_fails_loudly(
            self, tmp_path, rng):
        """A checkpoint written by a different sweep (lambda grid or
        experiment parameters) must not silently join stale numbers."""
        from telluride_decoding_tpu.cli import cohort, decoding
        root = _write_cohort(tmp_path, rng, num_subjects=1, trials=2,
                             n=220)
        base = dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4,
            dnn_regressor='fullyconnected', hidden_units='4',
            epoch_count=2, batch_size=100, learning_rate=0.05,
            train_file_pattern='allbut', shuffle_buffer_size=0)
        my_flags = decoding.DecodingOptions().set_from_dict(base)
        ckpt_dir = str(tmp_path / 'ckpts')
        subjects = cohort.discover_subjects(root, [])
        cohort.general_cohort_results(
            my_flags, subjects, [1e-3], checkpoint_dir=ckpt_dir)
        with pytest.raises(ValueError, match='different sweep'):
            cohort.general_cohort_results(
                my_flags, subjects, [1e-2], checkpoint_dir=ckpt_dir)
        other = decoding.DecodingOptions().set_from_dict(
            dict(base, hidden_units='8'))
        with pytest.raises(ValueError, match='different sweep'):
            cohort.general_cohort_results(
                other, subjects, [1e-3], checkpoint_dir=ckpt_dir)

    def test_general_checkpoint_torn_write_invisible(self, tmp_path,
                                                     rng):
        """A leftover .tmp file from a killed run is never trusted as
        a checkpoint (atomic publish via os.replace)."""
        from telluride_decoding_tpu.cli import cohort, decoding
        root = _write_cohort(tmp_path, rng, num_subjects=1, trials=2,
                             n=220)
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4,
            dnn_regressor='fullyconnected', hidden_units='4',
            epoch_count=2, batch_size=100, learning_rate=0.05,
            train_file_pattern='allbut', shuffle_buffer_size=0))
        ckpt_dir = tmp_path / 'ckpts'
        ckpt_dir.mkdir()
        # Simulate a torn write from a killed process.
        (ckpt_dir / 'general_subject00.npz.tmp-12345.npz').write_bytes(
            b'garbage')
        results = cohort.general_cohort_results(
            my_flags, cohort.discover_subjects(root, []), [1e-3],
            checkpoint_dir=str(ckpt_dir))
        assert np.isfinite(results['subject00'].correlations).all()

    def test_general_checkpoint_detects_changed_trial_files(
            self, tmp_path, rng):
        """A subject directory that gained a trial between runs must
        NOT silently restore the old grid (it would exclude the new
        trial from the cohort mean with no warning)."""
        from telluride_decoding_tpu.cli import cohort, decoding
        root = _write_cohort(tmp_path, rng, num_subjects=1, trials=2,
                             n=220)
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4,
            dnn_regressor='fullyconnected', hidden_units='4',
            epoch_count=2, batch_size=100, learning_rate=0.05,
            train_file_pattern='allbut', shuffle_buffer_size=0))
        ckpt_dir = str(tmp_path / 'ckpts')
        subjects = cohort.discover_subjects(root, [])
        cohort.general_cohort_results(
            my_flags, subjects, [1e-3], checkpoint_dir=ckpt_dir)
        src = os.path.join(root, 'subject00')
        existing = sorted(os.listdir(src))[0]
        import shutil
        shutil.copy(os.path.join(src, existing),
                    os.path.join(src, 'zz_new_trial.tfrecords'))
        with pytest.raises(ValueError, match='different trial files'):
            cohort.general_cohort_results(
                my_flags, subjects, [1e-3], checkpoint_dir=ckpt_dir)

    def test_general_checkpoint_resumes_across_hosts(self, tmp_path,
                                                     rng, monkeypatch):
        """A preempted sweep resumed with a different cohort root path
        and different output dirs (the cross-host case) restores: only
        sweep-relevant parameters key the checkpoint."""
        from telluride_decoding_tpu.cli import cohort, decoding
        from telluride_decoding_tpu.cli import regression
        import dataclasses
        import shutil
        root = _write_cohort(tmp_path, rng, num_subjects=1, trials=2,
                             n=220)
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4,
            dnn_regressor='fullyconnected', hidden_units='4',
            epoch_count=2, batch_size=100, learning_rate=0.05,
            train_file_pattern='allbut', shuffle_buffer_size=0,
            summary_dir=str(tmp_path / 'out_a')))
        ckpt_dir = str(tmp_path / 'ckpts')
        first = cohort.general_cohort_results(
            my_flags, cohort.discover_subjects(root, []), [1e-3],
            checkpoint_dir=ckpt_dir)
        # "Another host": the cohort lives under a different absolute
        # path, output dirs differ, and the (loop-overwritten)
        # regularization_lambda field starts from a different value.
        root2 = str(tmp_path / 'moved_cohort')
        shutil.move(root, root2)
        other = dataclasses.replace(
            my_flags, summary_dir=str(tmp_path / 'out_b'),
            regularization_lambda=99.0)

        def _boom(*a, **k):
            raise AssertionError('cross-host resume retrained')
        monkeypatch.setattr(regression, 'get_brain_model', _boom)
        second = cohort.general_cohort_results(
            other, cohort.discover_subjects(root2, []), [1e-3],
            checkpoint_dir=ckpt_dir)
        np.testing.assert_array_equal(
            second['subject00'].correlations,
            first['subject00'].correlations)
        # The restored result labels trials with the CURRENT paths.
        assert all(f.startswith(root2)
                   for f in second['subject00'].test_files)

    def test_cohort_tf_family_fails_with_clear_error(self):
        """--dnn_regressor tf has no buildable model (reference
        parity): the cohort driver says so before ingesting data."""
        from telluride_decoding_tpu.cli import cohort, decoding
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            dnn_regressor='tf'))
        with pytest.raises(ValueError, match='no buildable model'):
            cohort.run_cohort_sweep(my_flags, {'s': '/nonexistent'},
                                    [1e-3])

    def test_lambda_dedup_matches_full_retraining(self, tmp_path, rng,
                                                  monkeypatch):
        """fullyconnected/classifier ignore regularization_lambda and
        training is seeded, so the deduped grid (train once, tile
        rows) must equal the full per-lambda retraining exactly."""
        from telluride_decoding_tpu.cli import cohort, decoding
        from telluride_decoding_tpu.cli import regression
        root = _write_cohort(tmp_path, rng, num_subjects=1, trials=2,
                             n=220)
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4,
            dnn_regressor='fullyconnected', hidden_units='4',
            epoch_count=2, batch_size=100, learning_rate=0.05,
            train_file_pattern='allbut', shuffle_buffer_size=0))
        subjects = cohort.discover_subjects(root, [])
        lambdas = [1e-4, 1e-2, 1.0]
        calls = []
        orig = regression.jackknife_one_model

        def counting(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(regression, 'jackknife_one_model', counting)
        monkeypatch.setenv('TDT_GENERAL_LAMBDA_DEDUP', '0')
        full = cohort.general_cohort_results(my_flags, subjects,
                                             lambdas)['subject00']
        full_calls = len(calls)
        calls.clear()
        monkeypatch.setenv('TDT_GENERAL_LAMBDA_DEDUP', '1')
        deduped = cohort.general_cohort_results(my_flags, subjects,
                                                lambdas)['subject00']
        assert full_calls == 3 and len(calls) == 1
        np.testing.assert_array_equal(full.correlations,
                                      deduped.correlations)

    def test_dcca_grid_not_deduped_and_reads_lambda(self, rng):
        """DCCA's final CCA solve reads the flag lambda (consistent
        with the cca branch), so its grid must NOT be deduped."""
        from telluride_decoding_tpu.cli import cohort, decoding
        from telluride_decoding_tpu.data.brain_data import TestBrainData
        n = 300
        z = rng.randn(n, 2).astype(np.float32)
        x1 = np.concatenate([z, rng.randn(n, 2)], 1).astype(np.float32)
        x2 = np.concatenate(
            [z @ rng.randn(2, 2).astype(np.float32),
             rng.randn(n, 1)], 1).astype(np.float32)
        bd = TestBrainData('input', 'output', 100.0)
        bd.preserve_test_data(x1, np.zeros((n, 1), np.float32),
                              input2_data=x2)
        flags_ = decoding.DecodingOptions().set_from_dict(dict(
            dnn_regressor='dcca', hidden_units='4',
            regularization_lambda=0.123, cca_dimensions=2))
        model = decoding.create_brain_model(flags_,
                                            bd.create_dataset('train'))
        assert model.config()['regularization_lambda'] == \
            pytest.approx(0.123)

    def test_lambda_dedup_disabled_for_batch_transforms(
            self, tmp_path, rng, monkeypatch):
        """mismatch/mixup batches draw from the dataset's stateful
        RandomState — lambda rows are NOT identical then, so the
        dedup must stay off and every row must train."""
        from telluride_decoding_tpu.cli import cohort, decoding
        from telluride_decoding_tpu.cli import regression
        root = _write_cohort(tmp_path, rng, num_subjects=1, trials=2,
                             n=220)
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4,
            dnn_regressor='classifier', hidden_units='4',
            epoch_count=2, batch_size=100, learning_rate=0.05,
            mismatch_batch=True, test_metric='accuracy',
            train_file_pattern='allbut', shuffle_buffer_size=0))
        calls = []
        orig = regression.jackknife_one_model

        def counting(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(regression, 'jackknife_one_model',
                            counting)
        cohort.general_cohort_results(
            my_flags, cohort.discover_subjects(root, []),
            [1e-4, 1e-2])
        assert len(calls) == 2   # One training run per lambda.

    def test_lambda_dedup_unaffected_by_random_mixup_batch(
            self, tmp_path, rng, monkeypatch):
        """--random_mixup_batch is vestigial in training in BOTH
        implementations (the reference parses it into DecodingOptions
        and never consults it), so lambda rows stay identical and the
        dedup must stay ON — a 9-lambda jens grid must not silently
        retrain 9x for byte-identical rows."""
        from telluride_decoding_tpu.cli import cohort, decoding
        from telluride_decoding_tpu.cli import regression
        root = _write_cohort(tmp_path, rng, num_subjects=1, trials=2,
                             n=220)
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4,
            dnn_regressor='fullyconnected', hidden_units='4',
            epoch_count=2, batch_size=100, learning_rate=0.05,
            random_mixup_batch=True,
            train_file_pattern='allbut', shuffle_buffer_size=0))
        calls = []
        orig = regression.jackknife_one_model

        def counting(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(regression, 'jackknife_one_model',
                            counting)
        cohort.general_cohort_results(
            my_flags, cohort.discover_subjects(root, []),
            [1e-4, 1e-2, 1.0])
        assert len(calls) == 1   # Trained once, tiled 3 lambda rows.

    def test_old_format_checkpoint_fails_with_format_message(
            self, tmp_path, rng):
        """A checkpoint from the pre-release format (absolute trial
        paths) must be reported as a format mismatch, not as a data
        change."""
        from telluride_decoding_tpu.cli import cohort, decoding
        root = _write_cohort(tmp_path, rng, num_subjects=1, trials=2,
                             n=220)
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            input_field='eeg', output_field='intensity',
            pre_context=0, post_context=4,
            dnn_regressor='fullyconnected', hidden_units='4',
            epoch_count=2, batch_size=100, learning_rate=0.05,
            train_file_pattern='allbut', shuffle_buffer_size=0))
        ckpt_dir = tmp_path / 'ckpts'
        ckpt_dir.mkdir()
        subj = os.path.join(root, 'subject00')
        old_files = sorted(
            os.path.join(subj, f) for f in os.listdir(subj))
        np.savez(str(ckpt_dir / 'general_subject00.npz'),
                 corr=np.zeros((1, 2)),
                 lambdas=np.asarray([1e-3], np.float64),
                 files=np.asarray(old_files),
                 params=np.asarray('joined=string,of=params'))
        with pytest.raises(ValueError, match='older checkpoint '
                                             'format'):
            cohort.general_cohort_results(
                my_flags, cohort.discover_subjects(root, []), [1e-3],
                checkpoint_dir=str(ckpt_dir))

    def test_tf_family_clear_error_in_create_brain_model(self, rng):
        """Every driver (not just tdt-cohort) explains the tf
        flag-parity value."""
        from telluride_decoding_tpu.cli import decoding
        from telluride_decoding_tpu.data.brain_data import TestBrainData
        bd = TestBrainData('input', 'output', 100.0)
        bd.preserve_test_data(rng.randn(50, 3).astype(np.float32),
                              rng.randn(50, 1).astype(np.float32))
        flags_ = decoding.DecodingOptions().set_from_dict(
            dict(dnn_regressor='tf'))
        with pytest.raises(ValueError, match='no buildable model'):
            decoding.create_brain_model(flags_,
                                        bd.create_dataset('train'))
