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
