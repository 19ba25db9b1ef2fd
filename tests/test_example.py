"""The shipped end-to-end example must actually run (it is the first
thing a new user executes)."""

import os
import subprocess
import sys


def test_synthetic_cohort_generator_feeds_the_driver(tmp_path):
    """examples/make_synthetic_cohort.py (the dataset behind the
    measured end-to-end cohort number) must produce records the
    cohort driver ingests, at toy scale."""
    import numpy as np
    from examples.make_synthetic_cohort import make_cohort
    from telluride_decoding_tpu.cli import cohort, decoding
    base = str(tmp_path / 'cohort')
    make_cohort(base, num_subjects=2, trials=3, frames=120, chans=4,
                lags=5)
    my_flags = decoding.DecodingOptions().set_from_dict(dict(
        tfexample_dir='', input_field='eeg', output_field='intensity',
        dnn_regressor='linear', pre_context=0, post_context=4,
        test_metric='pearson_correlation_first'))
    subjects = cohort.discover_subjects(base, [])
    assert sorted(subjects) == ['subj00', 'subj01']
    results, (mean, std) = cohort.run_cohort_sweep(
        my_flags, subjects, [1e-4, 1e-1],
        subject_parallel=False)
    assert set(results) == {'subj00', 'subj01'}
    assert np.all(mean > 0.8)   # Planted TRF recovered.


def test_full_pipeline_example(tmp_path, cpu_subprocess_env):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, 'examples',
                                      'full_pipeline.py'),
         str(tmp_path)],
        env=cpu_subprocess_env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout + proc.stderr
    assert 'results.txt' in out or os.path.exists(
        os.path.join(str(tmp_path), 'summary', 'results.txt')), out[-2000:]
