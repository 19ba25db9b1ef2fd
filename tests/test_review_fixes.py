"""Regression tests for code-review findings."""

import numpy as np
import pytest

from telluride_decoding_tpu.data import brain_data, records
from telluride_decoding_tpu.sweep.engine import cca_jackknife_sweep


def _write_trials(tmp_path, rng, num=3):
    d = tmp_path / 'rec'
    d.mkdir()
    w = rng.randn(4, 1).astype(np.float32)
    for i in range(num):
        x = rng.randn(300, 4).astype(np.float32)
        records.convert_data_to_tfrecords(
            {'eeg': x, 'intensity': x @ w},
            str(d / ('t%02d.tfrecords' % i)))
    return str(d)


def test_single_test_file_sweep_not_nan(rng, tmp_path):
    # Finding: --test_file used to shrink the jackknife to ONE file,
    # making leave-one-out stats empty and every correlation NaN.
    from telluride_decoding_tpu.cli import decoding as dec
    from telluride_decoding_tpu.cli import regression as reg
    d = _write_trials(tmp_path, rng)
    my_flags = dec.DecodingOptions().set_from_dict(dict(
        tfexample_dir=d, dnn_regressor='linear', input_field='eeg',
        output_field='intensity', post_context=0,
        test_metric='pearson_correlation_first'))
    obj = reg.RegressionLinear(my_flags)
    bd = reg.get_brain_data_object(my_flags)
    test_file = bd.all_files()[0]
    results = obj.jackknife_over_regularizations(
        my_flags, [1e-4], test_file=test_file,
        summary_base_dir=str(tmp_path / 's'))
    (mean, std), = results.values()
    assert np.isfinite(mean)
    assert mean > 0.9


def test_cca_sweep_rank_deficient_matches_solver(rng):
    # Finding: degenerate eigendirections were clamped to 1e-12 and
    # amplified 1e6x instead of zeroed like the solver.
    latent = rng.randn(900, 2).astype(np.float32)
    xs, ys = [], []
    for i in range(3):
        n = 300
        sl = slice(i * n, (i + 1) * n)
        base = np.concatenate([latent[sl] + 0.1 * rng.randn(n, 2),
                               rng.randn(n, 2)], axis=1).astype(np.float32)
        x = np.concatenate([base, base[:, :2]], axis=1)  # Duplicated cols.
        y = np.concatenate([latent[sl] + 0.1 * rng.randn(n, 2),
                            rng.randn(n, 1)], axis=1).astype(np.float32)
        xs.append(x)
        ys.append(y)
    res = cca_jackknife_sweep(xs, ys, [1e-6, 1e-2], dims=2)
    assert np.all(np.isfinite(res.correlations))
    assert np.all(res.correlations > 0.8)  # Was ~0.45 pre-fix.


def test_shuffle_seed_none_passes_through(rng, tmp_path):
    d = _write_trials(tmp_path, rng, num=6)
    firsts = set()
    for _ in range(20):
        bd = brain_data.create_brain_dataset(
            'tfrecords', 'eeg', 'intensity', 100.0, data_dir=d,
            shuffle_seed=None)
        firsts.add(bd.all_files()[0])
    assert len(firsts) > 1  # Fresh randomness per instance.


def test_shrinkage_lambda_validated(rng):
    from telluride_decoding_tpu.solvers.ridge import (
        calculate_linear_regressor_parameters)
    x = rng.randn(100, 3).astype(np.float32)
    y = rng.randn(100, 1).astype(np.float32)
    with pytest.raises(ValueError):
        calculate_linear_regressor_parameters(x, y, lamb=5.0,
                                              use_ridge=False)
    # -1 (auto Ledoit-Wolf) stays legal.
    sol = calculate_linear_regressor_parameters(x, y, lamb=-1,
                                                use_ridge=False)
    assert np.all(np.isfinite(np.asarray(sol.w)))


def test_file_cache_updates_at_capacity(rng, tmp_path):
    import os
    import time
    d = _write_trials(tmp_path, rng, num=1)
    path = os.path.join(d, 't00.tfrecords')
    # (Updated for the byte-budget LRU redesign: entries are
    # (mtime, arrays, nbytes) and eviction is by bytes, so the old
    # 64-entry 'at capacity' premise no longer exists.)
    brain_data.TFExampleData._file_cache.clear()
    brain_data.TFExampleData._file_cache_bytes = 0
    try:
        bd = brain_data.TFExampleData(
            'eeg', 'intensity', 100.0, data_dir=d,
            test_file_pattern='t00', shuffle_buffer_size=0,
            final_batch_size=4)
        bd.file_arrays(path)
        assert path in brain_data.TFExampleData._file_cache
        # Rewriting the file with a NEWER mtime must REPLACE the cached
        # entry (and keep the byte accounting consistent).
        records.convert_data_to_tfrecords(
            {'eeg': 7 * np.ones((4, 4), np.float32),
             'intensity': np.ones((4, 1), np.float32)}, path)
        os.utime(path, (time.time() + 99, time.time() + 99))
        in1, _, _, _ = bd.file_arrays(path)
        assert in1[0, 0] == 7.0
        entry = brain_data.TFExampleData._file_cache[path]
        assert entry[1]['eeg'][0, 0] == 7.0
        assert (brain_data.TFExampleData._file_cache_bytes ==
                sum(e[2] for e in
                    brain_data.TFExampleData._file_cache.values()))
    finally:
        brain_data.TFExampleData._file_cache.clear()
        brain_data.TFExampleData._file_cache_bytes = 0
