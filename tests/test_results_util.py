"""results.txt parser + sweep aggregation tests (against files the
decoding driver actually writes)."""

import os

import numpy as np

from telluride_decoding_tpu.utils.results import (best_parameter,
                                                  collect_sweep_results,
                                                  parse_results_file)


def _write(path, lamb, corr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as f:
        f.write('Parameters: batch_size=512;dnn_regressor=linear;'
                'regularization_lambda=%s;loss=mse\n' % lamb)
        f.write('Final_Testing/loss: 0.01\n')
        f.write('Final_Testing/pearson_correlation_first: %g\n' % corr)
        f.write('Final_Testing/dprime: 1.5\n')


def test_parse_single_file(tmp_path):
    path = str(tmp_path / 'results.txt')
    _write(path, '0.1', 0.85)
    params, metrics = parse_results_file(path)
    assert params['regularization_lambda'] == '0.1'
    assert params['dnn_regressor'] == 'linear'
    assert metrics['pearson_correlation_first'] == 0.85
    assert metrics['dprime'] == 1.5


def test_parse_driver_output(tmp_path, rng):
    # Integration: parse what the real driver writes.
    from telluride_decoding_tpu.cli import decoding
    from telluride_decoding_tpu.data import records
    d = tmp_path / 'rec'
    d.mkdir()
    x = rng.randn(500, 4).astype(np.float32)
    records.convert_data_to_tfrecords(
        {'eeg': x, 'intensity': x[:, :1] * 2}, str(d / 't1.tfrecords'))
    my_flags = decoding.DecodingOptions().set_from_dict(dict(
        tfexample_dir=str(d), input_field='eeg', output_field='intensity',
        dnn_regressor='linear', train_file_pattern='t1',
        validate_file_pattern='t1', test_file_pattern='t1',
        attended_field='', batch_size=100, shuffle_buffer_size=0,
        summary_dir=str(tmp_path / 'out'), saved_model_dir=None))
    decoding.run_decoding_experiment(my_flags)
    params, metrics = parse_results_file(
        str(tmp_path / 'out' / 'results.txt'))
    assert params['dnn_regressor'] == 'linear'
    assert metrics['pearson_correlation_first'] > 0.99
    assert 'dprime' in metrics


def test_collect_and_best(tmp_path):
    for i, (lamb, corrs) in enumerate([('0.001', [0.5, 0.55]),
                                       ('0.1', [0.8, 0.82]),
                                       ('10.0', [0.6, 0.58])]):
        for j, corr in enumerate(corrs):
            _write(str(tmp_path / ('run%d_%d' % (i, j)) / 'results.txt'),
                   lamb, corr)
    collected = collect_sweep_results(str(tmp_path),
                                      'pearson_correlation_first')
    assert set(collected) == {'0.001', '0.1', '10.0'}
    assert len(collected['0.1']) == 2
    best = best_parameter(str(tmp_path), 'pearson_correlation_first')
    assert best[0] == '0.1'
    assert best[1] == 0.81
