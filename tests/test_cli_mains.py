"""main()-level driver tests (the reference's decoding_test.test_main
pattern: whole program via parsed flags, SURVEY §4.5)."""

import os

import numpy as np
import pytest
from absl.testing import flagsaver

from telluride_decoding_tpu.cli import decoding, infer
from telluride_decoding_tpu.data import records


@pytest.fixture
def trf_dir(tmp_path, rng):
    d = tmp_path / 'records'
    d.mkdir()
    t = np.arange(25) / 100.0
    shape = 30 * t * np.exp(-30 * t)
    irs = (np.random.RandomState(0).randn(8, 25) *
           shape[None, :]).astype(np.float32)
    for name in ['trial01', 'trial02', 'trial03']:
        n = 2000
        raw = np.abs(rng.randn(n // 10 + 2))
        idx = np.linspace(0, raw.shape[0] - 1.001, n)
        lo = idx.astype(int)
        fr = idx - lo
        att = ((1 - fr) * raw[lo] + fr * raw[lo + 1]).astype(np.float32)
        eeg = np.stack([np.convolve(att, irs[c], 'full')[:n]
                        for c in range(8)], 1).astype(np.float32)
        records.convert_data_to_tfrecords(
            {'eeg': eeg, 'intensity': att[:, None]},
            str(d / ('%s.tfrecords' % name)))
    return str(d)


def test_decoding_main(tmp_path, trf_dir):
    decoding.FLAGS(['prog'])
    with flagsaver.flagsaver(
            tfexample_dir=trf_dir, input_field='eeg',
            output_field='intensity', dnn_regressor='linear',
            regularization_lambda=1e-3, pre_context=0, post_context=24,
            train_file_pattern='allbut', validate_file_pattern='trial02',
            test_file_pattern='trial02', attended_field='',
            summary_dir=str(tmp_path / 'summary'),
            saved_model_dir=str(tmp_path / 'model')):
        decoding.main(['prog'])
    results = open(os.path.join(str(tmp_path / 'summary'),
                                'results.txt')).read()
    assert 'Final_Testing/pearson_correlation_first:' in results
    corr = float([l for l in results.splitlines()
                  if l.startswith('Final_Testing/'
                                  'pearson_correlation_first')
                  ][0].split()[-1])
    assert corr > 0.97
    for artifact in ('model.json', 'weights.npz', 'decoder_model.json'):
        assert os.path.exists(os.path.join(str(tmp_path / 'model'),
                                           artifact))


def test_infer_main_errors_on_missing_model(tmp_path):
    infer.FLAGS(['prog'])
    from absl import app
    with flagsaver.flagsaver(model_dir=str(tmp_path / 'nope')):
        with pytest.raises(app.UsageError):
            infer.main(['prog'])


def test_decoding_main_rejects_extra_args(trf_dir):
    from absl import app
    decoding.FLAGS(['prog'])
    with pytest.raises(app.UsageError):
        decoding.main(['prog', 'stray'])


def test_decoding_main_trace_dir(tmp_path, trf_dir):
    """--trace_dir writes a TensorBoard-loadable jax.profiler device
    trace of the experiment (beyond-reference observability)."""
    decoding.FLAGS(['prog'])
    trace_dir = str(tmp_path / 'trace')
    with flagsaver.flagsaver(
            tfexample_dir=trf_dir, input_field='eeg',
            output_field='intensity', dnn_regressor='linear',
            regularization_lambda=1e-3, pre_context=0, post_context=4,
            train_file_pattern='allbut', validate_file_pattern='trial02',
            test_file_pattern='trial02', attended_field='',
            summary_dir=str(tmp_path / 'summary'),
            saved_model_dir=str(tmp_path / 'model'),
            trace_dir=trace_dir):
        decoding.main(['prog'])
    traces = [os.path.join(root, f)
              for root, _, files in os.walk(trace_dir) for f in files]
    assert any(f.endswith('.xplane.pb') for f in traces), traces
