"""infer CLI tests: two-speaker attention switching end to end.

Mirrors the reference test/infer_test.py:120-216: build a linear model
on two-speaker fake data, run run_reduction_test, and require window
accuracy > 0.95 for windows >= 100 frames (1 s at 100 Hz).
"""

import os

import numpy as np
import pytest

from telluride_decoding_tpu.cli import decoding, infer
from telluride_decoding_tpu.data import records


NUM_CHANNELS = 4


def _write_two_speaker_data(rng, d, w_true):
    """One train file (attend spk1 throughout) + one test file with a
    mid-file attention switch."""
    os.makedirs(str(d), exist_ok=True)

    def build(n, labels):
        eeg = rng.randn(n, NUM_CHANNELS).astype(np.float32)
        matched = (eeg @ w_true).astype(np.float32)
        rand1 = rng.randn(n, 1).astype(np.float32)
        rand2 = rng.randn(n, 1).astype(np.float32)
        loud1 = np.where(labels == 0, matched, rand1)
        loud2 = np.where(labels == 1, matched, rand2)
        return {'eeg': eeg, 'loudness': loud1, 'loudness2': loud2,
                'attend': labels.astype(np.float32)}

    n_train, n_test = 3000, 2000
    train_labels = np.zeros((n_train, 1))
    records.convert_data_to_tfrecords(build(n_train, train_labels),
                                      os.path.join(str(d),
                                                   'train01.tfrecords'))
    test_labels = np.zeros((n_test, 1))
    test_labels[n_test // 2:] = 1.0
    records.convert_data_to_tfrecords(build(n_test, test_labels),
                                      os.path.join(str(d),
                                                   'test01.tfrecords'))


@pytest.fixture
def infer_setup(rng, tmp_path):
    w_true = rng.randn(NUM_CHANNELS, 1).astype(np.float32)
    tf_dir = tmp_path / 'records'
    _write_two_speaker_data(rng, tf_dir, w_true)
    model_dir = str(tmp_path / 'linear_model')
    my_flags = decoding.DecodingOptions().set_from_dict(dict(
        data='tfrecords',
        tfexample_dir=str(tf_dir),
        input_field='eeg',
        output_field='loudness',
        attended_field='attend',
        frame_rate=100.0,
        pre_context=0, post_context=0,
        dnn_regressor='linear',
        regularization_lambda=1e-4,
        batch_size=200,
        shuffle_buffer_size=0,
        train_file_pattern='train',
        validate_file_pattern='train',
        test_file_pattern='train',
        summary_dir=str(tmp_path / 'summary'),
        saved_model_dir=model_dir,
        correlation_reducer='lda',
    ))
    decoding.run_decoding_experiment(my_flags)
    return str(tf_dir), model_dir


class TestHelpers:

    def test_find_first_segment(self):
        labels = np.array([0.0, 0, 0, 1, 1, 0])
        assert infer.find_first_segment(labels) == 3
        assert infer.find_first_segment(np.zeros(5)) == 0
        with pytest.raises(TypeError):
            infer.find_first_segment('nope')
        with pytest.raises(TypeError):
            infer.find_first_segment(np.zeros((3, 2)))

    def test_calculate_time_axis(self):
        t = infer.calculate_time_axis(4, window_step=100, window_width=200,
                                      frame_rate=100.0)
        # Window centers: (0*100+100)/100/60 ...
        np.testing.assert_allclose(t * 60 * 100,
                                   [100, 200, 300, 400])
        assert infer.calculate_time_axis([1, 2], 10, 10, 100).shape == (2,)
        with pytest.raises(TypeError):
            infer.calculate_time_axis('x', 1, 1, 1.0)


class TestReductionTest:

    def test_window_accuracy_gate(self, infer_setup):
        tf_dir, model_dir = infer_setup
        results = infer.run_reduction_test(
            model_dir, tf_dir, ['train'], ['test'],
            reduction='lda', decoder_type='wta',
            audio_label_1='loudness', audio_label_2='loudness2',
            window_list=[10, 100, 200])
        # Reference gate (test/infer_test.py:171-176): >0.95 correct
        # for windows >= 100 frames; small windows do worse.
        assert results[100] > 0.95
        assert results[200] > 0.95

    def test_stepped_decoder(self, infer_setup):
        tf_dir, model_dir = infer_setup
        results = infer.run_reduction_test(
            model_dir, tf_dir, ['train'], ['test'],
            reduction='first', decoder_type='stepped',
            audio_label_1='loudness', audio_label_2='loudness2',
            window_list=[200])
        assert results[200] > 0.8  # Hysteresis lags at the switch.

    def test_csv_output(self, infer_setup, tmp_path):
        tf_dir, model_dir = infer_setup
        csv_path = str(tmp_path / 'acc.csv')
        infer.run_reduction_test(
            model_dir, tf_dir, ['train'], ['test'],
            reduction='lda', decoder_type='wta',
            audio_label_1='loudness', audio_label_2='loudness2',
            window_list=[100], save_results_csv=csv_path)
        lines = open(csv_path).read().strip().split('\n')
        assert lines[0] == 'Window size,Accuracy'
        assert lines[1].startswith('100,')

    def test_comparison_test(self, infer_setup, tmp_path):
        tf_dir, model_dir = infer_setup
        plot_dir = str(tmp_path / 'plots')
        all_results = infer.run_comparison_test(
            model_dir, tf_dir, ['train'], ['test'],
            'loudness', 'loudness2', plot_dir,
            reduction_list=['lda'], decoder_list=['wta', 'stepped'],
            window_list=[100])
        assert ('lda', 'wta') in all_results
        assert ('lda', 'stepped') in all_results
        assert os.path.exists(os.path.join(
            plot_dir, 'test_results-comparison.png'))

    def test_load_model_requires_params(self, tmp_path):
        with pytest.raises(Exception):
            infer.load_model(str(tmp_path / 'nonexistent_linear'), 'lda')
