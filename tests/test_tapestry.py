"""End-to-end two-speaker AAD from real audio (tapestry.wav).

BASELINE config 4: derive two-speaker data from the reference's
tapestry.wav fixture — real audio -> fused envelope frontend ->
synthetic EEG -> full ingest -> decoding driver -> scaled-LDA decoder
-> streaming infer with attention switches.
"""

import os

import numpy as np
import pytest

from telluride_decoding_tpu.cli import decoding, infer
from telluride_decoding_tpu.io import BrainExperiment, LocalCopy, \
    MemoryBrainDataFile
from telluride_decoding_tpu.signal import AudioFeatures


FRAME_RATE = 100.0


@pytest.fixture(scope='module')
def tapestry_intensity():
    import scipy.io.wavfile
    path = '/root/reference/test_data/tapestry.wav'
    if not os.path.exists(path):
        pytest.skip('tapestry.wav fixture missing')
    with LocalCopy(path) as local:
        fs, wave = scipy.io.wavfile.read(local)
    wave = np.asarray(wave, np.float32)
    if wave.ndim > 1:
        wave = wave[:, 0]
    wave /= 32767.0
    af = AudioFeatures('tapestry', fs, FRAME_RATE, window=2,
                       exponent=np.log10(2))
    return af.compute_intensity(wave[:, None]).astype(np.float32)


@pytest.fixture(scope='module')
def tapestry_dataset(tapestry_intensity, tmp_path_factory):
    """Two-speaker records: speaker 1 = tapestry envelope, speaker 2 =
    time-reversed tapestry; synthetic EEG tracks the attended one."""
    rng = np.random.RandomState(0)
    d = tmp_path_factory.mktemp('tapestry_records')
    # tapestry.wav is ~3 s; tile it into a multi-repeat "speech" stream.
    env1_full = np.tile(tapestry_intensity, (6, 1))
    env2_full = env1_full[::-1].copy()
    n = env1_full.shape[0]
    mix_w = rng.randn(1, 8).astype(np.float32)

    def build(name, labels):
        attended = np.where(labels == 0, env1_full, env2_full)
        eeg = (attended @ mix_w +
               0.05 * rng.randn(n, 8).astype(np.float32))
        trial_dict = {name: [
            {'loudness': env1_full, 'loudness2': env2_full,
             'attend': labels.astype(np.float32)},
            MemoryBrainDataFile({'eeg_data': eeg}, sr=FRAME_RATE)]}
        exp = BrainExperiment(trial_dict, frame_rate=FRAME_RATE)
        exp.load_all_data()
        for trial in exp.iterate_trials():
            trial.assemble_brain_data('eeg_data')
        exp.write_all_data(str(d))

    build('train01', np.zeros((n, 1), np.float32))
    switch_labels = np.zeros((n, 1), np.float32)
    switch_labels[n // 2:] = 1.0
    build('test01', switch_labels)
    return str(d)


class TestTapestryPipeline:

    def test_intensity_is_plausible(self, tapestry_intensity):
        env = tapestry_intensity[:, 0]
        assert env.shape[0] > 200          # A few seconds of audio.
        assert np.all(env >= 0)
        assert np.std(env) > 0.01          # Real modulation.

    def test_two_speaker_decoding(self, tapestry_dataset, tmp_path):
        model_dir = str(tmp_path / 'model')
        my_flags = decoding.DecodingOptions().set_from_dict(dict(
            data='tfrecords',
            tfexample_dir=tapestry_dataset,
            input_field='eeg', output_field='loudness',
            attended_field='attend',
            frame_rate=FRAME_RATE,
            pre_context=0, post_context=0,
            dnn_regressor='linear', regularization_lambda=1e-4,
            batch_size=200, shuffle_buffer_size=0,
            train_file_pattern='train', validate_file_pattern='train',
            test_file_pattern='train',
            summary_dir=str(tmp_path / 'summary'),
            saved_model_dir=model_dir,
        ))
        _, test_results, dprime = decoding.run_decoding_experiment(
            my_flags)
        assert test_results['pearson_correlation_first'] > 0.9
        assert dprime > 1.0

        results = infer.run_reduction_test(
            model_dir, tapestry_dataset, ['train'], ['test'],
            reduction='lda', decoder_type='wta',
            audio_label_1='loudness', audio_label_2='loudness2',
            window_list=[100, 200])
        assert results[100] > 0.9
        assert results[200] > 0.9
