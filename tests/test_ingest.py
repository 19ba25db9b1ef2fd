"""Ingest tests: triggers, trials, experiments, EDF + BrainVision.

Uses the reference's real BrainVision fixture for format interop and a
synthesized EDF round trip (the reference reads EDF via pyedflib; here
the pure-Python reader is validated against its own writer plus the
reference's header semantics).
"""

import os

import numpy as np
import pytest

from telluride_decoding_tpu.data import records
from telluride_decoding_tpu.io import (
    BrainExperiment,
    BrainSignal,
    BrainTrial,
    EdfBrainDataFile,
    MemoryBrainDataFile,
    convert_data_to_tfrecords,
    find_mean_std,
    find_temporal_offset_via_linear_regression,
    find_temporal_offset_via_mode_histogram,
    read_bv_file,
    read_edf,
    remove_close_times,
    transform_tfrecords,
    write_edf,
)
from telluride_decoding_tpu.io.brainvision import BvBrainDataFile


class TestBrainSignal:

    def test_basic_properties(self):
        s = BrainSignal('c1', np.arange(100.0), 64.0, data_type='eeg')
        assert s.signal.shape == (100, 1)
        assert s.sr == 64.0
        assert s.name == 'c1'
        assert s.data_type == 'eeg'

    def test_fix_offset(self):
        s = BrainSignal('c1', np.arange(100.0), 10.0)
        s.fix_offset(2.0)  # Drop 20 samples.
        assert s.signal.shape == (80, 1)
        assert s.signal[0, 0] == 20.0
        with pytest.raises(ValueError):
            s.fix_offset(-1)

    def test_validation(self):
        with pytest.raises(ValueError):
            BrainSignal('x', np.arange(4.0), 0.0)
        with pytest.raises(TypeError):
            BrainSignal(3, np.arange(4.0), 1.0)


class TestTriggerAlignment:

    def test_linear_regression_offset(self, rng):
        audio = np.sort(rng.rand(20) * 100)
        eeg = audio + 3.5
        offset, outliers = find_temporal_offset_via_linear_regression(
            audio, eeg)
        assert offset == pytest.approx(3.5, abs=1e-6)
        assert outliers == 0

    def test_linear_regression_robust_to_outliers(self, rng):
        audio = np.sort(rng.rand(30) * 100)
        eeg = audio + 2.0
        eeg[3] += 5.0  # One bad event.
        offset, outliers = find_temporal_offset_via_linear_regression(
            audio, eeg)
        assert offset == pytest.approx(2.0, abs=0.05)
        assert outliers == 1

    def test_mode_histogram(self, rng):
        audio = np.sort(rng.rand(15) * 50)
        eeg = audio + 1.25
        offset = find_temporal_offset_via_mode_histogram(audio, eeg,
                                                         fs=1000.0)
        assert offset == pytest.approx(1.25, abs=2e-3)

    def test_remove_close_times(self):
        times = [0.0, 0.01, 0.02, 1.0, 1.05, 2.0]
        kept = remove_close_times(times, min_time=0.06)
        np.testing.assert_allclose(kept, [0.0, 1.0, 2.0])


class TestBrainTrial:

    def _trial_with_data(self, rng, n=640):
        trial = BrainTrial('trial1')
        audio = rng.randn(n * 100, 1).astype(np.float32)
        trial.load_sound(audio, sound_fs=16000.0)
        eeg = {'A1': rng.randn(n), 'A2': rng.randn(n), 'TRIG': rng.randn(n)}
        trial.load_brain_data('', MemoryBrainDataFile(eeg, sr=64))
        return trial

    def test_load_and_summary(self, rng):
        trial = self._trial_with_data(rng)
        assert '3 EEG channels' in trial.summary_string()
        assert trial.sound_fs == 16000.0

    def test_assemble_brain_data(self, rng):
        trial = self._trial_with_data(rng)
        trial.assemble_brain_data('A1,A2')
        assert trial.model_features['eeg'].shape == (640, 2)
        with pytest.raises(ValueError):
            trial.assemble_brain_data('A1,A1')
        with pytest.raises(ValueError):
            trial.assemble_brain_data('missing')

    def test_audio_trigger_times(self):
        trial = BrainTrial('t')
        audio = np.zeros((1000, 2), np.float32)
        audio[100, 1] = 1.0
        audio[500:505, 1] = 1.0
        trial.load_sound(audio, sound_fs=100.0)
        times = trial.find_audio_trigger_times()
        np.testing.assert_allclose(times, [1.0, 5.0])

    def test_write_tfrecords_roundtrip(self, rng, tmp_path):
        trial = self._trial_with_data(rng)
        trial.assemble_brain_data('A1,A2')
        trial.add_model_feature('intensity', rng.randn(650, 1))
        path = trial.write_data_as_tfrecords(str(tmp_path))
        assert path.endswith('trial1.tfrecords')
        data = records.read_tfrecords(path)
        # adjust_data_sizes truncated to the shortest feature (640).
        assert data['eeg'].shape == (640, 2)
        assert data['intensity'].shape == (640, 1)

    def test_reverse_data_for_test(self, rng, tmp_path):
        trial = self._trial_with_data(rng)
        trial.assemble_brain_data('A1,A2')
        original = np.copy(trial.model_features['eeg'])
        path = trial.write_data_as_tfrecords(str(tmp_path),
                                             reverse_data_for_test=True)
        data = records.read_tfrecords(path)
        np.testing.assert_allclose(data['eeg'], original[::-1], atol=1e-6)


class TestBrainExperiment:

    def _experiment(self, rng, num_trials=3, n=320):
        trial_dict = {}
        for i in range(num_trials):
            eeg = {'A%d' % c: 10 + 5 * rng.randn(n) for c in range(2)}
            sound = {'audio_data': rng.randn(8000), 'audio_sr': 16000.0,
                     'intensity': 3 + rng.randn(n, 1)}
            trial_dict['trial%02d' % i] = [sound,
                                           MemoryBrainDataFile(eeg, sr=64)]
        return BrainExperiment(trial_dict, frame_rate=64)

    def test_load_and_summary(self, rng):
        exp = self._experiment(rng)
        exp.load_all_data()
        summary = exp.summary()
        assert 'Found 3 trials' in summary
        assert exp.trial_data('trial00') is not None

    def test_z_score_all_data(self, rng):
        exp = self._experiment(rng)
        exp.load_all_data()
        for trial in exp.iterate_trials():
            trial.assemble_brain_data('A0,A1')
        exp.z_score_all_data()
        all_eeg = np.concatenate(exp.get_all_feature_data('eeg'))
        assert abs(np.mean(all_eeg)) < 1e-6
        assert np.std(all_eeg) == pytest.approx(1.0, abs=1e-6)

    def test_write_all_data(self, rng, tmp_path):
        exp = self._experiment(rng)
        exp.load_all_data()
        for trial in exp.iterate_trials():
            trial.assemble_brain_data('A0,A1')
        files = exp.write_all_data(str(tmp_path))
        assert len(files) == 3
        for f in files:
            count, bad = records.count_tfrecords(f)
            assert count == 320 and not bad

    def test_save_zscore_data(self, rng, tmp_path):
        import pickle
        exp = self._experiment(rng)
        exp.load_all_data()
        for trial in exp.iterate_trials():
            trial.assemble_brain_data('A0,A1')
        exp.z_score_all_data()
        path = str(tmp_path / 'zscore.pkl')
        exp.save_zscore_data(path)
        with open(path, 'rb') as f:
            loaded = pickle.load(f)
        assert 'eeg' in loaded['mean'] and 'eeg' in loaded['std']

    def test_find_mean_std_columnwise(self, rng):
        data = [rng.randn(100, 3) + [1, 2, 3], rng.randn(50, 3) + [1, 2, 3]]
        mean, std = find_mean_std(data, columnwise=True)
        np.testing.assert_allclose(mean[0], [1, 2, 3], atol=0.2)
        assert std.shape == (1, 3)


class TestEdf:

    def test_write_read_roundtrip(self, rng, tmp_path):
        path = str(tmp_path / 'test.edf')
        sig1 = np.sin(np.arange(640) / 64.0 * 2 * np.pi).astype(np.float64)
        sig2 = rng.randn(320)
        write_edf(path, [sig1, sig2], ['C3', 'TRIG'], [64.0, 32.0])
        parsed = read_edf(path)
        assert parsed['labels'] == ['C3', 'TRIG']
        np.testing.assert_allclose(parsed['sample_rates'], [64.0, 32.0])
        got1 = parsed['signal_list'][0][:640]
        # int16 quantization limits the round-trip accuracy.
        np.testing.assert_allclose(got1, sig1, atol=1e-4)

    def test_edf_brain_data_file(self, rng, tmp_path):
        path = str(tmp_path / 'subj.edf')
        write_edf(path, [rng.randn(640), rng.randn(640)],
                  ['A1', 'A2'], [64.0, 64.0])
        reader = EdfBrainDataFile('subj')
        reader.load_all_data(str(tmp_path))
        assert reader.signal_names == ['A1', 'A2']
        assert reader.signal_fs('A2') == 64.0
        assert reader.signal_values('A1').shape[0] == 640
        assert reader.find_channel_index('A2') == 1
        assert reader.find_channel_index('missing') is None


class TestBrainVision:

    def test_reference_fixture(self, reference_test_data):
        header_file = os.path.join(reference_test_data,
                                   'brainvision_test.vhdr')
        if not os.path.exists(header_file):
            pytest.skip('brainvision fixture missing')
        header, data = read_bv_file(header_file)
        assert 'Common Infos' in header
        num_channels = header['Common Infos']['NumberOfChannels']
        assert data.shape[1] == num_channels
        assert data.shape[0] > 0

    def test_bv_brain_data_file(self, reference_test_data):
        header_file = os.path.join(reference_test_data,
                                   'brainvision_test.vhdr')
        if not os.path.exists(header_file):
            pytest.skip('brainvision fixture missing')
        reader = BvBrainDataFile('brainvision_test')
        reader.load_all_data(reference_test_data)
        names = reader.signal_names
        assert len(names) > 0
        first = reader.signal_values(names[0])
        assert first is not None and first.shape[0] > 0
        assert reader.signal_fs(names[0]) > 0


class TestTransforms:

    def test_transform_tfrecords(self, rng, tmp_path):
        src = str(tmp_path / 'src.tfrecords')
        convert_data_to_tfrecords(src, {
            'eeg': rng.randn(50, 2).astype(np.float32),
            'intensity': rng.randn(50, 1).astype(np.float32)})

        def double_intensity(data):
            return 'intensity2', data['intensity'] * 2

        out_dir = str(tmp_path / 'out')
        os.makedirs(out_dir)
        new_file = transform_tfrecords(src, out_dir, 'newtrial',
                                       [double_intensity])
        data = records.read_tfrecords(new_file)
        np.testing.assert_allclose(data['intensity2'],
                                   data['intensity'] * 2, atol=1e-6)


class TestEegTriggers:
    """EEG-side trigger helpers (reference ingest.py:467-557): the
    Natus level fix, Cognionix threshold, and offset trimming."""

    def _trial_with_trig(self, onsets, n=2000, sr=100.0):
        from telluride_decoding_tpu.io import ingest
        trial = ingest.BrainTrial('t')
        # Invert the Natus fix so the fixed signal's parity flips
        # exactly at the planted onsets: fixed = odd during a pulse.
        fixed = np.zeros(n)
        for s in onsets:
            fixed[s:s + 10] = 1.0          # 10-sample odd-level pulse.
        raw = (fixed - 0.5 + 32768) / -0.0063606452364314 + 5151600
        trial._brain_data = {
            'TRIG': ingest.BrainSignal('TRIG', raw[:, None], sr)}
        return trial

    def test_find_eeg_trigger_times_recovers_onsets(self):
        onsets = [100, 500, 1200]
        trial = self._trial_with_trig(onsets)
        times, raw_sig, fixed = trial.find_eeg_trigger_times()
        np.testing.assert_allclose(times, np.asarray(onsets) / 100.0,
                                   atol=0.02)
        assert raw_sig.shape[0] == 2000

    def test_find_eeg_trigger_times_missing_channel(self):
        trial = self._trial_with_trig([100])
        with pytest.raises(ValueError, match='channel name'):
            trial.find_eeg_trigger_times('NOPE')

    def test_cognionix_trigger_time(self):
        from telluride_decoding_tpu.io import ingest
        trial = ingest.BrainTrial('t')
        sig = np.zeros((1000, 1))
        sig[300:] = 9000.0
        trial._brain_data = {
            'EXP32': ingest.BrainSignal('EXP32', sig, 100.0)}
        assert trial.find_cognionix_trigger_time() == pytest.approx(3.0)
        trial._brain_data['EXP32'] = ingest.BrainSignal(
            'EXP32', np.zeros((1000, 1)), 100.0)
        assert trial.find_cognionix_trigger_time() is None

    def test_fix_eeg_offset_trims_all_channels(self):
        from telluride_decoding_tpu.io import ingest
        trial = ingest.BrainTrial('t')
        a = np.arange(500, dtype=np.float64)[:, None]
        trial._brain_data = {
            'C1': ingest.BrainSignal('C1', a.copy(), 100.0),
            'C2': ingest.BrainSignal('C2', a.copy() * 2, 100.0)}
        trial.fix_eeg_offset(1.0)          # Drop the first second.
        assert trial._brain_data['C1'].signal[0, 0] == 100.0
        assert trial._brain_data['C2'].signal[0, 0] == 200.0
        assert trial._brain_data['C1'].signal.shape[0] == 400
