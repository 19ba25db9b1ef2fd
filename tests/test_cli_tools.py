"""Tests for add_trigger and regression_data (synthetic archives)."""

import os

import numpy as np
import pytest
import scipy.io as spio

from telluride_decoding_tpu.cli import add_trigger, regression_data
from telluride_decoding_tpu.data import records


class TestAddTrigger:

    def test_random_times_spacing(self, rng):
        times = add_trigger.random_times(60.0, 20, minimum_interval=0.5,
                                         rng=rng)
        assert times is not None
        assert times[0] == 0.0
        assert np.min(np.diff(times)) >= 0.5
        assert len(times) == 20

    def test_random_times_impossible(self):
        with pytest.raises(ValueError):
            add_trigger.random_times(1.0, 100, minimum_interval=0.5)

    def test_random_times_high_density(self, rng):
        """The CLI default is 1 event/s with a 0.5 s minimum gap — the
        spacing budget is half the duration. (Regression: a
        draw-and-check sampler practically never succeeds here and
        returned None, crashing main().)"""
        times = add_trigger.random_times(59.8, 60, minimum_interval=0.5,
                                         rng=rng)
        assert times is not None and len(times) == 60
        assert times[0] == 0.0
        assert np.min(np.diff(times)) >= 0.5
        assert times[-1] <= 59.8

    def test_random_times_without_zero(self, rng):
        times = add_trigger.random_times(10.0, 15, minimum_interval=0.5,
                                         include_zero=False, rng=rng)
        assert len(times) == 15
        assert np.min(np.diff(times)) >= 0.5
        assert times[-1] <= 10.0

    def test_add_events_pulses(self, rng):
        fs = 16000
        audio = (1000 * rng.randn(fs * 5)).astype(np.int16)
        events = np.array([0.0, 1.0, 3.0])
        stereo = add_trigger.add_events_to_audio(audio, events, fs=fs,
                                                 pulse_length=0.1)
        assert stereo.shape == (fs * 5, 2)
        assert stereo.dtype == np.int16
        assert stereo[int(1.05 * fs), 1] == 32767       # Inside a pulse.
        assert stereo[int(2.0 * fs), 1] == 0            # Between pulses.
        np.testing.assert_array_equal(stereo[:, 0], audio)

    def test_add_events_tone(self, rng):
        fs = 16000
        audio = np.zeros(fs * 4, np.int16)
        events = np.array([0.0, 1.0, 2.0])
        stereo = add_trigger.add_events_to_audio(audio, events, fs=fs,
                                                 pulse_length=0.05,
                                                 pulse_freq=1000)
        seg = stereo[int(1.0 * fs):int(1.05 * fs), 1].astype(np.float64)
        assert np.max(np.abs(seg)) > 30000  # Tone present.
        assert abs(np.mean(seg)) < 3000     # Oscillating, not DC.

    def test_wav_roundtrip(self, rng, tmp_path):
        fs = 16000
        audio = (1000 * rng.randn(fs)).astype(np.int16)
        path = str(tmp_path / 'x.wav')
        add_trigger.write_audio_wave_file(path, audio, fs)
        fs2, back = add_trigger.read_audio_wave_file(path)
        assert fs2 == fs
        np.testing.assert_array_equal(back, audio)

    def test_validation(self, rng):
        with pytest.raises(TypeError):
            add_trigger.add_events_to_audio([1, 2, 3], [0.1, 0.2, 0.3])
        with pytest.raises(ValueError):
            add_trigger.add_events_to_audio(np.zeros(100, np.int16),
                                            [0.1, 0.2, 0.3], fs=100)
        with pytest.raises(ValueError):
            add_trigger.add_events_to_audio(
                np.zeros(100000, np.int16), [0.1], fs=16000)


class TestRegressionData:

    def test_telluride4_ingest(self, rng, tmp_path):
        # Synthetic Telluride2015.mat: 32 eeg trials, 4 audio files.
        cache = tmp_path / 'cache'
        cache.mkdir()
        n = 256
        eeg = np.empty((32,), object)
        wav = np.empty((4,), object)
        for i in range(32):
            eeg[i] = rng.randn(n, 8)
        for i in range(4):
            wav[i] = np.abs(rng.randn(n, 1))
        spio.savemat(str(cache / 'Telluride2015.mat'),
                     {'data': {'eeg': eeg, 'wav': wav}})
        obj = regression_data.RegressionDataTelluride4()
        assert obj.is_data_local(str(cache))
        tf_dir = str(tmp_path / 'tf')
        assert not obj.is_data_ingested(tf_dir)
        obj.ingest_data(str(cache), tf_dir, 64)
        assert obj.is_data_ingested(tf_dir)
        files = sorted(os.listdir(tf_dir))
        assert 'README.txt' in files
        assert len([f for f in files if f.endswith('.tfrecords')]) == 32
        data = records.read_tfrecords(os.path.join(tf_dir,
                                                   'trial_01.tfrecords'))
        assert set(data.keys()) == {'eeg', 'intensity', 'ones',
                                    'attended_speaker'}
        assert data['eeg'].shape == (n, 8)
        # z-scored across all trials.
        readme = open(os.path.join(tf_dir, 'README.txt')).read()
        assert 'Feature shapes' in readme

    def test_jens_memory_ingest(self, rng, tmp_path):
        cache = tmp_path / 'cache'
        cache.mkdir()
        # Two synthetic subjects x 3 trials of [70, N] (69 eeg + audio).
        for sid in range(2):
            trials = np.empty((3,), object)
            for t in range(3):
                trials[t] = rng.randn(70, 256)
            spio.savemat(str(cache / ('subject_%02d.mat' % sid)),
                         {'data': {'fsample': 128.0, 'trial': trials}})
        obj = regression_data.RegressionDataJensMemory()
        assert obj.is_data_local(str(cache), num_subjects=2)
        tf_dir = str(tmp_path / 'tf')
        obj.ingest_data(str(cache), tf_dir, 64)
        assert obj.is_data_ingested(tf_dir, num_subjects=2, num_trials=3)
        data = records.read_tfrecords(os.path.join(
            tf_dir, 'subject_01', 'trial_01.tfrecords'))
        assert data['eeg'].shape == (128, 69)      # 256 @128Hz -> 64Hz.
        assert data['intensity'].shape == (128, 1)

    def test_locations_registry(self):
        assert set(regression_data.locations.keys()) == {
            'telluride4', 'jens_memory', 'jens_impaired', 'kuleuven'}
        for loc in regression_data.locations.values():
            assert loc.internet.startswith('http')
            assert loc.desired_frame_rate > 0

    def test_loadmat_struct_recursion(self, tmp_path, rng):
        path = str(tmp_path / 's.mat')
        spio.savemat(path, {'top': {'inner': {'value': 42.0},
                                    'arr': rng.randn(3)}})
        data = regression_data.loadmat(path)
        assert data['top']['inner']['value'] == 42.0
        assert data['top']['arr'].shape == (3,)

    def test_download_failure_is_graceful(self, tmp_path):
        # file:// to a missing path exercises the same error handling
        # hermetically (no DNS — hijacking resolvers can make bogus
        # https hosts resolve, or hang without a timeout).
        out = regression_data.download_from_gdrive(
            (tmp_path / 'does-not-exist.bin').as_uri(),
            str(tmp_path / 'out.bin'))
        assert out is None
        assert not (tmp_path / 'out.bin').exists()
        assert not (tmp_path / 'out.bin.part').exists()

    def test_download_rejects_html_interstitial(self, tmp_path):
        """A gdrive 'can't scan for viruses' HTML page must NOT be
        cached as the payload (it would poison is_data_local forever):
        the download reports failure and leaves no file."""
        page = tmp_path / 'interstitial.html'
        page.write_text('<!DOCTYPE html><html><body>'
                        'Google Drive - Virus scan warning'
                        '</body></html>')
        target = tmp_path / 'data.mat'
        out = regression_data.download_from_gdrive(page.as_uri(),
                                                   str(target))
        assert out is None
        assert not target.exists()
        assert not (tmp_path / 'data.mat.part').exists()

    def test_download_binary_payload_ok(self, tmp_path, rng):
        blob = tmp_path / 'payload.bin'
        payload = rng.bytes(4096)
        blob.write_bytes(payload)
        target = tmp_path / 'fetched.bin'
        out = regression_data.download_from_gdrive(blob.as_uri(),
                                                   str(target))
        assert out == str(target)
        assert target.read_bytes() == payload


class TestCompileCache:

    def test_disabled_on_cpu_backend(self):
        from telluride_decoding_tpu.utils import compile_cache
        # Tests run on the CPU mesh: TPU-only cache must decline.
        assert not compile_cache.enable_persistent_compilation_cache()

    def test_empty_dir_disables(self, monkeypatch):
        from telluride_decoding_tpu.utils import compile_cache
        monkeypatch.setenv('TDT_COMPILE_CACHE_DIR', '')
        assert not compile_cache.enable_persistent_compilation_cache()
