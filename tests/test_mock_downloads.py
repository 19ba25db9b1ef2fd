"""End-to-end download -> extract -> ingest dry runs for all four
corpora, driven through regression_data.main() with file:// URLs over
local synthetic archives (VERDICT r1 item 10). After these, the only
untested code in the corpus path is the network fetch itself.

Also the first coverage of the KULeuven ingest (synthetic 16-subject
corpus with stimuli wavs).
"""

import os
import tarfile
import zipfile

import numpy as np
import pytest
import scipy.io as spio
import scipy.io.wavfile

from telluride_decoding_tpu.cli import regression_data
from telluride_decoding_tpu.data import records


def _run_main(tmp_path, data_type, url, frame_rate):
    cache = str(tmp_path / 'cache')
    tf_dir = str(tmp_path / 'tf')
    regression_data.FLAGS([
        'prog', '--type=%s' % data_type, '--internet=%s' % url,
        '--cache_dir=%s' % cache, '--tf_output_dir=%s' % tf_dir,
        '--desired_frame_rate=%g' % frame_rate])
    regression_data.main(['prog'])
    return cache, tf_dir


class TestTelluride4MockUrl:

    def test_download_and_ingest(self, rng, tmp_path):
        n = 256
        eeg = np.empty((32,), object)
        wav = np.empty((4,), object)
        for i in range(32):
            eeg[i] = rng.randn(n, 8)
        for i in range(4):
            wav[i] = np.abs(rng.randn(n, 1))
        src = tmp_path / 'Telluride2015.mat'
        spio.savemat(str(src), {'data': {'eeg': eeg, 'wav': wav}})
        cache, tf_dir = _run_main(tmp_path, 'telluride4',
                                  'file://' + str(src), 64)
        assert os.path.exists(os.path.join(cache, 'Telluride2015.mat'))
        assert os.path.exists(os.path.join(cache, 'README.txt'))
        obj = regression_data.RegressionDataTelluride4()
        assert obj.is_data_ingested(tf_dir)


class TestJensMemoryMockUrl:

    def test_download_and_ingest(self, rng, tmp_path):
        stage = tmp_path / 'stage'
        stage.mkdir()
        for sid in range(22):
            trials = np.empty((3,), object)
            for t in range(3):
                trials[t] = rng.randn(70, 64)
            spio.savemat(str(stage / ('subject_%02d.mat' % sid)),
                         {'data': {'fsample': 128.0, 'trial': trials}})
        archive = tmp_path / 'DATA.zip'
        with zipfile.ZipFile(str(archive), 'w') as zf:
            for f in sorted(os.listdir(str(stage))):
                zf.write(str(stage / f), f)
        cache, tf_dir = _run_main(tmp_path, 'jens_memory',
                                  'file://' + str(archive), 64)
        obj = regression_data.RegressionDataJensMemory()
        assert obj.is_data_local(cache)
        assert obj.is_data_ingested(tf_dir, num_subjects=22, num_trials=3)
        data = records.read_tfrecords(os.path.join(
            tf_dir, 'subject_01', 'trial_01.tfrecords'))
        assert data['eeg'].shape == (32, 69)  # 64 @128Hz -> 64Hz.


class TestJensImpairedMockUrl:

    def test_download_untar_and_ingest(self, rng, tmp_path):
        stage = tmp_path / 'stage' / 'ds-eeg-snhl'
        stage.mkdir(parents=True)
        from conftest import build_impaired_tree
        build_impaired_tree(rng, stage)
        archive = tmp_path / 'ds-eeg-snhl.tar'
        with tarfile.open(str(archive), 'w') as tf:
            tf.add(str(stage), arcname='ds-eeg-snhl')
        cache, tf_dir = _run_main(tmp_path, 'jens_impaired',
                                  'file://' + str(archive), 64)
        # The ds-eeg-snhl/ wrapper was hoisted into the cache root.
        assert os.path.isdir(os.path.join(cache, 'sub-001'))
        files = sorted(os.listdir(os.path.join(tf_dir, 'subject_01')))
        assert len([f for f in files if 'dual_speaker' in f]) == 32
        assert 'README.txt' in files


class TestKULeuvenMockUrl:

    def test_download_unzip_and_ingest(self, rng, tmp_path):
        stage = tmp_path / 'stage'
        (stage / 'stimuli').mkdir(parents=True)
        sound_fs = 8000
        names = ['part1_track1', 'part1_track2']
        for name in names:
            wav = (3000 * rng.randn(2 * sound_fs)).astype(np.int16)
            scipy.io.wavfile.write(
                str(stage / 'stimuli' / (name + '.wav')), sound_fs, wav)
        for sid in range(16):
            trials = np.empty((2,), object)
            for t in range(2):
                trials[t] = {
                    'attended_ear': 'L' if t % 2 == 0 else 'R',
                    'stimuli': np.array(names, dtype=object),
                    'RawData': {'EegData': rng.randn(256, 8)},
                    'FileHeader': {'SampleRate': 128.0},
                }
            spio.savemat(str(stage / ('S%d.mat' % (sid + 1))),
                         {'preproc_trials': trials})
        archive = tmp_path / 'kuleuven.zip'
        with zipfile.ZipFile(str(archive), 'w') as zf:
            for root, _, files in os.walk(str(stage)):
                for f in files:
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, str(stage)))
        cache, tf_dir = _run_main(tmp_path, 'kuleuven',
                                  'file://' + str(archive), 32)
        obj = regression_data.RegressionDataKULeuven()
        assert obj.is_data_local(cache)
        assert obj.is_data_ingested(tf_dir, num_subjects=16,
                                    num_trials=2)
        data = records.read_tfrecords(os.path.join(
            tf_dir, 'S1', 'S1_T0.tfrecords'))
        assert set(data.keys()) == {'eeg', 'intensity', 'intensity2',
                                    'attended_speaker'}
        # 256 @128 Hz and 2 s of 8 kHz audio both resample to 64 frames
        # at 32 Hz (streams zip-truncate to the shortest).
        assert data['eeg'].shape == (64, 8)
        assert data['intensity'].shape == (64, 1)


class TestManualFallbacks:

    def _capture(self, monkeypatch):
        import io
        buf = io.StringIO()
        monkeypatch.setattr(regression_data, 'regression_data_print',
                            buf)
        return buf

    def test_kuleuven_unfetchable_prints_instructions(self, tmp_path,
                                                      monkeypatch):
        buf = self._capture(monkeypatch)
        obj = regression_data.RegressionDataKULeuven()
        ok = obj.download_data('https://zenodo.org/record/3997352',
                               str(tmp_path / 'cache'))
        assert not ok
        assert 'preprocess_data' in buf.getvalue()

    def test_jens_impaired_unfetchable_prints_instructions(
            self, tmp_path, monkeypatch):
        buf = self._capture(monkeypatch)
        obj = regression_data.RegressionDataJensImpaired()
        ok = obj.download_data((tmp_path / 'missing-x.tar').as_uri(),
                               str(tmp_path / 'cache'))
        assert not ok
        assert 'tar xvf' in buf.getvalue()
