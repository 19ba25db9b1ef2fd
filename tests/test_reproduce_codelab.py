"""Plumbing CI for tools/reproduce_codelab.py: the full download ->
ingest -> --protocol reference experiment -> comparison-table pipeline
on a synthetic file:// jens_memory corpus (the real 3.1 GB corpus needs
network egress; the tool is the one command that produces the parity
table against reference doc/DecodingCodelab.md:654-670 the day it
exists)."""

import os
import zipfile

import numpy as np
import pytest

spio = pytest.importorskip('scipy.io')

from tools import reproduce_codelab


@pytest.fixture(scope='module')
def mock_zip(tmp_path_factory):
    """Two-subject jens_memory-shaped DATA.zip: 70-channel (69 EEG +
    1 audio) trials at 128 Hz, long enough to survive the codelab's
    15/21 context stacking after the 64 Hz resample."""
    rng = np.random.RandomState(0)
    tmp_path = tmp_path_factory.mktemp('jens_mock')
    stage = tmp_path / 'stage'
    stage.mkdir()
    for sid in range(2):
        trials = np.empty((3,), object)
        for t in range(3):
            audio = np.abs(rng.randn(1, 1600))
            # EEG weakly driven by the audio so CCA has signal to find
            # and the LDA stage sees separable attended windows.
            eeg = (rng.randn(69, 1600)
                   + 0.5 * rng.randn(69, 1) * audio)
            trials[t] = np.concatenate([eeg, audio], axis=0)
        spio.savemat(str(stage / ('subject_%02d.mat' % sid)),
                     {'data': {'fsample': 128.0, 'trial': trials}})
    archive = tmp_path / 'DATA.zip'
    with zipfile.ZipFile(str(archive), 'w') as zf:
        for f in sorted(os.listdir(str(stage))):
            zf.write(str(stage / f), f)
    return str(archive)


class TestReproduceCodelab:

    def test_end_to_end_plumbing(self, mock_zip, tmp_path, capsys):
        data_dir = str(tmp_path / 'repro')
        rc = reproduce_codelab.main([
            '--data_dir', data_dir,
            '--internet', 'file://' + mock_zip,
            '--subject', 'subject_01',
            '--norequire_match',
            # Shrink the codelab geometry to the synthetic corpus: the
            # real run keeps batch 512 / 100 correlation frames.
            '--override', 'batch_size=64',
            '--override', 'correlation_frames=50',
        ])
        assert rc == 0
        out = capsys.readouterr().out
        # The table carries all three published rows with values.
        for metric in reproduce_codelab.CODELAB_REFERENCE:
            assert metric in out, out
        assert 'codelab' in out and 'rebuild' in out
        assert 'DecodingCodelab.md:654-670' in out
        # The experiment really ran under the reference protocol.
        results = os.path.join(data_dir, 'summary', 'subject_01_cca',
                               'results.txt')
        assert os.path.exists(results)
        text = open(results).read()
        assert 'Protocol: reference' in text
        assert 'Final_Testing/dprime' in text

    def test_second_run_skips_download_and_ingest(self, mock_zip,
                                                  tmp_path, capsys,
                                                  monkeypatch):
        # The completeness checks are pinned to the real corpus (22
        # subjects); scale is_data_local to the 2-subject mock so the
        # second run exercises the cache-skip path.
        from telluride_decoding_tpu.cli import regression_data
        orig = regression_data.RegressionDataJensMemory.is_data_local
        monkeypatch.setattr(
            regression_data.RegressionDataJensMemory, 'is_data_local',
            lambda self, cache_dir, num_subjects=2:
                orig(self, cache_dir, num_subjects))
        data_dir = str(tmp_path / 'repro2')
        common = ['--data_dir', data_dir,
                  '--internet', 'file://' + mock_zip,
                  '--subject', 'subject_02',
                  '--norequire_match',
                  '--override', 'batch_size=64',
                  '--override', 'correlation_frames=50']
        assert reproduce_codelab.main(common) == 0
        capsys.readouterr()
        assert reproduce_codelab.main(common) == 0
        out = capsys.readouterr().out
        assert 'already cached' in out
        # 2 subjects x 3 trials is below the real corpus' 22x40, so
        # the ingest-completeness check conservatively re-ingests; the
        # cache skip is the expensive (3.1 GB) stage and must hold.

    def test_require_match_fails_on_synthetic_corpus(self, mock_zip,
                                                     tmp_path, capsys):
        # Random data cannot hit corr 0.1702 +- 0.02: the default
        # require_match mode must exit nonzero and say which rows.
        data_dir = str(tmp_path / 'repro3')
        rc = reproduce_codelab.main([
            '--data_dir', data_dir,
            '--internet', 'file://' + mock_zip,
            '--subject', 'subject_01',
            '--override', 'batch_size=64',
            '--override', 'correlation_frames=50',
        ])
        assert rc == 1
        assert 'OUT OF TOLERANCE' in capsys.readouterr().out

    def test_missing_subject_lists_available(self, mock_zip, tmp_path):
        data_dir = str(tmp_path / 'repro4')
        with pytest.raises(SystemExit, match='subject_01'):
            reproduce_codelab.main([
                '--data_dir', data_dir,
                '--internet', 'file://' + mock_zip,
                '--subject', 'subject_99',
                '--norequire_match'])

    def test_codelab_flags_match_reference_dump(self):
        """The flag set must stay pinned to the codelab's Parameters:
        dump (reference doc/DecodingCodelab.md:420) — drift here makes
        the future real-corpus comparison meaningless."""
        flags = reproduce_codelab.codelab_flags('/tf/subject_07',
                                                '/sum/')
        assert flags['dnn_regressor'] == 'cca'
        assert flags['cca_dimensions'] == 5
        assert flags['batch_size'] == 512
        assert flags['correlation_frames'] == 100
        assert flags['pre_context'] == 15
        assert flags['post_context'] == 21
        assert flags['input2_pre_context'] == 15
        assert flags['input2_post_context'] == 15
        assert flags['regularization_lambda'] == 1000.0
        assert flags['train_file_pattern'] == 'allbut'
        assert flags['test_file_pattern'] == 'trial_01.tfrecords'
        assert flags['protocol'] == 'reference'
