"""Dataset downloaders + ingestion for the standard AAD corpora.

Capability parity with the reference regression_data.py: the
DataLocation registry (:922-956), MATLAB struct loader (:72-108), a
gdrive/https downloader (:111-239), per-dataset RegressionData classes
(Telluride4 :261-357, JensMemory :360-474, JensImpaired with BDF
events/target/masker alignment :477-691, KULeuven :694-884), and the
README.txt summary writer (:887-920). Ingestion math (resampling,
intensity) runs through the signal layer's vectorized kernels instead
of per-frame Python loops.
"""

from __future__ import annotations

import collections
import os
import sys
import urllib.parse
import urllib.request
from typing import List, Optional

from absl import app
from absl import flags
from absl import logging

import numpy as np
import scipy.io as spio

from telluride_decoding_tpu.data import records as records_io
from telluride_decoding_tpu.io import edf as edf_io
from telluride_decoding_tpu.io import ingest
from telluride_decoding_tpu.signal import preprocess

from telluride_decoding_tpu.utils.stdio import LateBoundStdout

regression_data_print = LateBoundStdout()

FLAGS = flags.FLAGS
_tmp_dir = os.environ.get('TMPDIR') or '/tmp'


def define_flags():
    if 'tf_output_dir' in FLAGS:
        return
    flags.DEFINE_string('internet', None, 'URL override for the download.')
    flags.DEFINE_string('cache_dir', None, 'Local cache override.')
    flags.DEFINE_string('tf_output_dir', None, 'TFRecord output override.')
    flags.DEFINE_float('desired_frame_rate', 0,
                       'Frame rate override for ingestion.')
    flags.DEFINE_bool('force', False,
                      'Ignore existing files and force new download & '
                      'ingestion.')
    flags.DEFINE_enum('type', 'telluride4', list(locations.keys()),
                      'Which type of data to ingest.')


def make_if_not_exists(directory: str):
    os.makedirs(directory, exist_ok=True)


def loadmat(filename: str):
    """Loads a MATLAB file with structs as nested dictionaries."""

    def _todict(matobj):
        out = {}
        for field in matobj._fieldnames:
            elem = matobj.__dict__[field]
            if isinstance(elem, spio.matlab.mat_struct):
                out[field] = _todict(elem)
            else:
                out[field] = elem
        return out

    data = spio.loadmat(filename, struct_as_record=False, squeeze_me=True)
    for key in data:
        if isinstance(data[key], spio.matlab.mat_struct):
            data[key] = _todict(data[key])
    return data


def _fetch_to_file(opener, url: str, path: str):
    with opener.open(url, timeout=60) as response, open(path, 'wb') as f:
        while True:
            chunk = response.read(512 * 1024)
            if not chunk:
                break
            f.write(chunk)


def _looks_like_html(path: str) -> bool:
    with open(path, 'rb') as f:
        head = f.read(2048).lstrip()
    return head[:1] == b'<' or b'<html' in head.lower()


def download_from_gdrive(url: str, output: str,
                         debug: bool = False) -> Optional[str]:
    """HTTP download with Google-Drive interstitial handling.

    Large gdrive files return an HTTP-200 HTML confirmation page
    ("can't scan for viruses") instead of the payload; writing that
    page to the cache would poison it permanently (is_data_local()
    would skip re-downloading forever). The download goes to a .part
    file first; if the body looks like HTML the confirm-token retry is
    attempted once (cookies preserved), and on failure NOTHING is
    written to the cache path and None is returned with manual
    instructions."""
    del debug
    import http.cookiejar
    import re as _re
    part = output + '.part'
    try:
        os.makedirs(os.path.dirname(os.path.abspath(output)), exist_ok=True)
        opener = urllib.request.build_opener(
            urllib.request.HTTPCookieProcessor(http.cookiejar.CookieJar()))
        _fetch_to_file(opener, url, part)
        wants_html = output.lower().endswith(('.htm', '.html'))
        if not wants_html and _looks_like_html(part):
            with open(part, 'rb') as f:
                page = f.read(65536).decode('utf-8', 'replace')
            params = dict(_re.findall(
                r'name="(id|export|confirm|uuid)" value="([^"]*)"', page))
            action = _re.search(r'action="([^"]+)"', page)
            if action and 'confirm' in params:
                # HTML-unescape the action and extend its EXISTING
                # query string when present ('/uc?export=download' is
                # the historical shape; a second '?' would malform the
                # retry URL). Relative actions resolve against the
                # original request URL.
                import html as _html
                base = urllib.parse.urljoin(url,
                                            _html.unescape(action.group(1)))
                sep = '&' if '?' in base else '?'
                retry_url = base + sep + urllib.parse.urlencode(params)
                _fetch_to_file(opener, retry_url, part)
            else:
                token = _re.search(r'confirm=([0-9A-Za-z_-]+)', page)
                if token:
                    sep = '&' if '?' in url else '?'
                    _fetch_to_file(opener,
                                   url + sep + 'confirm=' + token.group(1),
                                   part)
        if not wants_html and _looks_like_html(part):
            os.remove(part)
            print('Download of %s returned an HTML page, not the file '
                  '(Google Drive confirmation could not be completed). '
                  'Fetch it manually to %s.' % (url, output),
                  file=regression_data_print)
            return None
        if os.path.getsize(part) == 0:
            # An empty 200 body must not poison the cache either
            # (is_data_local() only checks existence, so a cached
            # zero-byte artifact would skip the download forever and
            # crash in the loader on every later run).
            os.remove(part)
            print('Download of %s produced an empty file. Fetch it '
                  'manually to %s.' % (url, output),
                  file=regression_data_print)
            return None
        os.replace(part, output)
        return output
    except Exception as error:
        try:
            if os.path.exists(part):
                os.remove(part)
        except Exception:
            pass
        print('Download of %s failed (%s). Fetch it manually to %s.' %
              (url, error, output), file=regression_data_print)
        return None


def write_summary(cache_dir: str, tf_dir: str, frame_rate: float,
                  all_ingested_files: Optional[List[str]] = None):
    """README.txt: provenance + feature shapes + per-file record counts."""
    readme_file = os.path.join(tf_dir, 'README.txt')
    with open(readme_file, 'w') as fp:
        print('These files were ingested from:', cache_dir, file=fp)
        print('Using:', sys.argv, file=fp)
        print('With a output frame rate of %gHz' % frame_rate, file=fp)
        if all_ingested_files:
            features = records_io.discover_feature_shapes(
                all_ingested_files[0])
            print('\nFeature shapes are:', file=fp)
            for k, v in features.items():
                print('\t%s: %s' % (k, v), file=fp)
            print('\nAll ingested files:', file=fp)
            for filename in all_ingested_files:
                count, error = records_io.count_tfrecords(filename)
                error_string = 'READ ERROR' if error else ''
                print('\t%s: %d records (%s seconds) %s' %
                      (filename, count, count / float(frame_rate),
                       error_string), file=fp)


class RegressionData:
    """Base: download + ingest with idempotence checks."""

    def download_data(self, url: str, cache_dir: str,
                      debug: bool = False) -> bool:
        del debug
        make_if_not_exists(cache_dir)
        readme_file = os.path.join(cache_dir, 'README.txt')
        with open(readme_file, 'w') as fp:
            fp.write('These files were downloaded\nFrom %s\nTo %s\n'
                     'Using: %s\n' % (url, cache_dir, sys.argv))
        return True

    def is_data_local(self, cache_dir: str) -> bool:
        raise NotImplementedError

    def is_data_ingested(self, tf_dir: str) -> bool:
        raise NotImplementedError

    def ingest_data(self, cache_dir: str, tf_dir: str,
                    desired_frame_rate: float):
        raise NotImplementedError


class RegressionDataTelluride4(RegressionData):
    """Telluride 2015 four-subject dataset (one .mat archive)."""

    def is_data_local(self, cache_dir):
        return os.path.exists(os.path.join(cache_dir, 'Telluride2015.mat'))

    def download_data(self, url, cache_dir, debug=False):
        make_if_not_exists(cache_dir)
        cache_file = os.path.join(cache_dir, 'Telluride2015.mat')
        if not download_from_gdrive(url, cache_file, debug=debug):
            return False
        return super().download_data(url, cache_dir)

    def is_data_ingested(self, tf_dir, num_files=32):
        import glob
        return len(glob.glob(os.path.join(tf_dir,
                                          '*.tfrecords'))) == num_files

    def ingest_data(self, cache_dir, tf_dir, desired_frame_rate):
        """32 trials x (eeg + intensity/ones/attended) -> TFRecords."""
        mat_data = loadmat(os.path.join(cache_dir, 'Telluride2015.mat'))
        mat_objects = mat_data['data']
        eeg_signals = mat_objects['eeg']
        audio_signals = mat_objects['wav']
        if audio_signals.shape[0] != 4:
            raise ValueError('Incorrect shapes for audio_signals (%s)' %
                             str(audio_signals.shape))
        if eeg_signals.shape[0] != 32:
            raise ValueError('Incorrect shapes for eeg_signals (%s)' %
                             str(eeg_signals.shape))
        make_if_not_exists(tf_dir)
        trial_dict = {}
        for i in range(eeg_signals.shape[0]):
            audio = audio_signals[i % 4]
            sound_dict = {
                'intensity': audio,
                'ones': np.ones(audio.shape, dtype=audio.dtype),
                'attended_speaker': np.zeros(audio.shape,
                                             dtype=audio.dtype),
            }
            trial_dict['trial_{:02d}'.format(i + 1)] = [
                sound_dict,
                ingest.MemoryBrainDataFile({'eeg_data': eeg_signals[i]})]
        exp = ingest.BrainExperiment(trial_dict, '.', '.',
                                     frame_rate=desired_frame_rate)
        exp.load_all_data()
        exp.z_score_all_data()
        for trial in exp.iterate_trials():
            trial.assemble_brain_data('eeg_data')
        all_files = exp.write_all_data(tf_dir)
        write_summary(cache_dir, tf_dir, desired_frame_rate, all_files)


class RegressionDataJensMemory(RegressionData):
    """COCOHA/Jens 22-subject memory dataset (one .mat per subject)."""

    @property
    def name(self):
        return 'Jens'

    def is_data_local(self, cache_dir, num_subjects=22):
        if os.path.exists(cache_dir):
            all_files = [f for f in os.listdir(cache_dir)
                         if f.endswith('mat')]
            return len(all_files) == num_subjects
        return False

    def download_data(self, url, cache_dir, debug=False):
        tmp_jens_dir = os.path.join(_tmp_dir, 'jens_raw_data')
        make_if_not_exists(tmp_jens_dir)
        archive = os.path.join(tmp_jens_dir, 'DATA.zip')
        if not download_from_gdrive(url, archive, debug=debug):
            return False
        import zipfile
        with zipfile.ZipFile(archive) as zf:
            zf.extractall(tmp_jens_dir)
        make_if_not_exists(cache_dir)
        for f in sorted(os.listdir(tmp_jens_dir)):
            if f.endswith('.mat'):
                os.replace(os.path.join(tmp_jens_dir, f),
                           os.path.join(cache_dir, f))
        return super().download_data(url, cache_dir)

    def is_data_ingested(self, tf_dir, num_subjects=22, num_trials=40):
        import glob
        if os.path.exists(tf_dir):
            return sum(
                len(glob.glob(os.path.join(sdir, '*.tfrecords')))
                for sdir in glob.glob(os.path.join(tf_dir, 'subject_*'))
            ) >= num_trials * num_subjects
        return False

    def ingest_data(self, cache_dir, tf_dir, desired_frame_rate):
        """Per subject: 40 trials of eeg[69] + intensity[1] at 64 Hz."""
        import glob
        mat_files_list = sorted(glob.glob(os.path.join(cache_dir, '*.mat')))
        make_if_not_exists(tf_dir)
        print('Ingesting %d files of Jens data.' % len(mat_files_list),
              file=regression_data_print)
        all_ingested_files = []
        for sid, mat_file in enumerate(mat_files_list):
            tf_dir_subject = os.path.join(tf_dir,
                                          'subject_{:02d}'.format(sid + 1))
            mat_object = loadmat(mat_file)['data']
            fs = mat_object['fsample']
            trial_dict = {}
            for trial_idx, trial in enumerate(mat_object['trial']):
                eeg_signal = trial[:69, :].T
                audio_signal = trial[69:70, :].T
                p_eeg = preprocess.Preprocessor('eeg', fs,
                                                desired_frame_rate)
                p_audio = preprocess.Preprocessor('audio', fs,
                                                  desired_frame_rate)
                trial_dict['trial_{:02d}'.format(trial_idx + 1)] = [
                    {'intensity': p_audio.resample(audio_signal)},
                    ingest.MemoryBrainDataFile(
                        {'eeg_data': p_eeg.resample(eeg_signal)},
                        sr=desired_frame_rate)]
            exp = ingest.BrainExperiment(trial_dict, '.', '.',
                                         frame_rate=desired_frame_rate)
            exp.load_all_data()
            exp.z_score_all_data()
            for trial in exp.iterate_trials():
                trial.assemble_brain_data('eeg_data')
            make_if_not_exists(tf_dir_subject)
            all_ingested_files.extend(exp.write_all_data(tf_dir_subject))
        write_summary(cache_dir, tf_dir, desired_frame_rate,
                      all_ingested_files)


class RegressionDataJensImpaired(RegressionData):
    """Hearing-impaired dataset: BDF EEG + target/masker audio events."""

    @property
    def name(self):
        return 'JensImpaired'

    def is_data_local(self, cache_dir, num_subjects=44):
        if os.path.exists(cache_dir):
            subs = [f for f in os.listdir(cache_dir)
                    if f.startswith('sub-')]
            return len(subs) == num_subjects
        return False

    def download_data(self, url, cache_dir, debug=False):
        archive = os.path.join(_tmp_dir, 'ds-eeg-snhl.tar')
        if download_from_gdrive(url, archive, debug=debug):
            import shutil
            import tarfile
            make_if_not_exists(cache_dir)
            with tarfile.open(archive) as tf:
                try:
                    tf.extractall(cache_dir, filter='data')
                except TypeError:  # filter= needs >=3.10.12/3.11.4.
                    tf.extractall(cache_dir)
            # The archive wraps everything in ds-eeg-snhl/ — hoist it
            # (the manual instructions' `mv ds-eeg-snhl/* .`). The
            # fresh extraction is authoritative: leftovers from an
            # interrupted or --force'd earlier attempt are replaced.
            wrapper = os.path.join(cache_dir, 'ds-eeg-snhl')
            if os.path.isdir(wrapper):
                for name in os.listdir(wrapper):
                    dst = os.path.join(cache_dir, name)
                    if os.path.isdir(dst):
                        shutil.rmtree(dst)
                    os.replace(os.path.join(wrapper, name), dst)
                os.rmdir(wrapper)
            return super().download_data(url, cache_dir)
        print('To download manually, use: wget -c {} -O {}/{}'.format(
            url, cache_dir, 'ds-eeg-snhl.tar'), file=regression_data_print)
        print(' cd %s; tar xvf ds-eeg-snhl.tar; mv ds-eeg-snhl/* .' %
              cache_dir, file=regression_data_print)
        return False

    def is_data_ingested(self, tf_dir, num_subjects=44, num_trials=48):
        import glob
        if os.path.exists(tf_dir):
            return sum(
                len(glob.glob(os.path.join(tf_dir, sdir, '*.tfrecords')))
                for sdir in os.listdir(tf_dir)) >= num_trials * num_subjects
        return False

    def ingest_data(self, cache_dir, tf_dir, desired_frame_rate):
        """Aligns 48 trials/subject of BDF EEG to target/masker audio
        via the events TSV (reference regression_data.py:524-691)."""
        import pandas as pd
        frame_rate = 512
        make_if_not_exists(tf_dir)
        all_dirs_sub = sorted(f for f in os.listdir(cache_dir)
                              if f.startswith('sub-'))
        for sid, subject_dir in enumerate(all_dirs_sub):
            tf_dir_subject = os.path.join(tf_dir,
                                          'subject_{:02d}'.format(sid + 1))
            summary_file = os.path.join(tf_dir_subject, 'README.txt')
            if os.path.exists(summary_file):
                continue
            eeg_file = os.path.join(
                cache_dir, subject_dir,
                'eeg/{}_task-selectiveattention_eeg.bdf'.format(
                    subject_dir))
            events_file = os.path.join(
                cache_dir, subject_dir,
                'eeg/{}_task-selectiveattention_events.tsv'.format(
                    subject_dir))
            events_df = pd.read_csv(events_file, sep='\t')
            if sid == 23:  # Subject 24's events come in two parts.
                part2 = events_file.replace('_events.tsv',
                                            '_run-2_events.tsv')
                if os.path.exists(part2):
                    events_df = pd.concat([events_df,
                                           pd.read_csv(part2, sep='\t')])
            start_samples = events_df[
                events_df['trigger_type'] == 'targetonset']['sample'].values
            masker_df = events_df[
                events_df['trigger_type'] == 'maskeronset'][
                    ['sample', 'stim_file']].copy()
            masker_df['stim_file'] = masker_df['stim_file'].apply(
                lambda x: int(x.split('/')[-1][1:-4]))
            if len(start_samples) != 48 or len(masker_df) != 32:
                raise ValueError(
                    'Incorrect event counts for subject %s: %d/48 and '
                    '%d/32' % (subject_dir, len(start_samples),
                               len(masker_df)))
            parsed = edf_io.read_edf(eeg_file)
            sigbufs = np.stack(parsed['signal_list'], axis=1)
            trial_dict = {}
            for trial_idx in range(1, 49):
                target = loadmat(os.path.join(
                    cache_dir,
                    'derivatives/stimuli/sub{:03d}/target/t{:03d}.mat'
                    .format(sid + 1, trial_idx)))['dat']['feat']
                start = int(start_samples[trial_idx - 1])
                chopped = sigbufs[start:start + target.shape[0], :]
                masker_start = masker_df[
                    masker_df['stim_file'] == trial_idx]['sample'].values
                if len(masker_start):
                    masker = loadmat(os.path.join(
                        cache_dir,
                        'derivatives/stimuli/sub{:03d}/masker/m{:03d}.mat'
                        .format(sid + 1, trial_idx)))['dat']['feat']
                    diff = int(masker_start[0] - start)
                    if diff < 0:
                        raise ValueError(
                            'Subject %s trial %d: masker starts %d '
                            'samples BEFORE the target; data looks '
                            'corrupt.' % (subject_dir, trial_idx, -diff))
                    if diff > 0:
                        masker = np.concatenate((np.zeros(diff),
                                                 masker[:-diff]))
                    if len(masker) != len(target):
                        raise ValueError(
                            'Subject %s trial %d: masker/target length '
                            'mismatch (%d vs %d).' %
                            (subject_dir, trial_idx, len(masker),
                             len(target)))
                    trial_key = 'trial_{:02d}_dual_speaker'.format(
                        trial_idx)
                else:
                    masker = np.zeros_like(target)
                    trial_key = 'trial_{:02d}_single_speaker'.format(
                        trial_idx)
                trial_dict[trial_key] = [
                    {'attended_intensity': target,
                     'unattended_intensity': masker},
                    ingest.MemoryBrainDataFile({'eeg_data': chopped},
                                               sr=desired_frame_rate)]
            exp = ingest.BrainExperiment(trial_dict, '.', '.',
                                         frame_rate=frame_rate)
            exp.load_all_data()
            exp.z_score_all_data()
            for trial in exp.iterate_trials():
                trial.assemble_brain_data('eeg_data')
            make_if_not_exists(tf_dir_subject)
            files = exp.write_all_data(tf_dir_subject)
            write_summary(cache_dir, tf_dir_subject, desired_frame_rate,
                          files)


class RegressionDataKULeuven(RegressionData):
    """KULeuven 16-subject dataset (Das et al. 2016)."""

    @property
    def name(self):
        return 'KULeuven'

    def is_data_local(self, cache_dir, num_subjects=16):
        if os.path.exists(cache_dir):
            subs = [f for f in os.listdir(cache_dir)
                    if f.startswith('S') and f.endswith('.mat')]
            if len(subs) == num_subjects:
                return True
            print('Only found these %d/%d subjects in %s: %s' %
                  (len(subs), num_subjects, cache_dir, subs),
                  file=regression_data_print)
        return False

    def download_data(self, url, cache_dir, debug=False):
        # A directly fetchable archive of preprocessed S*.mat files (+
        # stimuli/) installs automatically; the published dataset needs
        # the authors' Matlab preprocess_data first, hence the manual
        # fallback instructions.
        archive = os.path.join(_tmp_dir, 'kuleuven.zip')
        if url.endswith('.zip') and download_from_gdrive(url, archive,
                                                         debug=debug):
            import zipfile
            make_if_not_exists(cache_dir)
            with zipfile.ZipFile(archive) as zf:
                zf.extractall(cache_dir)
            return super().download_data(url, cache_dir)
        print('To download manually, grab data from %s and run the '
              'dataset\'s Matlab preprocess_data, then copy the S*.mat '
              'files to %s' % (url, cache_dir),
              file=regression_data_print)
        return False

    def is_data_ingested(self, tf_dir, num_subjects=16, num_trials=20):
        import glob
        if os.path.exists(tf_dir):
            num_files = len(glob.glob(os.path.join(tf_dir, 'S*',
                                                   '*.tfrecords')))
            return num_files >= num_trials * num_subjects
        return False

    def ingest_data(self, cache_dir, tf_dir, desired_frame_rate):
        """Per trial: resampled EEG + attended/unattended intensities."""
        make_if_not_exists(tf_dir)
        all_ingested_files = []
        for subject_number in range(16):
            mat_file = os.path.join(cache_dir,
                                    'S%d.mat' % (subject_number + 1))
            tf_sub_dir = os.path.join(tf_dir, 'S%d' % (subject_number + 1))
            make_if_not_exists(tf_sub_dir)
            mat_data = loadmat(mat_file)
            trials = mat_data['preproc_trials']
            trial_dict = {}
            for trial_number in range(trials.shape[0]):
                name = 'S%d_T%d' % (subject_number + 1, trial_number)
                if os.path.exists(os.path.join(tf_sub_dir,
                                               name + '.tfrecords')):
                    continue
                mat_trial = trials[trial_number]
                ear = mat_trial.attended_ear
                if ear == 'L':
                    attended_track, unattended_track = 0, 1
                elif ear == 'R':
                    attended_track, unattended_track = 1, 0
                else:
                    raise ValueError('Unknown attended ear (%s)' % ear)
                eeg_signal = mat_trial.RawData.EegData
                eeg_fs = mat_trial.FileHeader.SampleRate
                trial_data = ingest.BrainTrial(name)

                def intensity_of(track_name):
                    trial_data.load_sound(
                        track_name,
                        sound_dir=os.path.join(cache_dir, 'stimuli'))
                    features = preprocess.AudioFeatures(
                        track_name, trial_data.sound_fs,
                        desired_frame_rate)
                    return features.compute_intensity(
                        trial_data.sound_data)

                p_eeg = preprocess.Preprocessor('eeg', eeg_fs,
                                                desired_frame_rate)
                ds_eeg = p_eeg.resample(eeg_signal)
                intensity = intensity_of(
                    mat_trial.stimuli[attended_track])
                intensity2 = intensity_of(
                    mat_trial.stimuli[unattended_track])
                trial_dict[name] = [
                    {'intensity': intensity, 'intensity2': intensity2,
                     'attended_speaker': 0 * intensity},
                    ingest.MemoryBrainDataFile({'eeg_data': ds_eeg},
                                               desired_frame_rate)]
            exp = ingest.BrainExperiment(trial_dict, '.', '.',
                                         frame_rate=desired_frame_rate)
            exp.load_all_data()
            exp.z_score_all_data()
            for trial in exp.iterate_trials():
                trial.assemble_brain_data('eeg_data')
            all_ingested_files.extend(exp.write_all_data(tf_sub_dir))
        write_summary(cache_dir, tf_dir, desired_frame_rate,
                      all_ingested_files)


DataLocation = collections.namedtuple(
    'DataLocation', ['internet', 'cache_dir', 'tf_dir',
                     'desired_frame_rate', 'data_type'])

base_data_dir = '/tmp'

locations = {
    'telluride4': DataLocation(
        'https://drive.google.com/uc?id=0ByZjGXodIlspWmpBcUhvenVQa1k',
        os.path.join(base_data_dir, 'local_cache/telluride4'),
        os.path.join(base_data_dir, 'tf_dir/telluride4_64Hz'),
        64, RegressionDataTelluride4),
    'jens_memory': DataLocation(
        'https://zenodo.org/record/1158410/files/DATA.zip',
        os.path.join(base_data_dir, 'local_cache/jens_memory'),
        os.path.join(base_data_dir, 'tf_dir/jens_memory_64Hz'),
        64, RegressionDataJensMemory),
    'jens_impaired': DataLocation(
        'https://zenodo.org/record/3618205/files/ds-eeg-snhl.tar'
        '?download=1',
        os.path.join(base_data_dir, 'local_cache/jens_impaired'),
        os.path.join(base_data_dir, 'tf_dir/jens_impaired_64Hz'),
        64, RegressionDataJensImpaired),
    'kuleuven': DataLocation(
        'https://zenodo.org/record/3997352#.YTkc755KhLQ',
        os.path.join(base_data_dir, 'local_cache/kuleuven'),
        os.path.join(base_data_dir, 'tf_dir/kuleuven'),
        32, RegressionDataKULeuven),
}


def main(argv):
    if len(argv) > 1:
        raise app.UsageError('Too many command-line arguments: %s.' % argv)
    logging.set_verbosity(logging.INFO)
    database = locations[FLAGS.type]
    data_object = database.data_type()
    url = FLAGS.internet or database.internet
    cache_dir = FLAGS.cache_dir or database.cache_dir
    tf_dir = FLAGS.tf_output_dir or database.tf_dir
    desired_frame_rate = (FLAGS.desired_frame_rate or
                          database.desired_frame_rate)
    if FLAGS.force or not data_object.is_data_local(cache_dir):
        print('Downloading data from Internet (%s) to cache_dir: %s' %
              (url, cache_dir), file=regression_data_print)
        if not data_object.download_data(url, cache_dir):
            print('No data available locally, aborting.',
                  file=regression_data_print)
            return
    else:
        print('No need to download data since it is all here:', cache_dir,
              file=regression_data_print)
    if FLAGS.force or not data_object.is_data_ingested(tf_dir):
        print('Ingesting data into tf_dir:', tf_dir,
              file=regression_data_print)
        data_object.ingest_data(cache_dir, tf_dir, desired_frame_rate)
    else:
        print('No need to ingest data since it is all here:', tf_dir,
              file=regression_data_print)


define_flags()


def app_main():
    app.run(main)


if __name__ == '__main__':
    app_main()
