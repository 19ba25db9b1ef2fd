"""JensImpaired ingestion on a synthetic BIDS-like tree.

Exercises the full path: BDF (24-bit) EEG reading, events-TSV target/
masker alignment, trial chopping, z-scoring, TFRecord output — the
parts of cli/regression_data.py no fixture covers.
"""

import os

import numpy as np
import pytest

from telluride_decoding_tpu.cli import regression_data
from telluride_decoding_tpu.data import records


FRAMES = 200          # Per-trial audio feature frames (at 512 Hz here).
CHANNELS = 4
NUM_TRIALS = 48
NUM_DUAL = 32


@pytest.fixture
def impaired_tree(rng, tmp_path):
    """One subject's directory tree in the dataset's layout (shared
    builder: conftest.build_impaired_tree)."""
    from conftest import build_impaired_tree
    cache = tmp_path / 'cache'
    cache.mkdir()
    starts, eeg = build_impaired_tree(rng, cache, frames=FRAMES,
                                      channels=CHANNELS,
                                      num_trials=NUM_TRIALS,
                                      num_dual=NUM_DUAL)
    return str(cache), starts, eeg


def test_jens_impaired_ingest(impaired_tree, tmp_path):
    cache, starts, eeg = impaired_tree
    obj = regression_data.RegressionDataJensImpaired()
    tf_dir = str(tmp_path / 'tf')
    obj.ingest_data(cache, tf_dir, 64)

    subject_dir = os.path.join(tf_dir, 'subject_01')
    files = sorted(os.listdir(subject_dir))
    dual = [f for f in files if 'dual_speaker' in f]
    single = [f for f in files if 'single_speaker' in f]
    assert len(dual) == NUM_DUAL
    assert len(single) == NUM_TRIALS - NUM_DUAL
    assert 'README.txt' in files

    # A dual trial has masker content; a single trial's masker is zero.
    d = records.read_tfrecords(os.path.join(subject_dir, dual[0]))
    assert set(d.keys()) == {'eeg', 'attended_intensity',
                             'unattended_intensity'}
    assert d['eeg'].shape == (FRAMES, CHANNELS)
    assert np.std(d['unattended_intensity']) > 0
    # Masker is delayed by its onset jitter: the first rows are the
    # zero padding (a constant value after global z-scoring).
    head = d['unattended_intensity'][:7, 0]
    assert np.std(head) == pytest.approx(0.0, abs=1e-6)
    assert np.std(d['unattended_intensity'][7:, 0]) > 1e-3

    s = records.read_tfrecords(os.path.join(subject_dir, single[0]))
    # Single-speaker trials have an all-zero masker -> constant after
    # z-scoring.
    assert np.std(s['unattended_intensity']) == pytest.approx(
        0.0, abs=1e-6)

    # EEG content corresponds to the trial's chopped segment: verify
    # shape alignment (values are z-scored so compare correlation).
    trial_idx = int(dual[0].split('_')[1]) - 1
    raw_segment = eeg[starts[trial_idx]:starts[trial_idx] + FRAMES, 0]
    ingested = d['eeg'][:, 0]
    r = np.corrcoef(raw_segment, ingested)[0, 1]
    assert r > 0.99


def test_jens_impaired_rejects_bad_event_counts(impaired_tree, tmp_path):
    cache, _, _ = impaired_tree
    events = os.path.join(
        cache, 'sub-001', 'eeg',
        'sub-001_task-selectiveattention_events.tsv')
    lines = open(events).read().strip().split('\n')
    open(events, 'w').write('\n'.join(lines[:-5]))  # Drop events.
    obj = regression_data.RegressionDataJensImpaired()
    with pytest.raises(ValueError):
        obj.ingest_data(cache, str(tmp_path / 'tf2'), 64)
