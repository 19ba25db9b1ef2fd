"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI, so all sharding/mesh tests
run against XLA's host-platform device emulation.

Note: this environment's sitecustomize imports jax and registers a
remote TPU platform at interpreter start, so setting JAX_PLATFORMS via
os.environ here is too late — the value was captured at first jax
import. jax.config.update works as long as no backend has initialized
yet, and avoids the ~50 s/compile remote-TPU round trips during tests.
"""

import os
import re

# Force the 8-device count even when the environment already carries a
# different value (e.g. a developer's =1 debugging setting): the mesh
# tests hard-require 8 and would otherwise fail confusingly.
_flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    "conftest expected 8 virtual CPU devices, got %d (platform %s) — "
    "was JAX initialized before conftest ran?" %
    (jax.device_count(), jax.devices()[0].platform))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_TEST_DATA = "/root/reference/test_data"


@pytest.fixture
def rng():
    return np.random.RandomState(42)


@pytest.fixture
def reference_test_data():
    if not os.path.isdir(REFERENCE_TEST_DATA):
        pytest.skip("reference test data not available")
    return REFERENCE_TEST_DATA


@pytest.fixture
def cpu_subprocess_env():
    """Env for child processes that must run single-device CPU JAX:
    repo on PYTHONPATH, axon registration disabled, and the 8-device
    XLA flag removed (children validate what real single-device users
    run). One definition so the recipe cannot drift per test file."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu',
               PYTHONPATH=repo + os.pathsep + os.environ.get(
                   'PYTHONPATH', ''))
    env.pop('XLA_FLAGS', None)
    return env


def write_cohort_tree(tmp_path, rng, num_subjects=3, trials=3, n=400,
                      channels=4):
    """A tiny multi-subject cohort of TFRecord dirs with a planted
    lag-stacked linear model (post_context=4) — shared by the cohort
    and multihost driver tests."""
    from telluride_decoding_tpu.data import records
    from telluride_decoding_tpu.ops.lagstack import lag_stack_np
    root = tmp_path / 'cohort'
    w = rng.randn(channels * 5, 1).astype(np.float32)
    for s in range(num_subjects):
        d = root / ('subject%02d' % s)
        d.mkdir(parents=True)
        for t in range(trials):
            frames = n + 13 * t + 7 * s   # Ragged.
            eeg = rng.randn(frames, channels).astype(np.float32)
            intensity = (lag_stack_np(eeg, 0, 4) @ w +
                         0.05 * rng.randn(frames, 1).astype(np.float32))
            records.convert_data_to_tfrecords(
                {'eeg': eeg, 'intensity': intensity.astype(np.float32)},
                str(d / ('trial%02d.tfrecords' % t)))
    return str(root)


def build_impaired_tree(rng, root, frames=200, channels=4,
                        num_trials=48, num_dual=32):
    """One subject's BIDS-like tree in the jens_impaired dataset layout
    (shared by test_jens_impaired + test_mock_downloads: events.tsv
    with target/masker onsets, 24-bit BDF EEG at 512 Hz, derivatives/
    stimuli .mat features). Returns (trigger_starts, eeg)."""
    import scipy.io as spio
    from telluride_decoding_tpu.io.edf import write_edf
    subject = 'sub-001'
    eeg_dir = root / subject / 'eeg'
    eeg_dir.mkdir(parents=True)
    total = num_trials * (frames + 50) + 500
    eeg = rng.randn(total, channels) * 30
    rows = []
    starts = []
    for trial in range(1, num_trials + 1):
        start = 300 + (trial - 1) * (frames + 50)
        starts.append(start)
        rows.append(('targetonset', start, 'n/a'))
        if trial <= num_dual:     # Dual-speaker trials have a masker.
            rows.append(('maskeronset', start + 7,
                         'stim/m%03d.wav' % trial))
    with open(str(eeg_dir / ('%s_task-selectiveattention_events.tsv' %
                             subject)), 'w') as f:
        f.write('trigger_type\tsample\tstim_file\n')
        for kind, sample, stim in rows:
            f.write('%s\t%d\t%s\n' % (kind, sample, stim))
    write_edf(str(eeg_dir / ('%s_task-selectiveattention_eeg.bdf' %
                             subject)),
              [eeg[:, c] for c in range(channels)],
              ['C%d' % c for c in range(channels)],
              [512.0] * channels, bdf=True)
    stim_dir = root / 'derivatives' / 'stimuli' / 'sub001'
    (stim_dir / 'target').mkdir(parents=True)
    (stim_dir / 'masker').mkdir(parents=True)
    for trial in range(1, num_trials + 1):
        feat = np.abs(rng.randn(frames)).astype(np.float64)
        spio.savemat(str(stim_dir / 'target' / ('t%03d.mat' % trial)),
                     {'dat': {'feat': feat}})
        if trial <= num_dual:
            spio.savemat(str(stim_dir / 'masker' / ('m%03d.mat' % trial)),
                         {'dat': {'feat': np.abs(
                             rng.randn(frames)).astype(np.float64)}})
    return np.asarray(starts), eeg
