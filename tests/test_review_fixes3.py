"""Regression tests for the model-training review pass."""

import numpy as np
import pytest

from telluride_decoding_tpu.data import brain_data
from telluride_decoding_tpu.models import (BrainModelCCA, BrainModelDNN,
                                           load_model)
from telluride_decoding_tpu.models.brain_model import _dataset_arrays


def _dnn_data(rng, n=600):
    bd = brain_data.TestBrainData('input_1', 'output', 100.0,
                                  final_batch_size=200,
                                  shuffle_buffer_size=0)
    x = rng.randn(n, 4).astype(np.float32)
    y = (x[:, :1] * 0.5).astype(np.float32)
    bd.preserve_test_data(x, y)
    return bd


def test_pre_batchnorm_checkpoint_loads(rng, tmp_path):
    """DNN checkpoints saved before params grew the 'layers' dict used
    bare list keys ('0/w'); they must still load. (Regression:
    KeyError 'layers/0/w'.)"""
    bd = _dnn_data(rng)
    model = BrainModelDNN(bd.create_dataset('train'),
                          num_hidden_list=[8])
    model.fit(bd.create_dataset('train'), epochs=2)
    d = str(tmp_path / 'model')
    model.save(d)
    # Rewrite weights.npz into the legacy flat-list key scheme.
    import os
    npz_path = os.path.join(d, 'weights.npz')
    with np.load(npz_path) as npz:
        flat = {k: npz[k] for k in npz.files}
    legacy = {k[len('layers/'):] if k.startswith('layers/') else k: v
              for k, v in flat.items()}
    np.savez(npz_path, **legacy)
    loaded = load_model(d)
    x = rng.randn(10, 4).astype(np.float32)
    np.testing.assert_allclose(loaded({'input_1': x}),
                               model({'input_1': x}), atol=1e-6)


def test_missing_weight_key_clear_error(rng, tmp_path):
    bd = _dnn_data(rng)
    model = BrainModelDNN(bd.create_dataset('train'),
                          num_hidden_list=[8])
    model.fit(bd.create_dataset('train'), epochs=1)
    d = str(tmp_path / 'model')
    model.save(d)
    import os
    npz_path = os.path.join(d, 'weights.npz')
    with np.load(npz_path) as npz:
        flat = {k: npz[k] for k in npz.files}
    flat.pop(sorted(flat)[0])
    np.savez(npz_path, **flat)
    with pytest.raises(ValueError, match='missing weight'):
        load_model(d)


def test_refit_reuses_compiled_trainer(rng):
    """Repeated fit() on one instance must not recompile the epoch
    program (remote compiles cost seconds)."""
    bd = _dnn_data(rng)
    model = BrainModelDNN(bd.create_dataset('train'),
                          num_hidden_list=[8])
    model.fit(bd.create_dataset('train'), epochs=2)
    trainers = [k for k in model._compiled
                if isinstance(k, tuple) and k[0] == 'trainer']
    assert len(trainers) == 1
    model.fit(bd.create_dataset('train'), epochs=2)
    trainers = [k for k in model._compiled
                if isinstance(k, tuple) and k[0] == 'trainer']
    assert len(trainers) == 1


def test_dataset_arrays_one_epoch_under_transforms(rng):
    """A transform dataset with repeat_count > 1 materializes ONE
    epoch, not repeat_count shuffled copies."""
    bd = brain_data.TestBrainData('input_1', 'output', 100.0,
                                  final_batch_size=100,
                                  repeat_count=4,
                                  shuffle_buffer_size=0)
    x = rng.randn(400, 3).astype(np.float32)
    bd.preserve_test_data(x, x[:, :1])
    ds = bd.create_dataset('train', mixup_batch=True)
    in1, _, _, _ = _dataset_arrays(ds)
    assert in1.shape[0] == 400
    # And plain iteration still honors repeat_count.
    total = sum(y.shape[0] for _, y in ds)
    assert total == 4 * 400


def test_empty_dataset_clear_error(rng):
    bd = _dnn_data(rng, n=600)
    model = BrainModelDNN(bd.create_dataset('train'),
                          num_hidden_list=[4])
    with pytest.raises(ValueError, match='no batches'):
        model.fit(iter(()))


def test_cca_apply_integer_inputs(rng):
    """Integer inputs (raw int16 samples) must promote to float, not
    truncate the rotation to an integer dtype."""
    n = 2000
    latent = rng.randn(n, 2).astype(np.float32)
    x1 = (latent + 0.1 * rng.randn(n, 2)).astype(np.float32)
    x2 = (latent + 0.1 * rng.randn(n, 2)).astype(np.float32)
    bd = brain_data.TestBrainData('input_1', 'ones', 100.0,
                                  final_batch_size=500,
                                  shuffle_buffer_size=0)
    bd.preserve_test_data(x1, np.ones((n, 1), np.float32),
                          input2_data=x2)
    model = BrainModelCCA(bd.create_dataset('train'), cca_dims=2,
                          regularization_lambda=1e-3)
    model.fit(bd.create_dataset('train'))
    ints = (x1[:50] * 100).astype(np.int16)
    want = np.asarray(model({'input_1': (ints.astype(np.float32)),
                             'input_2': x2[:50]}))
    got = np.asarray(model({'input_1': ints, 'input_2': x2[:50]}))
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert np.abs(got[:, 0]).max() > 0  # Not truncated to zeros.


def test_migrate_rejects_dnn_saved_model(monkeypatch):
    from telluride_decoding_tpu.models import migrate

    fake = {
        'model/dense/kernel/.ATTRIBUTES/VARIABLE_VALUE':
            np.zeros((4, 8), np.float32),
        'model/dense_1/kernel/.ATTRIBUTES/VARIABLE_VALUE':
            np.zeros((8, 1), np.float32),
        'model/dense/bias/.ATTRIBUTES/VARIABLE_VALUE':
            np.zeros((8,), np.float32),
    }
    monkeypatch.setattr(migrate, 'read_tensor_bundle', lambda p: fake)
    monkeypatch.setattr(migrate.os.path, 'exists', lambda p: True)
    with pytest.raises(ValueError, match='DNN/classifier'):
        migrate.load_reference_saved_model('/fake/dir')
