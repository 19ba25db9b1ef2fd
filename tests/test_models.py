"""Model-layer tests: exact recovery, SGD learning, save/load.

Mirrors the reference's closed-form recovery gates
(test/brain_model_test.py:129-243: ridge recovers planted W,b; r>0.99)
and adds save/load round trips for the new persistence format.
"""

import numpy as np
import pytest

from telluride_decoding_tpu.data import brain_data
from telluride_decoding_tpu.models import (
    BrainModelCCA,
    BrainModelClassifier,
    BrainModelDCCA,
    BrainModelDNN,
    BrainModelLinearRegression,
    load_model,
)


def _linear_test_data(rng, n=2000, dx=6, dy=2, noise=0.0, batch=500):
    w = rng.randn(dx, dy).astype(np.float32)
    b = rng.randn(dy).astype(np.float32)
    x = rng.randn(n, dx).astype(np.float32)
    y = x @ w + b + noise * rng.randn(n, dy).astype(np.float32)
    bd = brain_data.TestBrainData('input', 'output', 100.0,
                                  final_batch_size=batch)
    bd.preserve_test_data(x, y)
    return bd, w, b


class TestLinearModel:

    def test_exact_recovery(self, rng):
        bd, w, b = _linear_test_data(rng)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=0.0)
        model.fit(bd.create_dataset('train'))
        np.testing.assert_allclose(model.w_estimate, w, atol=1e-4)
        np.testing.assert_allclose(model.b_estimate, b, atol=1e-4)
        results = model.evaluate(bd.create_dataset('test'))
        assert results['pearson_correlation_first'] > 0.99

    def test_noisy_still_correlated(self, rng):
        bd, _, _ = _linear_test_data(rng, noise=0.5)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=0.1)
        model.fit(bd.create_dataset('train'))
        results = model.evaluate(bd.create_dataset('test'))
        assert results['pearson_correlation_first'] > 0.9

    def test_save_load_roundtrip(self, rng, tmp_path):
        bd, _, _ = _linear_test_data(rng)
        ds = bd.create_dataset('train')
        model = BrainModelLinearRegression(ds)
        model.fit(ds)
        model.add_metadata({'regularization_lambda': 0.0}, dataset=ds)
        model.save(str(tmp_path / 'model'))
        loaded = load_model(str(tmp_path / 'model'))
        assert isinstance(loaded, BrainModelLinearRegression)
        np.testing.assert_allclose(np.asarray(loaded.params['w']),
                                   model.w_estimate, atol=1e-6)
        (inputs, y), = list(bd.create_dataset('program_test'))[:1]
        np.testing.assert_allclose(loaded(inputs), model(inputs), atol=1e-6)
        assert loaded.telluride_inputs is not None

    def test_add_metadata_empty_dataset_raises(self, rng):
        bd, _, _ = _linear_test_data(rng)
        model = BrainModelLinearRegression(bd.create_dataset('train'))
        with pytest.raises(ValueError, match='no batches'):
            model.add_metadata({}, dataset=iter(()))

    def test_call_predicts(self, rng):
        bd, w, b = _linear_test_data(rng)
        model = BrainModelLinearRegression(bd.create_dataset('train'))
        model.fit(bd.create_dataset('train'))
        x = rng.randn(10, 6).astype(np.float32)
        np.testing.assert_allclose(model({'input_1': x}), x @ w + b,
                                   atol=1e-3)


class TestDNNModel:

    def test_learns_linear_map(self, rng):
        bd, _, _ = _linear_test_data(rng, n=3000, dx=4, dy=1)
        ds = bd.create_dataset('train')
        model = BrainModelDNN(ds, [16])
        model.compile(learning_rate=1e-2)
        history = model.fit(ds, epochs=30, batch_size=256)
        assert history['loss'][-1] < history['loss'][0]
        results = model.evaluate(bd.create_dataset('test'))
        assert results['pearson_correlation_first'] > 0.9

    def test_dropout_regularizes(self, rng):
        # Working --dropout (the reference defines but never consumes
        # it): with dropout the net cannot memorize the noise floor.
        n = 400
        x = rng.randn(n, 20).astype(np.float32)
        y = (x[:, :1] + 0.5 * rng.randn(n, 1)).astype(np.float32)
        bd = brain_data.TestBrainData('input', 'output', 100.0,
                                      final_batch_size=200)
        bd.preserve_test_data(x, y)
        ds = bd.create_dataset('train')
        losses = {}
        for rate in (0.0, 0.5):
            m = BrainModelDNN(ds, [64, 64], dropout=rate)
            m.compile(learning_rate=3e-3)
            h = m.fit(ds, epochs=150, batch_size=200, seed=1)
            losses[rate] = h['loss'][-1]
        assert losses[0.0] < 0.05          # Memorizes the noise.
        assert losses[0.5] > 0.2           # Dropout prevents that.

    def test_batch_norm_handles_misscaled_features(self, rng, tmp_path):
        # Working --batch_norm (also defined-but-inert in the
        # reference): with features spanning 6 orders of magnitude the
        # plain MLP stalls; batchnorm learns.
        n = 2000
        x = (rng.randn(n, 6) * np.array([1e3, 1e-3, 1, 10, 0.1, 100]
                                        )).astype(np.float32)
        y = (np.tanh(x[:, :1] / 1e3) +
             0.1 * rng.randn(n, 1)).astype(np.float32)
        bd = brain_data.TestBrainData('input', 'output', 100.0,
                                      final_batch_size=500)
        bd.preserve_test_data(x, y)
        ds = bd.create_dataset('train')
        scores = {}
        for use_bn in (False, True):
            m = BrainModelDNN(ds, [32], batch_norm=use_bn)
            m.compile(learning_rate=3e-3)
            m.fit(ds, epochs=60, batch_size=500, seed=2)
            scores[use_bn] = m.evaluate(
                bd.create_dataset('test'))['pearson_correlation_first']
        assert scores[True] > 0.9
        assert scores[True] > scores[False] + 0.3
        # Population stats persist through save/load.
        m.save(str(tmp_path / 'bn'))
        loaded = load_model(str(tmp_path / 'bn'))
        (inputs, _), = list(bd.create_dataset('program_test'))[:1]
        np.testing.assert_allclose(loaded(inputs), m(inputs), atol=1e-5)

    def test_save_load(self, rng, tmp_path):
        bd, _, _ = _linear_test_data(rng, n=500, dx=4, dy=1)
        ds = bd.create_dataset('train')
        model = BrainModelDNN(ds, [8, 8])
        model.compile()
        model.fit(ds, epochs=2)
        model.save(str(tmp_path / 'dnn'))
        loaded = load_model(str(tmp_path / 'dnn'))
        (inputs, _), = list(bd.create_dataset('program_test'))[:1]
        np.testing.assert_allclose(loaded(inputs), model(inputs), atol=1e-6)


class TestClassifier:

    def test_learns_match_mismatch(self, rng):
        # input_2 equals a projection of input_1 for label 0; random for 1.
        n = 4000
        x1 = rng.randn(n, 4).astype(np.float32)
        labels = (np.arange(n) % 2).astype(np.float32)[:, None]
        x2 = np.where(labels > 0.5,
                      rng.randn(n, 1).astype(np.float32),
                      x1[:, :1])
        bd = brain_data.TestBrainData('input', 'output', 100.0,
                                      final_batch_size=512)
        bd.preserve_test_data(x1, labels, input2_data=x2)
        ds = bd.create_dataset('train')
        model = BrainModelClassifier(ds, [16])
        model.compile(learning_rate=1e-2)
        model.fit(ds, epochs=30, batch_size=512)
        results = model.evaluate(bd.create_dataset('test'))
        assert results['accuracy'] > 0.8


def _correlated_pair(rng, n=3000, shared=2, d1=6, d2=5):
    """Two views sharing `shared` latent dimensions (cca_test pattern)."""
    latent = rng.randn(n, shared).astype(np.float32)
    x = np.concatenate([latent + 0.1 * rng.randn(n, shared),
                        rng.randn(n, d1 - shared)], axis=1).astype(np.float32)
    y = np.concatenate([latent + 0.1 * rng.randn(n, shared),
                        rng.randn(n, d2 - shared)], axis=1).astype(np.float32)
    return x, y


class TestCcaModel:

    def test_finds_shared_dimensions(self, rng):
        x, y = _correlated_pair(rng)
        bd = brain_data.TestBrainData('input', 'ones', 100.0,
                                      final_batch_size=500)
        bd.preserve_test_data(x, np.ones((x.shape[0], 1), np.float32),
                              input2_data=y)
        ds = bd.create_dataset('train')
        model = BrainModelCCA(ds, cca_dims=3, regularization_lambda=1e-3)
        model.fit(ds)
        assert model.eigenvalues[0] > 0.9
        assert model.eigenvalues[1] > 0.9
        assert model.eigenvalues[2] < 0.3
        results = model.evaluate(bd.create_dataset('test'))
        assert results['cca_pearson_correlation_first'] > 0.9

    def test_save_load(self, rng, tmp_path):
        x, y = _correlated_pair(rng, n=500)
        bd = brain_data.TestBrainData('input', 'ones', 100.0,
                                      final_batch_size=250)
        bd.preserve_test_data(x, np.ones((500, 1), np.float32),
                              input2_data=y)
        ds = bd.create_dataset('train')
        model = BrainModelCCA(ds, cca_dims=2)
        model.fit(ds)
        model.save(str(tmp_path / 'cca'))
        loaded = load_model(str(tmp_path / 'cca'))
        (inputs, _), = list(bd.create_dataset('program_test'))[:1]
        np.testing.assert_allclose(loaded(inputs), model(inputs), atol=1e-6)

    def test_rejects_scalar_inputs(self, rng):
        bd = brain_data.TestBrainData('input', 'ones', 100.0)
        bd.preserve_test_data(rng.randn(100, 1).astype(np.float32),
                              np.ones((100, 1), np.float32))
        with pytest.raises(ValueError):
            BrainModelCCA(bd.create_dataset('train'), cca_dims=2)


class TestDcca:

    def test_learns_nonlinear_shared_structure(self, rng):
        # Shared latent passed through different nonlinearities per view.
        n = 4000
        latent = rng.randn(n, 1).astype(np.float32)
        x = np.concatenate([np.tanh(latent), rng.randn(n, 3)],
                           axis=1).astype(np.float32)
        y = np.concatenate([latent ** 3 + 0.1 * rng.randn(n, 1),
                            rng.randn(n, 2)], axis=1).astype(np.float32)
        bd = brain_data.TestBrainData('input', 'ones', 100.0,
                                      final_batch_size=1000)
        bd.preserve_test_data(x, np.ones((n, 1), np.float32), input2_data=y)
        ds = bd.create_dataset('train')
        model = BrainModelDCCA(ds, cca_dims=2, hidden_units=[16])
        model.compile(learning_rate=3e-3)
        model.fit(ds, epochs=100, batch_size=1000)
        results = model.evaluate(bd.create_dataset('test'))
        assert results['cca_pearson_correlation_first'] > 0.8
