"""Scaled LDA tests mirroring the reference gates
(test/scaled_lda_test.py:30-89)."""

import numpy as np
import pytest

from telluride_decoding_tpu.solvers import (
    LinearDiscriminantAnalysis,
    ScaledLinearDiscriminantAnalysis,
    LdaParams,
)
from telluride_decoding_tpu.decode import calculate_dprime


def _two_class_data(rng, n=400, d=4, sep=3.0):
    c0 = rng.randn(n, d) + 0.0
    c1 = rng.randn(n, d)
    c1[:, 0] += sep
    c1[:, 1] += sep / 2
    x = np.concatenate([c0, c1], axis=0).astype(np.float32)
    y = np.concatenate([np.zeros(n), np.ones(n)])
    return x, y


def test_scaled_lda_maps_class_means_to_0_and_1(rng):
    x, y = _two_class_data(rng)
    lda = ScaledLinearDiscriminantAnalysis()
    lda.fit(x, y)
    m0 = lda.transform(np.reshape(lda.mean_vectors[0], (1, -1)))[0, 0]
    m1 = lda.transform(np.reshape(lda.mean_vectors[1], (1, -1)))[0, 0]
    np.testing.assert_allclose(m0, 0.0, atol=1e-5)
    np.testing.assert_allclose(m1, 1.0, atol=1e-5)


def test_scaled_lda_separates_classes(rng):
    x, y = _two_class_data(rng, sep=4.0)
    lda = ScaledLinearDiscriminantAnalysis()
    preds = lda.fit_transform(x, y)
    d = calculate_dprime(preds[y == 0, 0], preds[y == 1, 0])
    assert d > 2.0


def test_scaled_lda_transformed_centers_symmetric(rng):
    # Reference: transformed class centers are symmetric around 0.5
    # (test/scaled_lda_test.py:84-89).
    x, y = _two_class_data(rng)
    lda = ScaledLinearDiscriminantAnalysis()
    preds = lda.fit_transform(x, y)
    c0 = np.mean(preds[y == 0, 0])
    c1 = np.mean(preds[y == 1, 0])
    np.testing.assert_allclose(c0 + c1, 1.0, atol=1e-3)


def test_lda_params_roundtrip_json(rng):
    import json
    x, y = _two_class_data(rng)
    lda = ScaledLinearDiscriminantAnalysis()
    lda.fit(x, y)
    params = lda.model_parameters
    # Serialize like the reference NumpyEncoder JSON round trip.
    as_dict = {
        "w_real": np.asarray(params.w_real).tolist(),
        "w_imag": np.asarray(params.w_imag).tolist(),
        "labels": list(params.labels),
        "mean_vectors": np.asarray(params.mean_vectors).tolist(),
        "slope": params.slope,
        "intercept": params.intercept,
    }
    blob = json.loads(json.dumps(as_dict))
    lda2 = ScaledLinearDiscriminantAnalysis()
    lda2.model_parameters = LdaParams(**blob)
    np.testing.assert_allclose(lda.transform(x), lda2.transform(x),
                               atol=1e-5)


def test_lda_one_dim_input(rng):
    x = np.concatenate([rng.randn(100), rng.randn(100) + 4])
    y = np.concatenate([np.zeros(100), np.ones(100)])
    lda = ScaledLinearDiscriminantAnalysis()
    preds = lda.fit_transform(x, y)
    assert abs(np.mean(preds[y == 0, 0])) < 0.2
    assert abs(np.mean(preds[y == 1, 0]) - 1.0) < 0.2


def test_scaled_lda_rejects_three_classes(rng):
    x = rng.randn(90, 3)
    y = np.repeat([0, 1, 2], 30)
    lda = ScaledLinearDiscriminantAnalysis()
    with pytest.raises(ValueError):
        lda.fit(x, y)


def test_plain_lda_explained_variance(rng):
    x, y = _two_class_data(rng)
    lda = LinearDiscriminantAnalysis()
    lda.fit(x, y)
    ratios = lda.explained_variance_ratio()
    assert ratios[0] > 0.9
    np.testing.assert_allclose(np.sum(ratios), 1.0, atol=1e-5)


def test_dprime_known_values():
    # Reference gate: d' of two unit-variance distributions separated by
    # their mean difference (test/infer_decoder_test.py:510-518).
    rng = np.random.RandomState(0)
    d1 = rng.randn(100000)
    d2 = rng.randn(100000) + 1.0
    assert abs(calculate_dprime(d1, d2) - 1.0) < 0.02


# average_data is pinned in tests/test_infer_decoder.py (TestMetrics),
# where the helper lives.
