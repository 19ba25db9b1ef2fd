"""CCA solver tests mirroring the reference planted-structure gates
(test/cca_test.py:42-144)."""

import numpy as np

from telluride_decoding_tpu.solvers import (
    calculate_cca_parameters,
    cca_loss,
)
from telluride_decoding_tpu.solvers.cca import apply_cca
from telluride_decoding_tpu.ops import pearson_correlation


def create_test_data(num_frames=5000, num_c1=3, num_c2=5, frac=0.5):
    """Two arrays with planted shared dimensions (reference fixture)."""
    x1 = np.random.randn(num_frames, num_c1).astype(np.float32)
    x2 = np.random.randn(num_frames, num_c2).astype(np.float32)
    x2[:, 4] = x1[:, 0]                              # fully shared dim
    x2[:, 2] = frac * x2[:, 2] + (1 - frac) * x1[:, 1]  # partially shared
    return x1, x2


def test_cca_planted_structure_recovery():
    np.random.seed(42)
    x1, x2 = create_test_data()
    sol = calculate_cca_parameters(x1, x2, dim=4, regularization=0.1)
    a = np.asarray(sol.rot_x)
    b = np.asarray(sol.rot_y)
    e = np.asarray(sol.eigenvalues)

    expected_a = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]])
    expected_b = np.array([[0, 0], [0, 0], [0, 1], [0, 0], [1, 0]])

    np.testing.assert_array_less(0.9, np.abs(a[np.where(expected_a)]))
    np.testing.assert_array_less(
        np.abs(a[np.where(np.logical_not(expected_a))]), 0.05)
    b2 = b[:, 0:2]
    np.testing.assert_array_less(0.9, np.abs(b2[np.where(expected_b)]))
    np.testing.assert_array_less(
        np.abs(b2[np.where(np.logical_not(expected_b))]), 0.1)

    assert e[0] > 0.90
    assert e[1] > 0.60
    assert e[2] < 0.02


def test_cca_rotated_outputs_are_correlated():
    np.random.seed(0)
    x1, x2 = create_test_data(frac=0.0)
    sol = calculate_cca_parameters(x1, x2, dim=2, regularization=1e-4)
    out = np.asarray(apply_cca(sol, x1, x2))
    d = out.shape[1] // 2
    corr = np.asarray(pearson_correlation(out[:, :d], out[:, d:]))
    assert corr[0] > 0.95
    assert corr[1] > 0.9


def test_cca_loss_shared_dimension_count():
    """cca_loss estimates the planted shared-dimension count
    (reference gate: 2.05 / 1.72 / 1.0 within 0.1)."""
    np.random.seed(42)
    x, y = create_test_data(frac=0.0)
    assert abs(float(cca_loss(x, y, 4, 1e-4, 1e-2)) - 2.05) < 0.1
    x, y = create_test_data(frac=0.5)
    assert abs(float(cca_loss(x, y, 4, 1e-4, 1e-2)) - 1.72) < 0.1
    x, y = create_test_data(frac=1.0)
    assert abs(float(cca_loss(x, y, 4, 1e-4, 1e-2)) - 1.0) < 0.1


def test_cca_loss_is_differentiable():
    import jax
    np.random.seed(1)
    x, y = create_test_data(num_frames=500)

    def loss_fn(w):
        return -cca_loss(x @ w, y, 2, 1e-3, 1e-3)

    w0 = np.eye(3, dtype=np.float32)
    g = jax.grad(loss_fn)(w0)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)
