"""Pearson correlation primitives vs numpy ground truth."""

import numpy as np
import jax.numpy as jnp

from telluride_decoding_tpu.ops import (
    pearson_correlation,
    pearson_correlation_first,
    pearson_correlation_second,
    pearson_loss,
    correlation_matrix,
)


def test_pearson_matches_numpy(rng):
    x = rng.randn(500, 4).astype(np.float32)
    y = (0.5 * x + 0.5 * rng.randn(500, 4)).astype(np.float32)
    got = np.asarray(pearson_correlation(x, y))
    want = np.array([np.corrcoef(x[:, i], y[:, i])[0, 1] for i in range(4)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pearson_perfect_and_anticorrelated(rng):
    x = rng.randn(200, 2).astype(np.float32)
    y = np.stack([x[:, 0] * 3 + 1, -x[:, 1]], axis=1)
    got = np.asarray(pearson_correlation(x, y))
    np.testing.assert_allclose(got, [1.0, -1.0], atol=1e-5)


def test_pearson_zero_power_guard(rng):
    x = np.zeros((100, 3), np.float32)
    y = rng.randn(100, 3).astype(np.float32)
    got = np.asarray(pearson_correlation(x, y))
    np.testing.assert_array_equal(got, np.zeros(3))


def test_pearson_first_second(rng):
    x = rng.randn(300, 3).astype(np.float32)
    y = rng.randn(300, 3).astype(np.float32)
    all_c = np.asarray(pearson_correlation(x, y))
    assert float(pearson_correlation_first(x, y)) == all_c[0]
    assert float(pearson_correlation_second(x, y)) == all_c[1]


def test_pearson_1d_inputs(rng):
    x = rng.randn(200).astype(np.float32)
    y = (x + 0.1 * rng.randn(200)).astype(np.float32)
    got = float(pearson_correlation(x, y)[0])
    want = np.corrcoef(x, y)[0, 1]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pearson_loss_sums_to_negative_correlation(rng):
    x = rng.randn(400, 1).astype(np.float32)
    y = (0.8 * x + 0.2 * rng.randn(400, 1)).astype(np.float32)
    loss = np.asarray(pearson_loss(x, y))
    assert loss.shape == (400,)
    total = -np.sum(loss)
    want = np.corrcoef(x[:, 0], y[:, 0])[0, 1]
    np.testing.assert_allclose(total, want, atol=1e-4)


def test_correlation_matrix_matches_corrcoef(rng):
    x = rng.randn(300, 2).astype(np.float32)
    y = rng.randn(300, 3).astype(np.float32)
    got = np.asarray(correlation_matrix(x, y))
    want = np.corrcoef(np.concatenate([x, y], axis=1).T)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_pearson_is_jittable(rng):
    import jax
    x = jnp.asarray(rng.randn(100, 2), jnp.float32)
    y = jnp.asarray(rng.randn(100, 2), jnp.float32)
    jitted = jax.jit(pearson_correlation)
    np.testing.assert_allclose(np.asarray(jitted(x, y)),
                               np.asarray(pearson_correlation(x, y)),
                               atol=1e-6)
