"""Ridge solver recovery tests (mirror of the reference's closed-form
quality gates, test/brain_model_test.py:129-243)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telluride_decoding_tpu.ops import moments_from_arrays, blocked_moments
from telluride_decoding_tpu.solvers import (
    calculate_linear_regressor_parameters,
    solve_ridge_from_moments,
)


def _planted_problem(rng, n=2000, dx=6, dy=3, noise=0.0):
    x = rng.randn(n, dx).astype(np.float32)
    w = rng.randn(dx, dy).astype(np.float32)
    b = rng.randn(dy).astype(np.float32)
    y = x @ w + b + noise * rng.randn(n, dy).astype(np.float32)
    return x, y, w, b


def test_ridge_recovers_planted_weights(rng):
    x, y, w, b = _planted_problem(rng)
    sol = calculate_linear_regressor_parameters(x, y, lamb=0.0)
    np.testing.assert_allclose(np.asarray(sol.w), w, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sol.b), b, atol=1e-3)


def test_ridge_prediction_correlation_gate(rng):
    # Reference gate: r > 0.99 on noiseless recovery
    # (test/brain_model_test.py:192-193).
    from telluride_decoding_tpu.ops import pearson_correlation
    x, y, _, _ = _planted_problem(rng, noise=0.01)
    sol = calculate_linear_regressor_parameters(x, y, lamb=1e-3)
    pred = x @ np.asarray(sol.w) + np.asarray(sol.b)
    corr = np.asarray(pearson_correlation(pred, y))
    assert np.all(corr > 0.99)


def test_ridge_matches_reference_numpy_formula(rng):
    """Bit-level check against the reference's augmented-system algebra."""
    x, y, _, _ = _planted_problem(rng, n=500, dx=4, dy=2, noise=0.1)
    lamb = 0.7
    sol = calculate_linear_regressor_parameters(x, y, lamb=lamb)
    # Reference computation (brain_model.py:429-479) in float64:
    xa = np.hstack([x, np.ones((x.shape[0], 1), x.dtype)]).astype(np.float64)
    cov_x = xa.T @ xa / x.shape[0] + lamb * np.eye(x.shape[1] + 1)
    cov_xy = xa.T @ y.astype(np.float64) / x.shape[0]
    ref = np.linalg.solve(cov_x, cov_xy)
    np.testing.assert_allclose(np.asarray(sol.w), ref[:-1], atol=2e-3)
    np.testing.assert_allclose(np.asarray(sol.b), ref[-1], atol=2e-3)


def test_blocked_moments_match_oneshot(rng):
    x = rng.randn(5000, 8).astype(np.float32)
    y = rng.randn(5000, 2).astype(np.float32)
    a = moments_from_arrays(x, y, want_syy=True)
    b = blocked_moments(x, y, block=512, want_syy=True)
    for fa, fb in zip(a, b):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                   rtol=2e-4, atol=2e-2)


def test_blocked_moments_valid_mask(rng):
    x = rng.randn(1000, 4).astype(np.float32)
    y = rng.randn(1000, 2).astype(np.float32)
    valid = np.ones(1000, np.float32)
    valid[700:] = 0
    a = blocked_moments(x, y, block=128, valid=valid)
    b = moments_from_arrays(x[:700], y[:700])
    np.testing.assert_allclose(np.asarray(a.sxx), np.asarray(b.sxx),
                               rtol=1e-4, atol=1e-2)
    assert float(a.count) == 700


def test_lambda_sweep_vmap(rng):
    """One covariance pass, a whole vmapped lambda grid of solves."""
    x, y, _, _ = _planted_problem(rng, n=800, dx=5, dy=2, noise=0.2)
    stats = moments_from_arrays(x, y)
    lambdas = jnp.asarray(np.logspace(-6, 0.5, 9), jnp.float32)
    sols = jax.vmap(lambda l: solve_ridge_from_moments(stats, l))(lambdas)
    assert sols.w.shape == (9, 5, 2)
    # Each lambda must match its individual solve.
    for i, l in enumerate(np.asarray(lambdas)):
        single = solve_ridge_from_moments(stats, float(l))
        np.testing.assert_allclose(np.asarray(sols.w[i]),
                                   np.asarray(single.w), atol=1e-5)


def test_shrinkage_mode_runs(rng):
    x, y, _, _ = _planted_problem(rng, n=500, dx=4, dy=1, noise=0.3)
    sol = calculate_linear_regressor_parameters(x, y, lamb=0.01,
                                                use_ridge=False)
    assert np.all(np.isfinite(np.asarray(sol.w)))


def test_ledoit_wolf_auto_shrinkage(rng):
    x, y, _, _ = _planted_problem(rng, n=500, dx=4, dy=1, noise=0.3)
    sol = calculate_linear_regressor_parameters(x, y, lamb=-1,
                                                use_ridge=False)
    s = float(sol.shrinkage)
    assert 0.0 <= s <= 1.0
    assert np.all(np.isfinite(np.asarray(sol.w)))


def test_ledoit_wolf_nonzero_mean_matches_sklearn(rng):
    """LW shrinkage on data with a large offset. (Regression: the
    covariance fed to the LW formula subtracted outer(mean, mean)/n
    instead of outer(mean, mean), so any nonzero mean blew up the
    dispersion term and shrinkage clipped to 0.)"""
    ledoit_wolf_shrinkage = pytest.importorskip(
        'sklearn.covariance').ledoit_wolf_shrinkage
    x = (rng.randn(1500, 10) @ rng.randn(10, 10) * 0.3 +
         10.0 * rng.randn(10)).astype(np.float32)
    y = rng.randn(1500, 1).astype(np.float32)
    want = ledoit_wolf_shrinkage(x)   # Centers internally.
    sol = calculate_linear_regressor_parameters(
        x, y, lamb=-1, use_ridge=False, use_offset=False)
    assert float(sol.shrinkage) == pytest.approx(want, abs=1e-3)
    assert float(sol.shrinkage) > 1e-4   # The bug clipped this to 0.


def test_no_offset_mode(rng):
    x = rng.randn(1000, 4).astype(np.float32)
    w = rng.randn(4, 2).astype(np.float32)
    y = x @ w
    sol = calculate_linear_regressor_parameters(x, y, lamb=0.0,
                                                use_offset=False)
    np.testing.assert_allclose(np.asarray(sol.w), w, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(sol.b), np.zeros(2))
