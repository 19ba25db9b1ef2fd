"""Regression tests for the second review pass."""

import numpy as np
import pytest

from telluride_decoding_tpu.io.edf import read_edf, write_edf


def test_bdf_roundtrip(rng, tmp_path):
    # BioSemi BDF: 24-bit samples; previously parsed as 16-bit garbage.
    path = str(tmp_path / 'x.bdf')
    sig1 = (np.sin(np.arange(2048) / 512 * 2 * np.pi * 7) * 100)
    sig2 = rng.randn(1024) * 50
    write_edf(path, [sig1, sig2], ['A1', 'A2'], [512.0, 256.0], bdf=True)
    parsed = read_edf(path)
    np.testing.assert_allclose(parsed['signal_list'][0][:2048], sig1,
                               atol=1e-3)
    np.testing.assert_allclose(parsed['signal_list'][1][:1024], sig2,
                               atol=1e-3)
    np.testing.assert_allclose(parsed['sample_rates'], [512.0, 256.0])


def test_ledoit_wolf_matches_sklearn(rng):
    ledoit_wolf_shrinkage = pytest.importorskip(
        'sklearn.covariance').ledoit_wolf_shrinkage
    from telluride_decoding_tpu.solvers.ridge import (
        calculate_linear_regressor_parameters)
    x = (rng.randn(1500, 10) @ rng.randn(10, 10) * 0.3).astype(np.float32)
    y = rng.randn(1500, 1).astype(np.float32)
    want = ledoit_wolf_shrinkage(x - x.mean(0), assume_centered=True)
    sol = calculate_linear_regressor_parameters(
        x, y, lamb=-1, use_ridge=False, use_offset=False)
    assert float(sol.shrinkage) == pytest.approx(want, abs=1e-3)


def test_pearson_many_small_columns_not_zeroed(rng):
    # prod() of 64 small per-column powers underflowed float32 to 0.
    from telluride_decoding_tpu.ops.pearson import pearson_correlation
    x = (0.01 * rng.randn(200, 64)).astype(np.float32)
    y = x + (0.001 * rng.randn(200, 64)).astype(np.float32)
    corr = np.asarray(pearson_correlation(x, y))
    assert np.all(corr > 0.9)  # Was all zeros pre-fix.


def test_ssd_forward_lag_indexing(rng):
    from telluride_decoding_tpu.decide.attention_decoder import (
        StateSpaceAttentionDecoder)
    # forward_lag > 0 must return the estimate k_f frames back, not
    # the window's last frame.
    dec = StateSpaceAttentionDecoder(5, 1, 5, 100.0, forward_lag=3,
                                     backward_lag=8)
    assert dec.k_w == 12
    r_att = np.exp(-0.4 + 0.6 * rng.randn(60))
    r_un = np.exp(-1.5 + 0.9 * rng.randn(60))
    outs = [dec.attention(a, u) for a, u in zip(r_att, r_un)]
    p_final = outs[-1][0]
    assert np.isfinite(p_final)
    assert p_final > 0.5  # Attends to speaker 1 throughout.


def test_fused_frontend_long_nondyadic(rng):
    from telluride_decoding_tpu.ops.fused_frontend import (
        fused_envelope_lagstack, fused_envelope_lagstack_reference)
    audio = rng.randn(8000 * 50).astype(np.float32)
    got = np.asarray(fused_envelope_lagstack(
        audio, 8000, 30, window=2.0, pre=1, post=1, out_tile=64,
        interpret=True))
    want = np.asarray(fused_envelope_lagstack_reference(
        audio, 8000, 30, window=2.0, pre=1, post=1))
    # Tolerance covers the inherent +-1-sample boundary quantization
    # of float32 in-kernel rounding on non-terminating rate ratios.
    assert np.abs(got - want).max() < 5e-3
    assert np.median(np.abs(got - want)) < 1e-4


def test_shrinkage_sweep_clamps_sentinel(rng):
    # use_ridge=False without sum_x2tx2 must not blend with lamb=-1.
    from telluride_decoding_tpu.ops.covariance import moments_from_arrays
    from telluride_decoding_tpu.solvers.ridge import (
        solve_ridge_from_moments)
    x = rng.randn(500, 4).astype(np.float32)
    y = rng.randn(500, 1).astype(np.float32)
    stats = moments_from_arrays(x, y)
    sol = solve_ridge_from_moments(stats, -1.0, use_ridge=False)
    assert 0.0 <= float(sol.shrinkage) <= 1.0
    assert np.all(np.isfinite(np.asarray(sol.w)))
