"""Attention-decision tests.

Mirrors the reference gates: log-normal parameter recovery from large
samples (test/attention_decoder_test.py:238-262) and <15% frame error on
synthetic attention switches (:190-236).
"""

import numpy as np
import pytest

from telluride_decoding_tpu.decide import (
    AttentionDecoder,
    StateSpaceAttentionDecoder,
    StepAttentionDecoder,
    create_attention_decoder,
)


class TestWta:

    def test_instantaneous(self):
        dec = AttentionDecoder()
        assert dec.attention(0.9, 0.1)[0]
        assert not dec.attention(0.1, 0.9)[0]

    def test_array_inputs(self):
        dec = AttentionDecoder()
        assert dec.attention(np.array([0.5, 0.7]), np.array([0.1, 0.2]))[0]


class TestStepped:

    def test_hysteresis(self):
        dec = StepAttentionDecoder()
        # One flip isn't enough to change the decision from start state.
        decision, _, _ = dec.attention(0.9, 0.1)
        assert decision
        # Decisions require multiple consistent windows to switch.
        for _ in range(2):
            decision, _, _ = dec.attention(0.1, 0.9)
        assert not decision
        # State is clipped to [0.1, 0.9].
        for _ in range(20):
            dec.attention(0.1, 0.9)
        assert dec.state == pytest.approx(0.1)


class TestFactory:

    def test_create_types(self):
        assert isinstance(create_attention_decoder('wta'),
                          AttentionDecoder)
        assert isinstance(create_attention_decoder('stepped'),
                          StepAttentionDecoder)
        assert isinstance(create_attention_decoder('step'),
                          StepAttentionDecoder)
        ssd = create_attention_decoder('ssd', window_step=100,
                                       frame_rate=100.0)
        assert isinstance(ssd, StateSpaceAttentionDecoder)
        assert ssd.outer_iter == 20 and ssd.newton_iter == 10
        with pytest.raises(ValueError):
            create_attention_decoder('bogus')


def _lognormal_correlations(rng, n, attended):
    """Samples windowed correlations: higher log-normal when attended."""
    mu_a, sigma_a = -0.4, 0.6
    mu_u, sigma_u = -1.5, 0.9
    r_att = np.exp(mu_a + sigma_a * rng.randn(n))
    r_un = np.exp(mu_u + sigma_u * rng.randn(n))
    r1 = np.where(attended, r_att, r_un)
    r2 = np.where(attended, r_un, r_att)
    return r1, r2


class TestSsd:

    def test_tune_recovers_lognormal_parameters(self, rng):
        # MLE from 1e6 samples recovers planted parameters
        # (reference test/attention_decoder_test.py:238-262).
        n = 1000000
        mu_a, rho_a = -0.4, 1.0 / 0.36      # sigma^2 = 0.36
        mu_u, rho_u = -1.5, 1.0 / 0.81
        r1 = np.exp(mu_a + np.sqrt(1 / rho_a) * rng.randn(n))
        r2 = np.exp(mu_u + np.sqrt(1 / rho_u) * rng.randn(n))
        dec = StateSpaceAttentionDecoder(20, 1, 10, 100.0)
        dec.tune(r1, r2)
        assert dec.mu_d[0] == pytest.approx(mu_a, abs=0.02)
        assert dec.mu_d[1] == pytest.approx(mu_u, abs=0.02)
        assert dec.rho_d[0] == pytest.approx(rho_a, rel=0.05)
        assert dec.rho_d[1] == pytest.approx(rho_u, rel=0.05)

    def test_warmup_returns_undecided(self, rng):
        dec = create_attention_decoder('ssd')
        for i in range(dec.k_w - 1):
            out = dec.attention(0.5, 0.1)
            assert out == (0.5, 0.5, 0.5)

    def test_tracks_attention_switches(self, rng):
        # Synthetic switches: attended speaker alternates every 100
        # windows; decoder frame error must be < 15%
        # (reference test gate, test/attention_decoder_test.py:235-236).
        n = 400
        attended = (np.arange(n) // 100) % 2 == 0
        r1, r2 = _lognormal_correlations(rng, n, attended)
        dec = create_attention_decoder('ssd')
        dec.tune(r1[:100], r2[:100])
        errors = 0
        total = 0
        for i in range(n):
            p, lo, hi = dec.attention(r1[i], r2[i])
            assert 0.0 <= lo <= hi <= 1.0 or (lo, hi) == (0.5, 0.5)
            if i < dec.k_w:
                continue
            # Output at call i describes time i - k_b (fixed lag).
            t = i - dec.k_b
            decision = p > 0.5
            errors += decision != attended[t]
            total += 1
        assert errors / total < 0.15

    def test_confidence_bounds_ordered(self, rng):
        n = 50
        attended = np.ones(n, bool)
        r1, r2 = _lognormal_correlations(rng, n, attended)
        dec = create_attention_decoder('ssd')
        for i in range(n):
            p, lo, hi = dec.attention(r1[i], r2[i])
        assert lo <= p <= hi
        assert p > 0.5  # Consistently attended speaker 1.


class TestPlotAadResults:
    """plot_aad_results (reference attention_decoder.py:27-113):
    decision trace + confidence band + attention shading to a png."""

    def test_plot_with_bounds_and_shading(self, tmp_path):
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from telluride_decoding_tpu.decide.attention_decoder import (
            plot_aad_results)
        n = 200
        t = np.arange(n) / 100.0
        decision = 0.5 + 0.4 * np.sin(t)
        flag = (np.arange(n) > 100).astype(float)
        plt.figure()
        plot_aad_results(decision, attention_flag=flag,
                         decision_upper=decision + 0.05,
                         decision_lower=decision - 0.05, t=t)
        out = tmp_path / 'aad.png'
        plt.savefig(str(out))
        plt.close('all')
        assert out.stat().st_size > 1000

    def test_type_errors(self):
        from telluride_decoding_tpu.decide.attention_decoder import (
            plot_aad_results)
        with pytest.raises(TypeError, match='decision'):
            plot_aad_results([0.5, 0.6])
        with pytest.raises(TypeError):
            plot_aad_results(np.zeros(5), attention_flag=[1, 2])
