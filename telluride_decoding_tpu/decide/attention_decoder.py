"""Attention decision: winner-take-all, stepped, and state-space decoders.

Capability parity with the reference attention_decoder.py
(AttentionDecoder :116-137, StepAttentionDecoder :141-173,
StateSpaceAttentionDecoder :176-452, create_attention_decoder :455-485).

The state-space decoder (Miran et al. 2018, "Real-Time Tracking of
Selective Auditory Attention From M/EEG: A Bayesian Filtering Approach")
models windowed correlations of attended/unattended speakers as
log-normal variables over a latent attention state z, estimated with a
fixed-lag sliding window: an outer EM loop updating the log-normal
parameters, an inner EM loop running a Kalman filter/smoother over the
window, and a Newton iteration inside each filter step. All iteration
counts are fixed constants (reference :477-480: outer 20 / inner 1 /
newton 10), so the whole per-window update compiles to ONE jitted XLA
program with lax.fori_loop/scan — no data-dependent Python control flow.
Hyperparameters (UMD priors, reference :264-268) are identical.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


class AttentionDecoder:
    """Winner-take-all: instantaneous comparison, no hysteresis."""

    def attention(self, r1, r2) -> Tuple[Union[float, bool], float, float]:
        return bool(np.mean(r1) > np.mean(r2)), 0, 0

    def tune(self, r1: Sequence[float], r2: Sequence[float]):
        del r1, r2


class StepAttentionDecoder(AttentionDecoder):
    """Hysteresis stepper: state in [0.1, 0.9], +/-0.1 per window."""

    def __init__(self):
        self.state = 0.5

    def attention(self, r1, r2):
        if np.mean(r1) > np.mean(r2):
            self.state = min(0.9, self.state + 0.1)
        else:
            self.state = max(0.1, self.state - 0.1)
        return self.state > 0.5, 0, 0


class SsdState(NamedTuple):
    """Carry state of the state-space decoder between windows."""

    mu_d: jax.Array         # [2] log-normal means (attended, unattended)
    rho_d: jax.Array        # [2] log-normal precisions
    z_kk: jax.Array         # [k_w+1] Kalman filtered state
    sig_kk: jax.Array       # [k_w+1] Kalman filtered variance
    eta: jax.Array          # [k_w] state-space variances
    z_smooth: jax.Array     # [k_w] previous window's smoothed z
    #                         (reference z_smoothed[-k_w:], the next
    #                         window's E-step initialization)


class SsdConstants(NamedTuple):
    mu_0: jax.Array         # [2] prior means
    alpha_0: jax.Array      # [2]
    beta_0: jax.Array       # [2]
    a_0: jax.Array          # scalar inverse-gamma prior
    b_0: jax.Array          # scalar
    lambda_state: jax.Array  # scalar AR coefficient


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def _log_normal_density(r, mu, rho):
    return (1.0 / r) * jnp.sqrt(rho) * jnp.exp(
        -0.5 * rho * (jnp.log(r) - mu) ** 2)


@functools.partial(jax.jit,
                   static_argnames=('outer_iter', 'inner_iter',
                                    'newton_iter', 'k_w'))
def _ssd_update(state: SsdState, r1: jax.Array, r2: jax.Array,
                consts: SsdConstants,
                outer_iter: int, inner_iter: int, newton_iter: int,
                k_w: int):
    """One window update: outer EM over (E-step, M-step, Kalman smoother).

    The reference recursion (attention_decoder.py:350-443) with all
    loops as fixed-trip-count lax loops — with ONE deliberate
    deviation: the backward (RTS) smoother pass here runs in true
    reverse order, whereas the reference updates z_k_k_cap in
    ASCENDING index order and therefore reads stale (unsmoothed)
    values for the k+1 terms. The difference in the emitted attention
    probability is small (<~2e-3 measured on matched streams) and this
    form is the published Miran et al. fixed-lag smoother; the <15%
    switch-error gate covers both. r1/r2 are the [k_w]
    windows of |correlation| values (host ring buffers — keeping them
    out of the carried device state means the per-call buffer append
    costs no device dispatch).
    """
    kf = jnp.float32(k_w)

    def outer_body(_, carry):
        mu_d, rho_d, z_kk, sig_kk, eta, z = carry
        # E-step: responsibility that speaker 1 is attended per frame.
        p_11 = _log_normal_density(r1, mu_d[0], rho_d[0])
        p_12 = _log_normal_density(r1, mu_d[1], rho_d[1])
        p_21 = _log_normal_density(r2, mu_d[1], rho_d[1])
        p_22 = _log_normal_density(r2, mu_d[0], rho_d[0])
        p = _sigmoid(z)
        ep = (p * p_11 * p_21) / (p * p_11 * p_21 +
                                  (1.0 - p) * p_12 * p_22)

        # M-step: MAP update of the log-normal parameters.
        log_r1 = jnp.log(r1)
        log_r2 = jnp.log(r2)
        mu0_new = (jnp.sum(ep * log_r1 + (1.0 - ep) * log_r2) +
                   kf * consts.mu_0[0]) / (2.0 * kf)
        mu1_new = (jnp.sum(ep * log_r2 + (1.0 - ep) * log_r1) +
                   kf * consts.mu_0[1]) / (2.0 * kf)
        rho0_new = (2.0 * kf * consts.alpha_0[0]) / (
            jnp.sum(ep * (log_r1 - mu0_new) ** 2 +
                    (1.0 - ep) * (log_r2 - mu0_new) ** 2) +
            kf * (2.0 * consts.beta_0[0] +
                  (mu0_new - consts.mu_0[0]) ** 2))
        rho1_new = (2.0 * kf * consts.alpha_0[1]) / (
            jnp.sum(ep * (log_r2 - mu1_new) ** 2 +
                    (1.0 - ep) * (log_r1 - mu1_new) ** 2) +
            kf * (2.0 * consts.beta_0[1] +
                  (mu1_new - consts.mu_0[1]) ** 2))
        mu_d = jnp.stack([mu0_new, mu1_new])
        rho_d = jnp.stack([rho0_new, rho1_new])

        lam = consts.lambda_state

        def inner_body(_, inner_carry):
            z_kk, sig_kk, eta, _ = inner_carry

            # Forward Kalman filter over the window with Newton updates.
            def filter_step(carry, inputs):
                z_prev, sig_prev = carry
                eta_k, ep_k, z_init = inputs
                z_pred = lam * z_prev
                sig_pred = lam * lam * sig_prev + eta_k

                def newton_step(_, zk):
                    e = jnp.exp(zk)
                    return zk - (zk - z_pred - sig_pred *
                                 (ep_k - e / (1 + e))) / (
                                     1 + sig_pred * e / (1 + e) ** 2)

                zk = jax.lax.fori_loop(0, newton_iter, newton_step, z_init)
                e = jnp.exp(zk)
                sig = 1.0 / (1.0 / sig_pred + e / (1 + e) ** 2)
                return (zk, sig), (zk, sig, z_pred, sig_pred)

            (_, _), (z_f, sig_f, z_pred, sig_pred) = jax.lax.scan(
                filter_step, (z_kk[0], sig_kk[0]),
                (eta, ep, z_kk[1:]))
            z_kk = jnp.concatenate([z_kk[:1], z_f])
            sig_kk = jnp.concatenate([sig_kk[:1], sig_f])

            # Backward smoother.
            sm = sig_kk[:-1] * lam / sig_pred          # [k_w]

            def smooth_step(carry, inputs):
                z_next_cap, sig_next_cap = carry
                z_k, sig_k, sm_k, z_pred_next, sig_pred_next = inputs
                z_cap = z_k + sm_k * (z_next_cap - z_pred_next)
                sig_cap = sig_k + sm_k ** 2 * (sig_next_cap -
                                               sig_pred_next)
                return (z_cap, sig_cap), (z_cap, sig_cap)

            (_, _), (z_cap_rev, sig_cap_rev) = jax.lax.scan(
                smooth_step, (z_kk[k_w], sig_kk[k_w]),
                (z_kk[:-1], sig_kk[:-1], sm, z_pred, sig_pred),
                reverse=True)
            z_cap = jnp.concatenate([z_cap_rev,
                                     z_kk[k_w:k_w + 1]])
            sig_cap = jnp.concatenate([sig_cap_rev,
                                       sig_kk[k_w:k_w + 1]])

            z_kk = z_kk.at[0].set(z_cap[0])
            sig_kk = sig_kk.at[0].set(sig_cap[0])

            eta = ((z_cap[1:] - z_cap[:-1]) ** 2 +
                   sig_cap[1:] + sig_cap[:-1] -
                   2.0 * sig_cap[1:] * sm + 2 * consts.b_0) / (
                       1 + 2 * (consts.a_0 + 1))
            return z_kk, sig_kk, eta, z_cap

        z_kk, sig_kk, eta, z_cap = jax.lax.fori_loop(
            0, inner_iter, inner_body,
            (z_kk, sig_kk, eta, jnp.concatenate([z_kk[:1], z])))

        # The next outer E-step uses the SMOOTHED state
        # (reference: z = z_k_k_cap[1:]).
        z = z_cap[1:]
        return mu_d, rho_d, z_kk, sig_kk, eta, z

    # The first E-step starts from the PREVIOUS window's smoothed
    # trajectory (reference: z = z_smoothed[-k_w:], which was appended
    # as z_k_k_cap[1:] at the end of that window) — not the filtered
    # z_k_k values, which only seed the Newton iterations.
    z0 = state.z_smooth
    mu_d, rho_d, z_kk, sig_kk, eta, z = jax.lax.fori_loop(
        0, outer_iter, outer_body,
        (state.mu_d, state.rho_d, state.z_kk, state.sig_kk, state.eta, z0))

    # Carry the smoothed head into the next window
    # (reference: z_k_k[0] = z_k_k_cap[1]).
    new_state = state._replace(mu_d=mu_d, rho_d=rho_d,
                               z_kk=z_kk.at[0].set(z[0]),
                               sig_kk=sig_kk, eta=eta, z_smooth=z)
    return new_state, z, eta


class StateSpaceAttentionDecoder(AttentionDecoder):
    """Fixed-lag Bayesian attention filter (Miran et al. 2018)."""

    def __init__(self, outer_iter: int, inner_iter: int, newton_iter: int,
                 fs_corr: float, forward_lag: int = 0,
                 backward_lag: int = 13, offset: float = 0.0):
        self._offset = offset
        self.outer_iter = outer_iter
        self.inner_iter = inner_iter
        self.newton_iter = newton_iter
        self.fs_corr = fs_corr
        self.k_f = forward_lag
        self.k_b = backward_lag
        self.k_w = self.k_f + self.k_b + 1
        self.c0 = 1.96  # 95% confidence intervals.

        # Inverse-gamma prior on the state-space variances.
        self.mean_p = 0.2
        self.var_p = 5
        self.a_0 = 2 + self.mean_p ** 2 / self.var_p
        self.b_0 = self.mean_p * (self.a_0 - 1)

        self.calls = 0
        self.lambda_state = 1.0

        # UMD-tuned prior hyperparameters (reference :264-268).
        self.alpha_0 = [6.4113e+02, 4.0434e+03]
        self.beta_0 = [3.7581e+02, 6.2791e+03]
        self.mu_0 = [-0.3994, -1.5103]
        self.rho_d = [1.7060, 0.64395]
        self.mu_d = [-0.3994, -1.5103]

        # Correlation ring buffers live on the HOST: appending one
        # scalar per call must not cost device dispatches (every
        # dispatch is a network round trip on a tunneled backend).
        self._r1_buf = np.zeros((self.k_w,), np.float32)
        self._r2_buf = np.zeros((self.k_w,), np.float32)
        self._state = SsdState(
            mu_d=jnp.asarray(self.mu_d, jnp.float32),
            rho_d=jnp.asarray(self.rho_d, jnp.float32),
            z_kk=jnp.zeros((self.k_w + 1,), jnp.float32),
            sig_kk=jnp.zeros((self.k_w + 1,), jnp.float32),
            eta=jnp.full((self.k_w,), 0.3, jnp.float32),
            z_smooth=jnp.zeros((self.k_w,), jnp.float32))
        # Seeded with k_w zeros like the reference (:244-248), so
        # z_dyn[i] aligns with call index i for analysis scripts that
        # plot the trace against the input correlation stream.
        self.z_dyn = [0.0] * self.k_w
        self.eta_dyn = [0.0] * self.k_w
        self._constants_cache = None

    def _constants(self) -> SsdConstants:
        # Cached: attention() runs once per window and these six device
        # buffers only change in __init__/tune — re-uploading them per
        # call costs avoidable host->device transfers on a tunneled
        # backend. tune_log_normal_priors invalidates the cache.
        if self._constants_cache is not None:
            return self._constants_cache
        self._constants_cache = SsdConstants(
            mu_0=jnp.asarray(self.mu_0, jnp.float32),
            alpha_0=jnp.asarray(self.alpha_0, jnp.float32),
            beta_0=jnp.asarray(self.beta_0, jnp.float32),
            a_0=jnp.float32(self.a_0),
            b_0=jnp.float32(self.b_0),
            lambda_state=jnp.float32(self.lambda_state))
        return self._constants_cache

    def tune(self, r1: Sequence[float], r2: Sequence[float]):
        return self.tune_log_normal_priors(r1, r2)

    def tune_log_normal_priors(self, r1, r2):
        """MLE of the attended/unattended log-normal parameters
        (reference :277-327; r1 MUST be the attended speaker)."""
        abs_r1 = np.absolute(np.asarray(r1) + self._offset)
        abs_r2 = np.absolute(np.asarray(r2) + self._offset)
        n = abs_r1.shape[0]
        u_a = np.sum(abs_r1) / n
        v_a = np.sum((abs_r1 - u_a) ** 2) / n
        rho_a = 1 / np.log(v_a / u_a ** 2 + 1)
        mu_a = np.log(u_a) - 0.5 / rho_a
        u_u = np.sum(abs_r2) / n
        v_u = np.sum((abs_r2 - u_u) ** 2) / n
        rho_u = 1 / np.log(v_u / u_u ** 2 + 1)
        mu_u = np.log(u_u) - 0.5 / rho_u
        self.rho_d = [rho_a, rho_u]
        self.mu_d = [mu_a, mu_u]
        self.mu_0 = [mu_a, mu_u]
        self._constants_cache = None     # mu_0 feeds SsdConstants.
        self._state = self._state._replace(
            mu_d=jnp.asarray(self.mu_d, jnp.float32),
            rho_d=jnp.asarray(self.rho_d, jnp.float32))

    def attention(self, r1, r2):
        """Processes one new correlation pair; returns (p, lower, upper).

        Returns (0.5, 0.5, 0.5) until the fixed-lag window fills
        (reference :442-452 semantics with k_f = 0)."""
        self.calls += 1
        a1 = float(np.abs(np.mean(r1) + self._offset))
        a2 = float(np.abs(np.mean(r2) + self._offset))
        self._r1_buf = np.roll(self._r1_buf, -1)
        self._r1_buf[-1] = a1
        self._r2_buf = np.roll(self._r2_buf, -1)
        self._r2_buf[-1] = a2
        if self.calls < self.k_w:
            return (0.5, 0.5, 0.5)
        new_state, z_window, eta_window = _ssd_update(
            self._state, jnp.asarray(self._r1_buf),
            jnp.asarray(self._r2_buf), self._constants(),
            self.outer_iter, self.inner_iter,
            self.newton_iter, self.k_w)
        self._state = new_state
        # Fixed-lag output: the estimate k_f frames back
        # (reference: z_smoothed[-1 - k_f]).
        z = float(z_window[-1 - self.k_f])
        eta = float(eta_window[-1 - self.k_f])
        self.z_dyn.append(z)
        self.eta_dyn.append(eta)
        # Note: the reference returns (mean, sigmoid(z+c0*s),
        # sigmoid(z-c0*s)) while documenting (mean, lower, upper)
        # (attention_decoder.py:448-451); here the bounds are emitted in
        # the documented order: lower <= mean <= upper.
        half_width = self.c0 * np.sqrt(max(eta, 0.0))
        return (1.0 / (1 + np.exp(-z)),
                1.0 / (1 + np.exp(-(z - half_width))),
                1.0 / (1 + np.exp(-(z + half_width))))


def plot_aad_results(decision: np.ndarray,
                     attention_flag=None, decision_upper=None,
                     decision_lower=None, t=None,
                     xlabel: str = 'Time (frames)',
                     ylabel: str = 'Prob of Speaker 1',
                     title: str = 'AAD Decoding Result',
                     linecolor: str = 'blue'):
    """Plots a decision trace with confidence band + attention shading
    (reference attention_decoder.py:27-113). Does not clear the figure,
    so multiple traces overlay."""
    import itertools
    import matplotlib.pyplot as plt
    from matplotlib import patches

    if not isinstance(decision, np.ndarray):
        raise TypeError('Argument decision must be an np array, not %s' %
                        type(decision))
    for name, arr in [('attention_flag', attention_flag),
                      ('decision_upper', decision_upper),
                      ('decision_lower', decision_lower), ('t', t)]:
        if arr is not None:
            if not isinstance(arr, np.ndarray):
                raise TypeError('Argument %s must be an np array, not %s' %
                                (name, type(arr)))
            if len(decision) != len(arr):
                raise TypeError('Input %s must match length of decision, '
                                'not %d and %d' % (name, len(decision),
                                                   len(arr)))
    if t is None:
        t = np.arange(len(decision))
    plt.plot(t, decision, linecolor)
    plt.xlabel(xlabel)
    plt.ylabel(ylabel)
    plt.title(title)
    if decision_upper is not None and decision_lower is not None:
        plt.fill_between(t, decision_upper, decision_lower,
                         color='light' + linecolor)
    if attention_flag is not None and (np.sum(attention_flag == 0) and
                                       np.sum(attention_flag != 0)):
        axis_limits = plt.axis()
        start_index = 0
        for attention_value, values in itertools.groupby(
                list(attention_flag)):
            duration = len(list(values))
            if attention_value:
                rect = patches.Rectangle(
                    (t[start_index], axis_limits[2]),
                    t[start_index + duration - 1] - t[start_index],
                    axis_limits[3] - axis_limits[2],
                    facecolor='lightgray', alpha=0.5)
                plt.gca().add_patch(rect)
            start_index += duration


def create_attention_decoder(type_name: str, window_step: int = 100,
                             frame_rate: float = 100.0,
                             ssd_offset: float = 0.0) -> AttentionDecoder:
    """Factory (reference attention_decoder.py:455-485 semantics)."""
    if type_name == 'wta':
        return AttentionDecoder()
    if type_name in ('stepped', 'step'):
        return StepAttentionDecoder()
    if type_name == 'ssd':
        fs_corr = window_step * float(frame_rate) / 2.0
        return StateSpaceAttentionDecoder(20, 1, 10, fs_corr,
                                          offset=ssd_offset)
    raise ValueError('Unknown type (%s) requested from '
                     'create_attention_decoder' % type_name)
