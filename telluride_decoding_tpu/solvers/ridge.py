"""Ridge / shrinkage linear regression from streamed moments.

Capability parity with the reference solver
calculate_linear_regressor_parameters_from_dataset
(brain_model.py:384-481), re-designed for TPUs: sufficient statistics are
accumulated on device (ops.covariance), and the regularized solve — for
one lambda or a whole vmapped grid of lambdas from a *single* covariance
pass — runs as jnp.linalg.solve on device. Regularization modes:

  * ridge (use_ridge=True): cov += lamb * I (the reference default).
  * shrinkage (use_ridge=False): Blankertz et al. 2011 eq. 12, shrinking
    eigenvalues toward the mean; lamb == -1 selects the Ledoit-Wolf
    automatic shrinkage (reference brain_model.py:457-476).

The augmented-column trick (appending a 1s column for the bias,
brain_model.py:434-436) is reproduced algebraically from centered
moments, so accumulation stays well conditioned in float32 while the
solved system is exactly the reference's.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from telluride_decoding_tpu.ops.covariance import (
    MomentStats,
    blocked_moments,
    moments_from_arrays,
)


class RidgeSolution(NamedTuple):
    w: jax.Array          # [Dx, Dy] weights
    b: jax.Array          # [Dy] bias
    cov_x: jax.Array      # regularized input covariance (augmented)
    cov_xy: jax.Array     # input/output cross covariance (augmented)
    shrinkage: jax.Array  # effective shrinkage/regularization used


def _augmented_moments(stats: MomentStats):
    """Rebuilds the reference's augmented (x|1) moment matrices.

    With z = [x, 1]: sum z^T z = [[sxx, sum_x^T], [sum_x, n]] and
    sum z^T y = [[sxy], [sum_y]].
    """
    n = stats.count
    sxx = stats.sxx
    sx = stats.sum_x[:, None]
    top = jnp.concatenate([sxx, sx], axis=1)
    bot = jnp.concatenate([sx.T, n[None, None]], axis=1)
    szz = jnp.concatenate([top, bot], axis=0)
    szy = jnp.concatenate([stats.sxy, stats.sum_y[None, :]], axis=0)
    return szz, szy


def solve_ridge_from_moments(stats: MomentStats,
                             lamb: jax.Array | float = 0.1,
                             use_offset: bool = True,
                             use_ridge: bool = True,
                             sum_x2tx2: Optional[jax.Array] = None
                             ) -> RidgeSolution:
    """Solves the regularized normal equations from MomentStats.

    Pure function of (stats, lamb) — vmap over ``lamb`` to sweep a whole
    regularization grid from one data pass (the algorithmic win the
    reference misses by re-reading data per lambda, regression.py:381-409).
    """
    n = stats.count
    if use_offset:
        szz, szy = _augmented_moments(stats)
    else:
        szz, szy = stats.sxx, stats.sxy
    cov_x = szz / n
    cov_xy = szy / n
    n_col = cov_x.shape[0]
    eye = jnp.eye(n_col, dtype=cov_x.dtype)

    mean_aug = (jnp.concatenate([stats.sum_x, n[None]]) / n if use_offset
                else stats.sum_x / n)
    # Eigenvalue-mean target for the Blankertz/LW blend, from the
    # NORMALIZED centered covariance. The reference blends the
    # normalized cov_x with a mu computed from the UNNORMALIZED
    # scatter (brain_model.py:450-453 vs :476) — a scale mismatch
    # that makes the identity term ~N times the covariance, so any
    # shrinkage (fixed or auto) collapses the solved weights toward
    # zero. Deliberate deviation: consistent normalization.
    czc = szz / n - jnp.outer(mean_aug, mean_aug)
    mu_n = jnp.trace(czc) / n_col

    lamb = jnp.asarray(lamb, cov_x.dtype)
    if use_ridge:
        cov_r = cov_x + lamb * eye
        shrinkage = lamb
    else:
        if sum_x2tx2 is not None:
            # Ledoit-Wolf automatic shrinkage (lamb == -1 path). The
            # reference (brain_model.py:457-465) applies the LW formula
            # to *unnormalized* scatter sums, which degenerates for
            # large N; here all quantities are normalized per the paper
            # (and sklearn), and the result is clipped to [0, 1].
            delta = jnp.sum((czc - mu_n * eye) ** 2) / n_col
            # Ledoit-Wolf (sklearn form): beta_ =
            #   (sum(Xc^2' Xc^2)/n - ||S||_F^2) / (p * n).
            beta_ = (jnp.sum(sum_x2tx2) / n -
                     jnp.sum(czc ** 2)) / (n_col * n)
            beta = jnp.minimum(beta_, delta)
            auto = jnp.clip(beta / jnp.maximum(delta, 1e-30), 0.0, 1.0)
            shrinkage = jnp.where(lamb == -1, auto, lamb)
        else:
            # No sum_x2tx2: the -1 auto sentinel cannot be honored;
            # clamp into the valid shrinkage range (so -1 degrades to
            # 0 = no shrinkage rather than a non-PSD blend).
            shrinkage = jnp.clip(lamb, 0.0, 1.0)
        # Blankertz eq. 12: shrink eigenvalues toward the mean.
        cov_r = (1.0 - shrinkage) * cov_x + shrinkage * mu_n * eye

    solution = jnp.linalg.solve(cov_r, cov_xy)
    if use_offset:
        w = solution[:-1, :]
        b = solution[-1, :]
    else:
        w = solution
        b = jnp.zeros((szy.shape[1],), solution.dtype)
    return RidgeSolution(w=w, b=b, cov_x=cov_r, cov_xy=cov_xy,
                         shrinkage=shrinkage)


def calculate_linear_regressor_parameters(x, y, lamb=0.1,
                                          use_offset: bool = True,
                                          use_ridge: bool = True,
                                          block: int = 8192
                                          ) -> RidgeSolution:
    """End-to-end ridge fit for in-memory arrays (one jittable program).

    Matches the reference function of the same-ish name
    (brain_model.py:384-481) for the ridge and shrinkage paths. For the
    Ledoit-Wolf automatic path (lamb == -1) the centering uses the final
    mean (the reference uses a running mean mid-stream, an
    order-dependent approximation; with in-memory data the exact version
    is both cheaper and better).
    """
    if not use_ridge and isinstance(lamb, (int, float)) and \
            lamb != -1 and not 0 <= lamb <= 1:
        # Shrinkage interpolates eigenvalues toward their mean; outside
        # [0, 1] the blended matrix is not a covariance (reference
        # brain_model.py:466-469 raises the same way).
        raise ValueError('Regularization lambda must be between 0 and '
                         '1, not %g.' % lamb)
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if x.shape[0] > block:
        stats = blocked_moments(x, y, block=block)
    else:
        stats = moments_from_arrays(x, y)

    sum_x2tx2 = None
    # The O(N D^2) centered-squares pass only feeds the Ledoit-Wolf
    # automatic shrinkage; a fixed scalar lamb never selects it.
    if not use_ridge and (not isinstance(lamb, (int, float)) or
                          lamb == -1):
        mean_x = stats.sum_x / stats.count
        xc2 = (x - mean_x[None, :]) ** 2
        if use_offset:
            # The reference's augmented column contributes a centered
            # column of (1 - mean(1))^2 = 0's.
            xc2 = jnp.concatenate(
                [xc2, jnp.zeros((x.shape[0], 1), x.dtype)], axis=1)
        sum_x2tx2 = jnp.dot(xc2.T, xc2, preferred_element_type=jnp.float32)

    return solve_ridge_from_moments(stats, lamb=lamb, use_offset=use_offset,
                                    use_ridge=use_ridge,
                                    sum_x2tx2=sum_x2tx2)
