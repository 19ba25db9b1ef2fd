"""Canonical correlation analysis on device.

Capability parity with the reference CCA solver
calculate_cca_parameters_from_dataset (cca.py:272-369) and the
differentiable deep-CCA objective cca_loss (cca.py:372-443), re-designed
for TPUs:

  * covariances come from one streamed MXU pass (ops.covariance);
  * whitening uses jnp.linalg.eigh on the symmetrized SPD covariances
    (the reference uses unsymmetric np.linalg.eig, which can return
    complex vectors; eigh is the numerically correct choice for SPD
    matrices and keeps everything real on device);
  * small-eigenvalue dimensions are suppressed by zeroing 1/sqrt(e)
    instead of dynamically dropping columns, which is algebraically
    identical in the whitening product and keeps shapes static for jit;
  * cca_loss is a pure differentiable jax function, usable as an optax
    loss for DCCA towers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from telluride_decoding_tpu.ops.covariance import (
    MomentStats,
    blocked_moments,
    moments_from_arrays,
)


class CcaSolution(NamedTuple):
    rot_x: jax.Array   # [Dx, dim]
    rot_y: jax.Array   # [Dy, dim]
    mean_x: jax.Array  # [1, Dx]
    mean_y: jax.Array  # [1, Dy]
    eigenvalues: jax.Array  # [dim] canonical correlations


def _inv_sqrt_psd(cov: jax.Array, eps_eig: float) -> jax.Array:
    """Returns cov^{-1/2} for an SPD matrix, zeroing tiny eigen-dims."""
    cov = 0.5 * (cov + cov.T)
    vals, vecs = jnp.linalg.eigh(cov)
    inv_sqrt = jnp.where(vals > eps_eig, jax.lax.rsqrt(jnp.maximum(vals,
                                                                   eps_eig)),
                         0.0)
    return jnp.matmul(vecs * inv_sqrt[None, :], vecs.T,
                      precision=jax.lax.Precision.HIGHEST)


def cca_covariances_from_stats(stats: MomentStats):
    """The reference's CCA covariance normalization, in ONE place.

    The quirk (reference cca.py:337-343): covariance sums divide by
    (N - 1) while the subtracted mean outer products use the /N means
    — NOT the textbook unbiased estimator. This helper is the single
    source of that parity-critical arithmetic; solve_cca_from_moments
    and both of the sweep engine's CCA grid programs call it, so a
    parity fix here cannot silently diverge from the sweep
    (un-symmetrized: callers symmetrize where their factorization
    needs it, after adding their own lamb*I).

    Returns (mean_x, mean_y, cov_xx, cov_yy, cov_xy).
    """
    n = stats.count
    mean_x = stats.sum_x / n
    mean_y = stats.sum_y / n
    denom = n - 1.0
    cov_xx = stats.sxx / denom - jnp.outer(mean_x, mean_x)
    cov_yy = stats.syy / denom - jnp.outer(mean_y, mean_y)
    cov_xy = stats.sxy / denom - jnp.outer(mean_x, mean_y)
    return mean_x, mean_y, cov_xx, cov_yy, cov_xy


def solve_cca_from_moments(stats: MomentStats, dim: int,
                           regularization: float = 0.1,
                           eps_eig: float = 1e-12) -> CcaSolution:
    """CCA rotations from sufficient statistics (jit/vmap friendly).

    Normalization follows the reference (cca.py:337-343) via
    cca_covariances_from_stats, then regularizes by
    ``regularization * I``.
    """
    (mean_x, mean_y, cov_xx, cov_yy,
     cov_xy) = cca_covariances_from_stats(stats)
    cov_xx = cov_xx + regularization * jnp.eye(cov_xx.shape[0],
                                               dtype=cov_xx.dtype)
    cov_yy = cov_yy + regularization * jnp.eye(cov_yy.shape[0],
                                               dtype=cov_yy.dtype)

    highest = jax.lax.Precision.HIGHEST
    k11 = _inv_sqrt_psd(cov_xx, eps_eig)
    k22 = _inv_sqrt_psd(cov_yy, eps_eig)
    t = jnp.matmul(jnp.matmul(k11, cov_xy, precision=highest), k22,
                   precision=highest)
    u, e, vt = jnp.linalg.svd(t, full_matrices=False)
    v = vt.T
    rot_x = jnp.matmul(k11, u[:, :dim], precision=highest)
    rot_y = jnp.matmul(k22, v[:, :dim], precision=highest)
    return CcaSolution(rot_x=rot_x, rot_y=rot_y,
                       mean_x=mean_x[None, :], mean_y=mean_y[None, :],
                       eigenvalues=e[:dim])


def calculate_cca_parameters(x, y, dim: int, regularization: float = 0.1,
                             eps_eig: float = 1e-12,
                             block: int = 8192) -> CcaSolution:
    """End-to-end CCA fit for in-memory [N, Dx] / [N, Dy] arrays.

    Note the mean normalization quirk of the reference (cca.py:337-339):
    means are sums over *all* frames divided by total_frames, while
    covariance sums are divided by N-1; both reproduced here.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if x.shape[0] > block:
        stats = blocked_moments(x, y, block=block, want_syy=True)
    else:
        stats = moments_from_arrays(x, y, want_syy=True)
    return solve_cca_from_moments(stats, dim, regularization, eps_eig)


def apply_cca(solution: CcaSolution, x: jax.Array,
              y: jax.Array) -> jax.Array:
    """Rotates two inputs and concatenates, like BrainCcaLayer.call
    (cca.py:150-161)."""
    rx = (x - solution.mean_x) @ solution.rot_x
    ry = (y - solution.mean_y) @ solution.rot_y
    return jnp.concatenate([rx, ry], axis=1)


def cca_loss(x: jax.Array, y: jax.Array, dim: int,
             rcov1: float, rcov2: float,
             eps_eig: float = 1e-12) -> jax.Array:
    """Differentiable estimate of the number of shared CCA dimensions.

    Port of the Deep-CCA objective (reference cca.py:372-443, after
    Andrew et al. 2013): returns the sum of the top-``dim`` canonical
    correlations of the batch; negate it for a minimizable loss.
    """
    x = x - jnp.mean(x, axis=0, keepdims=True)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    batch_norm = x.shape[0] - 1.0
    highest = jax.lax.Precision.HIGHEST
    cov_xx = jnp.matmul(x.T, x, precision=highest) / batch_norm + \
        rcov1 * jnp.eye(x.shape[1], dtype=x.dtype)
    cov_yy = jnp.matmul(y.T, y, precision=highest) / batch_norm + \
        rcov2 * jnp.eye(y.shape[1], dtype=y.dtype)
    cov_xy = jnp.matmul(x.T, y, precision=highest) / batch_norm
    k11 = _inv_sqrt_psd(cov_xx, eps_eig)
    k22 = _inv_sqrt_psd(cov_yy, eps_eig)
    t = jnp.matmul(jnp.matmul(k11, cov_xy, precision=highest), k22,
                   precision=highest)
    # Eigenvalues of T T^T are the squared canonical correlations; eigh
    # returns ascending order, so the last `dim` are the top ones.
    vals = jnp.linalg.eigh(jnp.matmul(t, t.T, precision=highest))[0]
    return jnp.sum(jnp.sqrt(jnp.maximum(0.0, vals[-dim:])))
