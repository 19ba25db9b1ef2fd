"""Pearson correlation primitives as fused XLA reductions.

Capability parity with the reference metrics
(telluride_decoding/brain_model.py:34-126 and utils.py:27-59), re-designed
as pure jax functions: one fused pass over the data, no python control
flow, safe for jit/vmap/grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 0.0  # The reference zeroes the result if total power is <= 0.


def pearson_correlation(x: jax.Array, y: jax.Array) -> jax.Array:
    """Column-wise Pearson correlation between two [N, D] arrays.

    Returns a length-D vector of per-column correlations. If either
    side has zero total power (in the product over columns, matching the
    reference's guard in brain_model.py:75-79) the result is all zeros.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if x.ndim == 1:
        x = x[:, None]
    if y.ndim == 1:
        y = y[:, None]
    if x.shape[-1] != y.shape[-1]:
        # The reference asserts equal widths (brain_model.py:60-62);
        # silently broadcasting would return plausible-looking garbage.
        raise ValueError('pearson_correlation needs equal widths, got '
                         '%s vs %s.' % (x.shape, y.shape))
    x_m = x - jnp.mean(x, axis=0)
    y_m = y - jnp.mean(y, axis=0)
    x_p = jnp.sum(jnp.square(x_m), axis=0)
    y_p = jnp.sum(jnp.square(y_m), axis=0)
    denom = jnp.sqrt(x_p) * jnp.sqrt(y_p)
    corr = jnp.sum(x_m * y_m, axis=0) / jnp.where(denom <= _EPS, 1.0, denom)
    # The reference zeroes everything when prod(power) <= 0
    # (brain_model.py:75-79, float64 numpy); in jitted float32 that
    # product under/overflows for many columns, so test the intent
    # directly: does any column lack power?
    zero_cond = jnp.logical_or(jnp.any(x_p <= 0), jnp.any(y_p <= 0))
    return jnp.where(zero_cond, jnp.zeros_like(corr), corr)


def pearson_correlation_first(x: jax.Array, y: jax.Array) -> jax.Array:
    """Correlation of the first output dimension (reference metric)."""
    return pearson_correlation(x, y)[0]


def pearson_correlation_second(x: jax.Array, y: jax.Array) -> jax.Array:
    """Correlation of the second output dimension (reference metric)."""
    x = jnp.asarray(x)
    # Normalize FIRST: a 1-D x expands to [N, 1] inside
    # pearson_correlation, so without this the [1] index would clamp
    # to dimension 0 and silently return the first-dim correlation —
    # exactly the case the guard exists for (the reference errors).
    if x.ndim == 1:
        x = x[:, None]
    if x.shape[-1] < 2:
        raise ValueError('pearson_correlation_second needs >= 2 output '
                         'dimensions, got shape %s.' % (x.shape,))
    return pearson_correlation(x, y)[1]


def pearson_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-frame negative-correlation contributions (a trainable loss).

    Mirrors the reference PearsonCorrelationLoss (brain_model.py:94-126):
    returns a vector of per-frame *negative* correlation contributions;
    summing it over the batch gives minus the total batch correlation.
    Differentiable; usable directly with optax.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if x.ndim == 1:
        x = x[:, None]
    if y.ndim == 1:
        y = y[:, None]
    if x.shape != y.shape:
        # Mismatched shapes would silently broadcast x_m * y_m to an
        # [N, N] outer product (the reference raises here too,
        # brain_model.py:115-117).
        raise ValueError('x and y must have the same shape for the '
                         'Pearson loss, not %s vs %s.' %
                         (x.shape, y.shape))
    x_m = x - jnp.mean(x, axis=0)
    y_m = y - jnp.mean(y, axis=0)
    x_p = jnp.sum(jnp.square(x_m), axis=0)
    y_p = jnp.sum(jnp.square(y_m), axis=0)
    power = jnp.sqrt(x_p * y_p)
    return -jnp.sum((x_m * y_m) / power, axis=-1)


def correlation_matrix(x: jax.Array, y: jax.Array) -> jax.Array:
    """Full cross-correlation matrix of the columns of [x | y].

    Equivalent of the reference pearson_correlation_graph (utils.py:27-59):
    concatenates x and y column-wise and returns the (Dx+Dy)^2 correlation
    matrix, computed as one MXU matmul of the standardized data.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if x.ndim == 1:
        x = x[:, None]
    if y.ndim == 1:
        y = y[:, None]
    xy = jnp.concatenate([x, y], axis=1)
    n = xy.shape[0]
    xy_m = xy - jnp.mean(xy, axis=0, keepdims=True)
    # precision=HIGHEST is load-bearing on TPU (same class of fix as
    # ops/covariance.py and signal/filters.py): default bf16-truncated
    # operands cost ~1e-3 relative error against the reference's
    # float64 numpy matrix (reference utils.py:27-59).
    cov = jnp.dot(xy_m.T, xy_m / (n - 1.0),
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    inv_std = jax.lax.rsqrt(jnp.diagonal(cov))
    return cov * inv_std[:, None] * inv_std[None, :]
