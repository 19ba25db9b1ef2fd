"""Streaming second-moment accumulation on the MXU.

The reference accumulates X^T X / X^T Y per python minibatch on the host
(brain_model.py:429-444, cca.py:311-332) — a device->host round trip per
batch. Here the whole accumulation is one jitted program: data stays on
device, chunks stream through the MXU via lax.scan (so arbitrarily long
recordings never materialize a [N, D] x [N, D] product at once), and the
result is a small MomentStats pytree that downstream solvers consume.

Under a mesh, per-shard MomentStats simply add (psum) — this is the
data-parallel story for every deterministic solver in the framework.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class MomentStats(NamedTuple):
    """Sufficient statistics for (cross-)covariance based solvers.

    All sums are over frames (axis 0) and unnormalized:
      count  : scalar number of frames
      sum_x  : [Dx]           sum of x
      sum_y  : [Dy]           sum of y
      sxx    : [Dx, Dx]       sum of x^T x
      syy    : [Dy, Dy]       sum of y^T y  (optional; zeros if not needed)
      sxy    : [Dx, Dy]       sum of x^T y
    """

    count: jax.Array
    sum_x: jax.Array
    sum_y: jax.Array
    sxx: jax.Array
    syy: jax.Array
    sxy: jax.Array

    def __add__(self, other: "MomentStats") -> "MomentStats":
        return jax.tree.map(jnp.add, self, other)

    @property
    def mean_x(self) -> jax.Array:
        return self.sum_x / self.count

    @property
    def mean_y(self) -> jax.Array:
        return self.sum_y / self.count

    # NOTE: no centered() helper on purpose. The solvers normalize
    # their covariances with the reference's exact (quirky) algebra —
    # e.g. cca.py uses sxx/(n-1) - outer(mean, mean), which is NOT the
    # textbook centered scatter over n-1 — so a generic helper here
    # would be a value-parity trap.


def zeros_moments(dx: int, dy: int, dtype=jnp.float32) -> MomentStats:
    return MomentStats(
        count=jnp.zeros((), dtype),
        sum_x=jnp.zeros((dx,), dtype),
        sum_y=jnp.zeros((dy,), dtype),
        sxx=jnp.zeros((dx, dx), dtype),
        syy=jnp.zeros((dy, dy), dtype),
        sxy=jnp.zeros((dx, dy), dtype),
    )


def pad_to_bucket(arrays: Sequence[np.ndarray], n: int, bucket: int
                  ) -> Tuple[list, np.ndarray]:
    """Zero-pads host [N_i, D] arrays to the next ``bucket`` multiple
    of rows and returns (padded_list, valid) with valid the [padded]
    0/1 mask of the first ``n`` rows.

    Bucketing quantizes lengths so similar-length files share ONE
    compiled program (each distinct length would otherwise recompile —
    seconds per shape over a remote-compile link); the mask keeps the
    masked statistics exact. Shared by the streaming-fit paths (DCCA
    tower moments, batchnorm population stats) and the sweep engine's
    bounded-memory moments regime.
    """
    padded_n = -(-max(n, 1) // bucket) * bucket
    out = []
    for a in arrays:
        p = np.zeros((padded_n, a.shape[1]), np.float32)
        p[:n] = np.asarray(a[:n], np.float32)
        out.append(p)
    valid = (np.arange(padded_n) < n).astype(np.float32)
    return out, valid


def _chunk_moments(x: jax.Array, y: jax.Array,
                   want_syy: bool) -> MomentStats:
    n = x.shape[0]
    dtype = jnp.float32
    xf = x.astype(dtype)
    yf = y.astype(dtype)
    highest = jax.lax.Precision.HIGHEST  # Solver-grade accuracy: the
    # TPU default (bf16 operands) costs ~1e-3 relative error in X^T X,
    # which visibly degrades ridge recovery and CCA eigenvalues.
    syy = (jnp.dot(yf.T, yf, preferred_element_type=dtype,
                   precision=highest)
           if want_syy else jnp.zeros((y.shape[1], y.shape[1]), dtype))
    return MomentStats(
        count=jnp.asarray(n, dtype),
        sum_x=jnp.sum(xf, axis=0),
        sum_y=jnp.sum(yf, axis=0),
        sxx=jnp.dot(xf.T, xf, preferred_element_type=dtype,
                    precision=highest),
        syy=syy,
        sxy=jnp.dot(xf.T, yf, preferred_element_type=dtype,
                    precision=highest),
    )


def moments_from_arrays(x: jax.Array, y: jax.Array, *,
                        want_syy: bool = False) -> MomentStats:
    """One-shot moment computation for in-memory [N, D] arrays."""
    return _chunk_moments(jnp.asarray(x), jnp.asarray(y), want_syy)


def blocked_moments(x: jax.Array, y: jax.Array, *,
                    block: int = 8192,
                    want_syy: bool = False,
                    valid: Optional[jax.Array] = None) -> MomentStats:
    """Moment accumulation over blocks of frames via lax.scan.

    Keeps peak memory at O(block * D) while feeding the MXU with large
    matmuls. ``valid`` is an optional [N] 0/1 mask (frames with 0 are
    excluded) which lets callers pad N to a block multiple while keeping
    exact statistics — the key to static shapes under jit.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n, dx = x.shape
    dy = y.shape[1]
    if valid is None:
        valid = jnp.ones((n,), jnp.float32)
    else:
        valid = jnp.asarray(valid, jnp.float32)

    pad = (-n) % block
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        y = jnp.pad(y, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    num_blocks = x.shape[0] // block
    xb = x.reshape(num_blocks, block, dx)
    yb = y.reshape(num_blocks, block, dy)
    vb = valid.reshape(num_blocks, block, 1)

    def step(carry: MomentStats, blk):
        bx, by, bv = blk
        bx = bx * bv
        by = by * bv
        stats = _chunk_moments(bx, by, want_syy)
        stats = stats._replace(count=jnp.sum(bv))
        return carry + stats, None

    init = zeros_moments(dx, dy)
    total, _ = jax.lax.scan(step, init, (xb, yb, vb))
    return total
