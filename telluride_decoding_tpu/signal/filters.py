"""IIR (biquad cascade) filtering as a parallel associative scan.

The reference filters EEG with scipy's sequential sosfilt
(preprocess.py:293-352). A direct translation would be a lax.scan over
frames — a sequential recurrence that leaves the TPU idle. Instead,
each biquad (direct form II transposed, scipy-compatible) is an affine
state recurrence

    z[n+1] = M z[n] + k x[n],   y[n] = b0 x[n] + z1[n]

with constant M = [[-a1, 1], [-a2, 0]] and k = [b1 - a1 b0,
b2 - a2 b0]. Affine recurrences compose associatively, so the whole
filter runs as jax.lax.associative_scan over (M, k x[n]) pairs —
O(log N) depth, fully parallel over frames and channels, bit-matching
scipy.signal.sosfilt to float tolerance. Sections of the cascade run
sequentially (there are only a handful).

Filter design (Butterworth -> SOS) is delegated to scipy on the host:
it is a tiny one-time computation producing static coefficients.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal


def butter_sos(order: int, cutoff, btype: str, fs: float) -> np.ndarray:
    """Butterworth design returning second-order sections [S, 6]."""
    return scipy.signal.butter(order, cutoff, btype, output='sos',
                               fs=fs).astype(np.float64)


def sosfilt_zi(sos: np.ndarray) -> np.ndarray:
    """Steady-state initial conditions (scipy.signal.sosfilt_zi)."""
    return scipy.signal.sosfilt_zi(np.asarray(sos, np.float64))


def _biquad_apply(section, x, zi):
    """One DF2T biquad over [N, C] via associative scan.

    section: [6] = (b0, b1, b2, a0, a1, a2), a0 == 1.
    zi: [2, C] initial state. Returns (y [N, C], zf [2, C]).
    """
    b0, b1, b2, _, a1, a2 = [section[i] for i in range(6)]
    n = x.shape[0]
    m = jnp.array([[-a1, 1.0], [-a2, 0.0]], x.dtype)        # [2, 2]
    k = jnp.stack([b1 - a1 * b0, b2 - a2 * b0])              # [2]

    # Elements: (M_n, v_n) with v_n = k * x[n]  -> [N, 2, C].
    v = k[None, :, None] * x[:, None, :]
    ms = jnp.broadcast_to(m, (n, 2, 2))

    # precision=HIGHEST is load-bearing: the TPU default (bf16 matmul
    # inputs) compounds multiplicatively over the recurrence and puts
    # the filter ~0.25 absolute off scipy; full precision restores
    # ~1e-6 parity. These are 2x2 matmuls — the cost is irrelevant.
    highest = jax.lax.Precision.HIGHEST

    def combine(left, right):
        m1, v1 = left
        m2, v2 = right
        return (jnp.einsum('nij,njk->nik', m2, m1, precision=highest),
                jnp.einsum('nij,njc->nic', m2, v1,
                           precision=highest) + v2)

    cm, cv = jax.lax.associative_scan(combine, (ms, v))
    # State BEFORE consuming x[n]: z[0] = zi; z[n] = cm[n-1] zi + cv[n-1].
    z_after = jnp.einsum('nij,jc->nic', cm, zi,
                         precision=highest) + cv             # z[1..N]
    z_before = jnp.concatenate([zi[None], z_after[:-1]], axis=0)
    y = b0 * x + z_before[:, 0, :]
    return y, z_after


# Recordings rarely share exact lengths, and every distinct jitted
# shape costs a fresh XLA compile (~5-60 s through a remote TPU
# tunnel). Pad the frame axis to this quantum and gather the true-end
# state instead: one compile serves a whole ragged cohort. Causality
# makes the padding inert — y[:n] and the state at n-1 cannot depend
# on the zero frames appended after them.
_FRAME_BUCKET = 4096


@jax.jit
def _sosfilt_core(sos: jax.Array, x: jax.Array, zi: jax.Array,
                  n_true: jax.Array):
    y = x
    zfs = []
    # Cascade sections sequentially (S is small and static).
    for s in range(sos.shape[0]):
        y, z_all = _biquad_apply(sos[s], y, zi[s])
        zfs.append(z_all[n_true - 1])     # State at the TRUE end.
    return y, jnp.stack(zfs)


def sosfilt(sos, x, zi: Optional[jax.Array] = None
            ) -> Tuple[jax.Array, jax.Array]:
    """Filters [N, C] data through an SOS cascade.

    Matches scipy.signal.sosfilt(sos, x, zi=zi, axis=0): returns
    (filtered [N, C], final state [S, 2, C]). ``zi`` defaults to zeros.
    Computation runs in float64-when-enabled or float32 on device; for
    the EEG passbands used here float32 matches scipy to ~1e-4.
    """
    sos = jnp.asarray(sos, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 1:
        x = x[:, None]
    if zi is None:
        zi = jnp.zeros((sos.shape[0], 2, x.shape[1]), x.dtype)
    else:
        zi = jnp.asarray(zi, x.dtype)
    n = x.shape[0]
    padded_n = max(-(-n // _FRAME_BUCKET) * _FRAME_BUCKET, _FRAME_BUCKET)
    if padded_n != n:
        x = jnp.pad(x, ((0, padded_n - n), (0, 0)))
    y, zf = _sosfilt_core(sos, x, zi, jnp.asarray(n, jnp.int32))
    return y[:n], zf


def streaming_state_init(sos: np.ndarray, first_frame: np.ndarray
                         ) -> np.ndarray:
    """Step-response state scaled by the first frame (the reference's
    reset semantics, preprocess.py:293-303): avoids filter onset
    transients when a recording starts at a DC offset."""
    zi = sosfilt_zi(sos)                                     # [S, 2]
    return zi[:, :, None] * np.asarray(first_frame)[None, None, :]
