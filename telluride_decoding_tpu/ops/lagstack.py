"""Temporal lag-window context stacking.

The central data transform of the framework: each frame of a [N, C]
signal is concatenated with its ``pre`` preceding and ``post`` following
frames (zero padded at the edges), producing [N, (pre+1+post)*C]. This
reproduces the reference's tf.signal.frame windowing semantics
(brain_data.py:425-457) exactly: row n is
``concat(padded[n], padded[n+1], ..., padded[n+pre+post])`` where
``padded`` has ``pre`` zero rows prepended and ``post`` appended, so the
current frame sits at block index ``pre``.

Two implementations:
  * lag_stack_reference: stack of static shifted slices — pure XLA,
    fuses into downstream matmuls, differentiable. Default.
  * lag_stack_pallas: a Pallas TPU kernel that materializes the stacked
    matrix tile-by-tile out of VMEM (prev/cur/next aligned input tiles,
    static in-tile shifts, branch-free edge masking), for the fused
    preprocessing path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stacked_width(channels: int, pre: int, post: int) -> int:
    return channels * (pre + 1 + post)


def lag_stack_np(x, pre: int, post: int):
    """Host-side (numpy) lag stacking with identical semantics.

    Used by the data-assembly layer before device upload; per-file so
    context never crosses file boundaries. Uses stride tricks: one zero
    pad + a strided [N, total, C] view reshaped to [N, total*C].
    """
    import numpy as np
    x = np.ascontiguousarray(x)
    if x.ndim == 1:
        x = x[:, None]
    if pre == 0 and post == 0:
        return x
    n, c = x.shape
    padded = np.zeros((pre + n + post, c), x.dtype)
    padded[pre:pre + n] = x
    total = pre + 1 + post
    s0, s1 = padded.strides
    view = np.lib.stride_tricks.as_strided(
        padded, shape=(n, total, c), strides=(s0, s0, s1), writeable=False)
    return view.reshape(n, total * c)


def lag_stack_reference(x: jax.Array, pre: int, post: int) -> jax.Array:
    """Zero-padded lag stacking via shifted slices (pure XLA)."""
    x = jnp.asarray(x)
    if pre == 0 and post == 0:
        return x
    n, c = x.shape
    padded = jnp.pad(x, ((pre, post), (0, 0)))
    cols = [jax.lax.dynamic_slice_in_dim(padded, k, n, axis=0)
            for k in range(pre + 1 + post)]
    return jnp.concatenate(cols, axis=1)


def _lag_stack_kernel(cur_ref, next_ref, out_ref, *,
                      pre: int, post: int, block: int):
    """Writes one [block, (pre+1+post)*C] tile of the stacked output.

    The input was zero-padded with ``pre`` front rows (so padded row
    p = original row p - pre) and enough back rows; output row r's
    lag-k value is padded row r + k, always inside cur|next for
    pre + post < block. Branch-free: no masks, just static slices —
    this keeps the Mosaic lowering trivial and fast to compile.
    """
    total = pre + 1 + post
    full = jnp.concatenate([cur_ref[:], next_ref[:]], axis=0)
    # pltpu.roll keeps each shifted copy sublane-aligned, so the lane
    # concatenation lowers cleanly (plain row slices at odd offsets
    # don't: "offset mismatch on non-concat dimension").
    rows = full.shape[0]
    cols = [jax.lax.slice_in_dim(
        pltpu.roll(full, (rows - k) % rows, 0), 0, block, axis=0)
        for k in range(total)]
    out_ref[:] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("pre", "post", "block"))
def lag_stack_pallas(x: jax.Array, pre: int, post: int,
                     block: int = 512) -> jax.Array:
    """Pallas TPU kernel version of lag_stack_reference."""
    x = jnp.asarray(x, jnp.float32)
    if pre == 0 and post == 0:
        return x
    n, c = x.shape
    total = pre + 1 + post
    if total >= block:
        block = total + 1
    num_blocks = (n + block - 1) // block
    # Front pad: pre zero-context rows. Back pad: post zeros + slack so
    # the last tile's `next` block exists.
    back = (num_blocks + 1) * block - (pre + n)
    xp = jnp.pad(x, ((pre, back), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_lag_stack_kernel, pre=pre, post=post,
                          block=block),
        out_shape=jax.ShapeDtypeStruct((num_blocks * block, total * c),
                                       jnp.float32),
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, c), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, total * c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(xp, xp)
    return out[:n]


def lag_stack(x: jax.Array, pre: int, post: int, *,
              use_pallas: bool = False) -> jax.Array:
    """Temporal context stacking; see module docstring for semantics."""
    if use_pallas:
        return lag_stack_pallas(x, pre, post)
    return lag_stack_reference(x, pre, post)
