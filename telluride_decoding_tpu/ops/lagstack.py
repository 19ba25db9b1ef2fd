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


def _lag_stack_kernel(prev_ref, cur_ref, next_ref, out_ref, *,
                      pre: int, post: int, block: int, n: int):
    """Writes one [block, (pre+1+post)*C] tile of the stacked output.

    prev/cur/next are three consecutive aligned [block, C] tiles of the
    input; output row r's lag-k block reads input row r + k - pre, which
    for pre, post <= block always falls inside their concatenation.
    Edge behavior (zero context outside [0, n)) is a branch-free mask.
    """
    i = pl.program_id(0)
    c = cur_ref.shape[1]
    total = pre + 1 + post
    base = i * block  # first output row of this tile
    row = jax.lax.broadcasted_iota(jnp.int32, (block, c), 0) + base
    full = jnp.concatenate([prev_ref[:], cur_ref[:], next_ref[:]], axis=0)
    for k in range(total):
        off = block + k - pre  # static offset into `full`
        src = jax.lax.slice_in_dim(full, off, off + block, axis=0)
        in_row = row + (k - pre)
        valid = jnp.logical_and(in_row >= 0, in_row < n)
        out_ref[:, k * c:(k + 1) * c] = jnp.where(valid, src, 0.0)


@functools.partial(jax.jit, static_argnames=("pre", "post", "block"))
def lag_stack_pallas(x: jax.Array, pre: int, post: int,
                     block: int = 512) -> jax.Array:
    """Pallas TPU kernel version of lag_stack_reference."""
    x = jnp.asarray(x, jnp.float32)
    if pre == 0 and post == 0:
        return x
    n, c = x.shape
    if pre > block or post > block:
        block = max(pre, post)
    total = pre + 1 + post
    pad_n = (-n) % block
    xp = jnp.pad(x, ((0, pad_n), (0, 0)))
    num_blocks = xp.shape[0] // block
    grid = (num_blocks,)

    def prev_map(i):
        return (jnp.maximum(i - 1, 0), 0)

    def cur_map(i):
        return (i, 0)

    def next_map(i):
        return (jnp.minimum(i + 1, num_blocks - 1), 0)

    tile = pl.BlockSpec((block, c), cur_map, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_lag_stack_kernel, pre=pre, post=post,
                          block=block, n=n),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], total * c), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, c), prev_map, memory_space=pltpu.VMEM),
            tile,
            pl.BlockSpec((block, c), next_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, total * c), cur_map,
                               memory_space=pltpu.VMEM),
    )(xp, xp, xp)
    return out[:n]


def lag_stack(x: jax.Array, pre: int, post: int, *,
              use_pallas: bool = False) -> jax.Array:
    """Temporal context stacking; see module docstring for semantics."""
    if use_pallas:
        return lag_stack_pallas(x, pre, post)
    return lag_stack_reference(x, pre, post)
