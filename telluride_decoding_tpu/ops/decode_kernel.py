"""Fused CCA-decode window kernel (measured: XLA wins; kept as the
documented fusion study + an option for shapes where it helps).

The flagship decode (reference call stack: infer_decoder.infer_one ->
decode_one -> compute_correlation -> LDA reduction,
infer_decoder.py:416-455 + 583-632) is HBM-bandwidth-bound: the lagged
EEG windows x1 [W, T, 2553] dominate every other operand by 2-3 orders
of magnitude. This kernel performs the WHOLE pipeline per window block
inside VMEM so x1 is read from HBM exactly once.

MEASURED RESULT (v5e, 512 windows x 100 frames x 2553, bf16,
interleaved A/B medians over 5 runs): XLA einsum path 0.51 ms/batch
(~1.0M windows/s) vs this kernel 0.89-0.97 ms/batch (525-576k
windows/s; window_block >= 16 fails to compile on the remote
toolchain). The question is SETTLED by a roofline control: a pure
jnp.sum reduction over the same [512, 100, 2553] bf16 operands takes
0.505 ms/batch = 524 GB/s effective — bit-for-bit the decode's wall
time. The einsum path is already AT this chip's realized HBM
bandwidth (spec peak 819 GB/s; ~525 GB/s achieved for streaming
reads), so no kernel can be faster and the einsum path REMAINS the
production decode (bench.py, decode/infer_decoder.py). The kernel
stays because (a) the negative result plus the roofline control is
load-bearing engineering documentation, and (b) at larger D (where
[W, T, D] no longer fits XLA's fusion budget) the one-pass structure
wins; revisit if the model family grows.

Pipeline per window block:

  r1 = x1 @ rot1          (MXU, bf16 operands, f32 accumulation)
  r2 = x2 @ rot2
  score_t = ((r1 - c1) * (r2 - c2)) . scale      [LDA column, folded]
  out_w  = mean_t score_t

so x1 is read from HBM exactly once and nothing wider than [W] is
written back. Params are pre-folded: c1 = mean1 @ rot1 + corr_mean_x,
c2 = mean2 @ rot2 + corr_mean_y, scale = lda_slope * lda_w[:, 0] /
corr_power; the lda_intercept adds outside the kernel.

fused_cca_decode_reference (pure XLA) defines the exact semantics; the
kernel matches it to float tolerance (tests/test_decode_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_decode_params(params):
    """Folds the flagship CCA+LDA params into kernel form.

    params uses the bench/__graft_entry__ schema: mean1/mean2 [1, F*],
    rot1/rot2 [F*, D], corr_mean_x/y [D], corr_power [D], lda_w [D, k],
    lda_slope, lda_intercept (scalars).
    Returns (rot1, rot2, c1, c2, scale, intercept).
    """
    rot1 = jnp.asarray(params['rot1'])
    rot2 = jnp.asarray(params['rot2'])
    c1 = (params['mean1'] @ rot1).reshape(-1) + params['corr_mean_x']
    c2 = (params['mean2'] @ rot2).reshape(-1) + params['corr_mean_y']
    scale = (params['lda_slope'] * params['lda_w'][:, 0] /
             params['corr_power'])
    return (rot1, rot2, jnp.asarray(c1, jnp.float32),
            jnp.asarray(c2, jnp.float32),
            jnp.asarray(scale, jnp.float32),
            jnp.asarray(params['lda_intercept'], jnp.float32))


def fused_cca_decode_reference(params, x1, x2):
    """Pure-XLA semantics: [W, T, F1]/[W, T, F2] -> [W] scores."""
    rot1, rot2, c1, c2, scale, intercept = fold_decode_params(params)
    r1 = jnp.einsum('wtf,fd->wtd', x1, rot1.astype(x1.dtype),
                    preferred_element_type=jnp.float32) - c1
    r2 = jnp.einsum('wtf,fd->wtd', x2, rot2.astype(x2.dtype),
                    preferred_element_type=jnp.float32) - c2
    return jnp.mean(jnp.sum(r1 * r2 * scale, axis=-1),
                    axis=1) + intercept


def _kernel(x1_ref, x2_ref, rot1_ref, rot2_ref, consts_ref, out_ref, *,
            block: int, frames: int, d: int):
    """One block of windows: rotate, correlate, reduce — all in VMEM.

    Inputs arrive pre-flattened as [rows, F*] (rows = block * frames),
    so the big operand streams straight from its HBM layout into the
    MXU with NO in-kernel reshape (a [B, T, F] -> [B*T, F] reshape
    inside the kernel costs a full VMEM relayout copy of the tile —
    measured 1.7-3x slower than XLA before this restructuring).
    """
    x1 = x1_ref[...]
    x2 = x2_ref[...]
    # bf16 operands accumulate in f32 on the MXU natively
    # (preferred_element_type); requesting Precision.HIGHEST for bf16
    # is rejected by Mosaic. For f32 operands HIGHEST avoids the
    # default bf16 truncation of the inputs.
    precision = (None if x1.dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    r1 = jax.lax.dot_general(x1, rot1_ref[...],
                             (((1,), (0,)), ((), ())),
                             precision=precision,
                             preferred_element_type=jnp.float32)
    r2 = jax.lax.dot_general(x2, rot2_ref[...],
                             (((1,), (0,)), ((), ())),
                             precision=precision,
                             preferred_element_type=jnp.float32)
    c1 = consts_ref[0, :d]
    c2 = consts_ref[1, :d]
    scale = consts_ref[2, :d]
    prod = (r1 - c1[None, :]) * (r2 - c2[None, :]) * scale[None, :]
    proj = jnp.sum(prod, axis=1)                       # [block*frames]
    means = jnp.mean(proj.reshape(block, frames), axis=1)
    # The whole [num_blocks, block] result stays VMEM-resident (it is
    # tiny); each grid step writes its own row.
    out_ref[pl.program_id(0), :] = means


@functools.partial(jax.jit,
                   static_argnames=('window_block', 'interpret'))
def fused_cca_decode(params, x1, x2, *, window_block: int = 8,
                     interpret: bool = False):
    """Pallas-fused decode: [W, T, F1]/[W, T, F2] windows -> [W] scores.

    W must be a multiple of window_block (the bench/serving batch
    shapes are); pick window_block so one x1 block (~block*T*F1*2 B)
    stays well inside VMEM (8 x 100 x 2553 bf16 = 4 MB).
    """
    rot1, rot2, c1, c2, scale, intercept = fold_decode_params(params)
    w, frames, f1 = x1.shape
    f2 = x2.shape[2]
    d = rot1.shape[1]
    if w % window_block:
        raise ValueError('W (%d) must be a multiple of window_block '
                         '(%d).' % (w, window_block))
    rows_block = window_block * frames
    if rows_block % 8:
        raise ValueError('window_block * frames (%d) must be a multiple '
                         'of 8 (TPU sublane tiling).' % rows_block)
    num_blocks = w // window_block
    # Flatten windows to rows in XLA: the HBM layout is contiguous, so
    # this reshape is free and the kernel sees plain [rows, F] tiles.
    x1r = x1.reshape(w * frames, f1)
    x2r = x2.reshape(w * frames, f2)
    # The three [D] vectors ride in one padded f32 operand.
    dpad = max(d, 128)
    consts = jnp.zeros((3, dpad), jnp.float32)
    consts = consts.at[0, :d].set(c1)
    consts = consts.at[1, :d].set(c2)
    consts = consts.at[2, :d].set(scale)

    kernel = functools.partial(_kernel, block=window_block,
                               frames=frames, d=d)
    out = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((rows_block, f1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_block, f2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f2, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, dpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_blocks, window_block),
                               lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_blocks, window_block),
                                       jnp.float32),
        interpret=interpret,
    )(x1r, x2r, rot1.astype(x1.dtype), rot2.astype(x2.dtype), consts)
    return out.reshape(w) + intercept
