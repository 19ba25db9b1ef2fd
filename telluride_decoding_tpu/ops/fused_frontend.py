"""Fused audio-envelope + lag-stack frontend as one Pallas TPU kernel.

The reference computes audio intensity with a per-output-frame Python
loop (preprocess.py:676-682, its ingest hot loop) and then materializes
lag context in a separate tf.data stage (brain_data.py:425-457). This
kernel fuses the whole frontend — square, overlapping-window moving
average (the resample), square root, perceptual power compression, and
temporal lag stacking — into a single pass that never leaves VMEM:

  audio [N] at fs_in
    -> envelope e[m] = (mean_{t1(m) <= j < t2(m)} x[j]^2)^(1/2) ^ exponent
       at fs_out (window centers per AudioFeatures.audio_resample)
    -> rows [e[m-pre], ..., e[m], ..., e[m+post]]  (zero-padded edges)

The windowed mean runs on the MXU as a banded selection matmul:
S[j, r] = 1 if t1(r) <= j < t2(r), built branch-free from broadcasted
iota comparisons, so one [1, in_tile] x [in_tile, out_tile'] product
yields a whole tile of envelope sums. Each grid step also computes
pre/post halo envelope values, making the lag stack local to the tile
(no inter-tile communication).

A pure-XLA implementation (fused_envelope_lagstack_reference) defines
the exact semantics; the kernel matches it to float tolerance
(tests/test_fused_frontend.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_envelope_lagstack_reference(audio, fs_in: float, fs_out: float,
                                      window: float = 2.0,
                                      exponent: float = 1.0,
                                      pre: int = 0, post: int = 0):
    """Pure-XLA semantics: [N] audio -> [M, pre+1+post] features."""
    audio = jnp.asarray(audio, jnp.float32).reshape(-1)
    num_in = audio.shape[0]
    num_out = int(round(num_in / fs_in * fs_out))
    half = 0.5 * window / fs_out
    # Window bounds in float64 on host (shapes are static): float32
    # index math drifts at long horizons (round(fs_in*t) for t in the
    # millions of samples).
    m = np.arange(num_out, dtype=np.float64)
    t1_np = np.maximum(
        0, np.round(fs_in * (m / fs_out - half))).astype(np.int32)
    t2_np = np.minimum(num_in, np.round(
        fs_in * (m / fs_out + half))).astype(np.int32)
    t1i = jnp.asarray(t1_np)
    t2i = jnp.asarray(t2_np)
    # Per-window sums via a masked gather, NOT a prefix sum: a float32
    # cumsum grows to ~1e7 on a 10-minute 16 kHz recording while
    # window sums stay ~1e2, so csum[t2]-csum[t1] would cancel most of
    # the mantissa at the tail (the Pallas kernel accumulates per tile
    # and never has this problem — the spec must not be the LESS
    # accurate side of the parity tests). The gather is [M, w_max]
    # transient; this function is the semantic spec / test anchor, not
    # the production kernel.
    w_max = max(1, int(np.max(t2_np - t1_np)) if num_out else 1)
    idx = t1i[:, None] + jnp.arange(w_max, dtype=jnp.int32)[None, :]
    valid = idx < t2i[:, None]
    audio_sq = audio ** 2
    seg = jnp.where(valid, audio_sq[jnp.clip(idx, 0, max(num_in - 1,
                                                         0))], 0.0)
    counts = jnp.maximum(t2i - t1i, 1).astype(jnp.float32)
    env = (jnp.sum(seg, axis=1) / counts) ** 0.5
    env = env ** exponent
    padded = jnp.concatenate([jnp.zeros((pre,)), env, jnp.zeros((post,))])
    cols = [jax.lax.dynamic_slice_in_dim(padded, k, num_out, axis=0)
            for k in range(pre + 1 + post)]
    return jnp.stack(cols, axis=1)


_SLAB = 2048  # Input samples per in-kernel accumulation step.


def _in_stride(fs_in: float, fs_out: float, out_tile: int) -> int:
    """Input samples consumed per output tile (decimation stride)."""
    return int(round(out_tile * fs_in / fs_out))


def _kernel(starts_ref, audio_ref, out_ref, *, fs_in, fs_out, window,
            exponent, pre, post, out_tile, in_tile, front, halo):
    """One tile: envelope for out_tile + 2*halo frames, then lag stack.

    audio_ref holds padded-audio samples [tile_start, tile_start +
    in_tile); tile_start comes from starts_ref (exact per-tile starts,
    round(i*out_tile*fs_in/fs_out), so non-dyadic rate ratios don't
    accumulate drift against a fixed integer stride) and padded index =
    original index + front.
    """
    i = pl.program_id(0)
    base_out = i * out_tile
    # Tile-relative coordinates: the host supplies d1 = exact
    # fs_in*base_out/fs_out - tile_start + front (small), plus the
    # first-tile low clamp and last-tile high clamp, so all in-kernel
    # index arithmetic stays small-magnitude (float32-exact) no matter
    # how long the recording is. starts_ref is a scalar-prefetch
    # operand: the whole [num_tiles, 3] table, indexed per tile.
    d1 = starts_ref[i, 0]
    lo_clamp = starts_ref[i, 1]
    hi_clamp = starts_ref[i, 2]
    num_out_f = starts_ref[i, 3]

    total_out = out_tile + 2 * halo
    m_rel = (jax.lax.broadcasted_iota(jnp.int32, (total_out, 1), 0)[:, 0]
             .astype(jnp.float32) - halo)
    half = 0.5 * window / fs_out
    t1r = jnp.clip(jnp.round(d1 + fs_in * (m_rel / fs_out - half)),
                   lo_clamp, float(in_tile))
    t2r = jnp.clip(jnp.round(d1 + fs_in * (m_rel / fs_out + half)),
                   0.0, hi_clamp)

    # Banded selection matmul on the MXU, accumulated over fixed-size
    # input slabs so the [slab, total_out] selection matrix stays well
    # inside VMEM for any decimation ratio. in_tile is padded to a slab
    # multiple by the caller; t1r/t2r clipping keeps pad rows inert.
    slab = _SLAB
    num_slabs = in_tile // slab
    j_local = jax.lax.broadcasted_iota(jnp.int32, (slab, total_out),
                                       0).astype(jnp.float32)

    def slab_step(s, acc):
        j = j_local + (s * slab).astype(jnp.float32)
        sel = jnp.logical_and(j >= t1r[None, :], j < t2r[None, :])
        x_slab = audio_ref[0, 0, pl.ds(s * slab, slab)]
        x2_slab = x_slab * x_slab
        return acc + jax.lax.dot_general(
            x2_slab[None, :], sel.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0]

    sums = jax.lax.fori_loop(0, num_slabs, slab_step,
                             jnp.zeros((total_out,), jnp.float32))
    counts = jnp.maximum(t2r - t1r, 1.0)
    env = (sums / counts) ** 0.5
    env = env ** exponent
    m_global = m_rel + base_out
    valid = jnp.logical_and(m_global >= 0, m_global < num_out_f)
    env = jnp.where(valid, env, 0.0)

    for k in range(pre + 1 + post):
        off = halo + k - pre                          # Static offset.
        out_ref[:, k] = jax.lax.slice_in_dim(env, off, off + out_tile)


@functools.partial(jax.jit,
                   static_argnames=('fs_in', 'fs_out', 'window', 'exponent',
                                    'pre', 'post', 'out_tile', 'interpret'))
def fused_envelope_lagstack(audio, fs_in: float, fs_out: float,
                            window: float = 2.0, exponent: float = 1.0,
                            pre: int = 0, post: int = 0,
                            out_tile: int = 256,
                            interpret: bool = False,
                            valid_len=None, valid_out=None):
    """Pallas-fused frontend (semantics of the _reference function).

    interpret=True runs in interpreter mode for CPU tests.

    valid_len/valid_out (optional, traced int scalars) support
    bucket-padded inputs: when `audio` is zero-padded to a shape bucket,
    pass the true sample count as valid_len and the true output frame
    count (int(round(valid_len / fs_in * fs_out))) as valid_out. The
    envelope windows then clamp at the TRUE signal end (identical
    values to an unpadded call), frames past valid_out are zeroed, and
    one compilation serves every recording in the bucket — essential on
    backends where each compile costs seconds. Callers slice the result
    to [:valid_out] on the host.
    """
    audio = jnp.asarray(audio, jnp.float32).reshape(-1)
    num_in = audio.shape[0]
    num_out = int(round(num_in / fs_in * fs_out))
    halo = max(pre, post)
    # Margin: the widest reach beyond a tile's nominal input span, from
    # halo frames plus half the averaging window plus rounding slack.
    margin = int(math.ceil(fs_in * (halo + 1) / fs_out +
                           0.5 * window * fs_in / fs_out)) + 2
    in_tile = _in_stride(fs_in, fs_out, out_tile) + 2 * margin
    in_tile += (-in_tile) % _SLAB  # Slab-align for the in-kernel loop.
    num_tiles = max(1, (num_out + out_tile - 1) // out_tile)
    # Exact per-tile input starts (no cumulative rounding drift for
    # non-dyadic fs ratios).
    starts_np = np.round(np.arange(num_tiles) * out_tile * fs_in /
                         fs_out).astype(np.int64)
    front = margin
    back = max(0, int(starts_np[-1]) + in_tile - (num_in + front))
    padded = jnp.pad(audio, (front, back))

    # Overlapping input tiles as [num_tiles, 1, in_tile]; BlockSpec
    # indexes whole blocks, so the overlap is materialized by this
    # gather (fused by XLA into the operand stream).
    starts = jnp.asarray(starts_np)
    idx = starts[:, None] + jnp.arange(in_tile)[None, :]
    tiles = jnp.take(padded, idx, axis=0).reshape(num_tiles, 1, in_tile)
    # Per-tile scalars (float64 on host; small-magnitude in the kernel):
    # d1 = exact base input coordinate relative to the tile, plus the
    # boundary clamps expressed tile-relative.
    base_in = (np.arange(num_tiles, dtype=np.float64) * out_tile *
               fs_in / fs_out)
    d1 = base_in - starts_np + front
    lo_clamp = np.maximum(front - starts_np, 0)
    if valid_len is None:
        hi_clamp = jnp.asarray(
            np.minimum(num_in + front - starts_np, in_tile), jnp.float32)
        num_out_col = jnp.full((num_tiles,), float(num_out), jnp.float32)
    else:
        # Bucketed mode: the true end is a traced scalar, so the high
        # clamp and the valid-frame bound enter through the prefetch
        # table instead of being baked into the compilation. The
        # subtraction runs in int32 (exact for any recording below
        # 2^31 samples) and only the already-clamped small result is
        # cast to float32 — casting valid_len to f32 FIRST would round
        # by whole samples past 2^24 (~17 min at 16 kHz).
        hi_clamp = jnp.minimum(
            jnp.asarray(valid_len, jnp.int32) + front -
            jnp.asarray(starts_np.astype(np.int32)),
            in_tile).astype(jnp.float32)
        num_out_col = jnp.broadcast_to(
            jnp.asarray(valid_out, jnp.float32), (num_tiles,))
    starts_arg = jnp.stack(
        [jnp.asarray(d1, jnp.float32),
         jnp.asarray(lo_clamp, jnp.float32),
         hi_clamp, num_out_col], axis=1)

    total = pre + 1 + post
    kernel = functools.partial(
        _kernel, fs_in=float(fs_in), fs_out=float(fs_out),
        window=float(window), exponent=float(exponent), pre=pre,
        post=post, out_tile=out_tile, in_tile=in_tile,
        front=front, halo=halo)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, in_tile), lambda i, starts: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_tile, total),
                               lambda i, starts: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_tiles * out_tile, total),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts_arg, tiles)
    return out[:num_out]
