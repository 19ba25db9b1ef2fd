"""Mesh-parallel parameter sweeps: jackknife x regularization grids.

The reference scales parameter searches by launching one OS process per
(lambda, held-out-file) configuration and re-reading the entire dataset
in each (regression.py:381-409; doc/DecodingCodelab.md:353-389 runs 360
jobs that way). This engine is the TPU-native replacement:

  * ONE pass over the data computes per-file sufficient statistics
    (MomentStats) on the MXU.
  * Leave-one-out training statistics are algebraic: total - file
    (O(files) instead of O(files^2) data passes).
  * The whole (lambda x held-out-file) grid solves and evaluates as a
    single jitted program — lambdas via vmap, files via vmap, sharded
    over the device mesh ('file' axis) with jax.sharding.
  * Held-out evaluation is MOMENTS-ONLY: the Pearson r of a linear or
    CCA prediction is a pure function of the held-out file's
    MomentStats (quadratic forms with the solution), so raw frames
    never enter the sweep programs — residency is O(files * D^2),
    independent of recording length, and ragged cohorts share static
    shapes for free.

This is the flagship new capability: the codelab's 360-job shell sweep
becomes one program launch.
"""

from __future__ import annotations

import functools
import itertools
import os
from typing import List, NamedTuple, Optional, Sequence, Tuple

from absl import logging
import jax
import jax.numpy as jnp
import numpy as np

from telluride_decoding_tpu.ops.covariance import (MomentStats,
                                                   blocked_moments,
                                                   moments_from_arrays)
from telluride_decoding_tpu.ops.lagstack import lag_stack, lag_stack_np
from telluride_decoding_tpu.solvers.cca import cca_covariances_from_stats
from telluride_decoding_tpu.solvers.ridge import solve_ridge_from_moments


def _ensure_2d(a):
    """[N] -> [N, 1], preserving host/device residency."""
    if getattr(a, 'ndim', 2) != 1:
        return a
    return a[:, None] if isinstance(a, jax.Array) else \
        np.asarray(a)[:, None]


class ContextSpec(NamedTuple):
    """Lag-window context applied ON DEVICE inside the moments pass.

    With a context spec, sweep entry points take RAW (un-stacked)
    per-file streams and fuse the lag expansion into the moments
    program — only the raw channels cross the host->device link, a
    (pre+1+post)x transfer and host-memory saving (37x for the
    codelab's 2553-wide stacks). Semantics are identical to host-side
    ``lag_stack_np`` + truncation (reference brain_data.py:425-483
    windowing): the caller supplies each file's raw x with exactly
    ``n_i + x_post`` rows (zero-padded up if the source stream ends at
    the zip-truncation point ``n_i``) and raw y with ``n_i + y_post``
    rows, where ``n_i`` is the file's common (zip-truncated) frame
    count. cli.regression.Regression._per_file_raw produces exactly
    this layout.
    """

    x_pre: int = 0
    x_post: int = 0
    y_pre: int = 0
    y_post: int = 0

    def stacked_widths(self, dx_raw: int, dy_raw: int
                       ) -> Tuple[int, int]:
        return (dx_raw * (self.x_pre + 1 + self.x_post),
                dy_raw * (self.y_pre + 1 + self.y_post))


class SweepResult(NamedTuple):
    correlations: np.ndarray   # [num_lambdas, num_files]
    lambdas: np.ndarray        # [num_lambdas]
    test_files: List[str]      # file per column


def _masked_pearson_first(x: jax.Array, y: jax.Array,
                          mask: jax.Array) -> jax.Array:
    """Pearson r of column 0 over rows where mask == 1."""
    n = jnp.maximum(jnp.sum(mask), 1.0)
    m = mask[:, None]
    mean_x = jnp.sum(x * m, axis=0) / n
    mean_y = jnp.sum(y * m, axis=0) / n
    xc = (x - mean_x) * m
    yc = (y - mean_y) * m
    cov = jnp.sum(xc * yc, axis=0)
    power = jnp.sqrt(jnp.sum(xc ** 2, axis=0) * jnp.sum(yc ** 2, axis=0))
    r = cov / jnp.where(power <= 0, 1.0, power)
    return r[0]


def pad_and_stack(arrays: Sequence[np.ndarray],
                  pad_frames_to: Optional[int] = None,
                  pad_files_to: Optional[int] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stacks variable-length [N_i, D] arrays into [F, N_max, D] + mask.

    Device arrays stay on device (padded with jnp.pad); host arrays
    build the batch host-side in one buffer. Mixing is fine.
    pad_frames_to forces a larger N_max, and pad_files_to a larger F
    (all-zero masks — exact zero statistics), so ragged cohorts share
    ONE compiled moments-program shape across subjects.
    """
    arrays = [_ensure_2d(a) for a in arrays]
    max_n = max(max(a.shape[0] for a in arrays), pad_frames_to or 0)
    num_f = max(len(arrays), pad_files_to or 0)
    all_on_device = all(isinstance(a, jax.Array) for a in arrays)
    mask = np.zeros((num_f, max_n), np.float32)
    for i, a in enumerate(arrays):
        mask[i, :a.shape[0]] = 1.0
    if all_on_device:
        # Per-file pads compile ONE tiny program per distinct
        # (length, max_n) pair and the stack's shape is length-
        # independent — the smallest compile-key surface for ragged
        # file sets. (Uniform-length sets never reach here from
        # per_file_stats: _uniform_file_moments fuses stack+moments
        # into one dispatch with no padding at all.)
        width = arrays[0].shape[1]
        stacked = jnp.stack(
            [jnp.pad(a.astype(jnp.float32),
                     ((0, max_n - a.shape[0]), (0, 0)))
             for a in arrays]
            + [jnp.zeros((max_n, width), jnp.float32)] * (num_f -
                                                          len(arrays)))
        return stacked, jnp.asarray(mask)
    width = arrays[0].shape[1]
    stacked = np.zeros((num_f, max_n, width), np.float32)
    for i, a in enumerate(arrays):
        stacked[i, :a.shape[0]] = np.asarray(a)
    return jnp.asarray(stacked), jnp.asarray(mask)


@functools.partial(jax.jit, static_argnames=('want_syy',))
def _uniform_file_moments(xs, ys, want_syy: bool) -> MomentStats:
    """Per-file MomentStats for files that all SHARE one length:
    stack + moments fused into ONE program on the raw [F, N, D] stack,
    no padding or masks (zero-pad rows contribute zero sums anyway,
    and the count is the static N). The output stats shapes are
    length-INDEPENDENT, so every downstream sweep program stays
    shape-stable across a ragged cohort even though this program keys
    on (F, N, D). One dispatch and one compile key per distinct
    cohort shape — the per-file pad+stack staging it replaces issued
    2F+1 dispatches, which dominated the whole moments phase over a
    high-latency dispatch link (measured ~1 s of a 1.7 s cohort
    subject on the remote-TPU tunnel)."""
    x = jnp.stack([jnp.asarray(a, jnp.float32) for a in xs])
    y = jnp.stack([jnp.asarray(a, jnp.float32) for a in ys])
    return jax.vmap(lambda xi, yi: moments_from_arrays(
        xi, yi, want_syy=want_syy))(x, y)


@functools.partial(jax.jit, static_argnames=('want_syy', 'ctx'))
def _stacked_moments_ctx(xs: jax.Array, ys: jax.Array,
                         n_valid: jax.Array, want_syy: bool,
                         ctx: ContextSpec) -> MomentStats:
    """Per-file MomentStats with the lag expansion fused on device.

    xs: [F, N + x_post, dx_raw] RAW frames (zero rows beyond each
    file's true data); ys: [F, N + y_post, dy_raw]; n_valid: [F] true
    frame counts. Each file is lag-stacked on device (zero-padded
    edges, identical to lag_stack_np) and truncated to the common
    frame axis; rows >= n_i are masked out, which is exact because
    multiplying by a 0/1 mask zeroes their contribution to every sum.
    The stacked [N, D*(pre+1+post)] matrix exists only as a transient
    inside this program — it never crosses the link or touches host
    memory.
    """
    n_frames = xs.shape[1] - ctx.x_post

    def one(x, y, n):
        xc = lag_stack(x, ctx.x_pre, ctx.x_post)[:n_frames]
        if ctx.y_pre or ctx.y_post:
            yc = lag_stack(y, ctx.y_pre, ctx.y_post)[:n_frames]
        else:
            yc = y[:n_frames]
        m = (jnp.arange(n_frames) < n).astype(xc.dtype)[:, None]
        stats = moments_from_arrays(xc * m, yc * m, want_syy=want_syy)
        return stats._replace(count=jnp.asarray(n, stats.count.dtype))
    return jax.vmap(one)(xs, ys, n_valid)


@functools.partial(jax.jit, static_argnames=('want_syy',))
def _stacked_moments(xs: jax.Array, ys: jax.Array, masks: jax.Array,
                     want_syy: bool) -> MomentStats:
    """Per-file MomentStats from a padded [F, N, D] stack — ONE
    device program for a whole file set. Used when the caller already
    has the raw stack (parallel tests); the sweep entry points below
    use per_file_stats, which never materializes it."""
    def one(x, y, m):
        stats = moments_from_arrays(x * m[:, None], y * m[:, None],
                                    want_syy=want_syy)
        return stats._replace(count=jnp.sum(m))
    return jax.vmap(one)(xs, ys, masks)


def _pad_stats_files(stats: MomentStats, pad_files_to: Optional[int],
                     num_real: int) -> MomentStats:
    """Appends zero-statistics dummy files up to pad_files_to (exact:
    they contribute nothing to leave-one-out totals)."""
    if pad_files_to and pad_files_to > num_real:
        pad = pad_files_to - num_real
        stats = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]),
            stats)
    return stats


def _host_stack_one(x, y, ctx: ContextSpec):
    """Host-side fallback of the device lag expansion for ONE file
    (bounded-memory regime): value-identical lag_stack_np +
    truncation to n_i. Called per file inside the streaming loop so
    peak host memory stays at one stacked file."""
    n = x.shape[0] - ctx.x_post
    xs = (lag_stack_np(x, ctx.x_pre, ctx.x_post)[:n]
          if (ctx.x_pre or ctx.x_post) else x[:n])
    ys = (lag_stack_np(y, ctx.y_pre, ctx.y_post)[:n]
          if (ctx.y_pre or ctx.y_post) else y[:n])
    return xs, ys


def per_file_stats(per_file_x: Sequence[np.ndarray],
                   per_file_y: Sequence[np.ndarray],
                   want_syy: bool,
                   pad_files_to: Optional[int] = None,
                   pad_frames_to: Optional[int] = None,
                   frame_bucket: int = 4096,
                   batch_bytes: Optional[int] = None,
                   context: Optional[ContextSpec] = None) -> MomentStats:
    """Stacked [F, ...] MomentStats; the raw frames stay TRANSIENT.

    Two regimes, value-identical:

      * batched (default whenever the padded [F, N_max, D] stack fits
        ``batch_bytes``, env TDT_SWEEP_MOMENTS_BYTES, default 2 GB):
        one pad_and_stack + ONE _stacked_moments dispatch — the raw
        stack lives only for this call and is freed before the sweep
        program runs. One dispatch matters: over a high-latency
        dispatch link, per-file launches measured 20x slower.
      * streaming (large corpora): one bucketed-shape moments program
        per file (frames pad to a frame_bucket multiple with a
        validity mask), so peak memory is ONE padded file; dispatches
        are asynchronous and pipeline.

    Dummy files up to pad_files_to contribute exact-zero statistics
    (count 0), preserving leave-one-out totals.

    With ``context`` (a ContextSpec with any nonzero lag), the inputs
    are RAW streams in the ContextSpec layout and the lag expansion
    runs on device fused into the moments program (only raw channels
    cross the link); ``pad_frames_to`` then refers to the COMMON
    (zip-truncated) frame axis. The bounded-memory regime falls back
    to host-side stacking per file (value-identical), keeping its
    one-padded-file peak.
    """
    if batch_bytes is None:
        try:
            batch_bytes = int(float(os.environ.get(
                'TDT_SWEEP_MOMENTS_BYTES', 2 << 30)))
        except ValueError:
            batch_bytes = 2 << 30
    per_file_x = [_ensure_2d(x) for x in per_file_x]
    per_file_y = [_ensure_2d(y) for y in per_file_y]
    if len(per_file_x) != len(per_file_y):
        # With pad_files_to set, a mismatch would otherwise zip-
        # truncate and zero-fill the surplus files into silently
        # wrong (zero) statistics instead of failing.
        raise ValueError('per_file_stats got %d x files but %d y '
                         'files.' % (len(per_file_x), len(per_file_y)))
    if context is None or not any(context):
        # The context path validates its own (offset) layout below;
        # the plain paths derive the validity mask from x alone, so a
        # shorter y would be zero-padded INTO the counted rows and
        # silently corrupt sxy/syy.
        for i, (x, y) in enumerate(zip(per_file_x, per_file_y)):
            if x.shape[0] != y.shape[0]:
                raise ValueError(
                    'per_file_stats: file %d has %d x frames but %d '
                    'y frames; per-file x and y must align.'
                    % (i, x.shape[0], y.shape[0]))
    num_real = len(per_file_x)
    # The staged stack (and the program transient) scales with the
    # PADDED file count — budgeting on num_real alone would admit a
    # 2-trial subject padded to a 40-trial cohort into the batched
    # regime with a 20x larger stack than estimated.
    num_f_est = max(num_real, pad_files_to or 0)

    ctx = context if context is not None and any(context) else None
    if ctx is not None:
        n_list = [x.shape[0] - ctx.x_post for x in per_file_x]
        for i, (y, n) in enumerate(zip(per_file_y, n_list)):
            if y.shape[0] - ctx.y_post != n:
                raise ValueError(
                    'context layout violated for file %d: raw x has '
                    '%d rows (n=%d with x_post=%d) but raw y has %d '
                    'rows, expected n + y_post = %d'
                    % (i, per_file_x[i].shape[0], n, ctx.x_post,
                       y.shape[0], n + ctx.y_post))
        x_w, y_w = ctx.stacked_widths(per_file_x[0].shape[1],
                                      per_file_y[0].shape[1])
        n_common = max(max(n_list), pad_frames_to or 0)
        # The regime decision budgets the DEVICE-resident transient
        # (the stacked [F, N, D_stacked] matrices inside the fused
        # program), not the much smaller raw transfer.
        if num_f_est * n_common * (x_w + y_w) * 4 <= batch_bytes:
            # The file axis pads to pad_files_to INSIDE the program
            # (all-zero frames with n_valid 0 yield exact zero
            # statistics), so a cohort whose subjects differ in trial
            # count still compiles this moments program exactly once.
            # Same padded count the budget above was estimated with.
            num_f = num_f_est

            def pad_raw(arrs, target):
                out = np.zeros((num_f, target, arrs[0].shape[1]),
                               np.float32)
                for i, a in enumerate(arrs):
                    out[i, :a.shape[0]] = np.asarray(a, np.float32)
                return jnp.asarray(out)
            stats = _stacked_moments_ctx(
                pad_raw(per_file_x, n_common + ctx.x_post),
                pad_raw(per_file_y, n_common + ctx.y_post),
                jnp.asarray(n_list + [0] * (num_f - num_real),
                            jnp.float32),
                want_syy=want_syy, ctx=ctx)
            return _pad_stats_files(stats, pad_files_to, num_f)
        # Bounded-memory regime: fall through to the streaming loop,
        # which stacks each file on the host right before its moments
        # dispatch (_host_stack_one) — value-identical, and peak host
        # memory stays at ONE stacked file.
    max_n = max(max(x.shape[0] for x in per_file_x),
                pad_frames_to or 0)
    width = per_file_x[0].shape[1] + per_file_y[0].shape[1]
    est = num_f_est * max_n * width * 4

    # A context spec only reaches here in the bounded-memory regime
    # (its batched branch returned above): the raw arrays' smaller
    # footprint must not re-route them into the batched path, which
    # would treat them as pre-stacked.
    if est <= batch_bytes and ctx is None:
        x_lens = {x.shape[0] for x in per_file_x}
        y_lens = {y.shape[0] for y in per_file_y}
        # The no-padding fast path keys its compile on the REAL
        # (F, N, D), so it only applies when that already matches the
        # declared cohort pads — otherwise subjects with different
        # trial counts/lengths would each recompile the moments
        # program (seconds per shape through a remote-compile link),
        # defeating exactly what pad_files_to/pad_frames_to buy.
        pads_match = ((pad_files_to is None or pad_files_to == num_real)
                      and (pad_frames_to is None
                           or x_lens == {pad_frames_to}))
        if len(x_lens) == 1 and x_lens == y_lens and pads_match:
            # Uniform file lengths (fixed-duration trials — the
            # common cohort layout): one fused stack+moments dispatch,
            # no padding. Stats shapes are length-independent, so the
            # sweep programs compile once regardless.
            stats = _uniform_file_moments(tuple(per_file_x),
                                          tuple(per_file_y),
                                          want_syy=want_syy)
        else:
            # Ragged lengths (or declared pads): pad frames AND files
            # to one shared transient stack so the masked moments
            # program compiles once for the whole cohort (each
            # distinct shape would otherwise recompile — seconds per
            # shape through a remote-compile link). File-axis pads
            # carry all-zero masks: exact zero statistics.
            xs, masks = pad_and_stack(per_file_x, pad_frames_to,
                                      pad_files_to)
            ys, _ = pad_and_stack(per_file_y, pad_frames_to,
                                  pad_files_to)
            stats = _stacked_moments(xs, ys, masks, want_syy=want_syy)
            del xs, ys, masks   # Transient: freed before the sweep.
        # No-op when the branch above already padded the file axis.
        return _pad_stats_files(stats, pad_files_to,
                                int(stats.count.shape[0]))

    stats_list = []
    for x, y in zip(per_file_x, per_file_y):
        if ctx is not None:
            x, y = _host_stack_one(x, y, ctx)
        n = x.shape[0]
        padded = -(-n // frame_bucket) * frame_bucket
        if isinstance(x, jax.Array) or isinstance(y, jax.Array):
            xp = jnp.pad(jnp.asarray(x, jnp.float32),
                         ((0, padded - n), (0, 0)))
            yp = jnp.pad(jnp.asarray(y, jnp.float32),
                         ((0, padded - y.shape[0]), (0, 0)))
        else:
            from telluride_decoding_tpu.ops.covariance import (
                pad_to_bucket)
            (xp, yp), _ = pad_to_bucket([x, y], n, frame_bucket)
        valid = _bucket_valid(n, padded)
        stats_list.append(blocked_moments(
            jnp.asarray(xp), jnp.asarray(yp), want_syy=want_syy,
            valid=valid, block=frame_bucket))
    if pad_files_to:
        dx = stats_list[0].sum_x.shape[0]
        dy = stats_list[0].sum_y.shape[0]
        for _ in range(pad_files_to - len(stats_list)):
            from telluride_decoding_tpu.ops.covariance import (
                zeros_moments)
            stats_list.append(zeros_moments(dx, dy))
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *stats_list)


@functools.partial(jax.jit, static_argnames=('n_padded',))
def _bucket_valid(n_true, n_padded: int) -> jax.Array:
    """[n_padded] 0/1 validity mask — jitted so repeated file lengths
    share one tiny program instead of re-uploading index arrays."""
    return (jnp.arange(n_padded) < n_true).astype(jnp.float32)


def _tree_index(stats: MomentStats, index) -> MomentStats:
    return jax.tree.map(lambda a: a[index], stats)


def _lam_chunk_units(num_files: int, dim_sq_elems: int,
                     num_l: int) -> int:
    """How many lambdas' factorizations to batch per dispatch.

    Each lambda's transient is ~2 buffers (shifted covariance + its
    Cholesky factor) of num_files x dim^2 floats. Batching lambdas
    into one bigger batched-Cholesky dispatch rides the MXU harder:
    measured on v5e at codelab scale (40 files, width 2553, 9
    lambdas), chunk 3 runs the ridge grid 0.59 s -> 0.52 s and the
    CCA grid 0.74 s -> 0.68 s (values equal to 7e-7); chunk 4+
    REGRESSES (HBM pressure, 0.66-0.97 s — verified again after
    integration: an 8 GB budget picked chunk 4 and reproduced the
    regression exactly). The 7 GB default budget lands on chunk 3 at
    codelab scale while letting small problems batch the whole grid.
    Overrides: TDT_SWEEP_LAM_CHUNK (explicit count),
    TDT_SWEEP_LAM_CHUNK_BYTES (budget). Called at trace time — all
    inputs are static shapes."""
    explicit = os.environ.get('TDT_SWEEP_LAM_CHUNK')
    if explicit:
        try:
            # int(float(...)) accepts the same '4.0'/'1e1' styles as
            # the byte knobs.
            return max(1, min(num_l, int(float(explicit))))
        except (ValueError, OverflowError):
            # OverflowError: int(float('inf')).
            logging.warning(
                'Unparseable TDT_SWEEP_LAM_CHUNK=%r; falling back to '
                'the byte-budget heuristic.', explicit)
    try:
        budget = int(float(os.environ.get('TDT_SWEEP_LAM_CHUNK_BYTES',
                                          7 << 30)))
    except (ValueError, OverflowError):
        budget = 7 << 30
    unit = 2 * num_files * dim_sq_elems * 4
    return max(1, min(num_l, budget // max(unit, 1)))


def _chunked_lam_map(eval_fn, lambdas: jax.Array, num_files: int,
                     chunk: int) -> jax.Array:
    """[L, F] grid via lax.map over lambda-chunks of batched evals.

    Each step evaluates ``chunk`` lambdas x all files as ONE batched
    program (vmap of vmap), so chunk*num_files Cholesky factorizations
    land in a single dispatch. The lambda axis pads to a chunk
    multiple with lambda=1 (always factorizable); padded rows are
    sliced away."""
    num_l = lambdas.shape[0]
    pad = (-num_l) % chunk
    lam_p = (jnp.concatenate([lambdas,
                              jnp.ones((pad,), lambdas.dtype)])
             if pad else lambdas)
    out = jax.lax.map(
        lambda lams: jax.vmap(lambda lamb: jax.vmap(
            lambda f: eval_fn(f, lamb))(jnp.arange(num_files)))(lams),
        lam_p.reshape(-1, chunk))
    return out.reshape(-1, num_files)[:num_l]


def _linear_r_from_stats(stats: MomentStats, w: jax.Array,
                         b: jax.Array) -> jax.Array:
    """Pearson r (first output column) of pred = x @ w + b on the
    file summarized by ``stats`` — no raw frames needed.

    Requires stats built with want_syy=True (uses syy[0, 0]). A
    zero-count dummy file comes out 0, matching the masked evaluator.

    Numerical boundary (applies to _cca_r_from_stats too): variances
    come from UNCENTERED float32 second moments (var = s2 - s^2/n), so
    a signal with DC offset mu >> std sigma cancels ~(mu/sigma)^2
    significant digits; accuracy degrades past mu/sigma ~ 100 and is
    meaningless by ~3000 (float32 eps 1e-7). The ingest pipeline
    z-scores globally (io/ingest.py BrainExperiment), so production
    data is near zero-mean; pinned by
    tests/test_sweep.py::test_moments_eval_tolerates_dc_offset.
    """
    w0 = w[:, 0]
    b0 = b[0]
    n = jnp.maximum(stats.count, 1.0)
    sum_xw = jnp.dot(stats.sum_x, w0, precision=jax.lax.Precision.HIGHEST)
    sum_p = sum_xw + stats.count * b0
    sum_pp = (jnp.dot(w0, jnp.dot(stats.sxx, w0,
                                  precision=jax.lax.Precision.HIGHEST),
                      precision=jax.lax.Precision.HIGHEST)
              + 2.0 * b0 * sum_xw + stats.count * b0 * b0)
    sum_y0 = stats.sum_y[0]
    sum_yy = stats.syy[0, 0]
    sum_yp = (jnp.dot(stats.sxy[:, 0], w0,
                      precision=jax.lax.Precision.HIGHEST)
              + b0 * sum_y0)
    cov = sum_yp - sum_y0 * sum_p / n
    var_p = sum_pp - sum_p * sum_p / n
    var_y = sum_yy - sum_y0 * sum_y0 / n
    power = jnp.sqrt(jnp.maximum(var_p, 0.0) * jnp.maximum(var_y, 0.0))
    return cov / jnp.where(power <= 0, 1.0, power)


def _cca_r_from_stats(stats: MomentStats, u: jax.Array,
                      v: jax.Array) -> jax.Array:
    """Pearson r of (x @ u) vs (y @ v) on the file summarized by
    ``stats`` (want_syy=True). Pearson is shift-invariant, so the
    train-mean centering of the dense evaluator drops out."""
    highest = jax.lax.Precision.HIGHEST
    n = jnp.maximum(stats.count, 1.0)
    sum_a = jnp.dot(stats.sum_x, u, precision=highest)
    sum_b = jnp.dot(stats.sum_y, v, precision=highest)
    saa = jnp.dot(u, jnp.dot(stats.sxx, u, precision=highest),
                  precision=highest)
    sbb = jnp.dot(v, jnp.dot(stats.syy, v, precision=highest),
                  precision=highest)
    sab = jnp.dot(u, jnp.dot(stats.sxy, v, precision=highest),
                  precision=highest)
    cov = sab - sum_a * sum_b / n
    var_a = saa - sum_a * sum_a / n
    var_b = sbb - sum_b * sum_b / n
    power = jnp.sqrt(jnp.maximum(var_a, 0.0) * jnp.maximum(var_b, 0.0))
    return cov / jnp.where(power <= 0, 1.0, power)


def _total_minus(stacked: MomentStats, total: MomentStats,
                 index: jax.Array) -> MomentStats:
    return jax.tree.map(lambda tot, per: tot - per[index], total, stacked)


@functools.partial(jax.jit,
                   static_argnames=('use_ridge', 'force_eig'))
def _ridge_sweep_program(stacked_stats: MomentStats, total: MomentStats,
                         lambdas: jax.Array, use_ridge: bool = True,
                         force_eig: bool = False):
    """[L, F] held-out correlations from per-file MomentStats ALONE.

    The held-out Pearson r of a linear prediction is a pure function
    of the file's moments (quadratic forms of w with sxx/sxy/syy —
    _linear_r_from_stats), so the raw [F, N, D] frame stack never
    enters the program: the whole jackknife is O(F D^2) memory and the
    per-(lambda, file) cost is the Cholesky factorization floor.

    Files evaluate in one vmap (they share nothing); the lambda axis
    runs sequentially via lax.map so peak memory stays at one
    [F, D, D] covariance batch instead of [L, F, D, D] — at codelab
    width (D=2554) the fully-vmapped grid would need ~35 GB of HBM.

    For true ridge, each solve factors the SPD
    normal matrix via Cholesky — half the FLOPs of LU and much better
    MXU blocking on TPU. lamb == 0 on a rank-deficient covariance has
    no unique solution and yields NaNs under Cholesky OR LU; the
    caller detects this and retries with force_eig=True, whose
    whitening zeroes degenerate eigendirections (the pseudoinverse
    answer).
    """
    import jax.scipy.linalg as jsl
    num_files = stacked_stats.count.shape[0]

    if use_ridge and not force_eig and lambdas.shape[0] < 24:
        # The leave-one-out augmented covariance is lambda-INDEPENDENT:
        # build each file's symmetrized szz/n + szy/n ONCE ([F, D, D],
        # ~1 GB at codelab width — the same transient each lambda
        # iteration would materialize anyway) so the lambda loop only
        # adds lamb*I and factors; the loop itself batches lambdas in
        # chunks (_lam_chunk_units). Measured on v5e at codelab scale
        # (40 files x 9 lambdas, width 2553): 0.74 s unhoisted ->
        # 0.59 s hoisted -> 0.52 s chunked, against a batched-Cholesky
        # floor of 0.37 s (~5.5 TFLOPS) for the same 360
        # factorizations.
        from telluride_decoding_tpu.solvers.ridge import (
            _augmented_moments)

        def file_aug(file_idx):
            ts = _total_minus(stacked_stats, total, file_idx)
            n = ts.count
            szz, szy = _augmented_moments(ts)
            cov = szz / n
            return 0.5 * (cov + cov.T), szy / n

        cov_all, rhs_all = jax.vmap(file_aug)(jnp.arange(num_files))
        eye = jnp.eye(cov_all.shape[-1])

        def eval_chol(file_idx, lamb):
            l = jnp.linalg.cholesky(cov_all[file_idx] + lamb * eye)
            solution = jsl.cho_solve((l, True), rhs_all[file_idx])
            return _linear_r_from_stats(
                _tree_index(stacked_stats, file_idx),
                solution[:-1], solution[-1])

        chunk = _lam_chunk_units(num_files, cov_all.shape[-1] ** 2,
                                 lambdas.shape[0])
        return _chunked_lam_map(eval_chol, lambdas, num_files, chunk)

    def eval_one(file_idx, lamb):
        train_stats = _total_minus(stacked_stats, total, file_idx)
        sol = solve_ridge_from_moments(train_stats, lamb,
                                       use_ridge=use_ridge)
        return _linear_r_from_stats(
            _tree_index(stacked_stats, file_idx), sol.w,
            sol.b[None] if sol.b.ndim == 0 else sol.b)

    if (lambdas.shape[0] >= 24 or force_eig) and use_ridge:
        # LARGE grids amortize one eigendecomposition per file:
        # (cov + lamb I)^-1 b = V diag(1/(e + lamb)) V^T b, so every
        # additional lambda costs two thin matmuls instead of an
        # O(D^3) solve. (Augmented covariance is symmetric PSD.)
        # Threshold measured on v5e at codelab scale (40 files, width
        # 2553): direct solves are 0.38 s/lambda while the 40 eighs
        # cost a fixed ~8.4 s (TPU eigh is QR-iteration bound; batched
        # Cholesky solves ride the MXU) — crossover ~22 lambdas, so
        # the standard 9-lambda codelab grid takes the solve path
        # (3.45 s vs 8.47 s measured).
        def file_eig(file_idx):
            stats = _total_minus(stacked_stats, total, file_idx)
            n = stats.count
            from telluride_decoding_tpu.solvers.ridge import (
                _augmented_moments)
            szz, szy = _augmented_moments(stats)
            cov_x = szz / n
            cov_xy = szy / n
            e, v = jnp.linalg.eigh(0.5 * (cov_x + cov_x.T))
            return e, v, jnp.matmul(v.T, cov_xy,
                                    precision=jax.lax.Precision.HIGHEST)

        eigs = jax.vmap(file_eig)(jnp.arange(num_files))

        def eval_eig(file_idx, lamb):
            e, v, vt_cov_xy = [a[file_idx] for a in eigs]
            # Degenerate eigendirections (rank-deficient covariance
            # with lamb == 0) drop out of the solution — the
            # pseudoinverse answer — instead of dividing by ~0.
            shifted = e + lamb
            inv = jnp.where(shifted > 1e-12,
                            1.0 / jnp.maximum(shifted, 1e-12), 0.0)
            solution = jnp.matmul(v, vt_cov_xy * inv[:, None],
                                  precision=jax.lax.Precision.HIGHEST)
            return _linear_r_from_stats(
                _tree_index(stacked_stats, file_idx),
                solution[:-1, :], solution[-1, :])

        return jax.lax.map(
            lambda lamb: jax.vmap(lambda f: eval_eig(f, lamb))(
                jnp.arange(num_files)), lambdas)

    return jax.lax.map(
        lambda lamb: jax.vmap(lambda f: eval_one(f, lamb))(
            jnp.arange(num_files)), lambdas)


@jax.jit
def _cca_sweep_program_chol(stacked_stats: MomentStats,
                            total: MomentStats,
                            lambdas: jax.Array):
    """CCA grid with Cholesky whitening — the default fast path.

    Canonical correlations are invariant to the whitening choice (any
    W with W cov W^T = I); with W = L^-1 from cov + lamb*I = L L^T the
    per-(lambda, file) cost is one Cholesky + triangular solves, which
    ride the MXU — measured 9.4x faster than the eigh-based program at
    codelab scale on v5e (0.94 s vs 8.85 s for 40 files x 9 lambdas at
    width 2553), with correlations equal to 6e-5. Requires cov + lamb*I
    positive definite: lamb == 0 on a rank-deficient covariance yields
    NaNs, which the caller detects and retries with the eig program.

    Held-out evaluation runs from the file's own MomentStats
    (_cca_r_from_stats) — no raw frames in the program.
    """
    import jax.scipy.linalg as jsl
    num_files = stacked_stats.count.shape[0]
    dx = stacked_stats.sum_x.shape[1]
    dy = stacked_stats.sum_y.shape[1]

    # The leave-one-out covariances are lambda-INDEPENDENT: build each
    # file's symmetrized cov_xx/cov_yy/cov_xy + means ONCE so the
    # lambda loop only adds lamb*I and factors (same hoist as the
    # ridge program; the per-lambda cost is the Cholesky floor).
    def file_cov(file_idx):
        stats = _total_minus(stacked_stats, total, file_idx)
        _, _, cov_xx, cov_yy, cov_xy = cca_covariances_from_stats(stats)
        # Means are NOT returned: _cca_r_from_stats is shift-invariant,
        # so carrying [F, D] mean batches through the vmapped tuple
        # would only retain dead device memory.
        return (0.5 * (cov_xx + cov_xx.T), 0.5 * (cov_yy + cov_yy.T),
                cov_xy)

    covs = jax.vmap(file_cov)(jnp.arange(num_files))
    eye_x = jnp.eye(dx)
    eye_y = jnp.eye(dy)

    def eval_one(file_idx, lamb):
        cov_xx, cov_yy, cov_xy = [c[file_idx] for c in covs]
        l1 = jnp.linalg.cholesky(cov_xx + lamb * eye_x)
        l2 = jnp.linalg.cholesky(cov_yy + lamb * eye_y)
        t = jsl.solve_triangular(l1, cov_xy, lower=True)
        t = jsl.solve_triangular(l2, t.T, lower=True).T
        u, _, vt = jnp.linalg.svd(t, full_matrices=False)
        rot_x = jsl.solve_triangular(l1.T, u[:, :1], lower=False)
        rot_y = jsl.solve_triangular(l2.T, vt.T[:, :1], lower=False)
        return _cca_r_from_stats(_tree_index(stacked_stats, file_idx),
                                 rot_x[:, 0], rot_y[:, 0])

    chunk = _lam_chunk_units(num_files, dx * dx + dy * dy,
                             lambdas.shape[0])
    return _chunked_lam_map(eval_one, lambdas, num_files, chunk)


@jax.jit
def _cca_sweep_program(stacked_stats: MomentStats, total: MomentStats,
                       lambdas: jax.Array):
    """CCA grid with eigendecomposition reuse across the lambda axis.

    (cov + lamb*I) shares eigenvectors with cov — only the eigenvalues
    shift — so each held-out file's covariances are diagonalized ONCE
    and every lambda reuses the basis with 1/sqrt(e + lamb) whitening.
    On TPU the eighs themselves dominate (QR-iteration bound), so this
    is the FALLBACK for grids the Cholesky program cannot factor
    (rank-deficient covariance with lamb == 0): degenerate
    eigendirections are zeroed out of the whitening product.
    """
    num_files = stacked_stats.count.shape[0]

    def file_eig(file_idx):
        stats = _total_minus(stacked_stats, total, file_idx)
        _, _, cov_xx, cov_yy, cov_xy = cca_covariances_from_stats(stats)
        ex, vx = jnp.linalg.eigh(0.5 * (cov_xx + cov_xx.T))
        ey, vy = jnp.linalg.eigh(0.5 * (cov_yy + cov_yy.T))
        return ex, vx, ey, vy, cov_xy

    eigs = jax.vmap(file_eig)(jnp.arange(num_files))

    def eval_one(file_idx, lamb):
        ex, vx, ey, vy, cov_xy = [e[file_idx] for e in eigs]
        # Match solve_cca_from_moments: degenerate eigendirections
        # (float32 eigh can return small negatives on rank-deficient
        # covariances) are ZEROED out of the whitening product, not
        # clamped to 1e-12 (which would amplify them ~1e6x).
        def inv_sqrt(e):
            shifted = e + lamb
            return jnp.where(shifted > 1e-12,
                             jax.lax.rsqrt(jnp.maximum(shifted, 1e-12)),
                             0.0)

        inv_x = inv_sqrt(ex)
        inv_y = inv_sqrt(ey)
        highest = jax.lax.Precision.HIGHEST
        k11 = jnp.matmul(vx * inv_x[None, :], vx.T, precision=highest)
        k22 = jnp.matmul(vy * inv_y[None, :], vy.T, precision=highest)
        t = jnp.matmul(jnp.matmul(k11, cov_xy, precision=highest), k22,
                       precision=highest)
        u, _, vt = jnp.linalg.svd(t, full_matrices=False)
        rot_x = jnp.matmul(k11, u[:, :1], precision=highest)
        rot_y = jnp.matmul(k22, vt.T[:, :1], precision=highest)
        return _cca_r_from_stats(_tree_index(stacked_stats, file_idx),
                                 rot_x[:, 0], rot_y[:, 0])

    return jax.lax.map(
        lambda lamb: jax.vmap(lambda f: eval_one(f, lamb))(
            jnp.arange(num_files)), lambdas)


def _mesh_file_padding(num_real: int, pad_files_to: Optional[int],
                       mesh: Optional['jax.sharding.Mesh']
                       ) -> Optional[int]:
    """File-axis padding target that is shardable over the mesh.

    Rounds the requested (or natural) file count up to a multiple of
    the mesh's first-axis size so NON-DIVISIBLE cohorts still shard
    (e.g. 22 files on 8 devices pad to 24 and run 3-per-device instead
    of silently falling back to one device). Padding files are masked
    to zero, contribute exact-zero statistics, and are sliced away
    from the result.
    """
    target = max(num_real, pad_files_to or 0)
    if mesh is not None:
        shards = mesh.devices.shape[0]
        target = -(-target // shards) * shards
    return target if target > num_real else pad_files_to


def _shard_over_mesh(arrays, mesh: Optional['jax.sharding.Mesh']):
    """Shards padded per-file arrays over the mesh's first axis.

    Callers pad the file axis to a mesh multiple via
    _mesh_file_padding, so the divisibility fallback below should be
    unreachable from the public sweep API; it stays as a loud safety
    net rather than a silent single-device demotion.
    """
    if mesh is None:
        return arrays
    from jax.sharding import NamedSharding, PartitionSpec as P
    axis = mesh.axis_names[0]
    out = []
    for a in arrays:
        if a.shape[0] % mesh.devices.shape[0] == 0:
            spec = P(axis) if a.ndim == 1 else P(axis, *([None] *
                                                         (a.ndim - 1)))
            out.append(jax.device_put(a, NamedSharding(mesh, spec)))
        else:
            import warnings
            warnings.warn(
                'sweep: file axis %d not divisible by mesh size %d; '
                'running UNSHARDED (callers should pad via '
                '_mesh_file_padding)' % (a.shape[0],
                                         mesh.devices.shape[0]))
            out.append(a)
    return out


def _shard_stats_over_mesh(stats: MomentStats,
                           mesh: Optional['jax.sharding.Mesh']
                           ) -> MomentStats:
    """Shards every [F, ...] stats leaf over the mesh's file axis."""
    if mesh is None:
        return stats
    leaves, treedef = jax.tree.flatten(stats)
    return jax.tree.unflatten(treedef, _shard_over_mesh(leaves, mesh))


class _InFlightSweep(NamedTuple):
    """A dispatched-but-not-read-back jackknife grid.

    Splitting dispatch from finalize lets the serial multi-subject
    loop software-pipeline: subject k+1's host staging + raw upload +
    program dispatch proceed while subject k's grid is still
    computing on device (np.asarray is the only blocking step).
    ``stacked``/``total`` are retained so the rare NaN fallback can
    re-dispatch the eig program without recomputing moments.
    """

    corr: jax.Array            # In-flight [L, F_padded] correlations.
    stacked: MomentStats
    total: MomentStats
    lambdas: np.ndarray
    lambdas_arr: jax.Array
    num_real: int
    file_names: Optional[List[str]]
    model: str                 # 'ridge' | 'cca'
    use_ridge: bool


def _dispatch_sweep(model: str,
                    per_file_x, per_file_y, lambdas,
                    file_names=None, mesh=None, use_ridge=True,
                    pad_files_to=None, pad_frames_to=None,
                    context=None) -> _InFlightSweep:
    """Moments + grid dispatch for one subject; returns without
    blocking on the device result."""
    num_real = len(per_file_x)
    per_file_y = [_ensure_2d(y) for y in per_file_y]
    pad_files_to = _mesh_file_padding(num_real, pad_files_to, mesh)
    if (model != 'cca' and not use_ridge
            and any(float(l) < 0 for l in np.asarray(lambdas).ravel())):
        # The moments programs carry no sum(x^2.T @ x^2), so the
        # Ledoit-Wolf auto sentinel (-1) cannot be honored here;
        # solve_ridge_from_moments would silently clip it to
        # shrinkage=0 and the sweep row labeled -1 would really be 0.
        raise ValueError(
            'shrinkage sweep (use_ridge=False) cannot honor the -1 '
            'auto-shrinkage sentinel: the moments-only programs lack '
            'the Ledoit-Wolf sum(x2.T x2) statistic. Use the dense '
            'path (solvers.ridge.calculate_linear_regressor_'
            'parameters) for lamb=-1, or pass explicit shrinkage '
            'values in [0, 1].')
    lambdas_arr = jnp.asarray(np.asarray(lambdas, np.float32))
    stacked = per_file_stats(per_file_x, per_file_y, want_syy=True,
                             pad_files_to=pad_files_to,
                             pad_frames_to=pad_frames_to,
                             context=context)
    stacked = _shard_stats_over_mesh(stacked, mesh)
    total = jax.tree.map(lambda s: jnp.sum(s, axis=0), stacked)
    if model == 'cca':
        corr = _cca_sweep_program_chol(stacked, total, lambdas_arr)
    else:
        corr = _ridge_sweep_program(stacked, total, lambdas_arr,
                                    use_ridge=use_ridge)
    return _InFlightSweep(corr, stacked, total,
                          np.asarray(lambdas), lambdas_arr, num_real,
                          file_names, model, use_ridge)


def _finalize_sweep(inflight: _InFlightSweep) -> SweepResult:
    """Blocks on the dispatched grid; applies the NaN->eig fallback."""
    num_real = inflight.num_real
    corr = np.asarray(inflight.corr)
    if not np.isfinite(corr[:, :num_real]).all():
        # Rank-deficient covariance with lamb == 0 breaks Cholesky
        # and LU alike: the eig program zeroes degenerate directions
        # instead (the pseudoinverse answer). Only the ridge family
        # has a distinct eig program — for shrinkage (use_ridge=False)
        # force_eig is a no-op, so retrying would recompile the
        # identical program.
        if inflight.model == 'cca':
            corr = np.asarray(_cca_sweep_program(
                inflight.stacked, inflight.total, inflight.lambdas_arr))
        elif inflight.use_ridge:
            corr = np.asarray(_ridge_sweep_program(
                inflight.stacked, inflight.total, inflight.lambdas_arr,
                use_ridge=inflight.use_ridge, force_eig=True))
    return SweepResult(corr[:, :num_real],
                       inflight.lambdas,
                       inflight.file_names or
                       ['file%d' % i for i in range(num_real)])


def ridge_jackknife_sweep(per_file_x: Sequence[np.ndarray],
                          per_file_y: Sequence[np.ndarray],
                          lambdas: Sequence[float],
                          file_names: Optional[List[str]] = None,
                          mesh: Optional['jax.sharding.Mesh'] = None,
                          use_ridge: bool = True,
                          pad_files_to: Optional[int] = None,
                          pad_frames_to: Optional[int] = None,
                          context: Optional[ContextSpec] = None
                          ) -> SweepResult:
    """Leave-one-file-out ridge sweep over a lambda grid, one program.

    per_file_x[i]: lag-stacked input of file i ([N_i, Dx]) — or RAW
    [N_i + x_post, dx] streams with ``context`` (on-device lag
    expansion); per_file_y[i]: target ([N_i, Dy] or [N_i]). Returns
    correlations[num_lambdas, num_files] where entry (l, f) is the test
    correlation of a model trained on all files but f with
    regularization lambdas[l].

    pad_files_to forces a shared program shape so a whole ragged
    cohort reuses ONE compilation (padding contributes exact-zero
    statistics and is sliced away from the result). pad_frames_to
    only shapes the TRANSIENT moments stack (one compile across
    ragged lengths): evaluation runs from per-file MomentStats, so
    raw frames never enter the sweep program itself.
    """
    return _finalize_sweep(_dispatch_sweep(
        'ridge', per_file_x, per_file_y, lambdas,
        file_names=file_names, mesh=mesh, use_ridge=use_ridge,
        pad_files_to=pad_files_to, pad_frames_to=pad_frames_to,
        context=context))


def cca_jackknife_sweep(per_file_x: Sequence[np.ndarray],
                        per_file_y: Sequence[np.ndarray],
                        lambdas: Sequence[float],
                        dims: int = 5,
                        file_names: Optional[List[str]] = None,
                        mesh: Optional['jax.sharding.Mesh'] = None,
                        pad_files_to: Optional[int] = None,
                        pad_frames_to: Optional[int] = None,
                        context: Optional[ContextSpec] = None
                        ) -> SweepResult:
    """Leave-one-file-out CCA sweep (correlation of first canonical
    pair on the held-out file) over a regularization grid.
    pad_frames_to only shapes the transient moments stack.

    ``dims`` is accepted for API symmetry with the CCA model family
    but does NOT affect the sweep: the metric is the FIRST canonical
    pair, matching the reference jackknife's
    cca_pearson_correlation_first (reference regression.py:463-482
    presets select that metric regardless of cca_dimensions). It is
    deliberately NOT threaded into the jitted programs, where a
    static arg would recompile the identical program per value."""
    del dims
    return _finalize_sweep(_dispatch_sweep(
        'cca', per_file_x, per_file_y, lambdas,
        file_names=file_names, mesh=mesh,
        pad_files_to=pad_files_to, pad_frames_to=pad_frames_to,
        context=context))


@functools.partial(jax.jit, static_argnames=('mesh', 'model',
                                             'use_ridge', 'force_eig'))
def _subject_sweep_sharded(stats: MomentStats, lambdas: jax.Array,
                           mesh: 'jax.sharding.Mesh', model: str,
                           use_ridge: bool,
                           force_eig: bool) -> jax.Array:
    """[S, L, F] correlations with the SUBJECT axis sharded over the
    mesh, from [S, F, ...] per-file MomentStats alone.

    Subjects share nothing (files never mix across subjects), so each
    device runs its local subjects' whole jackknife x lambda grid with
    zero collectives — the ICI cost is one result gather. shard_map
    (not plain jit-with-sharded-inputs) pins this layout: the
    per-subject programs run device-local instead of XLA speculating
    cross-device gathers for the dynamic file indexing inside.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    axis = mesh.axis_names[0]

    def per_shard(stats, lambdas):
        def one(stacked):
            total = jax.tree.map(lambda s: jnp.sum(s, axis=0), stacked)
            if model == 'cca':
                if force_eig:
                    return _cca_sweep_program(stacked, total, lambdas)
                return _cca_sweep_program_chol(stacked, total, lambdas)
            return _ridge_sweep_program(stacked, total, lambdas,
                                        use_ridge=use_ridge,
                                        force_eig=force_eig)
        return jax.vmap(one)(stats)

    return shard_map(per_shard, mesh=mesh,
                     in_specs=(P(axis), P()),
                     out_specs=P(axis))(stats, lambdas)


def _subject_parallel_sweep(items, lambdas, model, dims, mesh,
                            use_ridge, pad_files_to, pad_frames_to,
                            context: Optional[ContextSpec] = None):
    """Runs the cohort in subject-sharded groups of mesh-size chunks.

    Each subject's per-file MomentStats are computed directly ON its
    target device (jax.default_device routes the moment programs), and
    the group's [S, F, ...] stats batch is assembled shard-by-shard
    with make_array_from_single_device_arrays — so neither the raw
    [S, F, N, D] frames (the old path staged ~12 GB of host buffer at
    jens scale) nor the stats ever pass through a host-side global
    buffer. Groups reuse ONE compiled sweep program; the final group
    pads with zero-stat dummy subjects whose rows are sliced away.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    ndev = mesh.devices.shape[0]
    axis = mesh.axis_names[0]
    devices = mesh.devices.reshape(-1)
    lambdas_arr = jnp.asarray(np.asarray(lambdas, np.float32))
    num_l = lambdas_arr.shape[0]
    want_syy = True   # Moments-only eval always needs syy.

    def subject_batch(group):
        """[S, F, ...] MomentStats sharded subject-per-device."""
        dx = _ensure_2d(group[0][1][0][0]).shape[1]
        dy = _ensure_2d(group[0][1][1][0]).shape[1]
        if context is not None and any(context):
            dx, dy = context.stacked_widths(dx, dy)
        # A (streamed) subject may exceed the declared pad_files_to;
        # every shard in the group must still share one file-axis
        # length for make_array_from_single_device_arrays, so pad the
        # whole group to its own maximum (the documented behavior:
        # such subjects compute correctly, at worst recompiling).
        group_files = max([pad_files_to]
                          + [len(xs) for _, (xs, _) in group])
        shards = []   # Per-device stats trees, each [1, F, ...].
        for i in range(ndev):
            with jax.default_device(devices[i]):
                if i < len(group):
                    _, (xs_i, ys_i) = group[i]
                    stats_i = per_file_stats(
                        xs_i, ys_i, want_syy=want_syy,
                        pad_files_to=group_files,
                        pad_frames_to=pad_frames_to,
                        context=context)
                else:
                    from telluride_decoding_tpu.ops.covariance import (
                        zeros_moments)
                    zero = zeros_moments(dx, dy)
                    stats_i = jax.tree.map(
                        lambda z: jnp.broadcast_to(
                            z, (group_files,) + z.shape), zero)
                shards.append(jax.tree.map(lambda a: a[None], stats_i))
        leaves = [jax.tree.flatten(s)[0] for s in shards]
        treedef = jax.tree.structure(shards[0])
        global_leaves = []
        for parts in zip(*leaves):
            shape = (ndev,) + parts[0].shape[1:]
            sharding = NamedSharding(
                mesh, P(axis, *([None] * (parts[0].ndim - 1))))
            global_leaves.append(
                jax.make_array_from_single_device_arrays(
                    shape, sharding,
                    [jax.device_put(p, d)
                     for p, d in zip(parts, devices)]))
        return jax.tree.unflatten(treedef, global_leaves)

    results = {}
    items_iter = iter(items)
    while True:
        group = list(itertools.islice(items_iter, ndev))
        if not group:
            break
        stats = subject_batch(group)
        corr = np.asarray(_subject_sweep_sharded(
            stats, lambdas_arr, mesh, model, use_ridge, False))
        for i, (name, (xs_i, ys_i)) in enumerate(group):
            num_real = len(xs_i)
            sub_corr = corr[i, :num_l, :num_real]
            if (not np.isfinite(sub_corr).all()
                    and (use_ridge or model == 'cca')):
                # Rank-deficient covariance with lamb == 0 broke
                # Cholesky for THIS subject; rerun only it through the
                # serial path, whose internal eig fallback zeroes
                # degenerate directions — healthy groupmates keep
                # their Cholesky results (identical to the serial
                # engine's behavior).
                if model == 'cca':
                    retry = cca_jackknife_sweep(
                        xs_i, ys_i, lambdas, dims=dims,
                        pad_files_to=pad_files_to,
                        pad_frames_to=pad_frames_to, context=context)
                else:
                    retry = ridge_jackknife_sweep(
                        xs_i, ys_i, lambdas, use_ridge=use_ridge,
                        pad_files_to=pad_files_to,
                        pad_frames_to=pad_frames_to, context=context)
                sub_corr = retry.correlations
            results[name] = SweepResult(
                sub_corr, np.asarray(lambdas),
                ['file%d' % f for f in range(num_real)])
    return results


def multi_subject_sweep(subjects, lambdas: Sequence[float],
                        model: str = 'ridge', dims: int = 5,
                        mesh: Optional['jax.sharding.Mesh'] = None,
                        use_ridge: bool = True,
                        shared_shapes: bool = True,
                        subject_parallel: bool = False,
                        context: Optional[ContextSpec] = None,
                        pad_files_to: Optional[int] = None,
                        pad_frames_to: Optional[int] = None):
    """Per-subject jackknife x lambda grids for a whole cohort.

    ``subjects`` maps subject name -> (per_file_x, per_file_y) — a
    dict/list (eager), or any other iterable of (name, (xs, ys)) pairs
    (STREAMING: subjects are consumed lazily, so a prefetching loader
    bounds host residency at ~two subjects instead of the whole cohort
    while the depth-2 dispatch pipeline below overlaps subject k+1's
    ingest+upload with subject k's on-device grid). Each subject's
    leave-one-out runs independently (files never mix across
    subjects). With shared_shapes (the default) every subject pads to
    the cohort's (max files, max frames) shape, so a RAGGED cohort —
    different trial counts or lengths per subject — still compiles the
    sweep program exactly ONCE; a 22-subject x 40-trial x 9-lambda
    cohort (the codelab's full experiment, ~8k model fits) runs in
    seconds. Returns {subject: SweepResult} (padding sliced away).

    ``pad_files_to``/``pad_frames_to`` override the shared program
    shape (frames in COMMON zip-truncated units when ``context`` is
    set). Eager callers may omit them (the maxima are derived from the
    data); a lazy iterable cannot be scanned without materializing it,
    so streaming callers MUST supply both (cli.cohort.prescan_cohort
    derives them from TFRecord record counts without decoding). A
    streaming subject whose shapes exceed the declared pads still
    computes correctly but recompiles the sweep program for its larger
    shape.

    With subject_parallel and a multi-device mesh, the SUBJECT axis is
    sharded over the mesh (groups of ndev subjects run concurrently,
    one per device, zero collectives) — the right layout when HBM fits
    ndev subjects at once. Without it, subjects run serially and the
    mesh (if any) shards each subject's FILE axis instead — the right
    layout when one subject's data strains HBM.
    """
    if hasattr(subjects, 'items'):
        items = list(subjects.items())
    elif isinstance(subjects, (list, tuple)):
        items = list(subjects)
    else:
        items = None   # Lazy iterable: consume subject by subject.
    # With a context spec the arrays are raw and pad_frames_to is in
    # COMMON-axis units: n_i = raw x length - x_post.
    x_post = context.x_post if context is not None else 0
    want_parallel = (subject_parallel and mesh is not None
                     and mesh.devices.shape[0] > 1)
    if items is None:
        if (shared_shapes or want_parallel) and (
                pad_files_to is None or pad_frames_to is None):
            raise ValueError(
                'multi_subject_sweep got a lazy subject iterable: '
                'shared program shapes cannot be derived without '
                'materializing every subject, so pass pad_files_to '
                'AND pad_frames_to explicitly (or pass a dict/list).')
        items = subjects
    else:
        if shared_shapes and len(items) > 1:
            if pad_files_to is None:
                pad_files_to = max(len(xs) for _, (xs, _) in items)
            if pad_frames_to is None:
                pad_frames_to = max(x.shape[0] for _, (xs, _) in items
                                    for x in xs) - x_post
    if want_parallel:
        if not isinstance(items, list):
            pass   # Streaming: pads were validated above.
        else:
            pad_files_to = pad_files_to or max(len(xs)
                                               for _, (xs, _) in items)
            pad_frames_to = pad_frames_to or (
                max(x.shape[0] for _, (xs, _) in items for x in xs)
                - x_post)
        return _subject_parallel_sweep(items, lambdas, model, dims,
                                       mesh, use_ridge, pad_files_to,
                                       pad_frames_to, context=context)
    # Software-pipelined serial loop (depth 2): subject k+1's host
    # staging + upload + dispatch overlap subject k's on-device grid
    # (np.asarray in _finalize_sweep is the only blocking step). Peak
    # HBM holds two subjects' MomentStats — O(F * D^2) each.
    del dims
    results = {}
    pending: Optional[Tuple[str, _InFlightSweep]] = None
    for name, (xs, ys) in items:
        inflight = _dispatch_sweep(
            'cca' if model == 'cca' else 'ridge', xs, ys, lambdas,
            mesh=mesh, use_ridge=use_ridge,
            pad_files_to=pad_files_to, pad_frames_to=pad_frames_to,
            context=context)
        if pending is not None:
            results[pending[0]] = _finalize_sweep(pending[1])
        pending = (name, inflight)
    if pending is not None:
        results[pending[0]] = _finalize_sweep(pending[1])
    return results


def cohort_summary(results) -> Tuple[np.ndarray, np.ndarray]:
    """Mean/std correlation per lambda across all subjects' held-out
    files (the codelab's cross-subject analysis)."""
    all_corr = np.concatenate([r.correlations for r in results.values()],
                              axis=1)
    return np.mean(all_corr, axis=1), np.std(all_corr, axis=1)


def default_mesh(axis_name: str = 'file') -> Optional['jax.sharding.Mesh']:
    """A 1-D mesh over all local devices (None if single-device)."""
    devices = jax.devices()
    if len(devices) <= 1:
        return None
    from jax.sharding import Mesh
    return Mesh(np.array(devices), (axis_name,))
