"""Benchmark: decode windows/sec/chip on the flagship CCA pipeline.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The JSON line is printed (and flushed) the moment the headline
measurement exists — BEFORE any diagnostics — so a driver timeout
that kills the tail still captures the perf number.  Diagnostics go
to stderr, one line per stage as each completes, under a wall-clock
budget (TDT_BENCH_DIAG_BUDGET_S, default 240 s); stages past the
budget are skipped with a note.

The workload is the codelab-scale decode path (inputs 2553 + 31, 10
CCA dims): per window of 100 frames, rotate both inputs, compute the
normalized correlation, reduce through LDA, and emit one attention
score — the serving inner loop of the framework.

Baseline: the reference evaluates this model through Keras at ~5 ms
per 1000-frame batch on a workstation (doc/DecodingCodelab.md:654),
i.e. ~2,000 windows/s of 100 frames. vs_baseline is measured
throughput / 2000.

All data is generated on-device (no host transfer in the timed
region).
"""

import json
import os
import sys
import time

_T_START = time.perf_counter()


def _diag(msg):
    """One stderr line per event, flushed immediately (driver-visible
    even if a timeout kills the process mid-diagnostics)."""
    print('diag[t+%.1fs]: %s' % (time.perf_counter() - _T_START, msg),
          file=sys.stderr, flush=True)


_diag('bench start (importing jax)')

import jax  # noqa: E402

# Persistent compilation cache: repeated bench runs skip the remote
# TPU compile round trips (TPU-only; see utils/compile_cache.py).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from telluride_decoding_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compilation_cache)

enable_persistent_compilation_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# The flagship model definition is shared with the driver entry point
# (one source of truth for the codelab-scale shapes and parameters).
from __graft_entry__ import CCA_DIMS as DIMS  # noqa: E402,F401
from __graft_entry__ import IN1_WIDTH as IN1  # noqa: E402
from __graft_entry__ import IN2_WIDTH as IN2  # noqa: E402
from __graft_entry__ import flagship_params as _params  # noqa: E402

WINDOW = 100
BASELINE_WINDOWS_PER_SEC = 2000.0
DIAG_BUDGET_S = float(os.environ.get('TDT_BENCH_DIAG_BUDGET_S', '240'))
# CI smoke knobs (tests/test_bench_smoke.py): TDT_BENCH_DIAG_SCALE
# shrinks every diagnostic stage's shapes by the given factor and
# TDT_BENCH_DIAG_FORCE=1 runs the TPU-only stages on CPU too, so the
# WHOLE diagnostics path executes in CI at toy sizes — guarding
# against engine-signature drift that only a real-TPU run would
# otherwise catch. Production runs leave both unset.
DIAG_SCALE = float(os.environ.get('TDT_BENCH_DIAG_SCALE', '1'))
DIAG_FORCE = os.environ.get('TDT_BENCH_DIAG_FORCE', '') not in ('', '0')


def _decode_windows(params, x1, x2):
    """[W, WINDOW, IN*] batch of windows -> [W] attention scores.

    TPU-optimized form: the mean subtraction folds into a bias
    ((x - m) @ R = x @ R - m @ R) so the window data streams through
    the MXU in its storage dtype (bf16 halves the HBM traffic that
    bounds this op) with float32 accumulation.
    """
    r1 = jnp.einsum('wtf,fd->wtd', x1, params['rot1'].astype(x1.dtype),
                    preferred_element_type=jnp.float32) - \
        (params['mean1'] @ params['rot1'])
    r2 = jnp.einsum('wtf,fd->wtd', x2, params['rot2'].astype(x2.dtype),
                    preferred_element_type=jnp.float32) - \
        (params['mean2'] @ params['rot2'])
    corr = ((r1 - params['corr_mean_x']) * (r2 - params['corr_mean_y']) /
            params['corr_power'])
    projected = jnp.einsum('wtd,dk->wtk', corr, params['lda_w'],
                           preferred_element_type=jnp.float32)
    scores = params['lda_slope'] * projected[..., 0] + \
        params['lda_intercept']
    return jnp.mean(scores, axis=1)


def sync(value):
    # device_get of a scalar forces completion of all queued work;
    # on the tunneled (axon) backend block_until_ready returns
    # before remote execution finishes, so a readback is the only
    # honest barrier.
    return float(jax.device_get(jnp.sum(value)))


NUM_WINDOWS = 512
REPS = 50
if DIAG_SCALE < 1:   # CI smoke: shrink the headline batch too.
    NUM_WINDOWS = max(8, round(512 * DIAG_SCALE))
    REPS = max(2, round(50 * DIAG_SCALE))


@jax.jit
def _make_data(key):
    k1, k2 = jax.random.split(key)
    # Windows stored in bf16: EEG/audio dynamic range fits easily,
    # and it halves the HBM read that bounds this op.
    x1 = jax.random.normal(k1, (NUM_WINDOWS, WINDOW, IN1),
                           jnp.float32).astype(jnp.bfloat16)
    x2 = jax.random.normal(k2, (NUM_WINDOWS, WINDOW, IN2),
                           jnp.float32).astype(jnp.bfloat16)
    return x1, x2


@jax.jit
def _decode_reps(params, x1, x2, n_reps):
    # The repetition loop runs ON DEVICE (one dispatch measures n_reps
    # full decodes) so tunnel dispatch latency does not pollute the
    # throughput number. The trip count is a traced scalar so the
    # short and long arms of the differential timing below share ONE
    # compiled program.
    #
    # CRITICAL: the carried score must feed the ROTATION, not just a
    # final scalar add. With only `lda_intercept=bias` varying, every
    # expensive op in the body is loop-invariant and XLA's
    # while-loop-invariant code motion hoists the whole decode out of
    # the loop — the "n_reps decodes" dispatch then measures ONE
    # decode plus loop overhead (this silently inflated the r03/r04
    # headline; caught by the short-vs-long arm differential, which
    # came back flat). rot1 + tiny*bias makes the wide einsum depend
    # on the carry: nothing hoists, every iteration re-reads x1 from
    # HBM and re-runs the MXU work, and the 1e-12 perturbation is far
    # below the measurement's meaning.
    def body(_, carry):
        acc, bias = carry
        p = dict(params,
                 rot1=params['rot1'] + 1e-12 * bias,
                 lda_intercept=bias)
        scores = _decode_windows(p, x1, x2)
        return acc + scores, scores[0]
    acc, _ = jax.lax.fori_loop(
        0, n_reps, body,
        (jnp.zeros((NUM_WINDOWS,), jnp.float32), jnp.float32(0)))
    return acc


def _start_heartbeat():
    """Background thread printing liveness every 30 s until the
    headline JSON is out — a driver watching a wedged tunnel sees a
    stall, not silence."""
    import threading
    stop = threading.Event()

    def beat():
        while not stop.wait(30):
            _diag('heartbeat (still working; remote compiles can '
                  'take 5-60 s each, tunnel congestion longer)')

    t = threading.Thread(target=beat, daemon=True)
    t.start()
    return stop


HEADLINE_DISPATCHES = int(os.environ.get('TDT_BENCH_HEADLINE_K', '5'))


def measure_headline(params):
    """Throughput of the flagship decode; needs only 2 jitted programs.

    Differential timing over best-of-K dispatches: every timed
    dispatch through the tunnel is device_time + one readback RTT, and
    at ~26 ms of device work a ~30 ms congested RTT costs 15-50% of a
    single-dispatch number (BENCH_r04 recorded 754,904 windows/s on a
    chip that self-measured 1,009,905 the same day). So the headline
    times a SHORT (REPS) and a LONG (3x REPS) on-device rep loop —
    same compiled program, traced trip count — takes the best of K
    dispatches of each (best = least tunnel pollution), and divides
    the extra windows by the extra time: the constant RTT term
    cancels, leaving pure device throughput. The workload is
    deterministic and HBM-roofline-bound (docs/performance.md), so
    this is the number the chip actually sustains; per-dispatch rates
    and the RTT they carry go to stderr.
    """
    _diag('devices=%s platform=%s' %
          (len(jax.devices()), jax.devices()[0].platform))
    x1, x2 = _make_data(jax.random.PRNGKey(0))
    sync(x1[0, 0, 0])
    _diag('data on device')
    reps_long = 3 * REPS
    sync(_decode_reps(params, x1, x2, REPS))     # Warm-up compile.
    _diag('decode program compiled + warm')

    def timed_dispatch_s(n_reps):
        t0 = time.perf_counter()
        acc = _decode_reps(params, x1, x2, n_reps)
        sync(acc)
        return time.perf_counter() - t0

    # INTERLEAVE the arms (S,L,S,L,...): a multi-second congestion
    # window then pollutes both arms' sample sets instead of landing
    # entirely on one arm, which would shrink (t_long - t_short) and
    # inflate the differential while each arm's own spread looked
    # clean.
    short_times, long_times = [], []
    for _ in range(max(1, HEADLINE_DISPATCHES)):
        short_times.append(timed_dispatch_s(REPS))
        long_times.append(timed_dispatch_s(reps_long))
    t_short, t_long = min(short_times), min(long_times)
    rate, verdict = headline_rate(t_short, t_long, REPS, reps_long,
                                  NUM_WINDOWS)
    single_rate = NUM_WINDOWS * REPS / t_short
    if verdict == 'differential':
        rtt_est_ms = max(0.0, (3 * t_short - t_long) / 2) * 1000
        _diag('headline differential: best short(%d reps)=%.1fms '
              'best long(%d reps)=%.1fms interleaved K=%d each -> '
              '%.0f windows/s device; per-dispatch RTT est %.1fms; '
              'single-dispatch best (r03/r04-comparable) = %.0f '
              'w/s; all short=%s long=%s (ms)'
              % (REPS, t_short * 1000, reps_long, t_long * 1000,
                 HEADLINE_DISPATCHES, rate, rtt_est_ms, single_rate,
                 ['%.1f' % (t * 1000) for t in short_times],
                 ['%.1f' % (t * 1000) for t in long_times]))
    elif verdict == 'implausible':
        _diag('headline differential IMPLAUSIBLE (> 2x long-arm raw '
              'rate): asymmetric congestion; falling back to '
              'single-dispatch best %.0f w/s (short %.1fms, long '
              '%.1fms)' % (rate, t_short * 1000, t_long * 1000))
    else:
        _diag('headline differential DEGENERATE (short %.1fms, long '
              '%.1fms < 1.5x): falling back to single-dispatch best '
              '%.0f w/s' % (t_short * 1000, t_long * 1000, rate))
    return rate, x1, x2


def headline_rate(t_short, t_long, reps_short, reps_long, num_windows):
    """Pure decision arithmetic for the differential headline
    (unit-tested in tests/test_bench_smoke.py). Returns
    (windows_per_sec, verdict) with verdict one of 'differential',
    'degenerate', 'implausible'.

    The differential is trustworthy only when the long arm's extra
    device work is visible OVER the constant per-dispatch term: with
    3x the trip count, t_long/t_short = (3d + r)/(d + r) >= 1.5 iff
    the RTT r is at most 3x the short arm's device time d. Below
    that, the subtraction is noise-dominated (and vulnerable to
    residual inter-arm asymmetry). The 2x-raw-long-rate cap is a
    belt-and-braces backstop: at the production 3x rep ratio it is
    EXACTLY complementary to the guard (diff > 2*raw <=> t_long <
    1.5*t_short, so it can never fire — pinned by a grid test), but
    it becomes load-bearing the moment the rep ratio changes. The
    primary defense against asymmetric congestion is the caller's
    interleaving of the two arms. Every fallback is the
    single-dispatch rate, which carries a whole RTT and therefore
    only UNDERSTATES the chip.
    """
    single_rate = num_windows * reps_short / t_short
    if t_long < t_short * 1.5:
        return single_rate, 'degenerate'
    rate = num_windows * (reps_long - reps_short) / (t_long - t_short)
    raw_long_rate = num_windows * reps_long / t_long
    if rate > 2.0 * raw_long_rate:
        return single_rate, 'implausible'
    return rate, 'differential'


def run_diagnostics(params, x1, x2):
    """Optional perf evidence, one stderr line per stage, budgeted."""
    t_diag = time.perf_counter()

    def over_budget(stage):
        spent = time.perf_counter() - t_diag
        if spent > DIAG_BUDGET_S:
            _diag('diag budget exhausted (%.0fs > %.0fs): skipping %s '
                  'and later stages' % (spent, DIAG_BUDGET_S, stage))
            return True
        return False

    def best_of(fn, k=3):
        """Best-of-k wall time of fn() (fn must block on its result).
        One congested-tunnel RTT inside any single timing window
        inflates it 2-3x at these durations; the best run is the
        device time."""
        times = []
        for _ in range(max(1, k)):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times), times

    # Stage 1: ridge solve latency.
    from telluride_decoding_tpu.ops.covariance import moments_from_arrays
    from telluride_decoding_tpu.solvers.ridge import solve_ridge_from_moments

    @jax.jit
    def ridge_program(key):
        kx, ky = jax.random.split(key)
        x = jax.random.normal(kx, (20000, 256), jnp.float32)
        y = jax.random.normal(ky, (20000, 4), jnp.float32)
        stats = moments_from_arrays(x, y)
        return solve_ridge_from_moments(stats, 0.1).w

    sync(ridge_program(jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    sync(ridge_program(jax.random.PRNGKey(2)))
    ridge_ms = (time.perf_counter() - t0) * 1000
    _diag('ridge_solve_ms=%.2f (20000x256 moments + solve)' % ridge_ms)
    if over_budget('streaming p50'):
        return

    # Stage 2: streaming p50 (dispatch RTT included, then device-only).
    one = jax.jit(lambda p, a, b: _decode_windows(p, a, b))
    xa, xb = x1[:1], x2[:1]
    sync(one(params, xa, xb))
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        sync(one(params, xa, xb))
        lat.append((time.perf_counter() - t0) * 1000)
    p50 = float(np.percentile(lat, 50))
    _diag('streaming_p50_ms=%.2f (includes dispatch RTT)' % p50)

    # On-device streaming latency: N sequential single-window decodes
    # as one device-resident loop with a data-dependent carry (window
    # i's score perturbs window i+1's ROTATION — feeding only the
    # final intercept lets XLA hoist the whole decode out of the loop
    # and the number degenerates to loop overhead), one readback at
    # the end. This is the serving per-window latency with the tunnel
    # RTT amortized away; the loop is deterministic so the mean IS the
    # p50. Target: <10 ms (BASELINE.md, reference path
    # infer_decoder.py:416-455).
    stream_n = 1000

    @jax.jit
    def stream_loop(params, xa, xb):
        def body(_, carry):
            acc, bias = carry
            p = dict(params,
                     rot1=params['rot1'] + 1e-12 * bias,
                     lda_intercept=bias)
            s = _decode_windows(p, xa, xb)
            return acc + s[0], s[0]
        acc, _ = jax.lax.fori_loop(
            0, stream_n, body, (jnp.float32(0), jnp.float32(0)))
        return acc

    sync(stream_loop(params, xa, xb))  # Warm-up compile.
    t0 = time.perf_counter()
    sync(stream_loop(params, xa, xb))
    p50_device = (time.perf_counter() - t0) * 1000 / stream_n
    _diag('streaming_p50_device_ms=%.4f (device-resident loop of %d '
          'windows, target <10ms)' % (p50_device, stream_n))
    if over_budget('codelab sweep'):
        return

    # Stage 3: north-star sweep — the full codelab-scale jackknife x
    # lambda grid (40 trials x 9 lambdas = 360 model fits at the jens
    # codelab width of 2553 lag-stacked channels) in one program.
    # (The reference documents ~1 hour per fit on a workstation.)
    from telluride_decoding_tpu.sweep.engine import (
        _ridge_sweep_program, per_file_stats)
    num_files = max(4, round(40 * DIAG_SCALE))
    frames = max(64, round(3300 * DIAG_SCALE))
    width = max(8, round(2553 * DIAG_SCALE))
    datakeys = jax.random.split(jax.random.PRNGKey(3), num_files)

    @jax.jit
    def make_file(k):
        kx, kn = jax.random.split(k)
        x = jax.random.normal(kx, (frames, width), jnp.float32)
        y = (x[:, :1] * 0.5 +
             0.1 * jax.random.normal(kn, (frames, 1), jnp.float32))
        return x, y

    xs_list, ys_list = [], []
    for k in datakeys:
        x, y = make_file(k)
        xs_list.append(x)
        ys_list.append(y)
    jax.block_until_ready(xs_list[-1])
    lambdas9 = jnp.asarray(np.logspace(-6, 2, 9), jnp.float32)

    def full_sweep():
        stacked = per_file_stats(xs_list, ys_list, want_syy=True)
        total = jax.tree.map(lambda s: jnp.sum(s, axis=0), stacked)
        return _ridge_sweep_program(stacked, total, lambdas9)

    sync(full_sweep())  # Warm-up compile.
    sweep_s, sweep_times = best_of(lambda: sync(full_sweep()))
    _diag('codelab_sweep_s=%.2f (40 files x 9 lambdas, width 2553: '
          '360 ridge fits, target <60s; best of %d, all: %s)'
          % (sweep_s, len(sweep_times),
             ['%.2f' % t for t in sweep_times]))
    if over_budget('CCA sweep'):
        return

    # Stage 4: same grid through the CCA program (Cholesky whitening).
    from telluride_decoding_tpu.sweep.engine import _cca_sweep_program_chol

    def full_cca_sweep():
        stacked = per_file_stats(xs_list, ys_list, want_syy=True)
        total = jax.tree.map(lambda s: jnp.sum(s, axis=0), stacked)
        return _cca_sweep_program_chol(stacked, total, lambdas9)

    sync(full_cca_sweep())  # Warm-up compile.
    cca_sweep_s, cca_times = best_of(lambda: sync(full_cca_sweep()))
    _diag('codelab_cca_sweep_s=%.2f (360 CCA fits, target <60s; '
          'best of %d, all: %s)'
          % (cca_sweep_s, len(cca_times),
             ['%.2f' % t for t in cca_times]))
    del xs_list, ys_list
    if over_budget('cohort sweep'):
        return

    # Stage 5: full-cohort sweep at codelab scale: 22 subjects x 40
    # trials x 9 lambdas (7920 model fits at width 2553 — the
    # codelab's ENTIRE experiment, which the reference runs as days of
    # shell jobs). Subjects are ragged (trial lengths differ) but pad
    # to one shared program shape, so the sweep compiles once; data is
    # generated and dropped per subject to bound HBM. TPU only
    # (minutes of matmuls on CPU). Emits a progress line every few
    # subjects and honors the budget between subjects.
    def cohort_stage():
        from telluride_decoding_tpu.sweep.engine import (
            ridge_jackknife_sweep)

        # Tunnel RTT probe: the cohort loop blocks on one host
        # readback per subject, so N_subjects x RTT is an irreducible
        # tunnel floor that the breakdown below attributes explicitly
        # (VERDICT r04: the 27 s capture vs the 14.7 s self-measured
        # floor carried no breakdown).
        tiny = jnp.float32(1.0)
        sync(tiny)
        rtt = []
        for _ in range(7):
            t0 = time.perf_counter()
            sync(tiny)
            rtt.append((time.perf_counter() - t0) * 1000)
        rtt_p50 = float(np.percentile(rtt, 50))
        _diag('tunnel_rtt_ms: p50=%.1f min=%.1f max=%.1f '
              '(trivial-readback probe, 7 samples)'
              % (rtt_p50, min(rtt), max(rtt)))

        num_subjects = max(2, round(22 * DIAG_SCALE))
        cohort_s = 0.0
        corr_peak = 0.0
        done = 0
        subj_times = []

        def make_subject(s):
            # Ragged cohort (delta scaled so toy frames stay positive).
            frames_s = frames - (s % 5) * max(1, round(37 * DIAG_SCALE))
            keys = jax.random.split(jax.random.PRNGKey(100 + s),
                                    num_files)
            xs_s, ys_s = [], []
            for k in keys:
                kx, kn = jax.random.split(k)
                x = jax.random.normal(kx, (frames_s, width),
                                      jnp.float32)
                y = (x[:, :1] * 0.5 + 0.1 * jax.random.normal(
                    kn, (frames_s, 1), jnp.float32))
                xs_s.append(x)
                ys_s.append(y)
            return xs_s, ys_s

        for s in range(num_subjects):
            if over_budget('cohort subjects %d..%d'
                           % (s, num_subjects - 1)):
                break
            xs_s, ys_s = make_subject(s)
            # Synthetic-data generation (1.3 GB of Threefry randoms
            # per subject) is NOT part of the workload — real cohorts
            # load records from disk — so only the moments + sweep
            # compute is timed.
            jax.block_until_ready(xs_s[-1])
            sync(xs_s[0][0, 0])
            t0 = time.perf_counter()
            res = ridge_jackknife_sweep(
                xs_s, ys_s, lambdas9, pad_files_to=num_files,
                pad_frames_to=frames)
            subj_times.append(time.perf_counter() - t0)
            cohort_s += subj_times[-1]
            corr_peak = max(corr_peak, float(res.correlations.max()))
            del xs_s, ys_s
            done += 1
            if done % 4 == 0:
                _diag('cohort progress: %d/%d subjects, %.2fs compute '
                      'so far' % (done, num_subjects, cohort_s))
        # done == 0 is a budget skip before the first subject, not a
        # correctness failure — only assert when something actually
        # ran.
        assert done == 0 or corr_peak > 0.9, corr_peak
        _diag('cohort_sweep_s=%.2f (%d/%d subjects x 40 trials x 9 '
              'lambdas at width 2553: %d fits, ragged, one compile)'
              % (cohort_s, done, num_subjects, done * 360))
        if done > 0:
            steady = subj_times[1:] or subj_times
            _diag('cohort breakdown 1/2 (wall): first_subject_s=%.2f '
                  '(carries the one compile of the padded shape), '
                  'steady per-subject p50=%.3fs min=%.3fs max=%.3fs; '
                  '%d blocking readbacks x rtt_p50 %.1fms = %.2fs '
                  'irreducible tunnel floor in the total'
                  % (subj_times[0], float(np.percentile(steady, 50)),
                     min(steady), max(steady), done, rtt_p50,
                     done * rtt_p50 / 1000))
            # Compute-only split on one subject (warm shapes): moments
            # accumulation vs the lambda-grid solve, each best-of-2
            # with its own readback barrier. Device compute floor per
            # subject = moments + grid; the remainder of the steady
            # per-subject time is dispatch/tunnel.
            xs_s, ys_s = make_subject(done - 1)
            jax.block_until_ready(xs_s[-1])

            def moments_arm():
                st = per_file_stats(xs_s, ys_s, want_syy=True,
                                    pad_files_to=num_files,
                                    pad_frames_to=frames)
                sync(st.sxx[0, 0, 0])
                return st

            def grid_arm(st, tot):
                sync(_ridge_sweep_program(st, tot, lambdas9))

            # Best-of-2 timed by hand so the second pass's RESULT is
            # kept for the grid arm (best_of would discard it, costing
            # a third full moments pass over the ~1.3 GB subject).
            t0 = time.perf_counter()
            st = moments_arm()
            m_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            st = moments_arm()
            moments_s = min(m_first, time.perf_counter() - t0)
            tot = jax.tree.map(lambda a: jnp.sum(a, axis=0), st)
            sync(tot.sxx[0, 0])
            grid_s, _ = best_of(lambda: grid_arm(st, tot), k=2)
            # Two bounds, because the cohort loop runs a depth-2
            # dispatch pipeline (subject k+1's moments overlap subject
            # k's grid solve): serial floor = moments+grid per
            # subject; perfect-overlap floor = max(moments, grid).
            # Steady wall p50 lands between them; anything above the
            # serial floor is dispatch/tunnel overhead.
            _diag('cohort breakdown 2/2 (compute, one warm subject): '
                  'moments_s=%.3f grid_solve_s=%.3f -> device floor '
                  'for %d subjects: %.2fs serial, %.2fs at perfect '
                  'depth-2 overlap (steady wall p50 falls between '
                  'them; above-serial excess is dispatch/tunnel)'
                  % (moments_s, grid_s, done,
                     done * (moments_s + grid_s),
                     done * max(moments_s, grid_s)))

    if jax.devices()[0].platform != 'tpu' and not DIAG_FORCE:
        # Skip only THIS stage (minutes of matmuls on CPU); the AOT
        # and ingest stages below still run / print their own markers.
        _diag('cohort sweep skipped (not on TPU)')
    else:
        cohort_stage()
    if over_budget('AOT serving artifact lane'):
        return

    # Stage 6: the DEPLOYMENT artifact (decode/aot.py serialized
    # StableHLO program) measured on device: per-chunk p50 through the
    # tunnel, device-side frames/s, and the sync vs pipelined
    # (infer_pair_async) replay A/B that docs/performance.md cites —
    # re-measured every round instead of quoted.
    import tempfile
    from telluride_decoding_tpu.data.brain_data import TestBrainData
    from telluride_decoding_tpu.decode import (LinearRegressionDecoder,
                                               aot)
    from telluride_decoding_tpu.models.brain_model import (
        BrainModelLinearRegression)
    rng_a = np.random.RandomState(11)
    n_fit = max(400, round(1200 * DIAG_SCALE))
    in_w = max(2, round(64 * DIAG_SCALE))
    eega = rng_a.randn(n_fit, in_w).astype(np.float32)
    outa = (eega[:, :1] * 0.5 + 0.3 +
            0.05 * rng_a.randn(n_fit, 1)).astype(np.float32)
    mdl = BrainModelLinearRegression(input_width=in_w, output_width=1,
                                     regularization_lambda=1e-4)
    tbd = TestBrainData('input_1', 'output', 100.0,
                        final_batch_size=400)
    tbd.preserve_test_data(eega, outa)
    mdl.fit(tbd.create_dataset('train'))
    live = LinearRegressionDecoder(mdl, reduction='mean')
    live.add_data_correlator(outa, outa)
    with tempfile.TemporaryDirectory() as adir:
        aot.export_decoder(live, adir, input_widths=(in_w, 1),
                           output_width=1)
        exported = aot.load_exported_decoder(adir)
        chunk = 32
        ca = eega[:chunk]
        c2, ya = outa[:chunk], outa[:chunk]
        yb = np.flip(outa[:chunk], axis=0).copy()
        exported.infer_pair(ca, c2, c2, ya, yb)   # Warm-up compile.
        lat = []
        for _ in range(20):
            t0 = time.perf_counter()
            exported.infer_pair(ca, c2, c2, ya, yb)
            lat.append((time.perf_counter() - t0) * 1000)
        aot_p50 = float(np.percentile(lat, 50))
        big = max(640, round(6400 * DIAG_SCALE))
        bx = np.tile(eega, (max(1, big // n_fit + 1), 1))[:big]
        by = np.tile(outa, (max(1, big // n_fit + 1), 1))[:big]
        byf = np.flip(by, axis=0).copy()
        exported.infer_pair(bx, by, by, by, byf)  # Warm-up compile.
        aot_big_s, _ = best_of(
            lambda: exported.infer_pair(bx, by, by, by, byf))
        _diag('aot_artifact: p50_ms=%.2f per %d-frame chunk (incl '
              'dispatch RTT), %.0f frames/s on a %d-frame chunk '
              '(serialized StableHLO program, not the live decoder)'
              % (aot_p50, chunk, big / aot_big_s, big))
        if over_budget('pipelined replay A/B'):
            return
        # Sync vs pipelined replay over the same chunks: the pipelined
        # arm dispatches chunk k+1 before harvesting chunk k (depth-2
        # double buffering, exactly what cli/serve.py --serve_pipeline
        # does), overlapping the device round trip with the next
        # dispatch.
        n_chunks = max(10, round(50 * DIAG_SCALE))
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            exported.infer_pair(ca, c2, c2, ya, yb)
        sync_ms = (time.perf_counter() - t0) * 1000 / n_chunks
        t0 = time.perf_counter()
        pending = None
        for _ in range(n_chunks):
            nxt = exported.infer_pair_async(ca, c2, c2, ya, yb)
            if pending is not None:
                np.asarray(pending[0])
            pending = nxt
        np.asarray(pending[0])
        pipe_ms = (time.perf_counter() - t0) * 1000 / n_chunks
        _diag('replay_ab: sync=%.2f ms/chunk pipelined=%.2f ms/chunk '
              '(%d chunks of %d frames; <1.0 ratio means pipelining '
              'pays on this link today)' % (sync_ms, pipe_ms,
                                            n_chunks, chunk))

    if over_budget('device-context ingest'):
        return

    # Stage 7 (run LAST — its host-stacked arm pushes a 37x-wider
    # copy of a subject through the tunnel and can absorb minutes
    # under congestion; it must not starve the cohort/AOT stages of
    # budget, which is exactly what happened in the r05 first
    # capture): the driver ingest A/B — host lag-stacking + stacked
    # upload (the pre-r4 workflow) vs raw upload + on-device fused
    # lag expansion (engine.ContextSpec, the default). One codelab
    # subject: 40 trials x 3300 frames, 69 raw channels x 37 lags =
    # width 2553. The data starts as HOST numpy, like the real cohort
    # driver's records — this is the path the cohort bench above
    # deliberately excludes (its synthetic data is device-resident).
    if jax.devices()[0].platform != 'tpu' and not DIAG_FORCE:
        # Skip only THIS stage (the measurement is the host->device
        # transfer); later stages still print their own markers.
        _diag('device-context ingest A/B skipped (not on TPU: the '
              'measurement is the host->device transfer)')
    else:
        from telluride_decoding_tpu.ops.lagstack import lag_stack_np
        from telluride_decoding_tpu.sweep.engine import ContextSpec
        lags = 37
        chans = max(2, round(69 * DIAG_SCALE))
        ctx37 = ContextSpec(0, lags - 1, 0, 0)
        rng_b = np.random.RandomState(7)
        raw_xs = [rng_b.randn(frames + lags - 1,
                              chans).astype(np.float32)
                  for _ in range(num_files)]
        raw_ys = [rng_b.randn(frames, 1).astype(np.float32)
                  for _ in range(num_files)]

        def ingest_host():
            xs = [lag_stack_np(x, 0, lags - 1)[:frames]
                  for x in raw_xs]
            return per_file_stats(xs, raw_ys, want_syy=True)

        def ingest_device():
            return per_file_stats(raw_xs, raw_ys, want_syy=True,
                                  context=ctx37)

        sync(ingest_device().sxx)   # Warm-up compile.
        t0 = time.perf_counter()
        sync(ingest_device().sxx)
        dev_ctx_s = time.perf_counter() - t0
        if over_budget('host-stacked ingest A/B arm'):
            _diag('ingest_device_context_s=%.2f (host arm skipped: '
                  'budget)' % dev_ctx_s)
            return
        sync(ingest_host().sxx)     # Warm-up compile.
        t0 = time.perf_counter()
        sync(ingest_host().sxx)
        host_ctx_s = time.perf_counter() - t0
        _diag('ingest_moments_s: device_context=%.2f '
              'host_stacked=%.2f (one %d-trial subject at width %d '
              'from host numpy; raw upload is 37x smaller)'
              % (dev_ctx_s, host_ctx_s, num_files, chans * lags))
        del raw_xs, raw_ys


def main():
    rng = np.random.RandomState(0)
    params = _params(rng)

    heartbeat = _start_heartbeat()
    try:
        windows_per_sec, x1, x2 = measure_headline(params)
    finally:
        heartbeat.set()

    # THE artifact: print + flush immediately, before any diagnostics,
    # so a driver timeout in the tail cannot erase the perf number
    # (BENCH_r02 was lost exactly this way).
    print(json.dumps({
        'metric': 'decode_windows_per_sec_per_chip',
        'value': round(windows_per_sec, 1),
        'unit': 'windows/s (100-frame windows, codelab CCA decode, '
                'bf16 activations / f32 accumulation)',
        'vs_baseline': round(windows_per_sec / BASELINE_WINDOWS_PER_SEC, 2),
    }), flush=True)
    _diag('headline JSON emitted: %.0f windows/s (%.0fx baseline)'
          % (windows_per_sec, windows_per_sec / BASELINE_WINDOWS_PER_SEC))

    if os.environ.get('TDT_BENCH_SKIP_DIAG'):
        _diag('diagnostics skipped (TDT_BENCH_SKIP_DIAG set)')
        return
    try:
        run_diagnostics(params, x1, x2)
    except Exception as e:  # Diagnostics must never break the bench.
        _diag('diagnostics failed: %r' % e)
    _diag('bench done')


if __name__ == '__main__':
    main()
