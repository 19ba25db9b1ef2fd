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
def _decode_reps(params, x1, x2):
    # The repetition loop runs ON DEVICE (one dispatch measures REPS
    # full decodes) so tunnel dispatch latency does not pollute the
    # throughput number. A data dependence between iterations stops
    # XLA from eliding the loop body.
    def body(_, carry):
        acc, bias = carry
        scores = _decode_windows(
            dict(params, lda_intercept=bias), x1, x2)
        return acc + scores, scores[0]
    acc, _ = jax.lax.fori_loop(
        0, REPS, body,
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


def measure_headline(params):
    """Throughput of the flagship decode; needs only 2 jitted programs."""
    _diag('devices=%s platform=%s' %
          (len(jax.devices()), jax.devices()[0].platform))
    x1, x2 = _make_data(jax.random.PRNGKey(0))
    sync(x1[0, 0, 0])
    _diag('data on device')
    sync(_decode_reps(params, x1, x2))     # Warm-up compile.
    _diag('decode program compiled + warm')
    t0 = time.perf_counter()
    acc = _decode_reps(params, x1, x2)
    sync(acc)
    elapsed = time.perf_counter() - t0
    return NUM_WINDOWS * REPS / elapsed, x1, x2


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
    # i's score biases window i+1), one readback at the end. This is
    # the serving per-window latency with the tunnel RTT amortized
    # away; the loop is deterministic so the mean IS the p50.
    # Target: <10 ms (BASELINE.md, reference path
    # infer_decoder.py:416-455).
    stream_n = 1000

    @jax.jit
    def stream_loop(params, xa, xb):
        def body(_, carry):
            acc, bias = carry
            s = _decode_windows(dict(params, lda_intercept=bias), xa, xb)
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
    t0 = time.perf_counter()
    sync(full_sweep())
    sweep_s = time.perf_counter() - t0
    _diag('codelab_sweep_s=%.2f (40 files x 9 lambdas, width 2553: '
          '360 ridge fits, target <60s)' % sweep_s)
    if over_budget('CCA sweep'):
        return

    # Stage 4: same grid through the CCA program (Cholesky whitening).
    from telluride_decoding_tpu.sweep.engine import _cca_sweep_program_chol

    def full_cca_sweep():
        stacked = per_file_stats(xs_list, ys_list, want_syy=True)
        total = jax.tree.map(lambda s: jnp.sum(s, axis=0), stacked)
        return _cca_sweep_program_chol(stacked, total, lambdas9)

    sync(full_cca_sweep())  # Warm-up compile.
    t0 = time.perf_counter()
    sync(full_cca_sweep())
    cca_sweep_s = time.perf_counter() - t0
    _diag('codelab_cca_sweep_s=%.2f (360 CCA fits, target <60s)'
          % cca_sweep_s)
    del xs_list, ys_list
    if over_budget('device-context ingest'):
        return

    # Stage 5: the driver ingest A/B — host lag-stacking + stacked
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
    if over_budget('cohort sweep'):
        return

    # Stage 6: full-cohort sweep at codelab scale: 22 subjects x 40
    # trials x 9 lambdas (7920 model fits at width 2553 — the
    # codelab's ENTIRE experiment, which the reference runs as days of
    # shell jobs). Subjects are ragged (trial lengths differ) but pad
    # to one shared program shape, so the sweep compiles once; data is
    # generated and dropped per subject to bound HBM. TPU only
    # (minutes of matmuls on CPU). Emits a progress line every few
    # subjects and honors the budget between subjects.
    if jax.devices()[0].platform != 'tpu' and not DIAG_FORCE:
        _diag('cohort sweep skipped (not on TPU)')
        return
    from telluride_decoding_tpu.sweep.engine import ridge_jackknife_sweep
    num_subjects = max(2, round(22 * DIAG_SCALE))
    cohort_s = 0.0
    corr_peak = 0.0
    done = 0
    for s in range(num_subjects):
        if over_budget('cohort subjects %d..%d' % (s, num_subjects - 1)):
            break
        # Ragged cohort (delta scaled so toy frames stay positive).
        frames_s = frames - (s % 5) * max(1, round(37 * DIAG_SCALE))
        keys = jax.random.split(jax.random.PRNGKey(100 + s), num_files)
        xs_s, ys_s = [], []
        for k in keys:
            kx, kn = jax.random.split(k)
            x = jax.random.normal(kx, (frames_s, width), jnp.float32)
            y = (x[:, :1] * 0.5 + 0.1 * jax.random.normal(
                kn, (frames_s, 1), jnp.float32))
            xs_s.append(x)
            ys_s.append(y)
        # Synthetic-data generation (1.3 GB of Threefry randoms per
        # subject) is NOT part of the workload — real cohorts load
        # records from disk — so only the moments + sweep compute is
        # timed.
        jax.block_until_ready(xs_s[-1])
        sync(xs_s[0][0, 0])
        t0 = time.perf_counter()
        res = ridge_jackknife_sweep(
            xs_s, ys_s, lambdas9, pad_files_to=num_files,
            pad_frames_to=frames)
        cohort_s += time.perf_counter() - t0
        corr_peak = max(corr_peak, float(res.correlations.max()))
        del xs_s, ys_s
        done += 1
        if done % 4 == 0:
            _diag('cohort progress: %d/%d subjects, %.2fs compute so far'
                  % (done, num_subjects, cohort_s))
    # done == 0 is a budget skip before the first subject, not a
    # correctness failure — only assert when something actually ran.
    assert done == 0 or corr_peak > 0.9, corr_peak
    _diag('cohort_sweep_s=%.2f (%d/%d subjects x 40 trials x 9 lambdas '
          'at width 2553: %d fits, ragged, one compile)'
          % (cohort_s, done, num_subjects, done * 360))


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
