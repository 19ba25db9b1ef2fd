"""bench.py diagnostics smoke: every diag stage executes at toy
shapes on CPU. The stages exercise private engine entry points
(_ridge_sweep_program, _cca_sweep_program_chol, per_file_stats with
ContextSpec) whose signatures can drift without any other CI coverage
— a real-TPU bench run found exactly that once (a stale dims= kwarg
killed diagnostics after stage 3)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_diagnostics_run_end_to_end_at_toy_scale():
    env = dict(os.environ)
    env.update({
        'PALLAS_AXON_POOL_IPS': '',
        'JAX_PLATFORMS': 'cpu',
        'PYTHONPATH': REPO + os.pathsep + env.get('PYTHONPATH', ''),
        'TDT_BENCH_DIAG_SCALE': '0.02',
        'TDT_BENCH_DIAG_FORCE': '1',
        'TDT_BENCH_DIAG_BUDGET_S': '600',
    })
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'bench.py')],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    # Headline JSON is the first stdout line and must parse.
    headline = json.loads(proc.stdout.splitlines()[0])
    assert headline['metric'] == 'decode_windows_per_sec_per_chip'
    assert headline['value'] > 0
    # Every diagnostic stage must have completed (no silent skip, no
    # 'diagnostics failed' swallow).
    err = proc.stderr
    assert 'diagnostics failed' not in err, err[-2000:]
    for marker in ['ridge_solve_ms=', 'streaming_p50_ms=',
                   'streaming_p50_device_ms=', 'codelab_sweep_s=',
                   'codelab_cca_sweep_s=', 'ingest_moments_s:',
                   'cohort_sweep_s=', 'aot_artifact:', 'replay_ab:']:
        assert marker in err, 'missing diag stage %r in:\n%s' % (
            marker, err[-3000:])


class TestHeadlineRate:
    """Decision arithmetic of the differential headline (bench.py
    headline_rate): the published number must never be inflated by
    tunnel-RTT asymmetry between the two arms."""

    def _load(self):
        # Import bench without executing main(); bench.py guards its
        # work under __main__ and only needs jax at import.
        sys.path.insert(0, REPO)
        try:
            import bench
        finally:
            sys.path.pop(0)
        return bench.headline_rate

    def test_clean_differential(self):
        headline_rate = self._load()
        # d=26ms per short arm, RTT r=26ms: short=52ms, long=104ms.
        rate, verdict = headline_rate(0.052, 0.104, 50, 150, 512)
        assert verdict == 'differential'
        # extra windows = 512*100, extra time = 52ms -> pure device.
        assert abs(rate - 512 * 100 / 0.052) < 1e-6

    def test_rtt_dominated_is_degenerate(self):
        headline_rate = self._load()
        # Device work 5ms, RTT 30ms: long/short = 45/35 < 1.5 — the
        # subtraction would be noise; must fall back to the
        # single-dispatch rate (which understates, never inflates).
        rate, verdict = headline_rate(0.035, 0.045, 50, 150, 512)
        assert verdict == 'degenerate'
        assert abs(rate - 512 * 50 / 0.035) < 1e-6

    def test_cap_implied_by_guard_at_production_ratio(self):
        # At the production 3x rep ratio the 2x-raw cap is EXACTLY
        # complementary to the 1.5x guard (diff > 2*raw <=> t_long <
        # 1.5*t_short), so 'implausible' can never fire — any timing
        # pair either fails the guard or passes the cap. Sweep a grid
        # to pin the invariant.
        headline_rate = self._load()
        for ts_ms in (5, 10, 30, 50):
            for tl_ms in range(int(ts_ms * 10), ts_ms * 60, 7):
                _, verdict = headline_rate(ts_ms / 1e3, tl_ms / 1e4,
                                           50, 150, 512)
                assert verdict in ('differential', 'degenerate')

    def test_asymmetric_congestion_is_implausible(self):
        headline_rate = self._load()
        # The cap is a safety net for a changed rep ratio: at 10x,
        # t_short=10ms / t_long=16ms passes the 1.5x guard but the
        # 6 ms delta implies a differential above 2x the long arm's
        # raw rate — only possible when inter-arm asymmetry shrank
        # the delta — so the backstop rejects it and falls back.
        rate, verdict = headline_rate(0.010, 0.016, 50, 500, 512)
        assert verdict == 'implausible'
        assert abs(rate - 512 * 50 / 0.010) < 1e-6

    def test_long_arm_slower_than_short_never_crashes(self):
        headline_rate = self._load()
        # Equal times (fully wedged tunnel): no division by zero.
        rate, verdict = headline_rate(0.05, 0.05, 50, 150, 512)
        assert verdict == 'degenerate' and rate > 0
