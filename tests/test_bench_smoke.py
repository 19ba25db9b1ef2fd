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
                   'cohort_sweep_s=']:
        assert marker in err, 'missing diag stage %r in:\n%s' % (
            marker, err[-3000:])
