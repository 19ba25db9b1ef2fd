"""The shipped end-to-end example must actually run (it is the first
thing a new user executes)."""

import os
import subprocess
import sys


def test_full_pipeline_example(tmp_path, cpu_subprocess_env):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, 'examples',
                                      'full_pipeline.py'),
         str(tmp_path)],
        env=cpu_subprocess_env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout + proc.stderr
    assert 'results.txt' in out or os.path.exists(
        os.path.join(str(tmp_path), 'summary', 'results.txt')), out[-2000:]
