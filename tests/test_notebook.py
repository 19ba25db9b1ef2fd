"""The demo notebook's code cells execute end to end.

The reference ships a demo colab (Telluride_Decoding_Toolbox_TF2_Demo
.ipynb); examples/demo.ipynb is its TPU-native, offline-runnable
equivalent. This test concatenates its code cells and runs them — the
cells carry their own asserts (decoder quality, sweep, streaming
accuracy)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_demo_notebook_executes(tmp_path):
    nb_path = os.path.join(REPO, 'examples', 'demo.ipynb')
    nb = json.load(open(nb_path))
    code = '\n\n'.join(''.join(c['source']) for c in nb['cells']
                       if c['cell_type'] == 'code')
    assert 'run_decoding_experiment' in code
    runner = tmp_path / 'run_nb.py'
    runner.write_text(
        'g = {"__file__": %r}\n'
        'exec(compile(%r, "demo.ipynb", "exec"), g)\n'
        'print("NOTEBOOK_OK")\n' % (nb_path, code))
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu',
               PYTHONPATH=REPO + os.pathsep + os.environ.get(
                   'PYTHONPATH', ''))
    env.pop('XLA_FLAGS', None)   # Validate on ONE device, like users.
    proc = subprocess.run([sys.executable, str(runner)], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert 'NOTEBOOK_OK' in proc.stdout
