"""Turnkey reproduction of the reference codelab's real-corpus headline.

The reference's DecodingCodelab quotes one end-to-end quality number on
real data (reference doc/DecodingCodelab.md:654-670): subject_07 of the
jens_memory corpus, CCA with regularization lambda 1e3, tested on
trial_01 —

    loss 0.2055, cca_pearson_correlation_first 0.1702, dprime 1.5728.

This tool is the one command that produces the comparison table against
those numbers the day network egress exists:

    python -m tools.reproduce_codelab                  # full 3.1 GB run
    python -m tools.reproduce_codelab --internet file:///path/DATA.zip

Stages (each skipped when its artifacts already exist):
  1. Download DATA.zip (zenodo record 1158410, 3.1 GB) into
     <data_dir>/cache and ingest all 22 subjects into
     <data_dir>/tfrecords at 64 Hz — the cli.regression_data
     jens_memory pipeline (reference regression_data.py:922-956).
  2. Run this framework's decoding experiment with the codelab's exact
     stage-2.3/3.2 flag set under --protocol reference, which
     reproduces the reference's shuffled drop-remainder evaluation
     stream (see docs/flags.md "Evaluation protocol").
  3. Parse results.txt and print a PASS/FAIL table against the
     published numbers with per-metric tolerances.

Exit status: 0 when every row is within tolerance (or with
--norequire_match), 1 otherwise. CI drives the plumbing end-to-end on
a synthetic file:// corpus (tests/test_reproduce_codelab.py); the
numeric row only becomes meaningful on the real corpus.

The published numbers come from one TF run with Keras' default shuffle
seeding; they are single-sample estimates, so the default tolerances
are calibration-level (|corr delta| <= 0.02, |dprime delta| <= 0.15,
|loss delta| <= 0.03), not bit-exactness. Tighten or loosen with
--corr_tol/--dprime_tol/--loss_tol.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Optional, Sequence

# The published headline (reference doc/DecodingCodelab.md:654-670).
CODELAB_REFERENCE = {
    'loss': 0.20550338923931122,
    'cca_pearson_correlation_first': 0.17020219564437866,
    'dprime': 1.5728,
}
# The reference compiles its CCA model with loss=metric=
# cca_pearson_correlation_first (reference cca.py:196-212), and the
# EXECUTING TF 2.21 reference accordingly reports loss == corr
# (docs/ab_report.md cca_meg: 0.805385 for both) — which this
# framework reproduces exactly. The published codelab loss (0.2055 vs
# corr 0.1702) predates that: a legacy-TF loss-aggregation artifact
# that no current run of the reference itself would reproduce. The
# loss row is therefore informational, not gating.
INFO_ONLY_METRICS = frozenset(['loss'])
CODELAB_CITATION = 'reference doc/DecodingCodelab.md:654-670'


def codelab_flags(tf_subject_dir: str, summary_dir: str,
                  test_trial: str = 'trial_01',
                  regularization_lambda: float = 1000.0) -> Dict:
    """The codelab's exact experiment flag set (stage 2.3 grid cell
    lambda_1e3_test_trial01, per the Parameters: dump at reference
    doc/DecodingCodelab.md:420 and the stage-3.2 flag file :566-602)."""
    return {
        'attended_field': '',
        'batch_norm': False,
        'batch_size': 512,
        'cca_dimensions': 5,
        'correlation_frames': 100,
        'correlation_reducer': 'lda',
        'data': 'tfrecords',
        'dnn_regressor': 'cca',
        'dropout': 0.0,
        'epoch_count': 100,
        'frame_rate': 100.0,
        'hidden_units': '20-20',
        'input2_field': 'intensity',
        'input2_post_context': 15,
        'input2_pre_context': 15,
        'input_field': 'eeg',
        'learning_rate': 0.05,
        'loss': 'mse',
        'min_context': 0,
        'output_field': 'intensity',
        'post_context': 21,
        'pre_context': 15,
        'regularization_lambda': regularization_lambda,
        'shuffle_buffer_size': 0,
        'summary_dir': summary_dir,
        'test_file_pattern': '%s.tfrecords' % test_trial,
        'test_metric': 'cca_pearson_correlation_first',
        'tfexample_dir': tf_subject_dir,
        'train_file_pattern': 'allbut',
        'validate_file_pattern': '%s.tfrecords' % test_trial,
        'protocol': 'reference',
    }


def ensure_corpus(data_dir: str, internet: Optional[str] = None,
                  force: bool = False) -> str:
    """Download + ingest jens_memory; returns the tfrecords root.

    Idempotent: both stages no-op when their artifacts are complete
    (same is_data_local/is_data_ingested checks as cli.regression_data
    main, reference regression_data.py:958-1002).
    """
    from telluride_decoding_tpu.cli import regression_data

    location = regression_data.locations['jens_memory']
    url = internet or location.internet
    cache_dir = os.path.join(data_dir, 'cache')
    tf_dir = os.path.join(data_dir, 'tfrecords')
    corpus = regression_data.RegressionDataJensMemory()
    if force or not corpus.is_data_local(cache_dir):
        print('reproduce_codelab: downloading %s -> %s' % (url, cache_dir))
        if not corpus.download_data(url, cache_dir):
            raise SystemExit('reproduce_codelab: download failed; '
                             'fetch %s manually into %s and rerun'
                             % (url, cache_dir))
    else:
        print('reproduce_codelab: corpus already cached in', cache_dir)
    if force or not corpus.is_data_ingested(tf_dir):
        print('reproduce_codelab: ingesting -> %s (64 Hz)' % tf_dir)
        corpus.ingest_data(cache_dir, tf_dir,
                           location.desired_frame_rate)
    else:
        print('reproduce_codelab: corpus already ingested in', tf_dir)
    return tf_dir


def run_experiment(flags: Dict) -> Dict[str, float]:
    """Runs the decoding experiment in process; returns the
    Final_Testing metrics (incl. dprime) parsed from results.txt."""
    from telluride_decoding_tpu.cli import decoding
    from telluride_decoding_tpu.utils.results import parse_results_file

    my_flags = decoding.DecodingOptions().set_from_dict(flags)
    decoding.run_decoding_experiment(my_flags)
    results_txt = os.path.join(flags['summary_dir'], 'results.txt')
    _, metrics = parse_results_file(results_txt)
    return metrics


def comparison_table(metrics: Dict[str, float],
                     tolerances: Dict[str, float]) -> List[Dict]:
    rows = []
    for name, want in CODELAB_REFERENCE.items():
        got = metrics.get(name)
        tol = tolerances[name]
        info = name in INFO_ONLY_METRICS
        rows.append({
            'metric': name,
            'codelab': want,
            'rebuild': got,
            'delta': None if got is None else abs(got - want),
            'tolerance': tol,
            'info': info,
            'ok': info or (got is not None
                           and abs(got - want) <= tol),
        })
    return rows


def format_table(rows: List[Dict]) -> str:
    lines = ['%-34s %10s %10s %8s %6s %s'
             % ('metric', 'codelab', 'rebuild', '|delta|', 'tol',
                'verdict'),
             '-' * 78]
    for r in rows:
        got = '     (n/a)' if r['rebuild'] is None else \
            '%10.4f' % r['rebuild']
        delta = '     ?' if r['delta'] is None else '%8.4f' % r['delta']
        verdict = 'PASS' if r['ok'] else 'FAIL'
        if r.get('info'):
            verdict = 'info'
        lines.append('%-34s %10.4f %s %s %6.2f %s'
                     % (r['metric'], r['codelab'], got, delta,
                        r['tolerance'], verdict))
    lines.append('(reference numbers: %s; single TF run, '
                 'calibration-level tolerances; the loss row is '
                 'informational — the executing reference reports '
                 'loss == corr for CCA, see ab_report cca_meg)'
                 % CODELAB_CITATION)
    return '\n'.join(lines)


def parse_overrides(items: Sequence[str]) -> dict:
    """Parse --override KEY=VALUE items, validating KEY.

    ``DecodingOptions.set_from_dict`` setattr's unknown keys without
    complaint, so a mistyped --override would silently run the
    published config while the user believes they changed it —
    validate against the dataclass fields here, BEFORE the (possibly
    3.1 GB) corpus download.
    """
    import ast
    import dataclasses
    from telluride_decoding_tpu.cli.decoding import DecodingOptions
    known = {f.name for f in dataclasses.fields(DecodingOptions)}
    out = {}
    for item in items:
        if '=' not in item:
            raise SystemExit('--override wants KEY=VALUE, got %r' % item)
        key, value = item.split('=', 1)
        if key not in known:
            raise SystemExit(
                '--override: unknown DecodingOptions field %r '
                '(closest: %s)'
                % (key, ', '.join(sorted(
                    k for k in known if key[:3] in k)) or '<none>'))
        try:
            out[key] = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            out[key] = value
    return out


def main(argv: Optional[Sequence[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument('--data_dir', default='/tmp/tdt_codelab_repro',
                        help='corpus cache + tfrecords root')
    parser.add_argument('--internet', default=None,
                        help='URL override (file:// works) for DATA.zip')
    parser.add_argument('--subject', default='subject_07',
                        help='ingested subject directory name')
    parser.add_argument('--test_trial', default='trial_01')
    parser.add_argument('--regularization_lambda', type=float,
                        default=1000.0)
    parser.add_argument('--summary_dir', default=None,
                        help='default <data_dir>/summary/<subject>_cca')
    parser.add_argument('--force', action='store_true',
                        help='re-download and re-ingest')
    parser.add_argument('--corr_tol', type=float, default=0.02)
    parser.add_argument('--dprime_tol', type=float, default=0.15)
    parser.add_argument('--loss_tol', type=float, default=0.03)
    parser.add_argument('--require_match', action='store_true',
                        default=True)
    parser.add_argument('--norequire_match', dest='require_match',
                        action='store_false',
                        help='print the table but always exit 0 '
                             '(CI plumbing mode on synthetic corpora)')
    parser.add_argument('--override', action='append', default=[],
                        metavar='KEY=VALUE',
                        help='override any DecodingOptions field '
                             '(repeatable); values parse as Python '
                             'literals when possible')
    args = parser.parse_args(argv)
    overrides = parse_overrides(args.override)

    tf_dir = ensure_corpus(args.data_dir, args.internet, args.force)
    subject_dir = os.path.join(tf_dir, args.subject)
    if not os.path.isdir(subject_dir):
        raise SystemExit('reproduce_codelab: no ingested subject at %s '
                         '(have: %s)'
                         % (subject_dir,
                            ', '.join(sorted(os.listdir(tf_dir)))))

    summary_dir = args.summary_dir or os.path.join(
        args.data_dir, 'summary', '%s_cca' % args.subject)
    flags = codelab_flags(
        subject_dir, summary_dir, test_trial=args.test_trial,
        regularization_lambda=args.regularization_lambda)
    flags.update(overrides)

    print('reproduce_codelab: running %s lambda=%g test=%s '
          'under --protocol %s'
          % (args.subject, args.regularization_lambda, args.test_trial,
             flags['protocol']))
    metrics = run_experiment(flags)

    rows = comparison_table(metrics, {
        'loss': args.loss_tol,
        'cca_pearson_correlation_first': args.corr_tol,
        'dprime': args.dprime_tol,
    })
    print()
    print(format_table(rows))
    failed = [r['metric'] for r in rows if not r['ok']]
    if failed and args.require_match:
        print('reproduce_codelab: OUT OF TOLERANCE: %s'
              % ', '.join(failed))
        return 1
    return 0


if __name__ == '__main__':
    sys.exit(main())
