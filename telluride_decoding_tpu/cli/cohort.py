"""Whole-cohort jackknife x regularization sweeps in one command.

The reference codelab runs its cross-subject analysis as DAYS of
shell-fanned per-subject jobs and joins results.txt files afterwards
(reference doc/DecodingCodelab.md:353-521; regression.py:327-420 is
one subject's sweep). This driver is the TPU-native replacement: every
subject's leave-one-trial-out x lambda grid runs through the sweep
engine (sweep/engine.py) — per-trial sufficient statistics computed
once, leave-one-out by subtraction, the whole grid one compiled
program — and, on a multi-device mesh, the SUBJECT axis shards across
devices (groups of n-devices subjects run concurrently, zero
collectives).

Usage:
  tdt-cohort --cohort_dir /data/ingested \
      --input_field eeg --output_field intensity --post_context 24 \
      --regularization_list 1e-6,1e-4,1e-2,1,10 \
      --cohort_csv_file /tmp/cohort.csv

``--cohort_dir`` holds one subdirectory of TFRecords per subject
(exactly what cli.regression_data produces for the multi-subject
corpora). Per-subject CSVs (reference csv_util format), a cohort
summary CSV (lambda, mean, std over all held-out trials), and an
optional mean+/-std plot are written.

Explicit SGD families (--dnn_regressor fullyconnected/classifier/
dcca) are supported too: they route through the API-parity per-model
jackknife (general_cohort_results) — every grid cell is a full
training run, the reference's own cost, in one command.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

from absl import app
from absl import flags
from absl import logging
import numpy as np

from telluride_decoding_tpu.cli import decoding
from telluride_decoding_tpu.cli import regression
from telluride_decoding_tpu.data import brain_data
from telluride_decoding_tpu.data import records
from telluride_decoding_tpu.sweep import engine

FLAGS = flags.FLAGS


def define_flags():
    if 'cohort_dir' in FLAGS:
        return
    flags.DEFINE_string('cohort_dir', None,
                        'Directory with one subdirectory of TFRecord '
                        'files per subject.')
    flags.DEFINE_multi_string('subject_dir', [],
                              'Explicit per-subject TFRecord dirs '
                              '(alternative to --cohort_dir).')
    flags.DEFINE_string('cohort_csv_file', None,
                        'Where to write the cohort summary CSV '
                        '(lambda, mean, std over all held-out trials).')
    flags.DEFINE_string('cohort_plot_file', None,
                        'Optional mean+/-std png of the cohort curve.')
    flags.DEFINE_bool('subject_parallel', True,
                      'Shard the subject axis over the device mesh '
                      '(falls back to serial on one device).')
    flags.DEFINE_bool('streaming_cohort', True,
                      'Load subjects through a prefetching streaming '
                      'loader (host residency bounded at ~2 subjects; '
                      'subject k+1 ingests while subject k sweeps on '
                      'device). Falls back to eager whole-cohort '
                      'loading when the cheap shape prescan cannot '
                      'run (on-the-fly field specs).')
    flags.DEFINE_integer('num_partitions', 0,
                         'Split the cohort over this many independent '
                         'processes (multi-host scaling; 0 = off). '
                         'Each process runs the subjects whose sorted '
                         'rank %% num_partitions == partition_index '
                         'and the partitions join exactly via part '
                         'files (or one DCN collective under '
                         'jax.distributed).')
    flags.DEFINE_integer('partition_index', -1,
                         'This process\'s shard (0-based). Defaults '
                         'to jax.process_index() when a '
                         'jax.distributed group is initialized.')
    flags.DEFINE_string('partition_dir', None,
                        'Shared directory for partition part files '
                        '(defaults to the cohort_csv_file directory).')
    flags.DEFINE_float('partition_wait_s', 1200.0,
                       'How long partition 0 waits for the other '
                       'partitions\' part files before failing.')


def discover_subjects(cohort_dir: Optional[str],
                      subject_dirs: List[str]) -> Dict[str, str]:
    """{subject_name: tfrecord_dir} from either flag."""
    found = {}
    for d in subject_dirs:
        name = os.path.basename(os.path.normpath(d))
        if name in found and found[name] != d:
            # Silently keeping one of the two would compute the cohort
            # statistics over the wrong population.
            raise ValueError(
                'Two --subject_dir paths share the subject name %r '
                '(%s and %s); rename one directory.' %
                (name, found[name], d))
        found[name] = d
    if cohort_dir:
        for name in sorted(os.listdir(cohort_dir)):
            path = os.path.join(cohort_dir, name)
            if os.path.isdir(path):
                found.setdefault(name, path)
    if not found:
        raise ValueError('No subjects: pass --cohort_dir with per-'
                         'subject subdirectories or --subject_dir.')
    return found


def load_cohort(subjects: Dict[str, str], my_flags
                ) -> Tuple[Dict[str, Tuple[list, list]],
                           Optional['engine.ContextSpec']]:
    """Loads every subject's per-trial (x, y) arrays.

    Returns ({subject: (xs, ys)}, context). By default the arrays are
    RAW un-stacked streams and ``context`` is the engine ContextSpec
    for the on-device lag expansion; with TDT_DEVICE_CONTEXT=0 they
    are host-lag-stacked and ``context`` is None. Reuses the
    regression driver's data path (same fields, contexts, and
    CCA-vs-ridge stream selection as a single-subject sweep).
    """
    cohort = {}
    use_raw = regression.device_context_enabled()
    for name, data_dir in subjects.items():
        # Raw streams (default): the engine lag-stacks on device
        # (fused into the moments pass), so the cohort's host
        # residency and upload stay at raw-channel width. The spec
        # depends only on flags, so it is identical across subjects.
        name, arrays = _load_subject(name, data_dir, my_flags, use_raw)
        cohort[name] = arrays
    context = cohort_context(my_flags) if use_raw else None
    return cohort, context


def _load_subject(name: str, data_dir: str, my_flags, use_raw: bool):
    """One subject's per-trial (x, y) arrays (raw or host-stacked).

    Reads THROUGH the decoded-file LRU cache (cache=False): a cohort
    sweep touches every file exactly once, so populating the cache
    would pin up to TDT_FILE_CACHE_BYTES of arrays nobody rereads.
    """
    import dataclasses
    sub_flags = dataclasses.replace(my_flags, tfexample_dir=data_dir)
    bd = regression.get_brain_data_object(sub_flags)
    files = sorted(bd.all_files())
    helper = regression.Regression(sub_flags)
    if use_raw:
        xs, ys, _ = helper._per_file_raw(bd, files, cache=False)
    else:
        xs, ys = helper._per_file_arrays(bd, files, cache=False)
    logging.info('subject %s: %d trials from %s', name, len(files),
                 data_dir)
    return name, (xs, ys)


def cohort_context(my_flags) -> 'engine.ContextSpec':
    """The engine ContextSpec the raw loader implies, from flags alone
    (identical to what Regression._per_file_raw derives per subject —
    the spec depends only on the context flags, never the data)."""
    cca = my_flags.dnn_regressor == 'cca'
    return engine.ContextSpec(
        my_flags.pre_context, my_flags.post_context,
        my_flags.input2_pre_context if cca else 0,
        my_flags.input2_post_context if cca else 0)


def prescan_cohort(subjects: Dict[str, str], my_flags
                   ) -> Optional[Tuple[int, int]]:
    """Shared sweep-program shape from TFRecord record counts alone.

    Returns (pad_files_to, pad_frames_to) — max trials per subject and
    max common (zip-truncated) frames per trial — without decoding any
    features: every telluride TFRecord example is one frame of every
    field, so a file's common frame count is its record count minus
    |input_offset| (the native codec counts+validates at ~GB/s). This
    is what lets the streaming loader exist: the cohort's shared
    program shape is known before any subject's arrays are.

    Returns None (caller falls back to eager loading) when the
    count-based estimate cannot be trusted: an on-the-fly field spec
    (``field(params)``) runs a Preprocessor that may change stream
    lengths, and a corrupt file defers its error to the real loader.
    """
    import dataclasses
    if not subjects:
        return None
    max_files = 0
    max_count = 0
    for _, data_dir in subjects.items():
        sub_flags = dataclasses.replace(my_flags, tfexample_dir=data_dir)
        bd = regression.get_brain_data_object(sub_flags)
        if (any(s is not None for s in (bd._in1_specs or []))
                or any(s is not None for s in (bd._in2_specs or []))
                or bd._out_spec is not None):
            return None
        files = bd.all_files()
        max_files = max(max_files, len(files))
        for f in files:
            count, error = records.count_tfrecords(f)
            if error:
                return None
            max_count = max(max_count, count)
    # pad_frames_to is in COMMON zip-truncated units, which for this
    # data path is simply the record count: the regression/cohort
    # loaders never apply input_offset (get_brain_data_object omits
    # it, faithful to the reference's regression.py:114-128), and raw
    # streams carry n_i + x_post rows — the engine adds x_post back
    # itself. This matches the eager loader's derivation exactly, so
    # toggling --streaming_cohort never recompiles the sweep
    # (TestStreamingCohort pins bit-identical results).
    frames = max_count
    if max_files == 0 or frames <= 0:
        return None
    return max_files, frames


def iter_cohort(subjects: Dict[str, str], my_flags, prefetch: bool = True):
    """Streams subjects one at a time with background prefetch.

    Yields (name, (xs, ys)) in ``subjects`` order. A daemon thread
    ingests subject k+1 (TFRecord decode + field selection) while the
    consumer — the sweep engine's depth-2 dispatch pipeline — runs
    subject k on device, so host residency stays at ~2 subjects'
    raw arrays instead of the whole cohort (the eager load_cohort
    holds every subject at once: ~3 GB at jens scale). Loader
    exceptions re-raise in the consumer.
    """
    import queue
    import threading
    use_raw = regression.device_context_enabled()
    items = list(subjects.items())
    if not prefetch:
        for name, data_dir in items:
            yield _load_subject(name, data_dir, my_flags, use_raw)
        return
    q: 'queue.Queue' = queue.Queue(maxsize=1)
    # Set when the consumer abandons the generator (sweep exception,
    # early close): the worker must not block forever in q.put holding
    # a subject's arrays (~1.5 GB at jens scale) for the process
    # lifetime — it polls this event and exits, dropping its payload.
    stop = threading.Event()

    def _put(payload) -> bool:
        while not stop.is_set():
            try:
                q.put(payload, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for name, data_dir in items:
                if not _put(('item', _load_subject(name, data_dir,
                                                   my_flags, use_raw))):
                    return
            _put(('done', None))
        except BaseException as e:   # Re-raised on the consumer side.
            _put(('error', e))

    threading.Thread(target=worker, daemon=True,
                     name='tdt-cohort-prefetch').start()
    try:
        while True:
            kind, val = q.get()
            if kind == 'done':
                return
            if kind == 'error':
                raise val
            yield val
    finally:
        stop.set()


def general_cohort_results(my_flags, subjects: Dict[str, str],
                           regularization_list,
                           checkpoint_dir: Optional[str] = None
                           ) -> Dict[str, 'engine.SweepResult']:
    """Whole-cohort jackknife for the SGD families (fullyconnected,
    classifier, dcca): per (subject, lambda) the API-parity
    per-model path (cli.regression.jackknife_one_model — the same
    train_and_test loop the reference shell-fans per configuration,
    reference doc/DecodingCodelab.md:353-389) runs leave-one-out over
    that subject's trials. No sufficient-statistics fast path exists
    for SGD models — every grid cell is a full training run — so this
    costs O(subjects x lambdas x trials) fits, exactly the reference's
    operational cost in ONE command (the deterministic families route
    through the sweep engine instead and are ~3 orders faster).

    Note that, as in the reference, only the linear/CCA/DCCA solvers
    read regularization_lambda (reference brain_model.py:313-331): a
    fullyconnected or classifier model ignores it entirely, and this
    framework's training is seeded — so those families' lambda rows
    are IDENTICAL by construction. The grid therefore trains ONCE per
    (subject, held-out trial) and tiles the row across lambdas (a 9x
    saving on the jens-scale grid), unless TDT_GENERAL_LAMBDA_DEDUP=0
    forces the full per-lambda retraining. DCCA retrains per lambda
    (its final CCA solve reads the flag).

    ``checkpoint_dir`` makes the sweep RESUMABLE at per-subject
    granularity (an SGD cohort is hours-to-days of training runs —
    the jens-scale grid is 7,920 fits): each finished subject's grid
    is written atomically as an .npz keyed by the sweep-relevant
    experiment parameters + lambda grid + the subject's trial-file
    basenames, and a rerun skips subjects whose checkpoint matches.
    A checkpoint from DIFFERENT parameters, lambdas, or trial files
    fails loudly — naming exactly what differed — instead of silently
    joining stale numbers (the same guard as multihost.join_parts).
    Output paths (--summary_dir etc.) and the per-trial selections the
    loop overwrites are excluded from the key, so a preempted sweep
    resumed from another host (different cohort root / output dirs)
    restores instead of retraining."""
    import dataclasses
    if my_flags.dnn_regressor == 'tf':
        raise ValueError(
            "tdt-cohort: --dnn_regressor tf is a flag-parity value "
            "with no buildable model (the reference's "
            "create_brain_model has no 'tf' branch either, reference "
            "decoding.py:279-308); use linear/cca or an SGD family "
            "(fullyconnected/classifier/dcca).")
    lambdas64 = np.asarray(regularization_list, np.float64)
    # fullyconnected/classifier never read the lambda: with seeded
    # training every lambda row is the same numbers, so train one row
    # and tile (opt out with TDT_GENERAL_LAMBDA_DEDUP=0).
    # --mismatch_batch disables the dedup: it draws from the dataset's
    # stateful RandomState, so each lambda iteration realizes a
    # DIFFERENT training stream and the rows are not identical by
    # construction. --random_mixup_batch does NOT gate it: the flag is
    # vestigial in training in both implementations (the reference
    # parses it into DecodingOptions, decoding.py:77,118, and never
    # consults it; train_lda_model hardcodes its own mixup pair), so
    # lambda rows stay identical.
    dedup = (my_flags.dnn_regressor in ('fullyconnected', 'classifier')
             and len(lambdas64) > 1
             and not getattr(my_flags, 'mismatch_batch', False)
             and os.environ.get('TDT_GENERAL_LAMBDA_DEDUP',
                                '1').lower() not in ('0', 'off',
                                                     'false'))
    results = {}
    for name, data_dir in subjects.items():
        sub_flags = dataclasses.replace(my_flags,
                                        tfexample_dir=data_dir)
        sub_flags.train_file_pattern = (sub_flags.train_file_pattern
                                        or 'allbut')
        params = _sweep_key_params(sub_flags)
        ckpt = (os.path.join(checkpoint_dir, 'general_%s.npz' % name)
                if checkpoint_dir else None)
        bd = regression.get_brain_data_object(sub_flags)
        files = sorted(bd.all_files())
        if not files:
            raise ValueError('subject %s: no TFRecord files under %s'
                             % (name, data_dir))
        if ckpt and os.path.exists(ckpt):
            results[name] = _load_general_checkpoint(
                ckpt, lambdas64, params, files)
            logging.info('subject %s: restored from %s', name, ckpt)
            continue
        corr = np.zeros((len(regularization_list), len(files)))
        train_rows = 1 if dedup else len(regularization_list)
        for i, lamb in enumerate(regularization_list[:train_rows]):
            sub_flags.regularization_lambda = float(lamb)
            sub_flags.validate_file_pattern = files[0]
            sub_flags.test_file_pattern = files[0]
            model = regression.get_brain_model(
                bd.create_dataset('test'), sub_flags)
            corr[i, :] = regression.jackknife_one_model(
                bd, model, None, sub_flags)
        if dedup:
            corr[1:, :] = corr[0, :]
            logging.info(
                'subject %s: %s ignores regularization_lambda and '
                'training is seeded — trained one row, tiled %d '
                'lambda rows (TDT_GENERAL_LAMBDA_DEDUP=0 to force '
                'full retraining).', name, my_flags.dnn_regressor,
                len(regularization_list))
        results[name] = engine.SweepResult(corr, lambdas64, files)
        if ckpt:
            os.makedirs(checkpoint_dir, exist_ok=True)
            # Ends in .npz so np.savez keeps the name; os.replace
            # makes the publish atomic (a killed run never leaves a
            # torn checkpoint for the resume to trust).
            tmp = ckpt + '.tmp-%d.npz' % os.getpid()
            np.savez(tmp, corr=corr, lambdas=lambdas64,
                     files=np.asarray(
                         [os.path.basename(f) for f in files]),
                     params=np.asarray(params))
            os.replace(tmp, ckpt)
        logging.info('subject %s: general %s jackknife done (%d fits)',
                     name, my_flags.dnn_regressor, corr.size)
    return results


# DecodingOptions fields excluded from the checkpoint key: pure output
# paths, the per-trial selections the jackknife loop overwrites, and
# regularization_lambda (the lambda GRID is keyed separately). The
# subject's data directory is excluded too — data identity is pinned
# by the stored trial basename list instead — so a sweep resumed from
# another host (different cohort root) restores rather than retrains.
_SWEEP_KEY_IGNORED = frozenset((
    'regularization_lambda', 'summary_dir', 'saved_model_dir',
    'tensorboard_dir', 'test_file_pattern', 'validate_file_pattern',
    'tfexample_dir', 'debug',
))


def _sweep_key_params(sub_flags) -> List[str]:
    """The 'key=value' strings that identify an SGD sweep's numbers."""
    return [kv for kv in sub_flags.experiment_parameters(delimiter=None)
            if kv.split('=', 1)[0] not in _SWEEP_KEY_IGNORED]


def _load_general_checkpoint(path: str, lambdas: np.ndarray,
                             params: List[str], files: List[str]
                             ) -> 'engine.SweepResult':
    """Loads one subject's general-sweep checkpoint, failing loudly —
    and naming what differed — on a stale grid, changed trial files,
    or a parameter mismatch. ``files`` are the subject's CURRENT
    TFRecord paths; they (not the stored basenames) label the result."""
    remedy = ('— remove the checkpoint or point --sweep_checkpoint_dir '
              'elsewhere.')
    with np.load(path, allow_pickle=False) as z:
        stored_params = [str(p) for p in np.atleast_1d(z['params'])]
        stored_lambdas = np.asarray(z['lambdas'], np.float64)
        stored_files = [str(f) for f in np.atleast_1d(z['files'])]
        if (z['params'].ndim == 0
                or any(os.sep in f for f in stored_files)):
            # Pre-release format (joined params string / absolute
            # trial paths): say so instead of misreporting a data
            # change.
            raise ValueError(
                'checkpoint %s was written by an older checkpoint '
                'format (absolute trial paths / joined parameter '
                'string) and cannot be safely matched %s'
                % (path, remedy))
        basenames = [os.path.basename(f) for f in files]
        if stored_files != basenames:
            raise ValueError(
                'checkpoint %s was written over different trial files '
                '(stored %s vs present %s) %s'
                % (path, stored_files, basenames, remedy))
        if not np.array_equal(stored_lambdas, lambdas):
            raise ValueError(
                'checkpoint %s was written by a different sweep: '
                'lambda grid %s vs requested %s %s'
                % (path, stored_lambdas.tolist(), lambdas.tolist(),
                   remedy))
        if stored_params != params:
            diff = sorted(set(stored_params) ^ set(params))
            raise ValueError(
                'checkpoint %s was written by a different sweep; '
                'mismatched parameters: %s %s'
                % (path, ', '.join(diff), remedy))
        return engine.SweepResult(np.asarray(z['corr']), lambdas,
                                  list(files))


def write_cohort_csv(path: str, lambdas, mean, std):
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    with open(path, 'w') as f:
        f.write('lambda,mean,std\n')
        for lamb, m, s in zip(lambdas, mean, std):
            f.write('%g,%g,%g\n' % (lamb, m, s))


def run_cohort_sweep(my_flags, subjects: Dict[str, str],
                     regularization_list,
                     subject_parallel: bool = True,
                     cohort_csv_file: Optional[str] = None,
                     cohort_plot_file: Optional[str] = None,
                     results_csv_file: Optional[str] = None,
                     streaming: Optional[bool] = None,
                     checkpoint_dir: Optional[str] = None):
    """The whole cohort's sweep; returns ({subject: SweepResult},
    (mean, std) per lambda).

    ``checkpoint_dir`` (--sweep_checkpoint_dir) makes the SGD-family
    general path resumable per subject; the deterministic families
    re-run in seconds and ignore it.

    ``streaming`` (default on; --nostreaming_cohort / env
    TDT_STREAMING_COHORT=0 disable) feeds the sweep through the
    prefetching per-subject loader: host residency is bounded at ~2
    subjects and subject k+1's TFRecord ingest overlaps subject k's
    on-device grid. Results are value-identical to eager loading (the
    prescan derives the SAME shared program shape the eager path
    would). Falls back to eager automatically when the prescan cannot
    trust record counts (on-the-fly field specs).
    """
    if my_flags.dnn_regressor not in ('linear', 'linear_with_bias',
                                      'cca'):
        # SGD/DCCA families have no sufficient-statistics fast path
        # (every grid cell is a training run): route through the
        # API-parity per-model jackknife instead of the sweep engine.
        # Silently running a ridge sweep for a requested DNN cohort
        # would be wrong-model science with a correct-looking CSV.
        results = general_cohort_results(my_flags, subjects,
                                         regularization_list,
                                         checkpoint_dir=checkpoint_dir)
    else:
        if streaming is None:
            streaming = os.environ.get(
                'TDT_STREAMING_COHORT', '1').lower() not in ('0', 'off',
                                                             'false')
        mesh = engine.default_mesh('subject')
        model = ('cca' if my_flags.dnn_regressor == 'cca' else 'ridge')
        pads = prescan_cohort(subjects, my_flags) if streaming else None
        if pads is not None:
            use_raw = regression.device_context_enabled()
            context = cohort_context(my_flags) if use_raw else None
            results = engine.multi_subject_sweep(
                iter_cohort(subjects, my_flags), regularization_list,
                model=model, dims=my_flags.cca_dimensions, mesh=mesh,
                subject_parallel=subject_parallel, context=context,
                pad_files_to=pads[0], pad_frames_to=pads[1])
        else:
            if streaming:
                logging.info('cohort prescan unavailable (field specs '
                             'or unreadable records); loading eagerly.')
            cohort, context = load_cohort(subjects, my_flags)
            results = engine.multi_subject_sweep(
                cohort, regularization_list, model=model,
                dims=my_flags.cca_dimensions, mesh=mesh,
                subject_parallel=subject_parallel, context=context)
    mean, std = engine.cohort_summary(results)
    if results_csv_file:
        # Per-subject rows in the reference csv_util layout
        # (lambda, then per-held-out-trial correlations).
        from telluride_decoding_tpu.utils import csv_util
        for name, res in results.items():
            base, ext = os.path.splitext(results_csv_file)
            csv_util.write_results(
                '%s_%s%s' % (base, name, ext or '.csv'),
                list(res.lambdas), res.correlations)
    if cohort_csv_file:
        write_cohort_csv(cohort_csv_file,
                         np.asarray(regularization_list, np.float64),
                         mean, std)
    if cohort_plot_file:
        from telluride_decoding_tpu.utils import plot_util
        os.makedirs(os.path.dirname(cohort_plot_file) or '.',
                    exist_ok=True)
        plot_util.plot_mean_std(
            'cohort (%d subjects)' % len(results),
            np.asarray(regularization_list, np.float64), mean, std,
            png_file_name=cohort_plot_file)
    return results, (mean, std)


def run_partitioned_cohort(my_flags, subjects: Dict[str, str],
                           regularization_list,
                           partition_index: int, num_partitions: int,
                           partition_dir: str,
                           subject_parallel: bool = True,
                           cohort_csv_file: Optional[str] = None,
                           cohort_plot_file: Optional[str] = None,
                           results_csv_file: Optional[str] = None,
                           partition_wait_s: float = 1200.0,
                           streaming: Optional[bool] = None,
                           checkpoint_dir: Optional[str] = None):
    """One partition's share of a multi-process cohort sweep.

    Runs this partition's subjects (round-robin by sorted name, so
    every process derives the same assignment with no coordination),
    publishes the partition's per-lambda sufficient statistics, and —
    on partition 0 — joins all partitions into the exact cohort
    summary (mean/std identical to the single-process sweep up to
    float64 addition order). The join uses one DCN collective when a
    jax.distributed group is active, else atomic part files in
    ``partition_dir`` (the reference's own join-by-files operational
    model, doc/DecodingCodelab.md:432-503). Returns
    ({local subject: SweepResult}, (mean, std) or None on non-joining
    workers).
    """
    import jax
    from telluride_decoding_tpu.parallel import multihost
    if 1 < jax.process_count() != num_partitions:
        # The collective join reduces over the PROCESS group; a
        # different partition count would leave subject shards nobody
        # computes (or double-counts) while the allgather still
        # "succeeds".
        raise ValueError(
            'num_partitions=%d but the jax.distributed group has %d '
            'processes; they must match.'
            % (num_partitions, jax.process_count()))
    mine = multihost.partition_subjects(subjects, partition_index,
                                        num_partitions)
    if mine:
        results, _ = run_cohort_sweep(
            my_flags, mine, regularization_list,
            subject_parallel=subject_parallel,
            results_csv_file=results_csv_file,
            streaming=streaming, checkpoint_dir=checkpoint_dir)
    else:
        # Over-partitioned cohort: this shard holds no subjects but
        # still participates in the join with exact-zero statistics.
        results = {}
    use_dcn = jax.process_count() > 1
    if use_dcn:
        mean, std = multihost.allgather_summary(regularization_list,
                                                results)
        summary = ((mean, std) if partition_index == 0 else None)
    else:
        multihost.write_part(partition_dir, partition_index,
                             regularization_list, results)
        summary = None
        if partition_index == 0:
            expected = {
                i: sorted(multihost.partition_subjects(
                    subjects, i, num_partitions))
                for i in range(num_partitions)}
            mean, std, joined = multihost.join_parts(
                partition_dir, num_partitions,
                lambdas=regularization_list,
                timeout_s=partition_wait_s,
                expected_shards=expected)
            logging.info('joined %d partitions covering subjects: %s',
                         num_partitions, ', '.join(joined))
            summary = (mean, std)
    if summary is not None:
        mean, std = summary
        if cohort_csv_file:
            write_cohort_csv(
                cohort_csv_file,
                np.asarray(regularization_list, np.float64), mean, std)
        if cohort_plot_file:
            from telluride_decoding_tpu.utils import plot_util
            os.makedirs(os.path.dirname(cohort_plot_file) or '.',
                        exist_ok=True)
            plot_util.plot_mean_std(
                'cohort (%d partitions)' % num_partitions,
                np.asarray(regularization_list, np.float64), mean, std,
                png_file_name=cohort_plot_file)
    return results, summary


def main(argv):
    if len(argv) > 1:
        logging.warning('WARNING: Non-flag arguments: %s', argv)
    from telluride_decoding_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()
    my_flags = decoding.DecodingOptions().set_flags(FLAGS)
    if FLAGS['dnn_regressor'].using_default_value:
        # The decoding-driver default is 'fullyconnected'; a cohort
        # sweep's natural family is deterministic, so an untouched
        # flag means the linear preset. EXPLICIT SGD families
        # (fullyconnected/classifier/dcca) run through the API-parity
        # per-model jackknife instead of the sweep engine — every
        # grid cell is a training run, so expect reference-scale cost.
        my_flags.dnn_regressor = 'linear'
    subjects = discover_subjects(FLAGS.cohort_dir, FLAGS.subject_dir)
    regularization_list = regression.parse_regularization_values(
        FLAGS.regularization_list)
    from telluride_decoding_tpu.parallel import multihost
    multihost.initialize()   # env-driven (TDT_COORDINATOR); no-op else.
    # Forwarding the flag's DEFAULT (True) would shadow the documented
    # TDT_STREAMING_COHORT env knob inside run_cohort_sweep (its env
    # fallback only fires on streaming=None); an untouched flag defers
    # to the env, an explicit --[no]streaming_cohort wins.
    streaming = (None if FLAGS['streaming_cohort'].using_default_value
                 else FLAGS.streaming_cohort)
    import jax
    num_partitions = FLAGS.num_partitions
    partition_index = FLAGS.partition_index
    if num_partitions <= 0 and jax.process_count() > 1:
        num_partitions = jax.process_count()
    if num_partitions > 1:
        if partition_index < 0:
            if jax.process_count() > 1:
                partition_index = jax.process_index()
            else:
                raise ValueError(
                    '--num_partitions needs --partition_index (or a '
                    'jax.distributed group to derive it from).')
        partition_dir = FLAGS.partition_dir or os.path.dirname(
            FLAGS.cohort_csv_file or '') or '.'
        from telluride_decoding_tpu.utils import profiling
        with profiling.trace(FLAGS.trace_dir):
            results, summary = run_partitioned_cohort(
                my_flags, subjects, regularization_list,
                partition_index=partition_index,
                num_partitions=num_partitions,
                partition_dir=partition_dir,
                subject_parallel=FLAGS.subject_parallel,
                cohort_csv_file=FLAGS.cohort_csv_file,
                cohort_plot_file=FLAGS.cohort_plot_file,
                results_csv_file=FLAGS.results_csv_file,
                partition_wait_s=FLAGS.partition_wait_s,
                streaming=streaming,
                checkpoint_dir=FLAGS.sweep_checkpoint_dir)
        if summary is None:
            print('Partition %d/%d done: %d subjects swept.'
                  % (partition_index, num_partitions, len(results)))
            return
        mean, std = summary
        num_named = '%d partitions' % num_partitions
    else:
        from telluride_decoding_tpu.utils import profiling
        with profiling.trace(FLAGS.trace_dir):
            results, (mean, std) = run_cohort_sweep(
                my_flags, subjects, regularization_list,
                subject_parallel=FLAGS.subject_parallel,
                cohort_csv_file=FLAGS.cohort_csv_file,
                cohort_plot_file=FLAGS.cohort_plot_file,
                results_csv_file=FLAGS.results_csv_file,
                streaming=streaming,
                checkpoint_dir=FLAGS.sweep_checkpoint_dir)
        num_named = '%d subjects' % len(results)
    best = int(np.argmax(mean))
    print('Cohort sweep over %s, %d lambdas:' %
          (num_named, len(mean)))
    for lamb, m, s in zip(regularization_list, mean, std):
        marker = '  <-- best' if float(
            np.asarray(regularization_list)[best]) == float(lamb) else ''
        print('  lambda %10.4g  r = %.4f +/- %.4f%s' %
              (float(lamb), float(m), float(s), marker))


regression.define_flags()
define_flags()


def app_main():
    app.run(main)


if __name__ == '__main__':
    app_main()
