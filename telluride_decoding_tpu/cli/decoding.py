"""Experiment driver: train + test one decoding model from flags.

Capability parity with the reference decoding.py (DecodingOptions
:48-154, flags :161-255, create_brain_model :259-311, train_and_test
:314-350, write_experiment_summary :353-410, check_files :413-433,
train_lda_model :436-482, run_decoding_experiment :485-577). The flag
names and semantics are preserved verbatim; the body runs as jitted
device programs (deterministic solves, one-pass decoder training)
instead of per-minibatch host loops. The results.txt format
('Parameters: ...' + 'Final_Testing/<metric>: ...' lines) is
load-bearing downstream and kept identical.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Tuple, Union

from absl import app
from absl import flags
from absl import logging

import numpy as np

from telluride_decoding_tpu.data import brain_data
from telluride_decoding_tpu.data import records
from telluride_decoding_tpu.decode import infer_decoder
from telluride_decoding_tpu.models import (
    BrainModelCCA,
    BrainModelClassifier,
    BrainModelDCCA,
    BrainModelDNN,
    BrainModelLinearRegression,
)


@dataclasses.dataclass
class DecodingOptions:
    """All parameters of one decoding experiment (flag mirror)."""

    attended_field: str = 'attend'
    batch_norm: bool = False
    batch_size: int = 512
    cca_dimensions: int = 10
    check_file_pattern: str = ''
    correlation_frames: int = 100
    correlation_reducer: str = 'lda'
    data: str = 'tfrecords'
    debug: bool = False
    dnn_regressor: str = 'fullyconnected'
    dp_fit: bool = False
    dropout: float = 0.0
    epoch_count: int = 100
    frame_rate: float = 100.0
    hidden_units: str = '20-20'
    input2_field: str = ''
    input2_post_context: int = 0
    input2_pre_context: int = 0
    input_offset: int = 0
    input_field: str = 'mel_spectrogram'
    learning_rate: float = 0.05
    loss: str = 'mse'
    min_context: int = 0
    output_field: str = 'envelope'
    post_context: int = 0
    pre_context: int = 0
    random_mixup_batch: bool = False
    mismatch_batch: bool = False
    streaming_fit: bool = False
    protocol: str = 'whole_split'
    regularization_lambda: float = 0.1
    saved_model_dir: Optional[str] = None
    shuffle_buffer_size: int = 100000
    summary_dir: str = '/tmp/tf'
    tensorboard_dir: Optional[str] = None
    test_file_pattern: str = ''
    test_metric: str = 'pearson_correlation_first'
    tfexample_dir: Optional[str] = None
    tfexample_pattern: str = ''
    train_file_pattern: str = ''
    validate_file_pattern: str = ''

    def set_flags(self, all_flags) -> 'DecodingOptions':
        for field in dataclasses.fields(self):
            if hasattr(all_flags, field.name):
                setattr(self, field.name, getattr(all_flags, field.name))
        return self

    def set_from_dict(self, new_values: Dict) -> 'DecodingOptions':
        for k, v in new_values.items():
            setattr(self, k, v)
        return self

    def experiment_parameters(
            self, delimiter: Optional[str] = ','
    ) -> Union[List[str], str]:
        params = dataclasses.asdict(self)
        keys_and_values = ['%s=%s' % (k, params[k]) for k in sorted(params)]
        if delimiter:
            return delimiter.join(keys_and_values)
        return keys_and_values


defaults = DecodingOptions()
FLAGS = flags.FLAGS


def define_flags():
    """Defines the decoding flag surface (idempotent)."""
    if 'dnn_regressor' in FLAGS:
        return
    flags.DEFINE_string('attended_field', '',
                        'Which data field indicates the attended feature.')
    flags.DEFINE_bool('batch_norm', defaults.batch_norm,
                      'Enable batch normalization in the network.')
    flags.DEFINE_integer('batch_size', defaults.batch_size,
                         'Number of frames (with context) per minibatch')
    flags.DEFINE_integer('cca_dimensions', defaults.cca_dimensions,
                         'Number of dimensions in the CCA analysis')
    flags.DEFINE_string('check_file_pattern', defaults.check_file_pattern,
                        'A regular expression enabling a file integrity '
                        'check.')
    flags.DEFINE_integer('correlation_frames', defaults.correlation_frames,
                         'How many frames to combine when estimating '
                         'correlation')
    flags.DEFINE_enum('correlation_reducer', defaults.correlation_reducer,
                      ['lda', 'first', 'second', 'mean', 'mean-squared'],
                      'How to reduce the correlation vector to a scalar.')
    flags.DEFINE_enum('data', defaults.data, ['tfrecords', 'test'],
                      'Dataset to use for this experiment.')
    flags.DEFINE_bool('debug', defaults.debug, 'Debug prints.')
    flags.DEFINE_enum('dnn_regressor', defaults.dnn_regressor,
                      ['fullyconnected', 'tf', 'linear', 'linear_with_bias',
                       'cca', 'classifier', 'dcca'],
                      'Model type for this experiment.')
    flags.DEFINE_bool('dp_fit', defaults.dp_fit,
                      'Train SGD models (fullyconnected/classifier/'
                      'dcca) data-parallel over every local device: '
                      'each minibatch shards across the mesh and '
                      'gradients all-reduce. Same batch stream as the '
                      'single-device fit (numbers match to float '
                      'tolerance); shards compute, not memory.')
    flags.DEFINE_float('dropout', defaults.dropout, 'The dropout rate.')
    flags.DEFINE_integer('epoch_count', defaults.epoch_count,
                         'Number of epochs for SGD models.')
    if 'frame_rate' not in FLAGS:   # cli.infer also defines it.
        flags.DEFINE_float('frame_rate', defaults.frame_rate,
                           'Number of frames per second in TFRecord data')
    flags.DEFINE_string('hidden_units', defaults.hidden_units,
                        'Hidden layer sizes, dash separated.')
    flags.DEFINE_string('input_field', defaults.input_field,
                        'Input field to use for predictions.')
    flags.DEFINE_string('input2_field', defaults.input2_field,
                        'Second input field for two-input methods.')
    flags.DEFINE_integer('input2_pre_context', defaults.input2_pre_context,
                         'Frames of pre context for the second input')
    flags.DEFINE_integer('input2_post_context',
                         defaults.input2_post_context,
                         'Frames of post context for the second input')
    flags.DEFINE_integer('input_offset', 0,
                         'Frames to drop from the first field; negative '
                         'drops from second/output field')
    flags.DEFINE_float('learning_rate', defaults.learning_rate,
                       'Initial learning rate for the optimizer.')
    flags.DEFINE_enum('loss', defaults.loss, ['mse', 'pearson'],
                      'Training loss.')
    flags.DEFINE_integer('min_context', defaults.min_context,
                         'Minimum frames of context for prediction')
    flags.DEFINE_string('output_field', defaults.output_field,
                        'Output field to predict.')
    flags.DEFINE_integer('pre_context', defaults.pre_context,
                         'Frames of context before prediction')
    flags.DEFINE_integer('post_context', defaults.post_context,
                         'Frames of context after prediction')
    flags.DEFINE_float('regularization_lambda',
                       defaults.regularization_lambda,
                       'Regularization for linear regression/CCA.')
    flags.DEFINE_bool('random_mixup_batch', defaults.random_mixup_batch,
                      'Mixup the data so labels are random, for testing. '
                      'Vestigial in the reference too: parsed into '
                      'DecodingOptions (reference decoding.py:77,118) '
                      'but never consulted by training — train_lda_model '
                      'hardcodes its own attended/mixup dataset pair '
                      '(reference decoding.py:472-474); preserved for '
                      'flag parity.')
    flags.DEFINE_bool('streaming_fit', defaults.streaming_fit,
                      'Fit deterministic models (linear/cca) from '
                      'per-file streamed covariance statistics: bounded '
                      'host memory (one raw file at a time) with lag '
                      'stacking on device. Value-identical to the '
                      'default whole-array fit.')
    flags.DEFINE_bool('mismatch_batch', defaults.mismatch_batch,
                      'Train in the match-mismatch paradigm: half of each '
                      'batch gets shuffled input_2 and the label becomes '
                      'the match/mismatch bit (use with '
                      '--dnn_regressor classifier). The reference defines '
                      'this transform but never wires it up '
                      '(brain_data.py:45-77).')
    flags.DEFINE_enum('protocol', defaults.protocol,
                      ['whole_split', 'reference'],
                      'Data/evaluation protocol. whole_split (default): '
                      'fit and evaluate whole ordered splits in one '
                      'program. reference: reproduce the TF reference '
                      'exactly — every split is shuffled (unless '
                      '--shuffle_buffer_size 0) then truncated to '
                      'floor(N/batch_size)*batch_size frames '
                      '(drop_remainder), and test metrics are means of '
                      'per-batch values (Keras evaluate semantics). The '
                      'two protocols give numerically different '
                      'correlations on the same data; see README '
                      '"Evaluation protocol".')
    flags.DEFINE_string('saved_model_dir', defaults.saved_model_dir,
                        'Directory in which to save the model.')
    flags.DEFINE_integer('shuffle_buffer_size',
                         defaults.shuffle_buffer_size,
                         'Number of elements to shuffle')
    flags.DEFINE_string('summary_dir', defaults.summary_dir,
                        'Location of summary files.')
    flags.DEFINE_string('trace_dir', None,
                        'Write a jax.profiler device trace of the '
                        'experiment here (TensorBoard-loadable; '
                        'beyond-reference observability — the '
                        'reference has no profiling hooks at all).')
    flags.DEFINE_string('tensorboard_dir', defaults.tensorboard_dir,
                        'Location of tensorboard files.')
    flags.DEFINE_string('test_file_pattern', defaults.test_file_pattern,
                        'Regular expression picking testing files.')
    flags.DEFINE_string('test_metric', defaults.test_metric,
                        'Metric to summarize from the training job.')
    flags.DEFINE_string('tfexample_dir', defaults.tfexample_dir,
                        'Location of generic TFRecord data')
    flags.DEFINE_string('tfexample_pattern', defaults.tfexample_pattern,
                        'Substring that data files must contain.')
    flags.DEFINE_string('train_file_pattern', defaults.train_file_pattern,
                        'Regular expression picking training files.')
    flags.DEFINE_string('validate_file_pattern',
                        defaults.validate_file_pattern,
                        'Regular expression picking validation files.')
    # Flags not stored in DecodingOptions (parity with reference).
    flags.DEFINE_enum('context_method', 'new', ('new', 'old'),
                      'Temporal window approach (kept for compatibility).')
    flags.DEFINE_integer('num_input_channels', 1,
                         'Input channels in test simulations.')
    flags.DEFINE_integer('prefetch_buffer_size', 100,
                         'Elements to prefetch (compatibility).')
    flags.DEFINE_integer('run', 0, 'Parallel-testing run number.')


def create_brain_model(model_flags: DecodingOptions, input_dataset):
    """Builds the requested model type (reference decoding.py:259-311)."""
    if not isinstance(model_flags, DecodingOptions):
        raise TypeError('Model_flags must be a DecodingOptions, not a %s' %
                        type(model_flags))
    kind = model_flags.dnn_regressor
    if kind == 'fullyconnected':
        hidden_units = ([int(x) for x in model_flags.hidden_units.split('-')]
                        if model_flags.hidden_units else [])
        bm = BrainModelDNN(input_dataset, hidden_units,
                           tensorboard_dir=model_flags.tensorboard_dir,
                           dropout=model_flags.dropout,
                           batch_norm=model_flags.batch_norm)
    elif kind == 'classifier':
        bm = BrainModelClassifier(
            input_dataset, model_flags.hidden_units,
            tensorboard_dir=model_flags.tensorboard_dir)
    elif kind in ('linear', 'linear_with_bias'):
        bm = BrainModelLinearRegression(
            input_dataset, model_flags.regularization_lambda,
            tensorboard_dir=model_flags.tensorboard_dir)
    elif kind == 'cca':
        bm = BrainModelCCA(
            input_dataset, cca_dims=model_flags.cca_dimensions,
            regularization_lambda=model_flags.regularization_lambda,
            tensorboard_dir=model_flags.tensorboard_dir)
    elif kind == 'dcca':
        hidden_units = ([int(x) for x in model_flags.hidden_units.split('-')]
                        if model_flags.hidden_units else [])
        bm = BrainModelDCCA(
            input_dataset, cca_dims=model_flags.cca_dimensions,
            hidden_units=hidden_units,
            # Consistent with the cca branch (and the reference's,
            # decoding.py:301-306): the user's flag reaches the
            # model's final CCA solve instead of a silent ctor
            # default.
            regularization_lambda=model_flags.regularization_lambda,
            tensorboard_dir=model_flags.tensorboard_dir)
    elif kind == 'tf':
        # Every driver (not just tdt-cohort) should explain this
        # flag-parity value up front rather than dying generically
        # after ingest.
        raise ValueError(
            "--dnn_regressor tf is a flag-parity value with no "
            "buildable model (the reference's create_brain_model has "
            "no 'tf' branch either, reference decoding.py:279-308); "
            "use linear/linear_with_bias/cca or an SGD family "
            "(fullyconnected/classifier/dcca).")
    else:
        raise TypeError('Unknown model type %s in create_brain_model.' %
                        kind)
    bm.compile(learning_rate=model_flags.learning_rate,
               loss=model_flags.loss)
    return bm


def train_and_test(my_flags: DecodingOptions, test_brain_data,
                   test_brain_model, epochs: int = 1,
                   fit_seed: int = 0
                   ) -> Tuple[Dict[str, float], Dict[str, float]]:
    """Fits on the train split and evaluates on the test split.

    fit_seed seeds the SGD families' parameter init and batch
    permutations (ignored by the deterministic solver families) —
    used by seeded replication studies such as the learning-regime
    reference A/B (tools/ab_reference.py run_learning_ab)."""
    if not isinstance(test_brain_data, brain_data.BrainData):
        raise TypeError('test_brain_data must be a BrainData object, not a '
                        '%s' % test_brain_data)
    if not isinstance(my_flags, DecodingOptions):
        raise TypeError('Train_and_test needs a DecodingOptions object, '
                        'not %s.' % type(my_flags))
    mismatch = getattr(my_flags, 'mismatch_batch', False)
    # The reference protocol truncates/shuffles the realized stream;
    # streamed covariance sees every frame, so the two would diverge.
    compat = getattr(my_flags, 'protocol', 'whole_split') == 'reference'
    streaming_ok = (hasattr(test_brain_model, 'fit_streaming') and
                    not mismatch and not compat and
                    isinstance(test_brain_data, brain_data.TFExampleData))
    want_streaming = getattr(my_flags, 'streaming_fit', False)
    sgd_model = isinstance(test_brain_model,
                           (BrainModelDNN, BrainModelClassifier,
                            BrainModelDCCA))
    if streaming_ok and not want_streaming and not sgd_model:
        # Auto-select bounded memory: covariance-based fits never need
        # the dense host concatenation (a pre+1+post blow-up, 37x at
        # codelab width), so when the estimated lag-stacked corpus is
        # large, stream it even without --streaming_fit. The result is
        # value-identical (tests/test_streaming.py). Threshold
        # override: TDT_STREAMING_AUTO_BYTES (0 disables). SGD models
        # are NOT auto-switched: their streaming fit draws a different
        # (bounded-shuffle) batch stream than the dense fit, so the
        # user opts in with --streaming_fit.
        try:
            # float() first so '1e9'-style values parse too.
            auto_bytes = int(float(
                os.environ.get('TDT_STREAMING_AUTO_BYTES', 1 << 30)))
        except ValueError:
            logging.warning('Unparseable TDT_STREAMING_AUTO_BYTES=%r; '
                            'using the 1 GB default.',
                            os.environ['TDT_STREAMING_AUTO_BYTES'])
            auto_bytes = 1 << 30
        if auto_bytes > 0:
            try:
                estimated = test_brain_data.estimated_stacked_bytes(
                    'train')
            except (OSError, ValueError, TypeError, KeyError):
                estimated = 0
            if estimated > auto_bytes:
                logging.info(
                    'Estimated lag-stacked train corpus ~%.1f GB > '
                    '%.1f GB: auto-selecting the bounded-memory '
                    'streaming fit (pass TDT_STREAMING_AUTO_BYTES=0 '
                    'to disable).', estimated / 2**30,
                    auto_bytes / 2**30)
                want_streaming = True
    fit_kwargs = {}
    if sgd_model:
        # The SGD families re-batch the assembled split themselves;
        # without this they silently trained at their own default
        # (512) instead of --batch_size, taking e.g. 4x fewer
        # optimizer steps per epoch at --batch_size 128 than the
        # reference's Keras fit on the same flags (caught by the
        # learning-regime A/B, tools/ab_reference.py run_learning_ab).
        # This deliberately overrides BrainModelDCCA.fit's own API
        # default (1024): the reference trains every family, DCCA
        # included, on a dataset batched at --batch_size (reference
        # decoding.py:53,95 — flag default 512), so the driver always
        # forwards the flag for reference parity.
        fit_kwargs['batch_size'] = my_flags.batch_size
        # Seed is unconditional (not `if fit_seed:`): seed 0 must be
        # forwarded explicitly rather than ride the fits' default, so
        # the seeded-run contract cannot silently break if a fit's
        # default seed ever changes.
        fit_kwargs['seed'] = fit_seed
    if getattr(my_flags, 'dp_fit', False) and sgd_model:
        # SGD families only; the deterministic solvers already shard
        # their covariance pass over the mesh.
        import jax as _jax
        from jax.sharding import Mesh as _Mesh
        devices = _jax.local_devices()
        if len(devices) > 1:
            fit_kwargs['mesh'] = _Mesh(np.asarray(devices), ('data',))
            logging.info('dp_fit: minibatches sharded over %d '
                         'devices.', len(devices))
    if want_streaming and streaming_ok:
        # Bounded-memory path: per-file streamed covariance for the
        # deterministic families; per-file minibatch streaming for the
        # SGD families (the train split is never concatenated on the
        # host either way).
        train_results = test_brain_model.fit_streaming(
            test_brain_data, 'train', epochs=epochs, **fit_kwargs)
    else:
        if getattr(my_flags, 'streaming_fit', False):
            # The user asked for bounded memory; say loudly that the
            # dense fallback (which concatenates the train split on
            # the host) is being used instead, and why.
            reason = ('model %s has no streaming fit'
                      % type(test_brain_model).__name__
                      if not hasattr(test_brain_model, 'fit_streaming')
                      else 'mismatch batches transform the stream'
                      if mismatch else
                      'dataset %s is not file-backed'
                      % type(test_brain_data).__name__)
            logging.warning('--streaming_fit requested but not '
                            'applicable (%s); using the dense '
                            'whole-array fit.', reason)
        train_dataset = test_brain_data.create_dataset(
            'train', mismatch_batch=mismatch)
        train_results = test_brain_model.fit(train_dataset,
                                             epochs=epochs,
                                             **fit_kwargs)
    test_dataset = test_brain_data.create_dataset(
        'test', mismatch_batch=mismatch)
    test_results = test_brain_model.evaluate(test_dataset)
    return train_results, test_results


def write_experiment_summary(my_flags: DecodingOptions,
                             train_results: Dict,
                             test_results: Dict,
                             dprime: Optional[float] = None):
    """Writes results.txt (format identical to decoding.py:353-410,
    including the PARAMS token directory substitution)."""
    if not isinstance(my_flags, DecodingOptions):
        raise TypeError('Write_experiment_summary needs a DecodingOptions '
                        'object, not %s.' % type(my_flags))
    summary_dir = my_flags.summary_dir
    if not summary_dir:
        return
    if 'PARAMS' in summary_dir:
        summary_dir = summary_dir.replace(
            'PARAMS', my_flags.experiment_parameters(','))
        # Path components are capped at 255 bytes on most filesystems;
        # overlong components keep a readable prefix plus a hash of the
        # full parameter string so sweep jobs still get unique dirs.
        import hashlib
        parts = []
        for part in summary_dir.split(os.sep):
            if len(part.encode()) > 200:
                digest = hashlib.sha1(part.encode()).hexdigest()[:12]
                part = part[:180] + '...' + digest
            parts.append(part)
        summary_dir = os.sep.join(parts)
    os.makedirs(summary_dir, exist_ok=True)
    results_file = os.path.join(summary_dir, 'results.txt')
    with open(results_file, 'w') as fp:
        fp.write('Parameters: %s\n' % my_flags.experiment_parameters(';'))
        # Which evaluation protocol produced the numbers below — the
        # two are NOT numerically comparable (README "Evaluation
        # protocol"; downstream parsers key on Parameters:/Final_*
        # prefixes and skip this line).
        protocol = getattr(my_flags, 'protocol', 'whole_split')
        if protocol == 'reference':
            fp.write('Protocol: reference (shuffled drop-remainder '
                     'batches of %d, per-batch metric means — the TF '
                     'reference\'s Keras evaluate semantics)\n' %
                     my_flags.batch_size)
        else:
            fp.write('Protocol: whole_split (every test frame, ordered, '
                     'one metric over the full split; reference-style '
                     'numbers need --protocol reference)\n')
        for k in test_results:
            value = test_results[k]
            if isinstance(value, np.ndarray):
                fp.write('Final_Test/%s: %s\n' %
                         (k, ' '.join(str(f)
                                      for f in np.reshape(value, (-1)))))
            else:
                fp.write('Final_Testing/%s: %g\n' % (k, value))
        if dprime is not None:
            fp.write('Final_Testing/dprime: %g\n' % dprime)
    logging.info('Wrote summary results to %s', results_file)


def check_files(exp_data_dir: str, tfexample_pattern: str = '.tfrecords'):
    """Validates every matching TFRecord file (decoding.py:413-433)."""
    all_files = []
    for path, _, files in os.walk(exp_data_dir):
        all_files += [os.path.join(path, f) for f in files
                      if f.endswith('.tfrecords') and
                      tfexample_pattern in f]
    print('Found %d files for TFExample data analysis.' % len(all_files))
    for f in all_files:
        count, error = records.count_tfrecords(f)
        logging.info('%s: %d%s', f, count, ' (ERROR)' if error else '')


def train_lda_model(brain_dataset, trained_model,
                    my_flags: DecodingOptions
                    ) -> Tuple[float, infer_decoder.Decoder]:
    """Trains the LDA reducer on the regressor's correlated outputs
    (decoding.py:436-482): attended = real test data, unattended =
    mixed-up test data."""
    if not isinstance(brain_dataset, brain_data.BrainData):
        raise TypeError('Train_lda_model needs BrainData, not %s.' %
                        type(brain_dataset))
    if not callable(trained_model):
        raise TypeError('Trained_model parameter is not a callable '
                        'function, but a %s.' % type(trained_model))
    if isinstance(my_flags, dict):
        my_flags = DecodingOptions().set_from_dict(my_flags)
    attended_data = brain_dataset.create_dataset('test', mixup_batch=False)
    unattended_data = brain_dataset.create_dataset('test', mixup_batch=True)
    decoder = infer_decoder.create_decoder(
        my_flags.dnn_regressor, reduction=my_flags.correlation_reducer,
        model=trained_model)
    dprime = decoder.train(unattended_data, attended_data,
                           window_size=my_flags.correlation_frames)
    return dprime, decoder


def run_decoding_experiment(my_flags: DecodingOptions
                            ) -> Tuple[Dict, Dict, float]:
    """Assembles data, trains, evaluates, trains LDA, writes artifacts."""
    if my_flags.debug:
        logging.set_verbosity(logging.DEBUG)
    if (my_flags.pre_context + 1 + my_flags.post_context <
            my_flags.min_context):
        my_flags.post_context = (my_flags.min_context -
                                 (my_flags.pre_context + 1))
    if not my_flags.summary_dir.endswith('/'):
        my_flags.summary_dir = my_flags.summary_dir + '/'

    if my_flags.check_file_pattern:
        check_files(my_flags.tfexample_dir, my_flags.tfexample_pattern)
        return {}, {}, 0.0

    from telluride_decoding_tpu.utils.profiling import StageTimer
    timer = StageTimer('run_decoding_experiment')

    with timer.stage('data_discovery'):
        test_brain_data = brain_data.create_brain_dataset(
            my_flags.data, my_flags.input_field, my_flags.output_field,
            attended_field=my_flags.attended_field or None,
            frame_rate=my_flags.frame_rate,
            pre_context=my_flags.pre_context,
            post_context=my_flags.post_context,
            in2_fields=my_flags.input2_field or None,
            in2_pre_context=my_flags.input2_pre_context,
            in2_post_context=my_flags.input2_post_context,
            input_offset=my_flags.input_offset,
            final_batch_size=my_flags.batch_size,
            shuffle_buffer_size=my_flags.shuffle_buffer_size,
            data_dir=my_flags.tfexample_dir,
            data_pattern=my_flags.tfexample_pattern,
            train_file_pattern=my_flags.train_file_pattern,
            validate_file_pattern=my_flags.validate_file_pattern,
            test_file_pattern=my_flags.test_file_pattern,
            reference_protocol=my_flags.protocol == 'reference')
        # Shape-only stand-in: the model factory and add_metadata need
        # element widths, not data. Materializing the dense train
        # split here held a full 37x lag-stacked copy of the corpus
        # for the whole experiment — and defeated the bounded-memory
        # streaming fit on exactly the corpora it exists for.
        some_dataset = test_brain_data.spec_dataset()

    test_model = create_brain_model(my_flags, some_dataset)
    test_model.add_tensorboard_summary(
        'Parameters', my_flags.experiment_parameters(' '))

    with timer.stage('train_and_test'):
        train_results, test_results = train_and_test(
            my_flags, test_brain_data, test_model,
            epochs=my_flags.epoch_count)
    test_model.summary()
    test_model.add_metadata(dataclasses.asdict(my_flags),
                            dataset=some_dataset)

    if my_flags.dnn_regressor == 'classifier':
        # A match-mismatch classifier already outputs a decision
        # probability; the correlation->LDA stage does not apply. (The
        # reference crashes here instead: its create_decoder has no
        # classifier case, infer_decoder.py:635-666.)
        dprime, final_decoder = 0.0, None
    else:
        with timer.stage('train_lda'):
            dprime, final_decoder = train_lda_model(test_brain_data,
                                                    test_model, my_flags)

    print('train_and_test got these results: %s and test %s' %
          (train_results, test_results))
    print('Calculated dprime is %g.' % dprime)

    if my_flags.summary_dir:
        write_experiment_summary(my_flags, train_results, test_results,
                                 dprime)
        print('Wrote train/test results to %s.' % my_flags.summary_dir)

    if my_flags.tensorboard_dir and test_model.tensorboard_dir:
        from telluride_decoding_tpu.utils import summaries
        writer = summaries.SummaryWriter(
            os.path.join(test_model.tensorboard_dir, 'dprime'))
        writer.scalar('dprime', dprime, step=my_flags.epoch_count)

    if my_flags.saved_model_dir:
        with timer.stage('save_artifacts'):
            test_model.save(my_flags.saved_model_dir)
            if final_decoder is not None:
                final_decoder.save_parameters(
                    os.path.join(my_flags.saved_model_dir,
                                 'decoder_model.json'))
        print('Wrote saved model to %s.' % my_flags.saved_model_dir)
    print(timer.report())
    return train_results, test_results, dprime


def main(argv):
    if len(argv) > 1:
        raise app.UsageError('Too many command-line arguments: %s.' % argv)
    from telluride_decoding_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()
    my_flags = DecodingOptions().set_flags(FLAGS)
    from telluride_decoding_tpu.utils import profiling
    with profiling.trace(FLAGS.trace_dir):
        run_decoding_experiment(my_flags)


define_flags()


def app_main():
    app.run(main)


if __name__ == '__main__':
    app_main()
