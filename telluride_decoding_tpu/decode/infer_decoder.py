"""Streaming attention decoding: correlation state + reductions + LDA.

Capability parity with the reference infer_decoder.py (Decoder
:95-580, Linear/CCA subclasses :583-632, create_decoder :635-666),
re-designed TPU-first:

  * The per-window serving path (``infer_one``) is one jitted program:
    model apply -> normalized cross product -> reduction (including the
    LDA projection, which is just an affine map). Compiled once, then
    each window is a single device dispatch — this is the <10 ms p50
    target path.
  * Training the decoder statistics runs in ONE pass over in-memory
    arrays (decode once, stats + correlations from the same
    activations) instead of the reference's four full dataset
    re-decodes (infer_decoder.py:365-390).
  * ``decoder_model.json`` stays wire-compatible: the same
    ModelParams namedtuple structure, complex arrays split re/im
    (NumpyEncoder semantics, infer_decoder.py:75-92).
"""

from __future__ import annotations

import collections
import functools
import json
import os
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from telluride_decoding_tpu.decode import result_store
from telluride_decoding_tpu.decode.metrics import (average_data,
                                                   calculate_dprime)
from telluride_decoding_tpu.solvers import lda as scaled_lda

CorrelationParamsTuple = collections.namedtuple('CorrelationParamsTuple', [
    'count', 'sum_x', 'sum_y', 'sum_x2', 'sum_y2', 'mean_x', 'mean_y',
    'power'])
ModelParamsTuple = collections.namedtuple('ModelParamsTuple',
                                          ['correlation_params',
                                           'lda_params'])

REDUCTIONS = ('mean-squared', 'first', 'second', 'lda', 'all', 'mean')


class NumpyEncoder(json.JSONEncoder):
    """JSON encoder splitting complex arrays into [re, im] lists
    (reference infer_decoder.py:75-86 schema)."""

    def default(self, obj: Any):
        if isinstance(obj, np.ndarray):
            if np.iscomplexobj(obj):
                return [np.real(obj).tolist(), np.imag(obj).tolist()]
            return obj.tolist()
        if isinstance(obj, (np.floating, np.integer)):
            return obj.item()
        return json.JSONEncoder.default(self, obj)


def _reduce(correlations: jax.Array, reduction: str,
            lda_w: Optional[jax.Array], lda_slope, lda_intercept):
    """Applies the chosen reduction; jit-safe (reduction is static)."""
    if reduction == 'first':
        return correlations[:, 0]
    if reduction == 'second':
        return correlations[:, 1]
    if reduction == 'mean':
        return jnp.mean(correlations, axis=1)
    if reduction == 'mean-squared':
        return jnp.mean(jnp.sign(correlations) * correlations ** 2, axis=1)
    if reduction == 'lda':
        projected = jnp.dot(correlations, lda_w,
                            preferred_element_type=jnp.float32)
        return lda_slope * projected[:, 0] + lda_intercept
    if reduction == 'all':
        return correlations
    raise ValueError('Unknown reduction technique: %s.' % reduction)


class Decoder:
    """Base decoder: correlation statistics + reduction + LDA.

    ``decoding_model`` is any callable mapping an input dict
    ({'input_1', 'input_2'}) to predictions; BrainModel instances
    qualify.
    """

    def __init__(self,
                 decoding_model: Optional[Callable] = None,
                 reduction: str = 'mean-squared'):
        if decoding_model is not None and not callable(decoding_model):
            raise TypeError('Must supply a callable model when initializing '
                            'a Decoder, not a %s.' % type(decoding_model))
        if reduction not in REDUCTIONS:
            raise ValueError('Unknown reduction technique: %s' % reduction)
        self._decoding_model = decoding_model
        self._decoding_model_params: Dict[str, Any] = {}
        self._model_inputs: Dict[str, Any] = {}
        self._model_output: list = []
        self._reduction = reduction
        self._lda: Optional[scaled_lda.ScaledLinearDiscriminantAnalysis] = \
            None
        # Identity of the model params the cached jitted pipelines
        # were traced against (fits REPLACE the params pytree, so
        # object identity is the refit telltale).
        self._built_params_ref: Any = None
        self.reset_correlation_statistics()

    # -- properties -----------------------------------------------------------

    @property
    def decoding_model(self):
        return self._decoding_model

    @property
    def decoding_model_params(self) -> Dict[str, Any]:
        return self._decoding_model_params

    @decoding_model_params.setter
    def decoding_model_params(self, values: Dict[str, Any]):
        self._decoding_model_params = values

    @property
    def correlation_params(self) -> CorrelationParamsTuple:
        return CorrelationParamsTuple(
            self._count, self._sum_x, self._sum_y, self._sum_x2,
            self._sum_y2, self._mean_x, self._mean_y, self._power)

    def _set_correlation_params(self, values):
        values = CorrelationParamsTuple(*values)
        self._count = values.count
        self._sum_x = np.asarray(values.sum_x)
        self._sum_y = np.asarray(values.sum_y)
        self._sum_x2 = np.asarray(values.sum_x2)
        self._sum_y2 = np.asarray(values.sum_y2)
        self._mean_x = np.asarray(values.mean_x)
        self._mean_y = np.asarray(values.mean_y)
        self._power = np.asarray(values.power)

    @property
    def lda_params(self) -> scaled_lda.LdaParams:
        if self._lda is None:
            self._lda = scaled_lda.ScaledLinearDiscriminantAnalysis()
        return self._lda.model_parameters

    def _set_lda_params(self, values):
        if self._lda is None:
            self._lda = scaled_lda.ScaledLinearDiscriminantAnalysis()
        self._lda.model_parameters = scaled_lda.LdaParams(*values)

    @property
    def model_params(self) -> ModelParamsTuple:
        return ModelParamsTuple(self.correlation_params, self.lda_params)

    @model_params.setter
    def model_params(self, values: ModelParamsTuple):
        self._set_parameters(values)

    def _set_parameters(self, values: ModelParamsTuple):
        self._set_correlation_params(values.correlation_params)
        self._set_lda_params(values.lda_params)
        # The jitted pipelines close over the statistics and LDA
        # parameters; new values must recompile them.
        self._infer_fn = None
        self._infer_pair_fn = None

    @property
    def model_inputs(self) -> Dict[str, Any]:
        return self._model_inputs

    @property
    def model_output(self) -> list:
        return self._model_output

    def reset_correlation_statistics(self):
        self._count = 0
        self._sum_x = 0.0
        self._sum_y = 0.0
        self._sum_x2 = 0.0
        self._sum_y2 = 0.0
        self._mean_x = 0.0
        self._mean_y = 0.0
        self._power = 1.0
        self._infer_fn = None
        self._infer_pair_fn = None

    # -- persistence (decoder_model.json compatible) --------------------------

    def save_parameters(self, param_filename: str):
        params = self.model_params
        os.makedirs(os.path.dirname(os.path.abspath(param_filename)),
                    exist_ok=True)
        with open(param_filename, 'w') as f:
            json.dump(params._asdict(), f, cls=NumpyEncoder)

    def restore_parameters(self, param_filename: str):
        with open(param_filename, 'r') as f:
            loaded = json.load(f)
        self.model_params = ModelParamsTuple(**loaded)
        self._infer_fn = None
        self._infer_pair_fn = None

    def load_decoding_model(self, saved_model_dir: str,
                            object_dict: Optional[Dict] = None):
        """Loads a saved model, pulling the embedded telluride metadata
        (reference infer_decoder.py:250-286).

        Accepts either this framework's native format (model.json +
        weights.npz) or a reference TF SavedModel directory, which is
        migrated on the fly (models.migrate) — existing reference
        artifacts serve without conversion. object_dict is accepted for
        API parity and ignored (custom functions come from the model
        registry)."""
        del object_dict
        if not saved_model_dir or not isinstance(saved_model_dir, str):
            raise TypeError('Must provide a file name (string) to '
                            'load-model, not a %s.' % type(saved_model_dir))
        if os.path.exists(os.path.join(saved_model_dir, 'model.json')):
            from telluride_decoding_tpu.models import load_model
            self._decoding_model = load_model(saved_model_dir)
        elif os.path.exists(os.path.join(saved_model_dir,
                                         'saved_model.pb')):
            from telluride_decoding_tpu.models.migrate import (
                load_reference_saved_model)
            self._decoding_model = load_reference_saved_model(
                saved_model_dir)
        else:
            from telluride_decoding_tpu.models import load_model
            self._decoding_model = load_model(saved_model_dir)
        if self._decoding_model.telluride_metadata:
            self._decoding_model_params = json.loads(
                self._decoding_model.telluride_metadata)
        if self._decoding_model.telluride_inputs:
            self._model_inputs = json.loads(
                self._decoding_model.telluride_inputs)
        if self._decoding_model.telluride_output:
            self._model_output = json.loads(
                self._decoding_model.telluride_output)
        self._infer_fn = None
        self._infer_pair_fn = None

    # -- correlation statistics ------------------------------------------------

    def add_data_correlator(self, x: np.ndarray, y: np.ndarray):
        """Online update of the correlation normalization statistics
        (reference infer_decoder.py:288-311)."""
        x = np.asarray(x)
        y = np.asarray(y)
        self._count += x.shape[0]
        self._sum_x = self._sum_x + np.sum(x, axis=0)
        self._sum_y = self._sum_y + np.sum(y, axis=0)
        self._sum_x2 = self._sum_x2 + np.sum(x ** 2, axis=0)
        self._sum_y2 = self._sum_y2 + np.sum(y ** 2, axis=0)
        self._mean_x = self._sum_x / self._count
        self._mean_y = self._sum_y / self._count
        self._power = (np.sqrt(
            (self._sum_x2 - self._sum_x ** 2 / self._count) *
            (self._sum_y2 - self._sum_y ** 2 / self._count)) / self._count)
        self._infer_fn = None
        self._infer_pair_fn = None

    def compute_correlation(self, x, y) -> np.ndarray:
        """Normalized cross product per frame, before the time sum."""
        x = np.asarray(x)
        y = np.asarray(y)
        return ((x - np.broadcast_to(self._mean_x, x.shape)) *
                (y - np.broadcast_to(self._mean_y, y.shape)) / self._power)

    # -- decoding ---------------------------------------------------------------

    def decode_one(self, input_dict, ground_truth):
        raise NotImplementedError('Must be implemented by a subclass.')

    def _decode_arrays(self, input_dict: Dict[str, jnp.ndarray],
                       ground_truth: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Traceable core of decode_one (jnp in, jnp out)."""
        raise NotImplementedError('Must be implemented by a subclass.')

    def _model_apply(self):
        model = self._decoding_model
        if hasattr(model, 'apply') and hasattr(model, 'params'):
            return functools.partial(model.apply, model.params)
        return lambda inputs: jnp.asarray(model(
            {k: np.asarray(v) for k, v in inputs.items()}))

    def _build_correlate_reduce(self):
        """Jitted (r1, r2) -> reduced scores stage, closed over the
        current correlation statistics and LDA parameters."""
        reduction = self._reduction
        mean_x = jnp.asarray(self._mean_x, jnp.float32)
        mean_y = jnp.asarray(self._mean_y, jnp.float32)
        power = jnp.asarray(self._power, jnp.float32)
        if reduction == 'lda':
            if self._lda is None or self._lda.coef_array is None:
                # Failing inside the jit would surface as an opaque
                # trace-time TypeError on the None weight; match the
                # reference's actionable message (infer_decoder.py:441).
                raise ValueError('Must compute the LDA model before '
                                 'reducing data (train the decoder or '
                                 'restore_parameters first).')
            lda_w = jnp.asarray(np.real(self._lda.coef_array), jnp.float32)
            lda_slope = jnp.asarray(self._lda.slope, jnp.float32)
            lda_intercept = jnp.asarray(self._lda.intercept, jnp.float32)
        else:
            lda_w, lda_slope, lda_intercept = None, 0.0, 0.0

        @jax.jit
        def correlate_reduce(r1, r2):
            correlations = (r1 - mean_x) * (r2 - mean_y) / power
            return _reduce(correlations, reduction, lda_w, lda_slope,
                           lda_intercept)
        return correlate_reduce

    def _build_infer_fn(self):
        """Compiles the window pipeline into one jitted function.

        When the decoding model is a JAX model (BrainModel: apply +
        params) the entire decode -> correlate -> reduce pipeline is one
        program. For arbitrary python callables only the post-decode
        stage is jitted.
        """
        correlate_reduce = self._build_correlate_reduce()
        model = self._decoding_model
        if hasattr(model, 'apply') and getattr(model, 'params',
                                               None) is not None:
            decode = self._decode_arrays

            @jax.jit
            def infer(input_dict, output):
                r1, r2 = decode(input_dict, output)
                return correlate_reduce(r1, r2)

            def run(input_dict, output):
                inputs = {k: jnp.asarray(np.asarray(v), jnp.float32)
                          for k, v in input_dict.items()
                          if k in ('input_1', 'input_2')}
                return np.asarray(infer(
                    inputs, jnp.asarray(np.asarray(output), jnp.float32)))
        else:
            def run(input_dict, output):
                r1, r2 = self.decode_one(input_dict, output)
                return np.asarray(correlate_reduce(
                    jnp.asarray(r1, jnp.float32),
                    jnp.asarray(r2, jnp.float32)))
        return run

    def _invalidate_stale_pipelines(self):
        """Drops the cached jitted pipelines when the underlying model
        was refit.

        The pipelines close over ``model.params`` at trace time; without
        this check a refit would leave already-compiled window shapes
        serving the OLD weights while any new shape retraces onto the
        new ones — two chunk sizes in one session scoring with
        different models, silently."""
        params = getattr(self._decoding_model, 'params', None)
        if params is not self._built_params_ref:
            self._infer_fn = None
            self._infer_pair_fn = None
            self._built_params_ref = params

    def infer_one(self, input_dict, output) -> np.ndarray:
        """Full inference for one minibatch/window: a single device
        dispatch after first compile."""
        self._invalidate_stale_pipelines()
        if self._infer_fn is None:
            self._infer_fn = self._build_infer_fn()
        return self._infer_fn(input_dict, output)

    def infer_pair(self, input_1, input_2a, input_2b, output_a,
                   output_b) -> Tuple[np.ndarray, np.ndarray]:
        """Scores BOTH candidate streams against one brain window in a
        single device dispatch.

        The two-speaker serving loop (reference call sites
        infer.py:380-384 run one decode per speaker) shares input_1
        across speakers; fusing the pair into one program halves the
        dispatch count — the dominant serving cost over a high-latency
        link — and lets XLA CSE compute the shared input_1 transform
        (the wide matmul) once. Value-identical to two infer_one calls.
        """
        self._invalidate_stale_pipelines()
        if self._infer_pair_fn is None:
            self._infer_pair_fn = self._build_infer_pair_fn()
        return self._infer_pair_fn(input_1, input_2a, input_2b,
                                   output_a, output_b)

    def infer_pair_async(self, input_1, input_2a, input_2b, output_a,
                         output_b):
        """infer_pair WITHOUT the host readback: returns the in-flight
        device arrays so a pipelined caller (cli.serve double
        buffering) can overlap the device round trip with the next
        chunk's acquisition; np.asarray(result) harvests. Falls back
        to the blocking pair when the model isn't a fused jax program
        (np arrays harvest identically)."""
        self._invalidate_stale_pipelines()
        if self._infer_pair_fn is None:
            self._infer_pair_fn = self._build_infer_pair_fn()
        return self._infer_pair_fn(input_1, input_2a, input_2b,
                                   output_a, output_b, readback=False)

    def _build_infer_pair_core(self):
        """The PURE fused two-stream program ``(x1, in2a, in2b, ya, yb)
        -> (scores_a, scores_b)``, with the model weights, correlation
        statistics and LDA parameters closed over as compile-time
        constants; None when the decoding model is not a jax pytree
        model. This is the hermetic program decode.aot serializes as
        the ahead-of-time serving artifact."""
        model = self._decoding_model
        if not (hasattr(model, 'apply') and getattr(model, 'params',
                                                    None) is not None):
            return None
        decode = self._decode_arrays
        correlate_reduce = self._build_correlate_reduce()

        @jax.jit
        def infer2(x1, in2a, in2b, ya, yb):
            # x1 is passed ONCE; the duplicate decode of it is
            # eliminated by XLA common-subexpression elimination.
            ra = decode({'input_1': x1, 'input_2': in2a}, ya)
            rb = decode({'input_1': x1, 'input_2': in2b}, yb)
            return correlate_reduce(*ra), correlate_reduce(*rb)
        return infer2

    def _build_infer_pair_fn(self):
        infer2 = self._build_infer_pair_core()
        if infer2 is None:
            # Arbitrary python callables can't fuse: fall back to two
            # sequential single-stream dispatches (always blocking;
            # readback is accepted for interface parity).
            def run(input_1, input_2a, input_2b, output_a, output_b,
                    readback=True):
                del readback
                sa = self.infer_one(
                    {'input_1': input_1, 'input_2': input_2a}, output_a)
                sb = self.infer_one(
                    {'input_1': input_1, 'input_2': input_2b}, output_b)
                return sa, sb
            return run

        def run(input_1, input_2a, input_2b, output_a, output_b,
                readback=True):
            j = lambda v: jnp.asarray(np.asarray(v), jnp.float32)
            sa, sb = infer2(j(input_1), j(input_2a), j(input_2b),
                            j(output_a), j(output_b))
            if readback:
                return np.asarray(sa), np.asarray(sb)
            # In-flight device arrays: the pipelined serve loop
            # harvests them one push later with np.asarray.
            return sa, sb
        return run

    # -- training ------------------------------------------------------------------

    def train(self, data0, data1, window_size: int = 0) -> float:
        """Estimates correlation statistics + LDA from two datasets.

        data0: class-0 (unattended/mixed-up); data1: class-1 (attended).
        One decode per dataset (the reference re-decodes everything four
        times, infer_decoder.py:365-390).
        """
        decoded0 = self._decode_dataset(data0)
        decoded1 = self._decode_dataset(data1)
        self.reset_correlation_statistics()
        for r1, r2 in (decoded0, decoded1):
            self.add_data_correlator(r1, r2)
        corr0 = self.compute_correlation(*decoded0)
        corr1 = self.compute_correlation(*decoded1)
        if corr0.shape[0] == 0:
            raise ValueError('No data for class 0')
        if corr1.shape[0] == 0:
            raise ValueError('No data for class 1')
        return self.compute_lda_model(average_data(corr0, window_size),
                                      average_data(corr1, window_size))

    def _decode_dataset(self, dataset) -> Tuple[np.ndarray, np.ndarray]:
        r1_parts, r2_parts = [], []
        for input_dict, output in dataset:
            r1, r2 = self.decode_one(input_dict, output)
            r1_parts.append(np.asarray(r1))
            r2_parts.append(np.asarray(r2))
        if not r1_parts:
            return (np.zeros((0, 1), np.float32),) * 2
        return np.concatenate(r1_parts), np.concatenate(r2_parts)

    def compute_lda_model(self, d1: np.ndarray, d2: np.ndarray) -> float:
        """Fits scaled LDA separating class 0 (label 1) from class 1
        (label 2); returns d' (reference infer_decoder.py:506-533)."""
        if not isinstance(d1, np.ndarray):
            raise TypeError('Input d1 must be an numpy array, not %s.' %
                            type(d1))
        if not isinstance(d2, np.ndarray):
            raise TypeError('Input d2 must be an numpy array, not %s.' %
                            type(d2))
        data = np.concatenate((d1, d2), axis=0)
        labels = np.concatenate((1 * np.ones(d1.shape[0]),
                                 2 * np.ones(d2.shape[0])))
        self._lda = scaled_lda.ScaledLinearDiscriminantAnalysis()
        predictions = self._lda.fit_transform(data, labels)
        self._infer_fn = None
        self._infer_pair_fn = None
        return float(calculate_dprime(predictions[labels == 1, 0],
                                      predictions[labels == 2, 0]))

    def reduce_with_lda(self, d1) -> np.ndarray:
        if self._lda is None:
            raise ValueError('Must compute the LDA model before reducing '
                             'data.')
        if not isinstance(d1, np.ndarray):
            raise TypeError('Input data must be an numpy array, not %s.' %
                            type(d1))
        return self._lda.transform(d1)

    # -- evaluation ---------------------------------------------------------------

    def test_all(self, exp_data) -> Tuple[np.ndarray, np.ndarray]:
        """Decodes a whole dataset; returns (likelihoods, labels)."""
        predictions = result_store.NumpyStore(name='test_all predictions')
        labels = result_store.NumpyStore(name='test_all labels')
        for input_dict, output in exp_data:
            predictions.add_data(self.infer_one(input_dict, output))
            labels.add_data(np.asarray(input_dict['attended_speaker']))
        return predictions.all_data, labels.all_data

    def test_by_window(self, dataset, window_size: int
                       ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yields (inference, label) windows of window_size frames,
        advancing by window_size//2 (reference infer_decoder.py:484-504).

        The step clamps to >= 1: at window_size=1 the reference's
        ``window_size//2 == 0`` step makes its TwoResultStore yield the
        same window forever (an infinite loop in the reference);
        window_means applies the same clamp, so the two evaluators
        agree at every window size."""
        storage = result_store.TwoResultStore(
            window_width=window_size,
            window_step=max(window_size // 2, 1))
        for input_dict, output in dataset:
            infer_results = self.infer_one(input_dict, output)
            storage.add_data(infer_results,
                             np.asarray(input_dict['attended_speaker']))
            for r1, r2 in storage.next_window():
                yield r1, r2

    def frame_scores(self, dataset) -> Tuple[np.ndarray, np.ndarray]:
        """Per-frame scores + labels for in-order windowed evaluation.

        The window-size-INDEPENDENT half of test_by_window_means: the
        whole dataset decodes in one jitted dispatch. Window sweeps
        (cli.infer runs six sizes per speaker) call this once and
        window the result per size instead of re-decoding the corpus.
        """
        from telluride_decoding_tpu.data.brain_data import BrainDataset
        if isinstance(dataset, BrainDataset) and \
                not dataset.has_batch_transforms:
            in1, in2, out, attended = dataset.all_arrays()
            # Match the iterator's drop-remainder batching: frames past
            # the last full minibatch are never delivered.
            batch = dataset.batch_size
            if batch:
                keep = (in1.shape[0] // batch) * batch
                in1, in2 = in1[:keep], in2[:keep]
                out, attended = out[:keep], attended[:keep]
            scores = self.infer_one({'input_1': in1, 'input_2': in2},
                                    out)
            labels = np.asarray(attended)
        else:
            scores_parts, label_parts = [], []
            for input_dict, output in dataset:
                scores_parts.append(self.infer_one(input_dict, output))
                label_parts.append(
                    np.asarray(input_dict['attended_speaker']))
            if not scores_parts:
                # A transform dataset shorter than one minibatch yields
                # nothing (drop_remainder); empty results, like the
                # fast path and the reference's test_by_window.
                return np.zeros((0,)), np.zeros((0,))
            scores = np.concatenate(scores_parts)
            labels = np.concatenate(label_parts)
        scores = np.asarray(scores)
        if scores.ndim > 1 and scores.shape[-1] > 1:
            # reduction='all' yields [N, D] correlation vectors; the
            # per-window decision statistic is the mean over frames AND
            # dims (np.mean of the window, as the iterator path's
            # consumers compute), so averaging dims first is exact —
            # flattening would interleave dims into the frame axis.
            scores = scores.mean(axis=-1)
        scores = np.reshape(scores, (-1,))
        labels = np.reshape(np.asarray(labels)[:, 0] if labels.ndim > 1
                            else labels, (-1,))
        return scores, labels

    @staticmethod
    def window_means(scores: np.ndarray, labels: np.ndarray,
                     window_size: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """50%-overlap window means over precomputed frame scores."""
        step = max(window_size // 2, 1)
        num_windows = max((scores.shape[0] - window_size) // step + 1, 0)
        if num_windows <= 0:
            return np.zeros((0,)), np.zeros((0,))
        csum_s = np.concatenate([[0.0], np.cumsum(scores)])
        csum_l = np.concatenate([[0.0], np.cumsum(labels)])
        starts = np.arange(num_windows) * step
        mean_scores = (csum_s[starts + window_size] -
                       csum_s[starts]) / window_size
        mean_labels = (csum_l[starts + window_size] -
                       csum_l[starts]) / window_size
        return mean_scores, mean_labels

    def test_by_window_means(self, dataset, window_size: int
                             ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-window mean scores + labels, all windows in one program.

        Batched equivalent of iterating test_by_window and averaging
        each yielded window (the reference's per-window Python loop,
        its evaluation hot loop #5). Requires an in-order (unshuffled)
        dataset.
        """
        scores, labels = self.frame_scores(dataset)
        return self.window_means(scores, labels, window_size)

    def check_model_and_data(self, actual_dataset):
        """Validates dataset widths against the loaded model metadata."""
        if not self.model_inputs or not self.model_output:
            raise ValueError('Model has not been initialized yet. Use '
                             'load_model first')
        for actual_input_dict, actual_output in actual_dataset:
            for key, spec in self.model_inputs.items():
                if key not in actual_input_dict:
                    raise TypeError('Can\'t find needed key %s in '
                                    'input_data (%s)' %
                                    (key, list(actual_input_dict.keys())))
                if actual_input_dict[key].shape[1] != spec[1]:
                    raise TypeError('Data for %s has the wrong shape, '
                                    'expected %s, got %s' %
                                    (key, spec,
                                     actual_input_dict[key].shape))
            if actual_output.shape[1] != self.model_output[1]:
                raise TypeError('Output data has the wrong shape, expected '
                                '%s, got %s' % (self.model_output,
                                                actual_output.shape))
            break


class LinearRegressionDecoder(Decoder):
    """Decoder pairing ground truth with regression predictions."""

    def decode_one(self, input_dict, ground_truth):
        inputs = {k: np.asarray(v) for k, v in input_dict.items()
                  if k in ('input_1', 'input_2')}
        predictions = self._decoding_model(inputs)
        return np.asarray(ground_truth), np.asarray(predictions)

    def _decode_arrays(self, input_dict, ground_truth):
        return ground_truth, self._model_apply()(input_dict)


class CCADecoder(Decoder):
    """Decoder splitting CCA model output into its two rotated halves."""

    def decode_one(self, input_dict, ground_truth):
        del ground_truth
        inputs = {k: np.asarray(v) for k, v in input_dict.items()
                  if k in ('input_1', 'input_2')}
        predictions = np.asarray(self._decoding_model(inputs))
        half = predictions.shape[1] // 2
        return predictions[:, :half], predictions[:, half:]

    def _decode_arrays(self, input_dict, ground_truth):
        del ground_truth
        predictions = self._model_apply()(input_dict)
        half = predictions.shape[1] // 2
        return predictions[:, :half], predictions[:, half:]


def create_decoder(model_tag: str, reduction: str = 'lda',
                   model=None) -> Decoder:
    """Creates the right Decoder subclass for a model tag.

    The reference sniffs the model type from the directory name alone
    ("Hack alert", infer_decoder.py:635-666); that fails for arbitrary
    paths. Here, if the tag is a saved-model directory, the recorded
    model class in model.json decides (name sniffing remains the
    fallback for bare tags).
    """
    meta_path = os.path.join(model_tag, 'model.json')
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            model_class = json.load(f).get('model_class', '')
        if 'CCA' in model_class.upper():   # Covers CCA and DCCA.
            return CCADecoder(model, reduction=reduction)
        if model_class:
            return LinearRegressionDecoder(model, reduction=reduction)
    if os.path.isfile(os.path.join(model_tag, 'saved_model.pb')):
        # Reference SavedModel: sniff the checkpoint variable names.
        try:
            from telluride_decoding_tpu.io.tf_checkpoint import (
                read_tensor_bundle)
            tensors = read_tensor_bundle(
                os.path.join(model_tag, 'variables', 'variables'))
            if any('rot1' in k for k in tensors):
                return CCADecoder(model, reduction=reduction)
            if any('kernel' in k for k in tensors):
                return LinearRegressionDecoder(model, reduction=reduction)
        except Exception:
            pass
    tag = model_tag.lower()
    if 'linear' in tag or 'fullyconnected' in tag:
        return LinearRegressionDecoder(model, reduction=reduction)
    if 'cca' in tag:
        return CCADecoder(model, reduction=reduction)
    raise ValueError('Couldn\'t determine model type for tag %s.' %
                     model_tag)


def create_dataset(tfrecord_file: str, params: Dict[str, Any],
                   audio_label: str, frame_rate: int = 100,
                   mode: str = 'test', mixup_batch: bool = False):
    """Builds a two-speaker test dataset for one TFRecord file
    (reference infer_decoder.py:669-713)."""
    from telluride_decoding_tpu.data import brain_data
    tf_dir, tf_file = os.path.split(tfrecord_file)
    exp_brain_data = brain_data.TFExampleData(
        params['input_field'],
        audio_label,
        frame_rate,
        pre_context=params['pre_context'],
        post_context=params['post_context'],
        in2_fields=audio_label,
        in2_pre_context=params['input2_pre_context'],
        in2_post_context=params['input2_post_context'],
        attended_field='attended_speaker',
        final_batch_size=200,
        repeat_count=1,
        shuffle_buffer_size=0,
        data_dir=tf_dir,
        data_pattern=tf_file)
    return exp_brain_data.create_dataset(mode, mixup_batch=mixup_batch)
