"""Brain models: linear regression, DNN, classifier — pure-pytree JAX.

Capability parity with the reference model layer (brain_model.py:129-620)
re-designed TPU-first:

  * A model is a pytree of parameters plus a jitted ``apply`` function —
    no Keras graph. ``fit``/``evaluate`` consume whole device arrays,
    not per-minibatch host loops.
  * Deterministic models (linear regression) fit with one streamed
    covariance pass on the MXU + an on-device solve
    (reference brain_model.py:361-377 runs the same math through numpy
    one minibatch at a time).
  * SGD models (DNN, classifier) train with optax; the whole epoch is a
    ``lax.scan`` over PRNG-permuted minibatches, so training runs as one
    XLA program per epoch.
  * ``save``/``load`` write a directory with ``model.json`` (config +
    telluride metadata) and ``weights.npz`` — replacing the reference's
    SavedModel while keeping the embedded-metadata capability
    (brain_model.py:255-280: telluride_metadata/_inputs/_output).
"""

from __future__ import annotations

import datetime
import functools
import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from telluride_decoding_tpu.data.brain_data import BrainDataset
from telluride_decoding_tpu.ops import pearson
from telluride_decoding_tpu.solvers import ridge


def _dataset_arrays(dataset) -> Tuple[np.ndarray, np.ndarray,
                                      np.ndarray, np.ndarray]:
    """Extracts (in1, in2, out, attended) full arrays from a dataset.

    Accepts a BrainDataset (fast path: preassembled arrays) or any
    iterable of (input_dict, output) minibatches.
    """
    if isinstance(dataset, BrainDataset):
        if not dataset.has_batch_transforms:
            return dataset.all_arrays()
        # Transforms must run, but only over ONE epoch — __iter__
        # would concatenate repeat_count shuffled copies.
        dataset = dataset.iter_one_epoch()
    xs, x2s, ys, ats = [], [], [], []
    for inputs, y in dataset:
        xs.append(np.asarray(inputs['input_1']))
        x2s.append(np.asarray(inputs['input_2']))
        ats.append(np.asarray(inputs.get('attended_speaker',
                                         np.zeros((len(y), 1)))))
        ys.append(np.asarray(y))
    if not xs:
        raise ValueError('Dataset produced no batches.')
    return (np.concatenate(xs), np.concatenate(x2s),
            np.concatenate(ys), np.concatenate(ats))


def _flat_key(path) -> str:
    """weights.npz key for one pytree leaf path (the serialization
    scheme; save, restore, and summary must all agree on it)."""
    return '/'.join(str(getattr(p, 'key', getattr(p, 'idx', p)))
                    for p in path)


# Registry for load_model dispatch.
_MODEL_REGISTRY: Dict[str, type] = {}


def register_model(cls):
    _MODEL_REGISTRY[cls.__name__] = cls
    return cls


class BrainModel:
    """Base model: params pytree + apply fn + fit/evaluate/save.

    API parity with the reference BrainModel Keras shim
    (brain_model.py:129-301): dict-returning evaluate, metadata
    embedding, tensorboard scalar hooks (via utils.summaries).
    """

    loss_name = 'mse'
    metric_names: Sequence[str] = ('pearson_correlation_first',)

    def __init__(self, tensorboard_dir: Optional[str] = None):
        if tensorboard_dir:
            self._tensorboard_dir = os.path.join(
                tensorboard_dir,
                datetime.datetime.now().strftime('%Y%m%d-%H%M%S'))
        else:
            self._tensorboard_dir = None
        self.params: Any = None
        self.telluride_metadata: Optional[str] = None
        self.telluride_inputs: Optional[str] = None
        self.telluride_output: Optional[str] = None
        self._compiled = {}

    # -- to be provided by subclasses ---------------------------------------

    def apply(self, params, input_dict: Dict[str, jax.Array]) -> jax.Array:
        raise NotImplementedError

    def fit(self, dataset, epochs: int = 1, **kwargs) -> Dict[str, Any]:
        raise NotImplementedError

    def config(self) -> Dict[str, Any]:
        """JSON-serializable constructor config for save/load."""
        raise NotImplementedError

    # -- common API ----------------------------------------------------------

    @property
    def tensorboard_dir(self):
        return self._tensorboard_dir

    def compile(self, learning_rate: float = 1e-3, **kwargs):
        """Records training hyperparameters (kept for API parity)."""
        self._compiled = dict(learning_rate=learning_rate, **kwargs)

    def __call__(self, input_dict: Dict[str, Any]) -> np.ndarray:
        if self.params is None:
            raise ValueError('Model must be fit or loaded before calling.')
        inputs = {k: jnp.asarray(v) for k, v in input_dict.items()
                  if k in ('input_1', 'input_2')}
        return np.asarray(self._jitted_apply()(self.params, inputs))

    def _jitted_apply(self):
        if not hasattr(self, '_apply_jit'):
            self._apply_jit = jax.jit(self.apply)
        return self._apply_jit

    def predict(self, dataset) -> np.ndarray:
        in1, in2, _, _ = _dataset_arrays(dataset)
        return np.asarray(self._jitted_apply()(
            self.params, {'input_1': jnp.asarray(in1),
                          'input_2': jnp.asarray(in2)}))

    # -- metrics -------------------------------------------------------------

    def _metric(self, name: str, y_true: jax.Array,
                y_pred: jax.Array) -> jax.Array:
        if name == 'mse' or name == 'loss_mse':
            return jnp.mean(jnp.square(y_true - y_pred))
        if name == 'pearson_correlation_first':
            return pearson.pearson_correlation_first(y_true, y_pred)
        if name == 'pearson_correlation_second':
            return pearson.pearson_correlation_second(y_true, y_pred)
        if name == 'pearson_correlation':
            return jnp.mean(pearson.pearson_correlation(y_true, y_pred))
        if name == 'cca_pearson_correlation_first':
            half = y_pred.shape[-1] // 2
            return pearson.pearson_correlation_first(
                y_pred[:, :half], y_pred[:, half:])
        if name == 'cca_pearson_correlation_second':
            half = y_pred.shape[-1] // 2
            return pearson.pearson_correlation_second(
                y_pred[:, :half], y_pred[:, half:])
        if name == 'accuracy':
            return jnp.mean((y_pred > 0.5).astype(jnp.float32) == y_true)
        if name == 'binary_crossentropy':
            eps = 1e-7
            p = jnp.clip(y_pred, eps, 1 - eps)
            return -jnp.mean(y_true * jnp.log(p) +
                             (1 - y_true) * jnp.log(1 - p))
        raise ValueError('Unknown metric %s' % name)

    def evaluate(self, dataset, epoch_count: int = 1,
                 **kwargs) -> Dict[str, float]:
        """Evaluates loss + metrics over the whole dataset in one program.

        Returns a dict (the reference reformats Keras' list the same way,
        brain_model.py:206-253).
        """
        in1, in2, out, _ = _dataset_arrays(dataset)
        inputs = {'input_1': jnp.asarray(in1), 'input_2': jnp.asarray(in2)}
        y_true = jnp.asarray(out)

        # Reference evaluation protocol: Keras evaluate computes each
        # metric PER drop-remainder BATCH and reports the mean over
        # batches (reference brain_model.py:206-253 + tf_keras
        # MeanMetricWrapper semantics). A reference_protocol dataset
        # (data/brain_data.py) carries its batch size; n is already a
        # multiple of it. Default (None): one metric over the whole
        # split.
        ref_bs = getattr(dataset, 'reference_batch_size', None)
        n_batches = (in1.shape[0] // ref_bs
                     if ref_bs and in1.shape[0] >= ref_bs else 0)

        # One jitted program, cached on the instance: repeated
        # evaluations (jackknife loops) must not recompile per call.
        # Keyed on the compiled loss: with --loss=pearson the reported
        # 'loss' must be the pearson training objective (the reference
        # returns Keras' compiled loss), not the class default.
        loss_kind = (self._compiled.get('loss')
                     if hasattr(self, '_compiled') else None)
        if getattr(self, '_eval_jit_key', ()) != (loss_kind, n_batches,
                                                  ref_bs):
            def one_program(params, inputs, y_true):
                y_pred = self.apply(params, inputs)
                if loss_kind == 'pearson':
                    loss = jnp.sum(pearson.pearson_loss(y_true, y_pred))
                else:
                    loss = self._metric(self.loss_name, y_true, y_pred)
                results = {'loss': loss}
                for name in self.metric_names:
                    results[name] = self._metric(name, y_true, y_pred)
                return results
            if n_batches:
                def program(params, inputs, y_true):
                    def split(a):
                        return a.reshape(n_batches, ref_bs, *a.shape[1:])
                    per_batch = jax.vmap(
                        lambda i, y: one_program(params, i, y))(
                            {k: split(v) for k, v in inputs.items()},
                            split(y_true))
                    return {k: jnp.mean(v) for k, v in per_batch.items()}
            else:
                program = one_program
            self._eval_jit = jax.jit(program)
            self._eval_jit_key = (loss_kind, n_batches, ref_bs)
        results = self._eval_jit(self.params, inputs, y_true)
        metrics = {k: float(v) for k, v in results.items()}
        if self._tensorboard_dir:
            from telluride_decoding_tpu.utils import summaries
            writer = summaries.SummaryWriter(
                os.path.join(self._tensorboard_dir, 'results'))
            for name, val in metrics.items():
                writer.scalar(name, val, step=epoch_count)
        return metrics

    # -- metadata ------------------------------------------------------------

    def add_metadata(self, flags, dataset=None):
        """Stores experiment flags + I/O shapes with the model
        (reference brain_model.py:255-280)."""
        self.telluride_metadata = json.dumps(flags)
        if dataset is None:
            return
        if isinstance(dataset, BrainDataset):
            spec_in, spec_out = dataset.element_spec
            inputs = {'input_1': [None, spec_in['input_1'][0]],
                      'input_2': [None, spec_in['input_2'][0]],
                      'attended_speaker':
                          [None, spec_in['attended_speaker'][0]]}
            output = [None, spec_out[0]]
        else:
            inputs = output = None
            for input_dict, y in dataset:
                inputs = {k: [None, int(np.asarray(v).shape[-1])]
                          for k, v in input_dict.items()}
                output = [None, int(np.asarray(y).shape[-1])]
                break
            if inputs is None:
                raise ValueError('add_metadata dataset produced no '
                                 'batches; cannot infer I/O shapes.')
        self.telluride_inputs = json.dumps(inputs)
        self.telluride_output = json.dumps(output)

    def add_tensorboard_summary(self, name, data, subdir='train', step=0):
        if not isinstance(name, str):
            raise TypeError('Tensorboard name must be a string, not a %s.' %
                            type(name))
        if not isinstance(subdir, str):
            raise TypeError('Tensorboard subdir must be a string, not a %s.'
                            % type(subdir))
        if self._tensorboard_dir:
            from telluride_decoding_tpu.utils import summaries
            writer = summaries.SummaryWriter(
                os.path.join(self._tensorboard_dir, subdir))
            writer.text(name, str(data), step=step)

    def summary(self):
        lines = ['Model: %s' % type(self).__name__]
        total = 0
        if self.params is not None:
            for path, leaf in jax.tree_util.tree_leaves_with_path(
                    self.params):
                name = _flat_key(path)  # Same names as weights.npz.
                lines.append('  %s: %s' % (name, tuple(leaf.shape)))
                total += int(np.prod(leaf.shape))
        lines.append('Total params: %d' % total)
        text = '\n'.join(lines)
        print(text)
        return text

    # -- persistence ----------------------------------------------------------

    def save(self, model_dir: str):
        """Saves config + metadata (model.json) and weights (weights.npz)."""
        os.makedirs(model_dir, exist_ok=True)
        flat = {}
        if self.params is not None:
            leaves = jax.tree_util.tree_leaves_with_path(self.params)
            for path, leaf in leaves:
                flat[_flat_key(path)] = np.asarray(leaf)
        np.savez(os.path.join(model_dir, 'weights.npz'), **flat)
        meta = {
            'model_class': type(self).__name__,
            'config': self.config(),
            'telluride_metadata': self.telluride_metadata,
            'telluride_inputs': self.telluride_inputs,
            'telluride_output': self.telluride_output,
        }
        with open(os.path.join(model_dir, 'model.json'), 'w') as f:
            json.dump(meta, f, indent=2)

    def _restore_params(self, flat: Dict[str, np.ndarray]):
        """Rebuilds the params pytree from the flattened npz dict."""
        if not flat:
            self.params = None
            return
        template = self._params_template()
        leaves_with_path = jax.tree_util.tree_leaves_with_path(template)
        treedef = jax.tree_util.tree_structure(template)
        new_leaves = []
        for path, _ in leaves_with_path:
            key = _flat_key(path)
            if key not in flat and key.startswith('layers/'):
                # Pre-batchnorm DNN checkpoints stored the bare layer
                # list ('0/w') before params grew the 'layers' dict.
                legacy = key[len('layers/'):]
                if legacy in flat:
                    key = legacy
            if key not in flat:
                raise ValueError(
                    'Checkpoint is missing weight %r (has %s); was it '
                    'saved by an incompatible model config?' %
                    (key, sorted(flat)))
            new_leaves.append(jnp.asarray(flat[key]))
        self.params = jax.tree_util.tree_unflatten(treedef, new_leaves)

    def _params_template(self):
        raise NotImplementedError


def load_model(model_dir: str) -> BrainModel:
    """Loads any saved BrainModel subclass from a directory."""
    with open(os.path.join(model_dir, 'model.json')) as f:
        meta = json.load(f)
    cls = _MODEL_REGISTRY[meta['model_class']]
    model = cls._from_config(meta['config'])
    model.telluride_metadata = meta.get('telluride_metadata')
    model.telluride_inputs = meta.get('telluride_inputs')
    model.telluride_output = meta.get('telluride_output')
    with np.load(os.path.join(model_dir, 'weights.npz')) as npz:
        flat = {k: npz[k] for k in npz.files}
    model._restore_params(flat)
    return model


@register_model
class BrainModelLinearRegression(BrainModel):
    """Linear (ridge/shrinkage) regression with a deterministic fit.

    Parity with reference BrainModelLinearRegression
    (brain_model.py:306-381). ``fit`` streams moments on the MXU and
    solves on device; no SGD.
    """

    loss_name = 'mse'
    metric_names = ('pearson_correlation_first',)

    def __init__(self, input_dataset=None, regularization_lambda: float = 0.0,
                 tensorboard_dir: Optional[str] = None,
                 input_width: Optional[int] = None,
                 output_width: Optional[int] = None):
        super().__init__(tensorboard_dir)
        if input_dataset is not None:
            spec_in, spec_out = input_dataset.element_spec
            input_width = spec_in['input_1'][-1]
            output_width = spec_out[-1]
        self._input_width = input_width
        self._output_width = output_width
        self._regularization_lambda = regularization_lambda

    def config(self):
        return {'regularization_lambda': self._regularization_lambda,
                'input_width': self._input_width,
                'output_width': self._output_width}

    @classmethod
    def _from_config(cls, config):
        return cls(**config)

    def _params_template(self):
        return {'w': jnp.zeros((self._input_width, self._output_width)),
                'b': jnp.zeros((self._output_width,))}

    def apply(self, params, input_dict):
        return (jnp.dot(input_dict['input_1'], params['w'],
                        preferred_element_type=jnp.float32) + params['b'])

    def fit(self, dataset, epochs: int = 1, **kwargs) -> Dict[str, Any]:
        del epochs  # Deterministic: one pass.
        in1, _, out, _ = _dataset_arrays(dataset)
        solution = ridge.calculate_linear_regressor_parameters(
            in1, out, lamb=self._regularization_lambda)
        self._set_solution(solution)
        return {}

    def fit_streaming(self, brain_data, mode: str = 'train',
                      epochs: int = 1, **kwargs) -> Dict[str, Any]:
        """Bounded-memory fit: per-file streamed covariance (one raw
        file of host memory at a time; lag stacking on device), then
        the same deterministic solve. Value-identical to fit() on the
        concatenated arrays."""
        del epochs, kwargs  # Deterministic: one pass.
        stats = brain_data.streaming_moments(mode, y_source='output')
        solution = ridge.solve_ridge_from_moments(
            stats, lamb=self._regularization_lambda)
        self._set_solution(solution)
        return {}

    def _set_solution(self, solution):
        self.params = {'w': solution.w, 'b': solution.b}
        self.w_estimate = np.asarray(solution.w)
        self.b_estimate = np.asarray(solution.b)

    @property
    def weight_matrices(self) -> List[np.ndarray]:
        return [np.asarray(self.params['w']), np.asarray(self.params['b'])]


def _init_mlp(key, widths: Sequence[int]) -> List[Dict[str, jax.Array]]:
    """He-initialized dense stack parameters."""
    layers = []
    for i in range(len(widths) - 1):
        key, sub = jax.random.split(key)
        fan_in = widths[i]
        w = jax.random.normal(sub, (widths[i], widths[i + 1]),
                              jnp.float32) * jnp.sqrt(2.0 / fan_in)
        layers.append({'w': w, 'b': jnp.zeros((widths[i + 1],))})
    return layers


def _apply_mlp(layers, x, final_activation=None):
    """Dense stack (ReLU hidden layers). Dropout lives in
    BrainModelDNN._forward, the only model that trains with it."""
    for i, layer in enumerate(layers):
        x = jnp.dot(x, layer['w'], preferred_element_type=jnp.float32)
        x = x + layer['b']
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
        elif final_activation is not None:
            x = final_activation(x)
    return x


def _mesh_batch_setup(mesh, batch_size: int, n: Optional[int] = None):
    """Shared data-parallel fit setup: returns (mesh, batch_sharding,
    replicated_sharding, batch_size).

    A size-1 (or None) mesh degrades to the single-device path. The
    batch size rounds up to a mesh-size multiple (warned — the stream
    then changes exactly like any batch-size change), and a corpus of
    ``n`` frames (when known up front) smaller than one per-device
    slice fails with a clear error instead of an opaque reshape deep
    inside the jitted program (streaming fits pass n=None and trim
    their final short batch instead)."""
    if mesh is None or mesh.size <= 1:
        return None, None, None, batch_size
    if n is not None and n < mesh.size:
        raise ValueError(
            'Corpus of %d frames is smaller than one per-device '
            'slice on a %d-device mesh; fit without a mesh.'
            % (n, mesh.size))
    if batch_size % mesh.size:
        rounded = batch_size + mesh.size - batch_size % mesh.size
        import warnings
        warnings.warn(
            'dp fit: batch_size %d is not a multiple of the %d-'
            'device mesh; using %d.'
            % (batch_size, mesh.size, rounded))
        batch_size = rounded
    from jax.sharding import NamedSharding, PartitionSpec
    batch_sharding = NamedSharding(
        mesh, PartitionSpec(tuple(mesh.axis_names)))
    replicated = NamedSharding(mesh, PartitionSpec())
    return mesh, batch_sharding, replicated, batch_size


class _SgdModel(BrainModel):
    """Shared optax training loop: one lax.scan per epoch over shuffled
    minibatches (the whole epoch compiles to a single XLA program)."""

    def _loss_fn(self, params, inputs, y_true, rng=None):
        raise NotImplementedError

    def fit(self, dataset, epochs: int = 1, batch_size: int = 512,
            seed: int = 0, _keep_arrays: bool = False,
            mesh=None, **kwargs) -> Dict[str, Any]:
        """Whole-epoch lax.scan SGD fit.

        ``mesh`` (a jax.sharding.Mesh, optional) runs the SAME batch
        stream data-parallel: every minibatch's rows shard over the
        mesh (all axes), gradients reduce via the psum GSPMD inserts
        for the replicated parameters, and the global batch statistics
        (loss means, batch-norm moments) reduce over the sharded axis
        — so with a mesh-multiple batch_size the numbers match the
        single-device fit to float tolerance (same permutations, same
        batch composition; only the reduction order differs); an
        off-multiple batch_size rounds up with a warning, changing
        the stream like any batch-size change. A TPU-native extension:
        the reference's Keras fit (brain_model.py:206-253) is
        single-process. Training inputs are replicated (DP shards
        compute, not storage — for bounded memory use fit_streaming);
        batch_size rounds up to a mesh-size multiple."""
        in1, in2, out, _ = _dataset_arrays(dataset)
        n = in1.shape[0]
        if n == 0:
            raise ValueError('Dataset produced no batches.')
        # Documented boundary: the whole-epoch lax.scan fit
        # materializes the lag-stacked corpus on device. Above the
        # streaming threshold, point at fit_streaming (bounded memory:
        # one file on the host, one minibatch on device) instead of
        # failing opaquely in the allocator.
        total_bytes = in1.nbytes + in2.nbytes + out.nbytes
        try:
            # float() first so '1e9'-style values parse; same contract
            # as cli/decoding.py (0 disables the threshold).
            warn_bytes = int(float(os.environ.get(
                'TDT_STREAMING_AUTO_BYTES', 1 << 30)))
        except ValueError:
            warn_bytes = 1 << 30
        if warn_bytes > 0 and total_bytes > warn_bytes:
            import warnings
            # Adaptive unit: tests lower TDT_STREAMING_AUTO_BYTES far
            # below 1 GB, and a '0.0 GB' warning reads as a bug.
            if total_bytes >= 1 << 30:
                size = '%.1f GB' % (total_bytes / 2**30)
            else:
                size = '%.1f MB' % (total_bytes / 2**20)
            warnings.warn(
                'SGD fit materializes %s of (lag-stacked) '
                'training data on device; consider fit_streaming '
                '(--streaming_fit), which holds one file on the host '
                'and one minibatch on device instead.' % size)
        batch_size = min(batch_size, n)
        mesh, batch_sharding, replicated, batch_size = \
            _mesh_batch_setup(mesh, batch_size, n)
        # Ceil, not floor: the reference's Keras fit trains on the
        # partial last batch too; flooring silently dropped up to
        # batch_size-1 frames per epoch (49% of a 1000-frame corpus at
        # the default 512). The shortfall wraps to the permutation's
        # head, so a handful of frames get a second gradient instead
        # of many getting none.
        num_batches = max(-(-n // batch_size), 1)
        lr = self._compiled.get('learning_rate', 1e-3)
        opt = optax.adam(lr)
        if self.params is None:
            self.params = self._init_params(jax.random.PRNGKey(seed))
        opt_state = opt.init(self.params)
        x1 = jnp.asarray(in1)
        x2 = jnp.asarray(in2)
        y = jnp.asarray(out)
        if batch_sharding is not None:
            # Rows of each minibatch shard over EVERY mesh axis;
            # params/opt_state/inputs replicate. The gather from the
            # replicated corpus lands directly in the sharded layout.
            x1, x2, y, self.params, opt_state = jax.device_put(
                (x1, x2, y, self.params, opt_state), replicated)

        def train_program(carry, keys, x1, x2, y):
            def epoch_step(carry, key):
                params, opt_state = carry
                perm_key, drop_key = jax.random.split(key)
                perm = jax.random.permutation(perm_key, n)
                pad = num_batches * batch_size - n
                if pad:
                    perm = jnp.concatenate([perm, perm[:pad]])
                perm = perm.reshape(num_batches, batch_size)
                drop_keys = jax.random.split(drop_key, num_batches)

                def batch_step(carry, batch):
                    idx, bkey = batch
                    params, opt_state = carry
                    if batch_sharding is not None:
                        # Sharding the INDICES shards the gathered
                        # rows (and everything downstream: activations
                        # per-device, gradient contractions psum'd
                        # into the replicated params by GSPMD).
                        idx = jax.lax.with_sharding_constraint(
                            idx, batch_sharding)
                    bi = {'input_1': x1[idx], 'input_2': x2[idx]}
                    loss, grads = jax.value_and_grad(self._loss_fn)(
                        params, bi, y[idx], bkey)
                    updates, opt_state = opt.update(grads, opt_state,
                                                    params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), loss

                (params, opt_state), losses = jax.lax.scan(
                    batch_step, (params, opt_state), (perm, drop_keys))
                return (params, opt_state), jnp.mean(losses)

            return jax.lax.scan(epoch_step, carry, keys)

        # Cache the compiled trainer per static configuration so a
        # refit of the same instance/shapes does not recompile the
        # whole multi-epoch program (remote compiles are seconds).
        cache_key = ('trainer', n, batch_size, num_batches, lr,
                     x1.shape, x2.shape, y.shape,
                     self._compiled.get('loss'),
                     None if mesh is None else
                     (mesh.axis_names, mesh.devices.shape,
                      tuple(d.id for d in mesh.devices.flat)))
        trainer = self._compiled.get(cache_key)
        if trainer is None:
            trainer = jax.jit(train_program)
            self._compiled[cache_key] = trainer
        keys = jax.random.split(jax.random.PRNGKey(seed + 1), epochs)
        (self.params, _), losses = trainer(
            (self.params, opt_state), keys, x1, x2, y)
        if _keep_arrays:
            # Subclasses reuse the assembled arrays (e.g. the
            # batchnorm population-stats pass, DCCA's final CCA solve)
            # instead of re-materializing — and, for transform
            # datasets, instead of drawing a DIFFERENT random
            # realization than the one trained on. The consumer clears
            # the attribute. Pinned only AFTER the trainer returns:
            # pinning before it would leak the whole assembled corpus
            # on the instance if training raises (device OOM,
            # KeyboardInterrupt), exactly when memory is scarcest.
            self._fit_arrays = (in1, in2, out)
        history = {'loss': [float(l) for l in np.asarray(losses)]}
        return history

    def _streaming_step(self, opt, lr):
        """Jitted single-batch SGD update, cached per (lr, loss) so a
        whole streaming fit compiles exactly one step program (plus at
        most one short-remainder shape). Buffers are donated: the
        previous step's params/opt_state memory is reused in place."""
        key = ('stream_step', lr, self._compiled.get('loss'))
        fn = self._compiled.get(key)
        if fn is None:
            def step(params, opt_state, x1, x2, y, rng):
                loss, grads = jax.value_and_grad(self._loss_fn)(
                    params, {'input_1': x1, 'input_2': x2}, y, rng)
                updates, opt_state = opt.update(grads, opt_state,
                                                params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss
            fn = jax.jit(step, donate_argnums=(0, 1))
            self._compiled[key] = fn
        return fn

    def fit_streaming(self, brain_data, mode: str = 'train',
                      epochs: int = 1, batch_size: int = 512,
                      seed: int = 0, mesh=None, **kwargs
                      ) -> Dict[str, Any]:
        """Bounded-memory SGD fit: per-file streaming through a jitted
        single-batch update.

        ``mesh`` (a jax.sharding.Mesh, optional) shards each
        minibatch's rows over the mesh, exactly like fit(): the
        parameters stay replicated and GSPMD all-reduces the
        gradients — bounded memory AND data-parallel compute.
        batch_size rounds up to a mesh-size multiple (warned); a
        final corpus-smaller-than-one-batch remainder trims down to
        one (so every device keeps an equal slice).

        fit() compiles each epoch into one lax.scan program but must
        hold the whole lag-stacked corpus resident in HBM; this path
        holds ONE file's context-stacked arrays on the host and ONE
        minibatch on device — the streaming counterpart of the
        reference's Keras fit over a tf.data file-interleave stream
        (reference brain_data.py:725-760), which is equally bounded.

        Shuffling is file order + a within-file permutation per epoch
        (the streaming analogue of the reference's bounded
        shuffle_buffer — neither is a global permutation). Leftover
        rows carry across file boundaries so every batch is full; the
        epoch's final partial batch is dropped (reference
        drop_remainder parity). A corpus smaller than one batch
        trains as a single short batch rather than silently fitting
        nothing.
        """
        del kwargs
        if self.params is None:
            self.params = self._init_params(jax.random.PRNGKey(seed))
        lr = self._compiled.get('learning_rate', 1e-3)
        opt = optax.adam(lr)
        opt_state = opt.init(self.params)
        mesh, batch_sharding, replicated, batch_size = \
            _mesh_batch_setup(mesh, batch_size)
        if batch_sharding is not None:
            self.params, opt_state = jax.device_put(
                (self.params, opt_state), replicated)
        step = self._streaming_step(opt, lr)

        def to_device(part):
            if batch_sharding is None:
                return jnp.asarray(part)
            return jax.device_put(np.ascontiguousarray(part),
                                  batch_sharding)
        base_key = jax.random.PRNGKey(seed + 1)
        rng = np.random.RandomState(seed)
        params = self.params
        history = []
        batch_counter = 0
        for _ in range(epochs):
            order = list(brain_data.filter_file_names(mode))
            if not order:
                raise ValueError('No files to process in mode %s.'
                                 % mode)
            rng.shuffle(order)
            carry = None
            losses = []
            for _, (in1, in2, out, _) in brain_data.iter_file_arrays(
                    mode, filenames=order):
                perm = rng.permutation(in1.shape[0])
                parts = (in1[perm], in2[perm], out[perm])
                if carry is not None:
                    parts = tuple(np.concatenate([c, p])
                                  for c, p in zip(carry, parts))
                n = parts[0].shape[0]
                usable = (n // batch_size) * batch_size
                for start in range(0, usable, batch_size):
                    sl = slice(start, start + batch_size)
                    key = jax.random.fold_in(base_key, batch_counter)
                    batch_counter += 1
                    params, opt_state, loss = step(
                        params, opt_state,
                        to_device(parts[0][sl]),
                        to_device(parts[1][sl]),
                        to_device(parts[2][sl]), key)
                    # Track live buffers every step: the donated step
                    # just invalidated the previous params, so a
                    # mid-fit exception (e.g. an unreadable later
                    # file) must not leave self.params pointing at
                    # deleted arrays.
                    self.params = params
                    losses.append(loss)
                carry = (tuple(p[usable:] for p in parts)
                         if usable < n else None)
            if not losses:
                if carry is None or carry[0].shape[0] == 0:
                    raise ValueError('Dataset produced no batches.')
                short = carry
                if batch_sharding is not None:
                    rows = (short[0].shape[0] // mesh.size) * mesh.size
                    if rows == 0:
                        raise ValueError(
                            'Corpus of %d frames is smaller than one '
                            'per-device slice on a %d-device mesh; '
                            'fit without a mesh.'
                            % (short[0].shape[0], mesh.size))
                    short = tuple(p[:rows] for p in short)
                key = jax.random.fold_in(base_key, batch_counter)
                batch_counter += 1
                params, opt_state, loss = step(
                    params, opt_state, to_device(short[0]),
                    to_device(short[1]), to_device(short[2]), key)
                self.params = params
                losses.append(loss)
            history.append(float(np.mean(np.asarray(
                [jax.device_get(l) for l in losses]))))
        self.params = params
        return {'loss': history}


@register_model
class BrainModelDNN(_SgdModel):
    """MLP regressor (reference BrainModelDNN, brain_model.py:486-549)."""

    loss_name = 'mse'
    metric_names = ('pearson_correlation_first', 'mse')

    def __init__(self, input_dataset=None, num_hidden_list=None,
                 tensorboard_dir=None, input_width=None, output_width=None,
                 dropout: float = 0.0, batch_norm: bool = False):
        super().__init__(tensorboard_dir)
        if num_hidden_list is None:
            num_hidden_list = []
        if not isinstance(num_hidden_list, list):
            raise TypeError('Num_hidden_list must be an list, not a %s.' %
                            type(num_hidden_list))
        if input_dataset is not None:
            spec_in, spec_out = input_dataset.element_spec
            input_width = spec_in['input_1'][-1]
            output_width = spec_out[-1]
        self._input_width = input_width
        self._output_width = output_width
        self.num_hidden_list = num_hidden_list
        # Training-time dropout on hidden layers (the reference defines
        # the --dropout flag but never consumes it; here it works).
        if not 0.0 <= dropout < 1.0:
            raise ValueError('dropout must be in [0, 1), not %g.' %
                             dropout)
        self._dropout = float(dropout)
        # Batch normalization on hidden layers (the other flag the
        # reference defines but never consumes): batch statistics in
        # training; population statistics, computed in one pass over
        # the training set after fit, at inference.
        self._batch_norm = bool(batch_norm)

    def config(self):
        return {'num_hidden_list': self.num_hidden_list,
                'input_width': self._input_width,
                'output_width': self._output_width,
                'dropout': self._dropout,
                'batch_norm': self._batch_norm}

    @classmethod
    def _from_config(cls, config):
        return cls(**config)

    def _widths(self):
        return ([self._input_width] + list(self.num_hidden_list) +
                [self._output_width])

    def _init_params(self, key):
        params = {'layers': _init_mlp(key, self._widths())}
        if self._batch_norm:
            params['bn'] = [
                {'gamma': jnp.ones((h,)), 'beta': jnp.zeros((h,)),
                 'mean': jnp.zeros((h,)), 'var': jnp.ones((h,))}
                for h in self.num_hidden_list]
        return params

    def _params_template(self):
        widths = self._widths()
        template = {'layers': [
            {'w': jnp.zeros((widths[i], widths[i + 1])),
             'b': jnp.zeros((widths[i + 1],))}
            for i in range(len(widths) - 1)]}
        if self._batch_norm:
            template['bn'] = [
                {'gamma': jnp.zeros((h,)), 'beta': jnp.zeros((h,)),
                 'mean': jnp.zeros((h,)), 'var': jnp.zeros((h,))}
                for h in self.num_hidden_list]
        return template

    def _forward(self, params, x, training: bool, rng=None,
                 collect_stats: bool = False):
        """MLP with optional per-hidden-layer batchnorm + dropout."""
        layers = params['layers']
        bn = params.get('bn')
        stats = []
        for i, layer in enumerate(layers):
            x = jnp.dot(x, layer['w'],
                        preferred_element_type=jnp.float32) + layer['b']
            if i < len(layers) - 1:
                if bn is not None:
                    if training:
                        mean = jnp.mean(x, axis=0)
                        var = jnp.var(x, axis=0)
                    else:
                        mean = bn[i]['mean']
                        var = bn[i]['var']
                    if collect_stats:
                        stats.append((jnp.mean(x, axis=0),
                                      jnp.var(x, axis=0)))
                    x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
                    x = x * bn[i]['gamma'] + bn[i]['beta']
                x = jax.nn.relu(x)
                if self._dropout > 0.0 and rng is not None:
                    rng, sub = jax.random.split(rng)
                    keep = jax.random.bernoulli(
                        sub, 1.0 - self._dropout, x.shape)
                    x = jnp.where(keep, x / (1.0 - self._dropout), 0.0)
        return (x, stats) if collect_stats else x

    def apply(self, params, input_dict):
        # Pre-batchnorm checkpoints are remapped into the 'layers' dict
        # at restore time (_restore_params), so params is always a dict
        # here.
        return self._forward(params, input_dict['input_1'],
                             training=False)

    def _loss_fn(self, params, inputs, y_true, rng=None):
        y_pred = self._forward(params, inputs['input_1'], training=True,
                               rng=rng)
        if self._compiled.get('loss') == 'pearson':
            return jnp.sum(pearson.pearson_loss(y_true, y_pred))
        return jnp.mean(jnp.square(y_pred - y_true))

    def fit(self, dataset, epochs: int = 1, batch_size: int = 512,
            seed: int = 0, **kwargs):
        history = super().fit(dataset, epochs=epochs,
                              batch_size=batch_size, seed=seed,
                              _keep_arrays=self._batch_norm, **kwargs)
        if self._batch_norm:
            # Population statistics for inference: one pass over the
            # SAME assembled training arrays (no second
            # materialization, and for transform datasets no second
            # random realization). try/finally: a raise anywhere in
            # the pass must not leave the full training corpus pinned
            # on the instance.
            try:
                in1, _, _ = self._fit_arrays
                if not hasattr(self, '_popstats_jit'):
                    # Cached like the trainer: a refit loop must not
                    # recompile the population pass every iteration.
                    self._popstats_jit = jax.jit(
                        lambda params, x: self._forward(
                            params, x, training=True,
                            collect_stats=True)[1])
                stats = self._popstats_jit(self.params,
                                           jnp.asarray(in1))
            finally:
                self._fit_arrays = None
            bn = [dict(entry, mean=mean, var=var)
                  for entry, (mean, var) in zip(self.params['bn'], stats)]
            self.params = dict(self.params, bn=bn)
        return history

    def fit_streaming(self, brain_data, mode: str = 'train', **kwargs):
        history = super().fit_streaming(brain_data, mode, **kwargs)
        if self._batch_norm:
            self._set_population_stats_streaming(brain_data, mode)
        return history

    def _preact(self, params, x, upto: int):
        """Pre-normalization activation of hidden layer ``upto``, with
        layers < upto normalized by their (already final) population
        stats — exactly what the dense collect_stats pass computes,
        where the full-split batch statistics ARE the population
        statistics."""
        layers = params['layers']
        bn = params['bn']
        for i in range(upto + 1):
            x = jnp.dot(x, layers[i]['w'],
                        preferred_element_type=jnp.float32) + layers[i]['b']
            if i == upto:
                return x
            x = (x - bn[i]['mean']) * jax.lax.rsqrt(bn[i]['var'] + 1e-5)
            x = x * bn[i]['gamma'] + bn[i]['beta']
            x = jax.nn.relu(x)
        return x

    def _set_population_stats_streaming(self, brain_data, mode: str,
                                        frame_bucket: int = 4096):
        """Population batchnorm statistics with bounded memory.

        Layer k's pre-normalization activations depend on layers < k
        being normalized with their FINAL population stats, so the
        layers resolve in order: one streamed pass per hidden layer
        (files pad to frame_bucket multiples with a validity mask so
        similar lengths share one compilation). Value-identical to the
        dense single-pass collect up to float summation order."""
        if not hasattr(self, '_preact_sums_jit'):
            @functools.partial(jax.jit, static_argnames=('upto',))
            def _preact_sums(params, x, valid, upto):
                a = self._preact(params, x, upto)
                m = valid[:, None]
                return (jnp.sum(a * m, axis=0),
                        jnp.sum(a * a * m, axis=0), jnp.sum(valid))
            self._preact_sums_jit = _preact_sums
        params = self.params
        for k in range(len(self.num_hidden_list)):
            acc_s = acc_ss = None
            count = 0.0
            for _, (in1, _, _, _) in brain_data.iter_file_arrays(mode):
                from telluride_decoding_tpu.ops.covariance import (
                    pad_to_bucket)
                (xp,), valid = pad_to_bucket([in1], in1.shape[0],
                                             frame_bucket)
                s, ss, c = self._preact_sums_jit(
                    params, jnp.asarray(xp), jnp.asarray(valid), k)
                acc_s = s if acc_s is None else acc_s + s
                acc_ss = ss if acc_ss is None else acc_ss + ss
                count += float(c)
            mean = acc_s / count
            var = jnp.maximum(acc_ss / count - mean * mean, 0.0)
            bn = list(params['bn'])
            bn[k] = dict(bn[k], mean=mean, var=var)
            params = dict(params, bn=bn)
        self.params = params


@register_model
class BrainModelClassifier(_SgdModel):
    """Match-mismatch classifier on concat(input_1, input_2)
    (reference BrainModelClassifier, brain_model.py:554-620)."""

    loss_name = 'binary_crossentropy'
    metric_names = ('accuracy',)

    def __init__(self, input_dataset=None, num_hidden_list=None,
                 tensorboard_dir=None, input_width=None, input2_width=None,
                 output_width=None):
        super().__init__(tensorboard_dir)
        if num_hidden_list is None:
            num_hidden_list = []
        if isinstance(num_hidden_list, str):
            num_hidden_list = ([int(x) for x in num_hidden_list.split('-')]
                               if num_hidden_list else [])
        if input_dataset is not None:
            spec_in, spec_out = input_dataset.element_spec
            input_width = spec_in['input_1'][-1]
            input2_width = spec_in['input_2'][-1]
            output_width = spec_out[-1]
        self._input_width = input_width
        self._input2_width = input2_width
        self._output_width = output_width
        self.num_hidden_list = num_hidden_list

    def config(self):
        return {'num_hidden_list': self.num_hidden_list,
                'input_width': self._input_width,
                'input2_width': self._input2_width,
                'output_width': self._output_width}

    @classmethod
    def _from_config(cls, config):
        return cls(**config)

    def _widths(self):
        return ([self._input_width + self._input2_width] +
                list(self.num_hidden_list) + [self._output_width])

    def _init_params(self, key):
        return _init_mlp(key, self._widths())

    def _params_template(self):
        widths = self._widths()
        return [{'w': jnp.zeros((widths[i], widths[i + 1])),
                 'b': jnp.zeros((widths[i + 1],))}
                for i in range(len(widths) - 1)]

    def apply(self, params, input_dict):
        x = jnp.concatenate([input_dict['input_1'], input_dict['input_2']],
                            axis=1)
        return _apply_mlp(x=x, layers=params,
                          final_activation=jax.nn.sigmoid)

    def _loss_fn(self, params, inputs, y_true, rng=None):
        del rng
        y_pred = self.apply(params, inputs)
        # Same implementation as the reported metric, by construction.
        return self._metric('binary_crossentropy', y_true, y_pred)
