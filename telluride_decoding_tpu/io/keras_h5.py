"""Export trained models as Keras-loadable HDF5 files — WITHOUT TensorFlow.

The reference persists models with ``model.save(saved_model_dir)`` and
loads them back through ``tf.keras.models.load_model``
(reference decoding.py:571-576, infer_decoder.py:250-286). That loader
accepts two containers: a SavedModel directory and a Keras HDF5 file.
This module writes the HDF5 container by hand (h5py + JSON — no TF
anywhere), so models trained HERE round-trip into the reference's
world with one stock call and ZERO custom objects:

    tf.keras.models.load_model('exported.h5')        # legacy tf_keras

Every exported graph uses only stock layers, by construction:

  * linear:      input_1 -> Dense(out)                      (exact)
  * CCA:         Dense(rot1, bias=-mean1 @ rot1)(input_1) ++
                 Dense(rot2, bias=-mean2 @ rot2)(input_2)   (exact:
                 (x - mean) @ rot == x @ rot - mean @ rot)
  * DNN:         Dense/relu stack (+ BatchNormalization with the
                 population statistics and this framework's 1e-5
                 epsilon)                                    (exact at
                 inference; dropout is a train-time-only transform)
  * classifier:  Concatenate(input_1, input_2) -> Dense stack
                 -> sigmoid                                  (exact)
  * DCCA:        per-input ReLU Dense towers -> the same CCA
                 Dense(rot) fold -> Concatenate               (exact)

The graphs take the reference serving feed ({'input_1', 'input_2'};
input_2 stays in the graph even where a family ignores it). Keras
warns-and-ignores extra dict keys on functional models, so the
reference's 3-key dataset feed (with attended_speaker) also works.

Why HDF5 and not saved_model.pb: a SavedModel additionally requires a
GraphDef of traced concrete functions plus a SavedObjectGraph whose
invariants TensorFlow's loader enforces — i.e. a working TF tracer.
Hand-emitting those protos without TF would mean reimplementing the
tracer's output format function by function; the HDF5 container is the
same one-call load for the user and is fully specified by layer
configs + weights. (Validated live against TF 2.21 + tf_keras legacy
loading in tests/test_reference_ab.py / tests/test_keras_export.py.)

The checkpoint side of a SavedModel IS writable without TF — see
io.tf_checkpoint.write_tensor_bundle — and export_saved_model_variables
emits a reference-compatible variables/ directory for users who want
to restore weights into an existing reference model object.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

# Version stamps: the format is what matters to the loader; these
# identify the writer. tf_keras accepts any 2.x keras_version.
_KERAS_VERSION = '2.15.0'
_BACKEND = 'tensorflow'


def _input_layer(name: str, width: int) -> Dict:
    return {'class_name': 'InputLayer',
            'config': {'batch_input_shape': [None, int(width)],
                       'dtype': 'float32', 'sparse': False,
                       'ragged': False, 'name': name,
                       'optional': False},
            'name': name, 'inbound_nodes': []}


def _dense_layer(name: str, units: int, activation: str,
                 inbound: str, use_bias: bool = True) -> Dict:
    return {'class_name': 'Dense',
            'config': {'name': name, 'trainable': True,
                       'dtype': 'float32', 'units': int(units),
                       'activation': activation, 'use_bias': use_bias,
                       'kernel_initializer': {
                           'module': 'keras.initializers',
                           'class_name': 'GlorotUniform',
                           'config': {'seed': None},
                           'registered_name': None},
                       'bias_initializer': {
                           'module': 'keras.initializers',
                           'class_name': 'Zeros', 'config': {},
                           'registered_name': None},
                       'kernel_regularizer': None,
                       'bias_regularizer': None,
                       'activity_regularizer': None,
                       'kernel_constraint': None,
                       'bias_constraint': None},
            'name': name,
            'inbound_nodes': [[[inbound, 0, 0, {}]]]}


def _batchnorm_layer(name: str, inbound: str,
                     epsilon: float = 1e-5) -> Dict:
    return {'class_name': 'BatchNormalization',
            'config': {'name': name, 'trainable': True,
                       'dtype': 'float32', 'axis': [1],
                       'momentum': 0.99, 'epsilon': epsilon,
                       'center': True, 'scale': True,
                       'beta_initializer': {
                           'module': 'keras.initializers',
                           'class_name': 'Zeros', 'config': {},
                           'registered_name': None},
                       'gamma_initializer': {
                           'module': 'keras.initializers',
                           'class_name': 'Ones', 'config': {},
                           'registered_name': None},
                       'moving_mean_initializer': {
                           'module': 'keras.initializers',
                           'class_name': 'Zeros', 'config': {},
                           'registered_name': None},
                       'moving_variance_initializer': {
                           'module': 'keras.initializers',
                           'class_name': 'Ones', 'config': {},
                           'registered_name': None},
                       'beta_regularizer': None,
                       'gamma_regularizer': None,
                       'beta_constraint': None,
                       'gamma_constraint': None},
            'name': name,
            'inbound_nodes': [[[inbound, 0, 0, {}]]]}


def _concat_layer(name: str, inbounds: Sequence[str]) -> Dict:
    return {'class_name': 'Concatenate',
            'config': {'name': name, 'trainable': True,
                       'dtype': 'float32', 'axis': -1},
            'name': name,
            'inbound_nodes': [[[n, 0, 0, {}] for n in inbounds]]}


class _GraphSpec:
    """A functional-model description: layer configs + weights."""

    def __init__(self, name: str):
        self.name = name
        self.layers: List[Dict] = []
        # layer name -> [(weight_name, array), ...]
        self.weights: Dict[str, List] = {}
        self.input_layers: List[str] = []
        self.output_layer: Optional[str] = None

    def add_input(self, name: str, width: int):
        self.layers.append(_input_layer(name, width))
        self.weights[name] = []
        self.input_layers.append(name)

    def add_layer(self, config: Dict, weights: Sequence = ()):
        self.layers.append(config)
        name = config['name']
        self.weights[name] = [
            ('%s/%s:0' % (name, wname), np.asarray(arr, np.float32))
            for wname, arr in weights]

    def model_config(self) -> Dict:
        return {'class_name': 'Functional',
                'config': {
                    'name': self.name, 'trainable': True,
                    'layers': self.layers,
                    'input_layers': [[n, 0, 0]
                                     for n in self.input_layers],
                    'output_layers': [[self.output_layer, 0, 0]]}}


def _spec_linear(model) -> _GraphSpec:
    w = np.asarray(model.params['w'], np.float32)
    b = np.asarray(model.params['b'], np.float32).reshape(-1)
    spec = _GraphSpec('model')
    spec.add_input('input_1', w.shape[0])
    spec.add_input('input_2', 1)
    spec.add_layer(_dense_layer('dense', w.shape[1], 'linear',
                                'input_1'),
                   [('kernel', w), ('bias', b)])
    spec.output_layer = 'dense'
    return spec


def _spec_cca(model) -> _GraphSpec:
    p = model.params
    rot1 = np.asarray(p['rot1'], np.float32)
    rot2 = np.asarray(p['rot2'], np.float32)
    mean1 = np.asarray(p['mean1'], np.float32).reshape(-1)
    mean2 = np.asarray(p['mean2'], np.float32).reshape(-1)
    spec = _GraphSpec('model')
    spec.add_input('input_1', rot1.shape[0])
    spec.add_input('input_2', rot2.shape[0])
    # (x - mean) @ rot == x @ rot + (-mean @ rot): stock Dense.
    spec.add_layer(_dense_layer('rot1', rot1.shape[1], 'linear',
                                'input_1'),
                   [('kernel', rot1), ('bias', -mean1 @ rot1)])
    spec.add_layer(_dense_layer('rot2', rot2.shape[1], 'linear',
                                'input_2'),
                   [('kernel', rot2), ('bias', -mean2 @ rot2)])
    spec.add_layer(_concat_layer('concatenate', ['rot1', 'rot2']))
    spec.output_layer = 'concatenate'
    return spec


def _spec_dcca(model) -> _GraphSpec:
    """DCCA inference is stock layers end to end: each tower is a
    ReLU Dense stack with a linear final Dense, and the post-hoc CCA
    ``(h - mean) @ rot`` folds into one more Dense exactly as in
    _spec_cca. Concatenate joins the canonical outputs."""
    p = model.params
    spec = _GraphSpec('model')
    spec.add_input('input_1',
                   np.asarray(p['tower1'][0]['w']).shape[0])
    spec.add_input('input_2',
                   np.asarray(p['tower2'][0]['w']).shape[0])

    def tower(layers, rot, mean, input_name, suffix):
        """Returns [(config, weights)] for one tower, ending in the
        folded CCA Dense."""
        out = []
        prev = input_name
        n = len(layers)
        for i, layer in enumerate(layers):
            w = np.asarray(layer['w'], np.float32)
            b = np.asarray(layer['b'], np.float32).reshape(-1)
            name = 'dense_t%s_%d' % (suffix, i)
            activation = 'linear' if i == n - 1 else 'relu'
            out.append((_dense_layer(name, w.shape[1], activation,
                                     prev),
                        [('kernel', w), ('bias', b)]))
            prev = name
        rot = np.asarray(rot, np.float32)
        mean = np.asarray(mean, np.float32).reshape(-1)
        out.append((_dense_layer('rot%s' % suffix, rot.shape[1],
                                 'linear', prev),
                    [('kernel', rot), ('bias', -mean @ rot)]))
        return out

    t1 = tower(p['tower1'], p['rot1'], p['mean1'], 'input_1', '1')
    t2 = tower(p['tower2'], p['rot2'], p['mean2'], 'input_2', '2')
    # Emit in Keras's topological (depth) order — the two towers
    # interleaved level by level (they always share the hidden-layer
    # structure). The legacy loader numbers layer_with_weights-<k> by
    # model.layers order, and the checkpoint keys must agree with it.
    for (c1, w1), (c2, w2) in zip(t1, t2):
        spec.add_layer(c1, w1)
        spec.add_layer(c2, w2)
    spec.add_layer(_concat_layer('concatenate', ['rot1', 'rot2']))
    spec.output_layer = 'concatenate'
    return spec


def _spec_dnn(model) -> _GraphSpec:
    layers = model.params['layers'] if isinstance(model.params, dict) \
        else model.params
    bn = model.params.get('bn') if isinstance(model.params, dict) \
        else None
    spec = _GraphSpec('model')
    in_width = np.asarray(layers[0]['w']).shape[0]
    spec.add_input('input_1', in_width)
    spec.add_input('input_2', 1)
    prev = 'input_1'
    n_layers = len(layers)
    for i, layer in enumerate(layers):
        w = np.asarray(layer['w'], np.float32)
        b = np.asarray(layer['b'], np.float32).reshape(-1)
        last = i == n_layers - 1
        if bn is not None and not last:
            # Framework order: dense -> batchnorm -> relu
            # (models/brain_model.py:594-610), so the Dense stays
            # linear and the relu gets its own Activation layer.
            name = 'dense_%d' % i
            spec.add_layer(_dense_layer(name, w.shape[1], 'linear',
                                        prev),
                           [('kernel', w), ('bias', b)])
            entry = bn[i]
            bn_name = 'batch_normalization_%d' % i
            spec.add_layer(
                _batchnorm_layer(bn_name, name),
                [('gamma', np.asarray(entry['gamma'], np.float32)),
                 ('beta', np.asarray(entry['beta'], np.float32)),
                 ('moving_mean', np.asarray(entry['mean'], np.float32)),
                 ('moving_variance',
                  np.asarray(entry['var'], np.float32))])
            act_name = 'activation_%d' % i
            spec.add_layer({'class_name': 'Activation',
                            'config': {'name': act_name,
                                       'trainable': True,
                                       'dtype': 'float32',
                                       'activation': 'relu'},
                            'name': act_name,
                            'inbound_nodes': [[[bn_name, 0, 0, {}]]]})
            prev = act_name
        else:
            name = 'dense_%d' % i
            activation = 'linear' if last else 'relu'
            spec.add_layer(_dense_layer(name, w.shape[1], activation,
                                        prev),
                           [('kernel', w), ('bias', b)])
            prev = name
    spec.output_layer = prev
    return spec


def _spec_classifier(model) -> _GraphSpec:
    layers = model.params
    spec = _GraphSpec('model')
    in_total = np.asarray(layers[0]['w']).shape[0]
    in2 = model._input2_width
    in1 = in_total - in2
    spec.add_input('input_1', in1)
    spec.add_input('input_2', in2)
    spec.add_layer(_concat_layer('concatenate',
                                 ['input_1', 'input_2']))
    prev = 'concatenate'
    n_layers = len(layers)
    for i, layer in enumerate(layers):
        w = np.asarray(layer['w'], np.float32)
        b = np.asarray(layer['b'], np.float32).reshape(-1)
        last = i == n_layers - 1
        name = 'dense_%d' % i
        activation = 'sigmoid' if last else 'relu'
        spec.add_layer(_dense_layer(name, w.shape[1], activation, prev),
                       [('kernel', w), ('bias', b)])
        prev = name
    spec.output_layer = prev
    return spec


def _build_spec(model) -> _GraphSpec:
    kind = type(model).__name__
    if kind == 'BrainModelLinearRegression':
        return _spec_linear(model)
    if kind == 'BrainModelCCA':
        return _spec_cca(model)
    if kind == 'BrainModelDCCA':
        return _spec_dcca(model)
    if kind == 'BrainModelDNN':
        return _spec_dnn(model)
    if kind == 'BrainModelClassifier':
        return _spec_classifier(model)
    raise ValueError('No Keras H5 export for model type %s.' % kind)


def export_keras_h5(model, path: str) -> None:
    """Writes ``model`` as a Keras HDF5 file loadable by
    ``tf.keras.models.load_model`` (legacy tf_keras) with no custom
    objects. Every persistable family exports (linear, CCA, DNN,
    classifier, DCCA)."""
    import h5py   # TF-free; a transitive dependency of the ecosystem.
    if model.params is None:
        raise ValueError('Model must be fit or loaded before export.')
    spec = _build_spec(model)
    with h5py.File(path, 'w') as f:
        f.attrs['keras_version'] = _KERAS_VERSION
        f.attrs['backend'] = _BACKEND
        f.attrs['model_config'] = json.dumps(spec.model_config())
        mw = f.create_group('model_weights')
        str_dt = h5py.string_dtype(encoding='utf-8')
        mw.attrs.create('layer_names',
                        [l['name'] for l in spec.layers] +
                        ['top_level_model_weights'], dtype=str_dt)
        mw.attrs['backend'] = _BACKEND
        mw.attrs['keras_version'] = _KERAS_VERSION
        for layer in spec.layers:
            name = layer['name']
            g = mw.create_group(name)
            weights = spec.weights.get(name, [])
            g.attrs.create('weight_names',
                           [wn for wn, _ in weights], dtype=str_dt)
            for wn, arr in weights:
                g.create_dataset(wn, data=arr)
        g = mw.create_group('top_level_model_weights')
        g.attrs.create('weight_names', [], dtype=str_dt)
    # HDF5 carries config + weights only; the reference's Decoder
    # additionally reads telluride_{metadata,inputs,output} variables
    # off the model object (reference infer_decoder.py:278-286). Ship
    # them as a sidecar so a reference-side user can reattach them —
    # and, by saving the reattached model, obtain a REAL SavedModel
    # with TF doing the tracing (README "Model artifact
    # compatibility"; validated live in tests/test_keras_export.py):
    #   model = tf.keras.models.load_model('exported.h5')
    #   side = json.load(open('exported.telluride.json'))
    #   for k, v in side.items():
    #       setattr(model, k, tf.Variable(v))
    #   model.save('saved_model_dir')
    # Written when ANY of the three is set (matching the SavedModel
    # exporter, which persists each variable independently): a model
    # with input/output shape strings but no flags JSON must still
    # round-trip them.
    if any(getattr(model, attr, None) for attr in
           ('telluride_metadata', 'telluride_inputs',
            'telluride_output')):
        sidecar = {
            'telluride_metadata': getattr(model, 'telluride_metadata',
                                          None) or '',
            'telluride_inputs': getattr(model, 'telluride_inputs',
                                        None) or '',
            'telluride_output': getattr(model, 'telluride_output',
                                        None) or '',
        }
        base = path[:-3] if path.endswith('.h5') else path
        with open(base + '.telluride.json', 'w') as f:
            json.dump(sidecar, f, indent=1)


def export_saved_model_variables(model, variables_dir: str) -> None:
    """Writes a reference-style ``variables/`` checkpoint directory
    (TensorBundle, the binary format inside every SavedModel) holding
    this model's weights under the names a freshly-built reference
    model checkpoints them as (positional ``variables/<n>``), plus the
    telluride metadata strings. A reference-side user restores with
    ``model.load_weights(dir + '/variables')`` on a built model of the
    same architecture."""
    import os
    from telluride_decoding_tpu.io.tf_checkpoint import (
        write_tensor_bundle)
    kind = type(model).__name__
    if kind == 'BrainModelLinearRegression':
        arrays = [np.asarray(model.params['w'], np.float32),
                  np.asarray(model.params['b'], np.float32)]
    elif kind == 'BrainModelCCA':
        p = model.params
        arrays = [np.asarray(p['mean1'], np.float32),
                  np.asarray(p['mean2'], np.float32),
                  np.asarray(p['rot1'], np.float32),
                  np.asarray(p['rot2'], np.float32)]
    else:
        raise ValueError(
            'Reference variables export covers the deterministic '
            'families (linear, CCA); %s has no fixed reference '
            'variable order.' % kind)
    tensors = {}
    for i, arr in enumerate(arrays):
        tensors['variables/%d/.ATTRIBUTES/VARIABLE_VALUE' % i] = arr
    for attr in ('telluride_metadata', 'telluride_inputs',
                 'telluride_output'):
        value = getattr(model, attr, None)
        if value:
            tensors['%s/.ATTRIBUTES/VARIABLE_VALUE' % attr] = (
                np.array(value.encode('utf-8'), dtype=object))
    os.makedirs(variables_dir, exist_ok=True)
    write_tensor_bundle(os.path.join(variables_dir, 'variables'),
                        tensors)
