"""Write-back validation: models trained HERE load in live TensorFlow.

Two independent interchange surfaces, both TF-free on the writer side:

  * io.keras_h5.export_keras_h5 — a Keras HDF5 file that
    ``tf.keras.models.load_model`` (legacy tf_keras) loads with ZERO
    custom objects; predictions must equal this framework's to 1e-5.
  * io.tf_checkpoint.write_tensor_bundle — a TensorFlow TensorBundle
    checkpoint (the binary format inside every SavedModel) that
    ``tf.train.load_checkpoint`` reads back bit-exactly, including
    DT_STRING metadata variables.

TF runs in a subprocess (tools/ab_reference's worker environment);
the whole module skips when no TF is available, and the TF-free
round-trip tests below the gate still run everywhere.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tools import ab_reference as ab  # noqa: E402

from telluride_decoding_tpu.io.keras_h5 import (  # noqa: E402
    export_keras_h5,
    export_saved_model_variables,
)
from telluride_decoding_tpu.io.saved_model_pb import (  # noqa: E402
    export_saved_model)
from telluride_decoding_tpu.io.tf_checkpoint import (  # noqa: E402
    read_tensor_bundle,
    write_tensor_bundle,
)
from telluride_decoding_tpu.models import (  # noqa: E402
    BrainModelCCA,
    BrainModelClassifier,
    BrainModelDNN,
    BrainModelLinearRegression,
)
from telluride_decoding_tpu.models.cca import (  # noqa: E402
    BrainModelDCCA)
from telluride_decoding_tpu.data.brain_data import (  # noqa: E402
    TestBrainData)


_TF_LOADER = r"""
import json, sys
import numpy as np
import tensorflow as tf

spec = json.load(open(sys.argv[1]))
probe = np.load(spec['probe'])
model = tf.keras.models.load_model(spec['h5'])
feed = {'input_1': probe['x1'], 'input_2': probe['x2'],
        'attended_speaker': probe['att']}
pred = model.predict(feed, verbose=0)
np.savez(spec['out'], pred=np.asarray(pred))
"""


def _tf_load_and_predict(tmp_path, h5_path, x1, x2):
    probe_path = str(tmp_path / 'probe_in.npz')
    out_path = str(tmp_path / 'probe_out.npz')
    np.savez(probe_path, x1=x1, x2=x2,
             att=np.zeros((x1.shape[0], 1), np.float32))
    spec_path = str(tmp_path / 'spec.json')
    with open(spec_path, 'w') as f:
        json.dump({'h5': str(h5_path), 'probe': probe_path,
                   'out': out_path}, f)
    script = str(tmp_path / 'loader.py')
    with open(script, 'w') as f:
        f.write(_TF_LOADER)
    proc = subprocess.run([sys.executable, script, spec_path],
                          env=ab._worker_env(), capture_output=True,
                          text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    return np.load(out_path)['pred']


def _dataset(rng, n=600, d1=12, d2=3, out=2):
    bd = TestBrainData('input_1', 'output', 100.0,
                       final_batch_size=128, repeat_count=1)
    x1 = rng.randn(n, d1).astype(np.float32)
    w = rng.randn(d1, out).astype(np.float32)
    y = x1 @ w + 0.1 * rng.randn(n, out).astype(np.float32)
    x2 = rng.randn(n, d2).astype(np.float32)
    bd.preserve_test_data(x1, y, input2_data=x2)
    bd.set_file_patterns('', '', '')
    return bd, x1, x2


@pytest.fixture
def rng():
    return np.random.RandomState(7)


# -- TF-free round trips (run everywhere) ----------------------------------


class TestBundleWriterRoundTrip:

    def test_floats_ints_bools_strings(self, rng, tmp_path):
        tensors = {
            'a/f32': rng.randn(5, 3).astype(np.float32),
            'b/f64': rng.randn(4).astype(np.float64),
            'c/i32': np.arange(6, dtype=np.int32).reshape(2, 3),
            'd/i64': np.arange(3, dtype=np.int64),
            'e/bool': np.array([True, False, True]),
            'f/str': np.array([b'hello', b'', b'world'], dtype=object),
            'g/scalar': np.float32(3.5).reshape(()),
        }
        prefix = str(tmp_path / 'variables')
        write_tensor_bundle(prefix, tensors)
        back = read_tensor_bundle(prefix)
        assert sorted(back) == sorted(tensors)
        for k, v in tensors.items():
            if v.dtype == object:
                assert list(back[k].reshape(-1)) == list(v.reshape(-1))
            else:
                np.testing.assert_array_equal(back[k], v)

    def test_exported_variables_reload_through_migrate_layout(
            self, rng, tmp_path):
        """export_saved_model_variables writes the positional layout
        the fresh-TF migrate reader understands — so our own writer
        and our own SavedModel reader agree on the wire."""
        bd, x1, x2 = _dataset(rng)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=0.01)
        model.fit(bd.create_dataset('train'))
        model.add_metadata({'kind': 'test'})
        vdir = str(tmp_path / 'variables')
        export_saved_model_variables(model, vdir)
        back = read_tensor_bundle(os.path.join(vdir, 'variables'))
        np.testing.assert_array_equal(
            back['variables/0/.ATTRIBUTES/VARIABLE_VALUE'],
            np.asarray(model.params['w']))
        meta = back['telluride_metadata/.ATTRIBUTES/VARIABLE_VALUE']
        assert json.loads(meta.reshape(-1)[0]) == {'kind': 'test'}


class TestH5Structure:

    def test_h5_layout_without_tf(self, rng, tmp_path):
        import h5py
        bd, x1, x2 = _dataset(rng)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=0.01)
        model.fit(bd.create_dataset('train'))
        path = str(tmp_path / 'm.h5')
        export_keras_h5(model, path)
        with h5py.File(path, 'r') as f:
            cfg = json.loads(f.attrs['model_config'])
            assert cfg['class_name'] == 'Functional'
            names = [l['name'] for l in cfg['config']['layers']]
            assert names == ['input_1', 'input_2', 'dense']
            kernel = f['model_weights/dense/dense/kernel:0'][()]
            np.testing.assert_array_equal(kernel,
                                          np.asarray(model.params['w']))

    def test_unfit_model_refuses(self):
        model = BrainModelLinearRegression(input_width=4, output_width=1)
        with pytest.raises(ValueError, match='fit or loaded'):
            export_keras_h5(model, '/tmp/never.h5')


class TestSavedModelStructure:
    """TF-free checks of the hand-written SavedModel DIRECTORY
    (io/saved_model_pb): container layout, checkpoint keys, and a
    round trip through this package's OWN readers."""

    def test_directory_layout_and_checkpoint_keys(self, rng, tmp_path):
        bd, x1, x2 = _dataset(rng)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=0.01)
        model.fit(bd.create_dataset('train'))
        model.add_metadata({'kind': 'sm'})
        out = str(tmp_path / 'sm')
        export_saved_model(model, out)
        for rel in ('saved_model.pb', 'keras_metadata.pb',
                    'variables/variables.index',
                    'variables/variables.data-00000-of-00001',
                    'assets'):
            assert os.path.exists(os.path.join(out, rel)), rel
        back = read_tensor_bundle(os.path.join(out, 'variables',
                                               'variables'))
        np.testing.assert_array_equal(
            back['layer_with_weights-0/kernel/.ATTRIBUTES/'
                 'VARIABLE_VALUE'],
            np.asarray(model.params['w']))
        # The reader deliberately skips the internal object-graph
        # entry; assert it is on the wire via the raw index.
        with open(os.path.join(out, 'variables', 'variables.index'),
                  'rb') as f:
            assert b'CHECKPOINTABLE_OBJECT_GRAPH' in f.read()
        meta = back['telluride_metadata/.ATTRIBUTES/VARIABLE_VALUE']
        assert json.loads(meta.reshape(-1)[0]) == {'kind': 'sm'}

    def test_linear_reads_back_through_own_migrate_reader(
            self, rng, tmp_path):
        from telluride_decoding_tpu.models.migrate import (
            load_reference_saved_model)
        bd, x1, x2 = _dataset(rng)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=0.01)
        model.fit(bd.create_dataset('train'))
        out = str(tmp_path / 'sm')
        export_saved_model(model, out)
        back = load_reference_saved_model(out)
        pred = back({'input_1': x1[:32], 'input_2': x2[:32, :1]})
        direct = model({'input_1': x1[:32], 'input_2': x2[:32, :1]})
        np.testing.assert_array_equal(np.asarray(pred),
                                      np.asarray(direct))

    def test_unfit_model_refuses(self):
        model = BrainModelLinearRegression(input_width=4, output_width=1)
        with pytest.raises(ValueError, match='fit or loaded'):
            export_saved_model(model, '/tmp/never_sm')


# -- Live TF validation (skips without TF) ---------------------------------


tf_required = pytest.mark.skipif(
    not ab.reference_available(),
    reason='live TF not available for load_model validation')


@tf_required
class TestLiveKerasLoad:

    def test_linear_h5_loads_and_predicts(self, rng, tmp_path):
        bd, x1, x2 = _dataset(rng)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=0.01)
        model.fit(bd.create_dataset('train'))
        path = tmp_path / 'linear.h5'
        export_keras_h5(model, str(path))
        tf_pred = _tf_load_and_predict(tmp_path, path, x1[:64], x2[:64])
        ours = model({'input_1': x1[:64], 'input_2': x2[:64]})
        assert np.abs(tf_pred - np.asarray(ours)).max() < 1e-5

    def test_cca_h5_loads_and_predicts(self, rng, tmp_path):
        bd, x1, x2 = _dataset(rng)
        model = BrainModelCCA(bd.create_dataset('train'), cca_dims=2,
                              regularization_lambda=0.1)
        model.fit(bd.create_dataset('train'))
        path = tmp_path / 'cca.h5'
        export_keras_h5(model, str(path))
        tf_pred = _tf_load_and_predict(tmp_path, path, x1[:64], x2[:64])
        ours = model({'input_1': x1[:64], 'input_2': x2[:64]})
        scale = max(np.abs(np.asarray(ours)).max(), 1e-6)
        assert np.abs(tf_pred - np.asarray(ours)).max() < 1e-5 * max(
            scale, 1.0)

    def test_dnn_h5_loads_and_predicts(self, rng, tmp_path):
        bd, x1, x2 = _dataset(rng)
        model = BrainModelDNN(bd.create_dataset('train'), [8, 8])
        model.compile(learning_rate=1e-3)
        model.fit(bd.create_dataset('train'), epochs=2)
        path = tmp_path / 'dnn.h5'
        export_keras_h5(model, str(path))
        tf_pred = _tf_load_and_predict(tmp_path, path, x1[:64], x2[:64])
        ours = model({'input_1': x1[:64], 'input_2': x2[:64]})
        assert np.abs(tf_pred - np.asarray(ours)).max() < 1e-5

    def test_dnn_batchnorm_h5_loads_and_predicts(self, rng, tmp_path):
        bd, x1, x2 = _dataset(rng)
        model = BrainModelDNN(bd.create_dataset('train'), [8],
                              batch_norm=True)
        model.compile(learning_rate=1e-3)
        model.fit(bd.create_dataset('train'), epochs=2)
        path = tmp_path / 'dnn_bn.h5'
        export_keras_h5(model, str(path))
        tf_pred = _tf_load_and_predict(tmp_path, path, x1[:64], x2[:64])
        ours = model({'input_1': x1[:64], 'input_2': x2[:64]})
        assert np.abs(tf_pred - np.asarray(ours)).max() < 1e-4

    def test_classifier_h5_loads_and_predicts(self, rng, tmp_path):
        bd, x1, x2 = _dataset(rng)
        model = BrainModelClassifier(bd.create_dataset('train'), [8])
        model.compile(learning_rate=1e-3)
        model.fit(bd.create_dataset('train'), epochs=2)
        path = tmp_path / 'clf.h5'
        export_keras_h5(model, str(path))
        tf_pred = _tf_load_and_predict(tmp_path, path, x1[:64], x2[:64])
        ours = model({'input_1': x1[:64], 'input_2': x2[:64]})
        assert np.abs(tf_pred - np.asarray(ours)).max() < 1e-5

    def test_dcca_h5_loads_and_predicts(self, rng, tmp_path):
        """DCCA exports too: the ReLU towers and the folded CCA
        rotation are all stock layers (io/keras_h5._spec_dcca)."""
        bd, x1, x2 = _dataset(rng)
        model = BrainModelDCCA(bd.create_dataset('train'), cca_dims=2,
                               hidden_units=[8, 5])
        model.compile(learning_rate=1e-3)
        model.fit(bd.create_dataset('train'), epochs=2)
        path = tmp_path / 'dcca.h5'
        export_keras_h5(model, str(path))
        tf_pred = _tf_load_and_predict(tmp_path, path, x1[:64], x2[:64])
        ours = model({'input_1': x1[:64], 'input_2': x2[:64]})
        assert np.abs(tf_pred - np.asarray(ours)).max() < 1e-5


_TF_DECODER_DIRECT = r"""
import json, sys
import numpy as np
import tensorflow as tf

sys.path.insert(0, %(ref_path)r)
from telluride_decoding import infer_decoder

spec = json.load(open(sys.argv[1]))
probe = np.load(spec['probe'])
dec = infer_decoder.create_decoder('linear', reduction='first')
dec.load_decoding_model(spec['saved_model_dir'], {})
model = dec._decoding_model
pred = model.predict({'input_1': probe['x1'], 'input_2': probe['x2']},
                     verbose=0)
np.savez(spec['out'], pred=np.asarray(pred),
         meta=np.frombuffer(model.telluride_metadata.numpy(),
                            dtype=np.uint8))
"""


@tf_required
class TestLiveSavedModelLoad:
    """The full SavedModel DIRECTORY written WITHOUT TensorFlow loads
    in live TF through the exact call the reference uses
    (tf.keras.models.load_model on the directory; reference
    infer_decoder.py:277, decoding.py:571-576)."""

    def _roundtrip(self, tmp_path, model, x1, x2, tol=1e-5):
        out = str(tmp_path / 'sm')
        export_saved_model(model, out)
        tf_pred = _tf_load_and_predict(tmp_path, out, x1[:64], x2[:64])
        ours = model({'input_1': x1[:64], 'input_2': x2[:64]})
        assert np.abs(tf_pred - np.asarray(ours)).max() < tol

    def test_linear(self, rng, tmp_path):
        bd, x1, x2 = _dataset(rng)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=0.01)
        model.fit(bd.create_dataset('train'))
        self._roundtrip(tmp_path, model, x1, x2)

    def test_cca(self, rng, tmp_path):
        bd, x1, x2 = _dataset(rng)
        model = BrainModelCCA(bd.create_dataset('train'), cca_dims=2,
                              regularization_lambda=0.1)
        model.fit(bd.create_dataset('train'))
        self._roundtrip(tmp_path, model, x1, x2)

    def test_dnn_batchnorm(self, rng, tmp_path):
        bd, x1, x2 = _dataset(rng)
        model = BrainModelDNN(bd.create_dataset('train'), [8, 5],
                              batch_norm=True)
        model.compile(learning_rate=1e-3)
        model.fit(bd.create_dataset('train'), epochs=2)
        self._roundtrip(tmp_path, model, x1, x2, tol=1e-4)

    def test_classifier(self, rng, tmp_path):
        bd, x1, x2 = _dataset(rng)
        model = BrainModelClassifier(bd.create_dataset('train'), [8])
        model.compile(learning_rate=1e-3)
        model.fit(bd.create_dataset('train'), epochs=2)
        self._roundtrip(tmp_path, model, x1, x2)

    def test_dcca(self, rng, tmp_path):
        """The interleaved tower emission order matches the legacy
        loader's depth-sorted layer_with_weights numbering — weights
        land on the right layers (io/keras_h5._spec_dcca)."""
        bd, x1, x2 = _dataset(rng)
        model = BrainModelDCCA(bd.create_dataset('train'), cca_dims=2,
                               hidden_units=[8, 5])
        model.compile(learning_rate=1e-3)
        model.fit(bd.create_dataset('train'), epochs=2)
        self._roundtrip(tmp_path, model, x1, x2)

    def test_reference_decoder_loads_directory_directly(
            self, rng, tmp_path):
        """The reference's Decoder.load_decoding_model consumes our
        directory with NO intermediate TF re-save, and the telluride
        metadata variable is restored as the model attribute the
        reference's serving stack reads."""
        bd, x1, x2 = _dataset(rng, out=1)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=0.01)
        model.fit(bd.create_dataset('train'))
        model.add_metadata(
            {'decoder': 'direct', 'pre_context': 0, 'post_context': 0,
             'input2_pre_context': 0, 'input2_post_context': 0,
             'dnn_regressor': 'linear'},
            dataset=bd.create_dataset('train'))
        out_dir = str(tmp_path / 'sm')
        export_saved_model(model, out_dir)
        probe = str(tmp_path / 'probe.npz')
        np.savez(probe, x1=x1[:64], x2=x2[:64])
        out = str(tmp_path / 'direct_out.npz')
        spec_path = str(tmp_path / 'spec.json')
        with open(spec_path, 'w') as f:
            json.dump({'saved_model_dir': out_dir, 'probe': probe,
                       'out': out}, f)
        script = str(tmp_path / 'direct.py')
        with open(script, 'w') as f:
            f.write(_TF_DECODER_DIRECT % {'ref_path': ab.REFERENCE_PATH})
        proc = subprocess.run([sys.executable, script, spec_path],
                              env=ab._worker_env(), capture_output=True,
                              text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-3000:]
        got = np.load(out)
        ours = model({'input_1': x1[:64], 'input_2': x2[:64]})
        assert np.abs(got['pred'] - np.asarray(ours)).max() < 1e-5
        meta = bytes(got['meta']).decode('utf-8')
        assert json.loads(meta)['decoder'] == 'direct'


class TestExportCli:

    def test_cli_exports_h5_and_decoder_sidecar(self, rng, tmp_path):
        from telluride_decoding_tpu.cli import export_keras
        bd, x1, x2 = _dataset(rng)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=0.01)
        model.fit(bd.create_dataset('train'))
        src = str(tmp_path / 'native')
        model.save(src)
        with open(os.path.join(src, 'decoder_model.json'), 'w') as f:
            f.write('{"decoder": "params"}')
        dst = str(tmp_path / 'exported.h5')
        export_keras.app_main([src, dst])
        assert os.path.exists(dst)
        assert os.path.exists(str(tmp_path /
                                  'exported.decoder_model.json'))

    def test_cli_variables_mode(self, rng, tmp_path):
        from telluride_decoding_tpu.cli import export_keras
        bd, x1, x2 = _dataset(rng)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=0.01)
        model.fit(bd.create_dataset('train'))
        src = str(tmp_path / 'native')
        model.save(src)
        dst = str(tmp_path / 'tf_artifact')
        export_keras.app_main(['--variables', src, dst])
        back = read_tensor_bundle(
            os.path.join(dst, 'variables', 'variables'))
        np.testing.assert_array_equal(
            back['variables/0/.ATTRIBUTES/VARIABLE_VALUE'],
            np.asarray(model.params['w']))

    def test_cli_saved_model_mode(self, rng, tmp_path):
        from telluride_decoding_tpu.cli import export_keras
        bd, x1, x2 = _dataset(rng)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=0.01)
        model.fit(bd.create_dataset('train'))
        src = str(tmp_path / 'native')
        model.save(src)
        with open(os.path.join(src, 'decoder_model.json'), 'w') as f:
            f.write('{"decoder": "params"}')
        dst = str(tmp_path / 'sm')
        export_keras.app_main(['--saved-model', src, dst])
        assert os.path.exists(os.path.join(dst, 'saved_model.pb'))
        assert os.path.exists(os.path.join(dst, 'keras_metadata.pb'))
        assert os.path.exists(os.path.join(dst, 'decoder_model.json'))

    def test_cli_rejects_non_model_dir(self, tmp_path):
        from telluride_decoding_tpu.cli import export_keras
        with pytest.raises(SystemExit, match='model.json'):
            export_keras.app_main([str(tmp_path), 'out.h5'])


_TF_SERVING_ROUNDTRIP = r"""
import json, sys
import numpy as np
import tensorflow as tf

sys.path.insert(0, %(ref_path)r)
from telluride_decoding import infer_decoder

spec = json.load(open(sys.argv[1]))
probe = np.load(spec['probe'])

# 1. Load the exported H5 and reattach the telluride metadata
#    variables (the documented 3-line bridge), then save a REAL
#    SavedModel with TF doing the tracing.
model = tf.keras.models.load_model(spec['h5'])
side = json.load(open(spec['sidecar']))
for k, v in side.items():
    setattr(model, k, tf.Variable(v))
model.save(spec['saved_model_dir'])

# 2. Drive the REFERENCE's serving stack end to end on it.
dec = infer_decoder.create_decoder('linear', reduction='first')
dec.load_decoding_model(spec['saved_model_dir'], {})
dec.restore_parameters(spec['decoder_json'])
scores = dec.infer_one({'input_1': tf.constant(probe['x1']),
                        'input_2': tf.constant(probe['x2'])},
                       tf.constant(probe['y']))
np.savez(spec['out'], scores=np.asarray(scores))
"""


@tf_required
class TestReferenceServingRoundTrip:

    def test_reference_decoder_serves_our_model(self, rng, tmp_path):
        """Full circle: a model trained HERE, exported with
        tdt-export-keras, drives the REFERENCE's Decoder serving stack
        (load_decoding_model + restore_parameters + infer_one) with
        scores equal to this framework's decoder."""
        from telluride_decoding_tpu.decode import infer_decoder as ours
        bd, x1, x2 = _dataset(rng, out=1)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=0.01)
        model.fit(bd.create_dataset('train'))
        model.add_metadata(
            {'pre_context': 0, 'post_context': 0,
             'input2_pre_context': 0, 'input2_post_context': 0,
             'dnn_regressor': 'linear'},
            dataset=bd.create_dataset('train'))
        native_dir = str(tmp_path / 'native')
        model.save(native_dir)
        dec = ours.create_decoder('linear', reduction='first')
        dec.load_decoding_model(native_dir)
        _, _, y, _ = bd.load_arrays('train')
        dec.add_data_correlator(y, y)
        decoder_json = os.path.join(native_dir, 'decoder_model.json')
        dec.save_parameters(decoder_json)

        h5 = str(tmp_path / 'exported.h5')
        export_keras_h5(model, h5)
        sidecar = str(tmp_path / 'exported.telluride.json')
        assert os.path.exists(sidecar)

        probe = str(tmp_path / 'probe.npz')
        np.savez(probe, x1=x1[:128], x2=x2[:128, :1],
                 y=y[:128])
        out = str(tmp_path / 'ref_scores.npz')
        spec = {'h5': h5, 'sidecar': sidecar,
                'saved_model_dir': str(tmp_path / 'roundtrip_sm'),
                'decoder_json': decoder_json, 'probe': probe,
                'out': out}
        spec_path = str(tmp_path / 'spec.json')
        with open(spec_path, 'w') as f:
            json.dump(spec, f)
        script = str(tmp_path / 'serving.py')
        with open(script, 'w') as f:
            f.write(_TF_SERVING_ROUNDTRIP %
                    {'ref_path': ab.REFERENCE_PATH})
        proc = subprocess.run([sys.executable, script, spec_path],
                              env=ab._worker_env(), capture_output=True,
                              text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-3000:]
        ref_scores = np.load(out)['scores'].reshape(-1)
        our_scores = np.asarray(dec.infer_one(
            {'input_1': x1[:128], 'input_2': x2[:128, :1]},
            y[:128])).reshape(-1)
        assert ref_scores.shape == our_scores.shape
        np.testing.assert_allclose(ref_scores, our_scores, atol=1e-4)

        # Bonus: the round-tripped SavedModel also loads back through
        # OUR TF-free migrate reader — the full circle closes.
        from telluride_decoding_tpu.models.migrate import (
            load_reference_saved_model)
        back = load_reference_saved_model(spec['saved_model_dir'])
        pred = back({'input_1': x1[:16], 'input_2': x2[:16, :1]})
        direct = model({'input_1': x1[:16], 'input_2': x2[:16, :1]})
        np.testing.assert_allclose(np.asarray(pred),
                                   np.asarray(direct), atol=1e-5)


@tf_required
class TestLiveCheckpointLoad:

    def test_tf_reads_written_bundle(self, rng, tmp_path):
        """tf.train.load_checkpoint reads our hand-written TensorBundle
        bit-exactly (floats AND string metadata)."""
        bd, x1, x2 = _dataset(rng)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=0.01)
        model.fit(bd.create_dataset('train'))
        model.add_metadata({'protocol': 'whole_split'})
        vdir = str(tmp_path / 'variables')
        export_saved_model_variables(model, vdir)
        script = str(tmp_path / 'ckpt_loader.py')
        out_path = str(tmp_path / 'ckpt_out.npz')
        with open(script, 'w') as f:
            f.write(
                'import sys, numpy as np, tensorflow as tf\n'
                'r = tf.train.load_checkpoint(sys.argv[1])\n'
                'np.savez(sys.argv[2],\n'
                "  w=r.get_tensor('variables/0/.ATTRIBUTES/"
                "VARIABLE_VALUE'),\n"
                "  b=r.get_tensor('variables/1/.ATTRIBUTES/"
                "VARIABLE_VALUE'),\n"
                "  meta=np.frombuffer(r.get_tensor("
                "'telluride_metadata/.ATTRIBUTES/VARIABLE_VALUE'), "
                "dtype=np.uint8))\n")
        proc = subprocess.run(
            [sys.executable, script, os.path.join(vdir, 'variables'),
             out_path],
            env=ab._worker_env(), capture_output=True, text=True,
            timeout=600)
        assert proc.returncode == 0, proc.stderr[-3000:]
        out = np.load(out_path)
        np.testing.assert_array_equal(out['w'],
                                      np.asarray(model.params['w']))
        meta = bytes(out['meta']).decode('utf-8')
        assert json.loads(meta) == {'protocol': 'whole_split'}
