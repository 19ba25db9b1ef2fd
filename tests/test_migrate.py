"""SavedModel migration: read the reference's frozen model without TF
and serve it natively end to end."""

import json
import os

import numpy as np
import pytest

from telluride_decoding_tpu.io.tf_checkpoint import (read_tensor_bundle,
                                                     snappy_decompress)
from telluride_decoding_tpu.models import load_model
from telluride_decoding_tpu.models.migrate import (
    load_reference_saved_model)

FIXTURE = '/root/reference/test_data/linear_model'


@pytest.fixture
def frozen_model_dir():
    if not os.path.isdir(FIXTURE):
        pytest.skip('frozen SavedModel fixture missing')
    return FIXTURE


class TestSnappy:

    def test_literal_roundtrip(self):
        # Hand-built snappy stream: length 5, literal of 5 bytes.
        stream = bytes([5, (4 << 2) | 0]) + b'hello'
        assert snappy_decompress(stream) == b'hello'

    def test_copy_backreference(self):
        # 'abab' = literal 'ab' + copy(offset=2, len=2) via 2-byte copy.
        stream = bytes([4, (1 << 2) | 0]) + b'ab' + \
            bytes([(1 << 2) | 2, 2, 0])
        assert snappy_decompress(stream) == b'abab'

    def test_overlapping_copy(self):
        # 'aaaaa' = literal 'a' + copy(offset=1, len=4).
        stream = bytes([5, 0]) + b'a' + bytes([(3 << 2) | 2, 1, 0])
        assert snappy_decompress(stream) == b'aaaaa'


class TestBundleReader:

    def test_reads_frozen_fixture(self, frozen_model_dir):
        tensors = read_tensor_bundle(
            os.path.join(frozen_model_dir, 'variables', 'variables'))
        kernel = tensors['_layer/kernel/.ATTRIBUTES/VARIABLE_VALUE']
        assert kernel.shape == (1364, 1)
        assert kernel.dtype == np.float32
        assert np.all(np.isfinite(kernel))
        meta = json.loads(tensors[
            'telluride_metadata/.ATTRIBUTES/VARIABLE_VALUE'].reshape(
                -1)[0])
        assert meta['dnn_regressor'] == 'linear'
        assert meta['post_context'] == 30


class TestMigration:

    def test_migrate_and_serve(self, frozen_model_dir, rng, tmp_path):
        model = load_reference_saved_model(frozen_model_dir)
        inputs = json.loads(model.telluride_inputs)
        width = inputs['input_1'][1]
        x = rng.randn(16, width).astype(np.float32)
        pred = model({'input_1': x})
        assert pred.shape == (16, 1)
        # Matches the raw kernel/bias math.
        tensors = read_tensor_bundle(
            os.path.join(frozen_model_dir, 'variables', 'variables'))
        kernel = tensors['_layer/kernel/.ATTRIBUTES/VARIABLE_VALUE']
        bias = tensors['_layer/bias/.ATTRIBUTES/VARIABLE_VALUE']
        np.testing.assert_allclose(pred, x @ kernel + bias, atol=1e-4)

        # Re-save natively and round trip.
        model.save(str(tmp_path / 'native'))
        loaded = load_model(str(tmp_path / 'native'))
        np.testing.assert_allclose(loaded({'input_1': x}), pred,
                                   atol=1e-6)
        assert loaded.telluride_metadata == model.telluride_metadata

    def test_migrate_cli_tool(self, frozen_model_dir, rng, tmp_path):
        """The stated one-way compatibility policy: SavedModel -> native
        via the CLI shim, then served natively (README 'Model artifact
        compatibility')."""
        from telluride_decoding_tpu.cli import migrate_saved_model
        dst = str(tmp_path / 'native')
        migrate_saved_model.app_main([frozen_model_dir, dst])
        assert os.path.exists(os.path.join(dst, 'model.json'))
        assert os.path.exists(os.path.join(dst, 'weights.npz'))
        loaded = load_model(dst)
        width = json.loads(loaded.telluride_inputs)['input_1'][1]
        x = rng.randn(8, width).astype(np.float32)
        assert np.asarray(loaded({'input_1': x})).shape == (8, 1)
        with pytest.raises(SystemExit):
            migrate_saved_model.app_main([str(tmp_path), dst])  # No pb.
        with pytest.raises(SystemExit):
            migrate_saved_model.app_main([dst])  # Wrong arity.

    def test_migrated_model_in_decoder(self, frozen_model_dir, rng):
        from telluride_decoding_tpu.decode import LinearRegressionDecoder
        model = load_reference_saved_model(frozen_model_dir)
        dec = LinearRegressionDecoder(model, reduction='first')
        width = json.loads(model.telluride_inputs)['input_1'][1]
        x = rng.randn(100, width).astype(np.float32)
        y = rng.randn(100, 1).astype(np.float32)
        dec.add_data_correlator(y, y)
        scores = dec.infer_one({'input_1': x, 'input_2': y}, y)
        assert scores.shape == (100,)
        assert np.all(np.isfinite(scores))
