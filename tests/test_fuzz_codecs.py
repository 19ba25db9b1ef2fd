"""Seeded random fuzz for the hand-implemented wire codecs.

The reference delegates all of these formats to TF / pyedflib / mne;
here they are hand-implemented (data/records.py TFRecord + the C++
fast path, io/edf.py EDF/BDF, io/brainvision.py, decode JSON params),
so malformed bytes are OUR parsing problem. Property under fuzz:
random garbage and random mutations of valid files must either parse
(a mutation can be benign) or raise a clean Exception — never crash
the process, hang, or silently return data from pure garbage.

Complements tests/test_parser_hardening.py's targeted corruptions
with seeded breadth. Deterministic (RandomState seeds), small inputs,
CPU-only.
"""
import json
import os

import numpy as np
import pytest

from telluride_decoding_tpu.data import records
from telluride_decoding_tpu.io import edf as edf_io
from telluride_decoding_tpu.io import brainvision

N_GARBAGE = 40
N_MUTANTS = 40


def _garbage_blobs(rng, max_len=4096):
    for _ in range(N_GARBAGE):
        n = int(rng.randint(0, max_len))
        yield rng.randint(0, 256, size=n, dtype=np.uint8).tobytes()


def _mutate(rng, data: bytes) -> bytes:
    buf = bytearray(data)
    kind = rng.randint(3)
    if kind == 0 and buf:  # flip a few bytes
        for _ in range(int(rng.randint(1, 8))):
            buf[int(rng.randint(len(buf)))] = int(rng.randint(256))
    elif kind == 1:        # truncate
        buf = buf[:int(rng.randint(len(buf) + 1))]
    else:                  # splice garbage into the middle
        pos = int(rng.randint(len(buf) + 1))
        junk = rng.randint(0, 256, size=int(rng.randint(1, 64)),
                           dtype=np.uint8).tobytes()
        buf = buf[:pos] + junk + buf[pos:]
    return bytes(buf)


def _assert_parses_or_raises_cleanly(fn, path):
    try:
        fn(path)
    except Exception as e:  # noqa: BLE001 — the property under test
        # Clean failure: a normal exception type, not a process-level
        # one (SystemExit/KeyboardInterrupt derive from BaseException
        # and would escape this handler and fail the test).
        assert isinstance(e, Exception)


class TestTfrecordFuzz:

    @pytest.fixture()
    def valid_file(self, tmp_path):
        rng = np.random.RandomState(0)
        path = str(tmp_path / 'valid.tfrecords')
        records.convert_data_to_tfrecords(
            {'eeg': rng.randn(50, 3).astype(np.float32),
             'intensity': rng.randn(50, 1).astype(np.float32)}, path)
        return path

    def _read_both_paths(self, path):
        # Python decoder and (when built) the native C++ fast path
        # must both survive; count first like the drivers do.
        records.count_tfrecords(path)
        records.read_tfrecords(path)

    def test_garbage(self, tmp_path):
        rng = np.random.RandomState(1)
        p = str(tmp_path / 'fuzz.tfrecords')
        for blob in _garbage_blobs(rng):
            with open(p, 'wb') as f:
                f.write(blob)
            _assert_parses_or_raises_cleanly(self._read_both_paths, p)

    def test_mutated_valid(self, valid_file, tmp_path):
        rng = np.random.RandomState(2)
        base = open(valid_file, 'rb').read()
        p = str(tmp_path / 'mut.tfrecords')
        for _ in range(N_MUTANTS):
            with open(p, 'wb') as f:
                f.write(_mutate(rng, base))
            _assert_parses_or_raises_cleanly(self._read_both_paths, p)

    def test_empty_garbage_never_yields_frames(self, tmp_path):
        # Pure garbage that PARSES must not hallucinate records: a
        # random blob has ~2^-32 odds of a valid masked CRC, so any
        # successful parse must return zero records.
        rng = np.random.RandomState(3)
        p = str(tmp_path / 'crc.tfrecords')
        for blob in _garbage_blobs(rng, max_len=512):
            with open(p, 'wb') as f:
                f.write(blob)
            try:
                got = records.read_tfrecords(p)
            except Exception:
                continue
            assert not got, 'garbage parsed into %r' % (got,)


class TestEdfFuzz:

    @pytest.fixture()
    def valid_file(self, tmp_path):
        rng = np.random.RandomState(0)
        path = str(tmp_path / 'valid.edf')
        sigs = [rng.randn(256) for _ in range(4)]
        edf_io.write_edf(path, sigs,
                         labels=['c%d' % i for i in range(4)],
                         sample_rates=[64.0] * 4)
        return path

    def test_garbage(self, tmp_path):
        rng = np.random.RandomState(4)
        p = str(tmp_path / 'fuzz.edf')
        for blob in _garbage_blobs(rng):
            with open(p, 'wb') as f:
                f.write(blob)
            _assert_parses_or_raises_cleanly(edf_io.read_edf, p)

    def test_mutated_valid(self, valid_file, tmp_path):
        rng = np.random.RandomState(5)
        base = open(valid_file, 'rb').read()
        p = str(tmp_path / 'mut.edf')
        for _ in range(N_MUTANTS):
            with open(p, 'wb') as f:
                f.write(_mutate(rng, base))
            _assert_parses_or_raises_cleanly(edf_io.read_edf, p)


class TestBrainVisionFuzz:

    VHDR = '/root/reference/test_data/brainvision_test.vhdr'

    def test_header_garbage(self):
        rng = np.random.RandomState(6)
        for blob in _garbage_blobs(rng, max_len=2048):
            text = blob.decode('latin-1')
            try:
                brainvision.parse_bv_header(text)
            except Exception as e:
                assert isinstance(e, Exception)

    @pytest.mark.skipif(not os.path.exists(VHDR),
                        reason='reference fixture absent')
    def test_mutated_real_header(self):
        rng = np.random.RandomState(7)
        base = open(self.VHDR, 'rb').read()
        for _ in range(N_MUTANTS):
            text = _mutate(rng, base).decode('latin-1', 'replace')
            try:
                brainvision.parse_bv_header(text)
            except Exception as e:
                assert isinstance(e, Exception)


class TestBundleFuzz:
    """TensorBundle reader (io/tf_checkpoint.py) — the SavedModel
    migration path parses TF-WRITTEN files (snappy blocks, SSTable,
    BundleEntry protos), so it fuzzes like the other read codecs:
    garbage and mutations of a valid bundle must parse or raise a
    clean Exception, never hang (varint readers are bounded), crash,
    or allocate unboundedly from a lying length field."""

    @pytest.fixture()
    def valid_prefix(self, tmp_path):
        from telluride_decoding_tpu.io.tf_checkpoint import (
            write_tensor_bundle)
        rng = np.random.RandomState(0)
        prefix = str(tmp_path / 'variables')
        write_tensor_bundle(prefix, {
            'model/layer/kernel/.ATTRIBUTES/VARIABLE_VALUE':
                rng.randn(4, 3).astype(np.float32),
            'model/layer/bias/.ATTRIBUTES/VARIABLE_VALUE':
                rng.randn(3),
            'telluride_metadata/.ATTRIBUTES/VARIABLE_VALUE':
                np.array([b'{"dnn_regressor": "linear"}'],
                         dtype=object),
        })
        return prefix

    def test_garbage_index(self, tmp_path):
        from telluride_decoding_tpu.io.tf_checkpoint import (
            read_tensor_bundle)
        rng = np.random.RandomState(9)
        prefix = str(tmp_path / 'g')
        for blob in _garbage_blobs(rng):
            with open(prefix + '.index', 'wb') as f:
                f.write(blob)
            with open(prefix + '.data-00000-of-00001', 'wb') as f:
                f.write(blob)
            _assert_parses_or_raises_cleanly(read_tensor_bundle, prefix)

    def test_mutated_valid(self, valid_prefix, tmp_path):
        from telluride_decoding_tpu.io.tf_checkpoint import (
            read_tensor_bundle)
        rng = np.random.RandomState(10)
        index = open(valid_prefix + '.index', 'rb').read()
        data = open(valid_prefix + '.data-00000-of-00001', 'rb').read()
        prefix = str(tmp_path / 'mut')
        for i in range(N_MUTANTS):
            # Mutate the index and the data shard in alternation —
            # the index drives the control flow (offsets, shapes,
            # dtypes), the shard the payload slicing.
            mut_index = _mutate(rng, index) if i % 2 == 0 else index
            mut_data = data if i % 2 == 0 else _mutate(rng, data)
            with open(prefix + '.index', 'wb') as f:
                f.write(mut_index)
            with open(prefix + '.data-00000-of-00001', 'wb') as f:
                f.write(mut_data)
            _assert_parses_or_raises_cleanly(read_tensor_bundle, prefix)

    def test_mutated_saved_model_migration(self, valid_prefix,
                                           tmp_path):
        # One layer up: load_reference_saved_model on a SavedModel
        # directory whose bundle bytes are mutated must also fail
        # cleanly (it composes the bundle reader with metadata JSON
        # parsing and model construction).
        from telluride_decoding_tpu.models.migrate import (
            load_reference_saved_model)
        rng = np.random.RandomState(11)
        index = open(valid_prefix + '.index', 'rb').read()
        data = open(valid_prefix + '.data-00000-of-00001', 'rb').read()
        sm = tmp_path / 'sm'
        vdir = sm / 'variables'
        vdir.mkdir(parents=True)
        for i in range(N_MUTANTS // 2):
            with open(vdir / 'variables.index', 'wb') as f:
                f.write(_mutate(rng, index) if i % 2 == 0 else index)
            with open(vdir / 'variables.data-00000-of-00001',
                      'wb') as f:
                f.write(data if i % 2 == 0 else _mutate(rng, data))
            _assert_parses_or_raises_cleanly(load_reference_saved_model,
                                             str(sm))


class TestDecoderJsonFuzz:

    def test_garbage_params(self, tmp_path):
        from telluride_decoding_tpu.decode import infer_decoder
        rng = np.random.RandomState(8)
        dec = infer_decoder.LinearRegressionDecoder(
            lambda d: d['input_1'][:, :1], reduction='first')
        p = str(tmp_path / 'decoder_model.json')
        cases = list(_garbage_blobs(rng, max_len=512))
        # Plus structurally-valid JSON with wrong shapes/keys.
        cases += [json.dumps(x).encode() for x in (
            {}, [], {'lda': 'nope'}, {'correlation_mean': [[1, 2]]},
            {'re': None}, 42)]
        for blob in cases:
            with open(p, 'wb') as f:
                f.write(blob)
            _assert_parses_or_raises_cleanly(dec.restore_parameters, p)
