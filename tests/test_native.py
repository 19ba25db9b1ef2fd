"""Native C++ TFRecord codec: parity with the pure-Python path."""

import ctypes
import os

import numpy as np
import pytest

from telluride_decoding_tpu import _native
from telluride_decoding_tpu.data import records


@pytest.fixture
def native_lib():
    lib = _native.lib()
    if lib is None:
        pytest.skip('native library unavailable (no g++?)')
    return lib


class TestNativeCodec:

    def test_crc32c_matches_python(self, native_lib, rng):
        for size in [0, 1, 7, 8, 9, 1000]:
            data = rng.bytes(size)
            buf = (ctypes.c_uint8 * max(size, 1)).from_buffer_copy(
                data or b'\x00')
            assert native_lib.tdt_crc32c(buf, size) == records.crc32c(data)
            assert (native_lib.tdt_masked_crc32c(buf, size) ==
                    records.masked_crc32c(data))

    def test_write_read_parity_with_python(self, native_lib, rng,
                                           tmp_path):
        data = {'eeg': rng.randn(500, 16).astype(np.float32),
                'intensity': rng.randn(500, 1).astype(np.float32)}
        native_path = str(tmp_path / 'native.tfrecords')
        records.convert_data_to_tfrecords(data, native_path)

        # Force the pure-Python encoder for comparison.
        python_path = str(tmp_path / 'python.tfrecords')
        payloads = [records.encode_example(
            {k: v[i] for k, v in data.items()})
            for i in range(500)]
        records.write_tfrecords(python_path, iter(payloads))

        # Byte-identical files (same wire encoding).
        assert (open(native_path, 'rb').read() ==
                open(python_path, 'rb').read())

    def test_native_read_matches_python_parse(self, native_lib, rng,
                                              tmp_path):
        data = {'a': rng.randn(200, 7).astype(np.float32),
                'b': rng.randn(200, 3).astype(np.float32)}
        path = str(tmp_path / 'x.tfrecords')
        records.convert_data_to_tfrecords(data, path)
        got = records.read_tfrecords(path)          # Native fast path.
        want = {}
        for payload in records.iter_tfrecords(path):
            ex = records.parse_example(payload)
            for k, v in ex.items():
                want.setdefault(k, []).append(v)
        for k in data:
            np.testing.assert_array_equal(got[k], np.stack(want[k]))

    def test_scan_detects_corruption(self, native_lib, rng, tmp_path):
        data = {'x': rng.randn(20, 4).astype(np.float32)}
        path = str(tmp_path / 'c.tfrecords')
        records.convert_data_to_tfrecords(data, path)
        raw = bytearray(open(path, 'rb').read())
        raw[30] ^= 0xFF
        open(path, 'wb').write(bytes(raw))
        count, bad = records.count_tfrecords(path)
        assert bad

    def test_int_features_use_python_path(self, native_lib, rng,
                                          tmp_path):
        # Mixed dtypes bypass the native encoder but still round trip.
        data = {'f': rng.randn(10, 2).astype(np.float32),
                'i': np.arange(20, dtype=np.int64).reshape(10, 2)}
        path = str(tmp_path / 'm.tfrecords')
        records.convert_data_to_tfrecords(data, path)
        back = records.read_tfrecords(path)
        np.testing.assert_array_equal(back['i'], data['i'])
        np.testing.assert_allclose(back['f'], data['f'], atol=1e-6)

    def test_reference_fixture_native_read(self, native_lib,
                                           reference_test_data):
        f = os.path.join(reference_test_data, 'meg',
                         'subj01_1ksamples.tfrecords')
        if not os.path.exists(f):
            pytest.skip('meg fixture missing')
        data = records.read_tfrecords(f)
        assert data['meg'].shape == (1001, 148)
        assert np.all(np.isfinite(data['meg']))
