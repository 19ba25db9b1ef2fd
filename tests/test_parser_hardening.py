"""Hardening tests for the binary parsers (review pass 4).

Pins: EDF 8-char numeric fields and truncated recordings, TFRecord
corruption handling (native and python paths must agree and never
crash the process), snappy copy-offset validation, and TensorShape Dim
parsing with optional fields.
"""

import os
import struct

import numpy as np
import pytest

from telluride_decoding_tpu.data import records
from telluride_decoding_tpu.io import tf_checkpoint
from telluride_decoding_tpu.io.edf import (_format_num8, read_edf,
                                           write_edf)


class TestEdfHardening:

    def test_large_physical_values_round_trip(self, rng, tmp_path):
        """Physical bounds whose '%g' rendering exceeds 8 chars.
        (Regression: blind truncation shrank the scale ~1e6x.)"""
        path = str(tmp_path / 'big.edf')
        sig = (rng.randn(512) * 5e6 - 1234567.8)
        write_edf(path, [sig], ['A1'], [256.0])
        parsed = read_edf(path)
        got = parsed['signal_list'][0][:512]
        h = parsed['signal_headers'][0]
        # Directed bound rounding: the written range CONTAINS the data
        # (no clipping), so the only error is 16-bit quantization.
        assert h['physical_min'] <= sig.min()
        assert h['physical_max'] >= sig.max()
        step = (h['physical_max'] - h['physical_min']) / 65535.0
        assert np.abs(got - sig).max() <= step

    def test_format_num8_always_fits(self):
        for v in (0.0, -1234567.8, 5.4321e-17, -9.87654321e+120,
                  1e308, -1e-308, 123.456789):
            s = _format_num8(v)
            assert len(s) <= 8
            if v != 0:
                assert abs(float(s) - v) <= abs(v) * 0.51

    def test_truncated_file_reads_complete_records(self, rng, tmp_path):
        """A header promising more records than the data section holds
        (interrupted recording) reads the complete records present.
        (Regression: opaque reshape ValueError.)"""
        path = str(tmp_path / 'x.edf')
        sig = rng.randn(1024).astype(np.float64)
        write_edf(path, [sig], ['A1'], [256.0])   # 4 records.
        blob = open(path, 'rb').read()
        record_bytes = 256 * 2
        open(path, 'wb').write(blob[:len(blob) - record_bytes])
        parsed = read_edf(path)
        assert parsed['num_records'] == 3
        np.testing.assert_allclose(parsed['signal_list'][0],
                                   sig[:768], atol=1e-2)


def _write_framed(path, payloads):
    records.write_tfrecords(path, iter(payloads))


class TestRecordsHardening:

    def test_count_rejects_non_example_payloads(self, tmp_path):
        """Valid TFRecord framing around junk payloads: both the
        native and python paths must report an error, matching the
        reference's per-record Example.FromString check."""
        path = str(tmp_path / 'junk.tfrecords')
        _write_framed(path, [b'\xff\xfe definitely not a proto \x00'])
        count, error = records.count_tfrecords(path)
        assert error

    def test_read_mixed_schema_raises(self, rng, tmp_path):
        """Records with different feature sets must raise loudly, not
        silently drop or misalign features."""
        a = records.encode_example({'x': rng.randn(3).astype(np.float32)})
        b = records.encode_example(
            {'x': rng.randn(3).astype(np.float32),
             'extra': rng.randn(2).astype(np.float32)})
        path = str(tmp_path / 'mixed.tfrecords')
        _write_framed(path, [a, b, b])
        with pytest.raises(ValueError, match='inconsistent records'):
            records.read_tfrecords(path)

    def test_read_extra_feature_in_middle_record_raises(self, rng,
                                                        tmp_path):
        """An extra feature present ONLY in middle records (first and
        last agree) must still be caught — the C validator summarizes
        every record's schema, not just the endpoints."""
        a = records.encode_example({'x': rng.randn(3).astype(np.float32)})
        mid = records.encode_example(
            {'x': rng.randn(3).astype(np.float32),
             'attend': rng.randn(1).astype(np.float32)})
        path = str(tmp_path / 'middle.tfrecords')
        _write_framed(path, [a, mid, mid, a])
        with pytest.raises(ValueError, match='inconsistent records'):
            records.read_tfrecords(path)

    def test_corrupt_embedded_lengths_do_not_crash(self, rng,
                                                   tmp_path):
        """Fuzz the native parser: corrupted payload bytes (framing
        left valid, validate=False read path) must yield a Python
        error or valid fallback — never an out-of-bounds crash."""
        base = {'eeg': rng.randn(40, 4).astype(np.float32),
                'env': rng.randn(40, 1).astype(np.float32)}
        clean = str(tmp_path / 'clean.tfrecords')
        records.convert_data_to_tfrecords(base, clean)
        blob = bytearray(open(clean, 'rb').read())
        fuzz_rng = np.random.RandomState(0)
        for trial in range(60):
            corrupted = bytearray(blob)
            for _ in range(3):
                # Corrupt payload bytes near the END of the file (the
                # last record's embedded lengths are the OOB-risky
                # ones) with high values that read as huge varints.
                idx = len(blob) - 1 - int(fuzz_rng.randint(0, 200))
                corrupted[idx] = int(fuzz_rng.randint(128, 256))
            path = str(tmp_path / ('f%02d.tfrecords' % trial))
            open(path, 'wb').write(bytes(corrupted))
            try:
                out = records.read_tfrecords(path)
                for v in out.values():
                    np.asarray(v)          # Materialize.
            except Exception:
                pass                        # Clean error: fine.

    def test_clean_native_read_still_exact(self, rng, tmp_path):
        data = {'eeg': rng.randn(64, 6).astype(np.float32)}
        path = str(tmp_path / 'ok.tfrecords')
        records.convert_data_to_tfrecords(data, path)
        out = records.read_tfrecords(path)
        np.testing.assert_array_equal(out['eeg'], data['eeg'])


class TestCheckpointHardening:

    def test_snappy_bad_copy_offset_raises(self):
        # Preamble: total length 4; literal of 1 byte; copy with
        # 2-byte offset 9 (> bytes produced so far) and length 4.
        blob = bytes([4]) + bytes([0x00, 0x41]) + \
            bytes([(3 << 2) | 2, 9, 0])
        with pytest.raises(ValueError, match='copy offset'):
            tf_checkpoint.snappy_decompress(blob)

    def test_dim_with_name_field_keeps_size(self):
        """A TensorShapeProto Dim carrying the optional name field
        before size must not drop the dimension."""
        def varint(v):
            out = b''
            while True:
                bits = v & 0x7F
                v >>= 7
                if v:
                    out += bytes([bits | 0x80])
                else:
                    return out + bytes([bits])
        # Dim { name: "batch" (field 2), size: 7 (field 1) }.
        dim = (bytes([2 << 3 | 2]) + varint(5) + b'batch' +
               bytes([1 << 3 | 0]) + varint(7))
        shape = bytes([2 << 3 | 2]) + varint(len(dim)) + dim
        entry = (bytes([1 << 3 | 0]) + varint(1) +        # dtype f32
                 bytes([2 << 3 | 2]) + varint(len(shape)) + shape +
                 bytes([5 << 3 | 0]) + varint(28))        # size
        parsed = tf_checkpoint._parse_bundle_entry(entry)
        assert parsed['shape'] == [7]
