"""Native (C++) accelerators, loaded via ctypes with graceful fallback.

``lib()`` returns the loaded shared library or None. The library is
compiled from tdt_records.cc on first use (g++ -O3, cached next to the
source); any build/load failure silently degrades to the pure-Python
implementations in data.records.

The accelerated surface is the TFRecord/tf.train.Example codec the
reference delegates to TensorFlow (reference ingest.py:1118-1172
frame-per-record layout; brain_data.py:756-760 TFRecordDataset reads).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), 'tdt_records.cc')
_SO = os.path.join(os.path.dirname(__file__), 'libtdt_records.so')


def _configure(lib: ctypes.CDLL) -> ctypes.CDLL:
    i64 = ctypes.c_int64
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.tdt_crc32c.restype = ctypes.c_uint32
    lib.tdt_crc32c.argtypes = [u8p, i64]
    lib.tdt_masked_crc32c.restype = ctypes.c_uint32
    lib.tdt_masked_crc32c.argtypes = [u8p, i64]
    lib.tdt_scan_records.restype = i64
    lib.tdt_scan_records.argtypes = [u8p, i64, ctypes.c_int, i64p, i64p,
                                     i64]
    lib.tdt_read_feature.restype = i64
    lib.tdt_read_feature.argtypes = [u8p, i64p, i64p, i64,
                                     ctypes.c_char_p, f32p, i64]
    lib.tdt_validate_examples.restype = i64
    lib.tdt_validate_examples.argtypes = [u8p, i64p, i64p, i64, i64p,
                                          i64p]
    lib.tdt_encoded_size.restype = i64
    lib.tdt_encoded_size.argtypes = [i64p, i64p, i64, i64]
    lib.tdt_encode_file.restype = i64
    lib.tdt_encode_file.argtypes = [ctypes.c_char_p, i64p, i64p,
                                    ctypes.POINTER(f32p), i64, i64, u8p,
                                    i64]
    return lib


def lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first call; None on failure."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        try:
            # A prebuilt .so without the source (deployed package,
            # deleted .cc) is simply NOT stale — getmtime on a missing
            # source must not discard a loadable library.
            stale = not os.path.exists(_SO)
            if not stale and os.path.exists(_SRC):
                stale = os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            if stale:
                # Per-process tmp name: concurrent first-use builds
                # (parallel test workers / CLI jobs) must not write the
                # same path — a shared '.tmp' could be os.replace()d by
                # one process while another's g++ is still writing the
                # inode, installing a half-written library.
                tmp = '%s.%d.tmp' % (_SO, os.getpid())
                try:
                    subprocess.run(
                        ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
                         _SRC, '-o', tmp],
                        check=True, capture_output=True, timeout=120)
                    os.replace(tmp, _SO)
                finally:
                    if os.path.exists(tmp):
                        os.remove(tmp)
            _LIB = _configure(ctypes.CDLL(_SO))
        except Exception:
            _LIB = None
        _TRIED = True
        return _LIB
