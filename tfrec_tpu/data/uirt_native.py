"""ctypes bridge to the native UIRT parser (csrc/uirt_native.cpp).

Parses a whole rating-file buffer through the threaded C++ parser,
bit-identically to the Python loop in data/movielens.py:load_uirt_raw
(tests pin it) — the startup bottleneck at ML-20M scale. Falls back to
the Python parser when no toolchain is available (NativeUnavailable),
and raises ValueError on malformed numeric fields exactly where the
Python path would.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "uirt_native.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")
_SO = os.path.join(_BUILD_DIR, "libtfrec_uirt.so")

_lib = None


class NativeUnavailable(RuntimeError):
    pass


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if not (os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
               _SRC, "-o", _SO]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise NativeUnavailable(
                f"failed to build {_SO}: {getattr(e, 'stderr', e)}"
            ) from e
    lib = ctypes.CDLL(_SO)
    c = ctypes
    lib.tfrec_uirt_count.argtypes = [c.c_char_p, c.c_int64]
    lib.tfrec_uirt_count.restype = c.c_int64
    lib.tfrec_uirt_parse.argtypes = [
        c.c_char_p, c.c_int64, c.c_char_p, c.c_int32,
        c.POINTER(c.c_int64), c.POINTER(c.c_int64), c.POINTER(c.c_float),
        c.POINTER(c.c_double), c.POINTER(c.c_uint8), c.c_int64, c.c_int32,
    ]
    lib.tfrec_uirt_parse.restype = c.c_int64
    _lib = lib
    return lib


def parse_buffer(
    buf: bytes, sep: str, n_threads: int | None = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(raw_users, raw_items, ratings, times) — same contract as the
    Python loop over the same (header-stripped) buffer."""
    lib = load()
    n_threads = n_threads or min(os.cpu_count() or 1, 16)
    n_lines = int(lib.tfrec_uirt_count(buf, len(buf)))
    if n_lines == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float32), np.empty(0, np.float64))
    users = np.empty(n_lines, np.int64)
    items = np.empty(n_lines, np.int64)
    ratings = np.ones(n_lines, np.float32)
    times = np.zeros(n_lines, np.float64)
    valid = np.zeros(n_lines, np.uint8)
    c = ctypes
    sep_b = sep.encode("latin-1")
    seen = int(lib.tfrec_uirt_parse(
        buf, len(buf), sep_b, len(sep_b),
        users.ctypes.data_as(c.POINTER(c.c_int64)),
        items.ctypes.data_as(c.POINTER(c.c_int64)),
        ratings.ctypes.data_as(c.POINTER(c.c_float)),
        times.ctypes.data_as(c.POINTER(c.c_double)),
        valid.ctypes.data_as(c.POINTER(c.c_uint8)),
        n_lines, n_threads,
    ))
    assert seen == n_lines, (seen, n_lines)
    bad = np.flatnonzero(valid == 2)
    if len(bad):
        # The Python path raises on the first malformed numeric field;
        # stay exactly as loud (never silently drop data rows).
        raise ValueError(
            f"malformed numeric field on line {int(bad[0])} of the UIRT "
            "buffer (after any header)"
        )
    keep = valid == 1
    return users[keep], items[keep], ratings[keep], times[keep]
