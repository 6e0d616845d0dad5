"""ctypes bridge to the native Criteo parser (csrc/criteo_native.cpp).

Streams a Criteo TSV through the threaded C++ parser in large chunks;
yields the same (dense, cat, label) batches as the Python path in
data/criteo.py, bit-identically (same FNV-1a field hashing, same log1p
dense transform) — tests pin that. Falls back to the Python parser when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Sequence, Tuple

import numpy as np

from tfrec_tpu.data.criteo import NUM_CATEGORICAL, NUM_DENSE

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "criteo_native.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")
_SO = os.path.join(_BUILD_DIR, "libtfrec_criteo.so")

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
    lib.tfrec_criteo_parse.argtypes = [
        c.c_char_p, c.c_int64, c.c_int64, c.POINTER(c.c_int32), c.c_int32,
        c.POINTER(c.c_float), c.POINTER(c.c_int32), c.POINTER(c.c_float),
        c.POINTER(c.c_int64),
    ]
    lib.tfrec_criteo_parse.restype = c.c_int64
    _lib = lib
    return lib


def parse_buffer(
    buf: bytes,
    vocab_sizes: Sequence[int],
    max_rows: int | None = None,
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Parse complete lines from ``buf``. Returns (dense, cat, label,
    bytes_consumed); arrays are trimmed to the parsed row count."""
    lib = load()
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 8)
    cap = max_rows if max_rows is not None else buf.count(b"\n")
    dense = np.zeros((cap, NUM_DENSE), np.float32)
    cat = np.zeros((cap, NUM_CATEGORICAL), np.int32)
    label = np.zeros(cap, np.float32)
    vs = np.ascontiguousarray(vocab_sizes, dtype=np.int32)
    assert len(vs) == NUM_CATEGORICAL
    consumed = ctypes.c_int64(0)
    c = ctypes
    rows = lib.tfrec_criteo_parse(
        buf, len(buf), cap, vs.ctypes.data_as(c.POINTER(c.c_int32)),
        num_threads,
        dense.ctypes.data_as(c.POINTER(c.c_float)),
        cat.ctypes.data_as(c.POINTER(c.c_int32)),
        label.ctypes.data_as(c.POINTER(c.c_float)),
        c.byref(consumed),
    )
    return dense[:rows], cat[:rows], label[:rows], int(consumed.value)


def iter_criteo_batches_native(
    path: str,
    batch_size: int,
    vocab_sizes: Sequence[int] | int = 100_000,
    max_examples: int | None = None,
    chunk_bytes: int = 64 << 20,
    num_threads: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Drop-in replacement for data.criteo.iter_criteo_batches using the
    native parser: reads ``chunk_bytes`` at a time, parses in parallel,
    slices into fixed-size batches (final partial batch dropped)."""
    if isinstance(vocab_sizes, int):
        vocab_sizes = [vocab_sizes] * NUM_CATEGORICAL
    pend_d, pend_c, pend_l = [], [], []
    pending = 0
    seen = 0
    with open(path, "rb") as f:
        carry = b""
        while True:
            chunk = f.read(chunk_bytes)
            if not chunk and not carry:
                break
            buf = carry + chunk
            limit = None if max_examples is None else max_examples - seen
            if limit is not None and limit <= 0:
                break
            if not chunk and buf and not buf.endswith(b"\n"):
                # Final line without a trailing newline: terminate it so it
                # parses (the Python fallback parses it — parity).
                buf += b"\n"
            dense, cat, label, consumed = parse_buffer(
                buf, vocab_sizes, max_rows=limit, num_threads=num_threads
            )
            if len(label) == 0 and not chunk:
                break
            carry = buf[consumed:]
            seen += len(label)
            pend_d.append(dense); pend_c.append(cat); pend_l.append(label)
            pending += len(label)
            while pending >= batch_size:
                d = np.concatenate(pend_d); ca = np.concatenate(pend_c)
                la = np.concatenate(pend_l)
                yield (d[:batch_size], ca[:batch_size], la[:batch_size])
                d, ca, la = d[batch_size:], ca[batch_size:], la[batch_size:]
                pend_d, pend_c, pend_l = [d], [ca], [la]
                pending = len(la)
            if not chunk:
                break
