"""ctypes bridge to the native C++ threaded evaluator (csrc/eval_native.cpp).

Mirrors the reference family's C++/Cython top-k evaluator (SURVEY.md §2a
"eval-native") including its build-or-fallback behavior: the library is
compiled on first use with g++ and cached under build/; if no toolchain is
available, callers fall back to the device/jnp path (eval/retrieval.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Sequence

import numpy as np
import scipy.sparse as sp

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "eval_native.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")
_SO = os.path.join(_BUILD_DIR, "libtfrec_eval.so")

_lib = None
METRIC_NAMES = ("precision", "recall", "map", "ndcg", "mrr")


class NativeUnavailable(RuntimeError):
    pass


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeUnavailable(f"failed to build {_SO}: {detail}") from e
    return _SO


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build())
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.tfrec_eval_topk.argtypes = [
        f32p, ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p, i32p,
        ctypes.c_int32, ctypes.c_int32, f64p,
    ]
    lib.tfrec_eval_topk.restype = None
    lib.tfrec_eval_dot.argtypes = [
        f32p, f32p, f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, i32p, i32p, ctypes.c_int32, ctypes.c_int32, f64p,
    ]
    lib.tfrec_eval_dot.restype = None
    _lib = lib
    return lib


def _csr_parts(csr: sp.csr_matrix):
    indptr = np.ascontiguousarray(csr.indptr, dtype=np.int32)
    # eval_native binary-searches per row: indices must be sorted.
    m = csr.sorted_indices() if not csr.has_sorted_indices else csr
    indices = np.ascontiguousarray(m.indices, dtype=np.int32)
    return indptr, indices


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def evaluate_scores_native(
    scores: np.ndarray,
    exclude_csr: sp.csr_matrix,
    test_csr: sp.csr_matrix,
    ks: Sequence[int],
    num_threads: int = 0,
) -> Dict[str, float]:
    """Full-sort ranking metrics from a dense [U, V] score matrix."""
    lib = load()
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    num_users, num_items = scores.shape
    e_ptr, e_ids = _csr_parts(exclude_csr)
    t_ptr, t_ids = _csr_parts(test_csr)
    has_test = np.diff(t_ptr) > 0
    denom = max(int(has_test.sum()), 1)
    out_all: Dict[str, float] = {}
    for k in ks:
        out = np.zeros((num_users, 5), dtype=np.float64)
        lib.tfrec_eval_topk(
            _ptr(scores, ctypes.c_float), num_users, num_items,
            _ptr(e_ptr, ctypes.c_int32), _ptr(e_ids, ctypes.c_int32),
            _ptr(t_ptr, ctypes.c_int32), _ptr(t_ids, ctypes.c_int32),
            k, num_threads, _ptr(out, ctypes.c_double),
        )
        sums = out.sum(axis=0)
        for name, val in zip(METRIC_NAMES, sums):
            out_all[f"{name}@{k}"] = float(val) / denom
    return out_all


def evaluate_dot_native(
    user_vecs: np.ndarray,
    item_vecs: np.ndarray,
    item_bias: np.ndarray | None,
    exclude_csr: sp.csr_matrix,
    test_csr: sp.csr_matrix,
    ks: Sequence[int],
    num_threads: int = 0,
) -> Dict[str, float]:
    """Ranking metrics for dot-product scorers without materializing the
    full score matrix across users (per-thread score buffers)."""
    lib = load()
    user_vecs = np.ascontiguousarray(user_vecs, dtype=np.float32)
    item_vecs = np.ascontiguousarray(item_vecs, dtype=np.float32)
    num_users, dim = user_vecs.shape
    num_items = item_vecs.shape[0]
    if item_bias is not None:
        item_bias = np.ascontiguousarray(item_bias, dtype=np.float32)
        bias_ptr = _ptr(item_bias, ctypes.c_float)  # item_bias kept alive below
    else:
        bias_ptr = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    e_ptr, e_ids = _csr_parts(exclude_csr)
    t_ptr, t_ids = _csr_parts(test_csr)
    has_test = np.diff(t_ptr) > 0
    denom = max(int(has_test.sum()), 1)
    out_all: Dict[str, float] = {}
    for k in ks:
        out = np.zeros((num_users, 5), dtype=np.float64)
        lib.tfrec_eval_dot(
            _ptr(user_vecs, ctypes.c_float), _ptr(item_vecs, ctypes.c_float),
            bias_ptr, num_users, num_items, dim,
            _ptr(e_ptr, ctypes.c_int32), _ptr(e_ids, ctypes.c_int32),
            _ptr(t_ptr, ctypes.c_int32), _ptr(t_ids, ctypes.c_int32),
            k, num_threads, _ptr(out, ctypes.c_double),
        )
        sums = out.sum(axis=0)
        for name, val in zip(METRIC_NAMES, sums):
            out_all[f"{name}@{k}"] = float(val) / denom
    return out_all
