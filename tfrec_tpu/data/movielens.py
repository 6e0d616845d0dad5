"""MovieLens UIRT loaders.

Parses the standard rating-file formats:
- ml-100k ``u.data``: ``user\titem\trating\ttimestamp``
- ml-1m/10m ``ratings.dat``: ``user::item::rating::timestamp``
- generic CSV/TSV/space-separated UIRT with optional header

plus ml-1m ``users.dat``/``movies.dat`` side features for the multi-field FM
config (BASELINE.json:8). Separator is sniffed from the first line.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from tfrec_tpu.data.dataset import Interactions, densify_ids

_SEPARATORS = ("::", "\t", ",", " ")


def _sniff_separator(line: str) -> str:
    for sep in _SEPARATORS:
        if sep in line:
            return sep
    raise ValueError(f"cannot determine UIRT separator from line {line!r}")


def load_uirt_raw(path: str, native: bool = True):
    """(raw_users, raw_items, ratings, times) WITHOUT id densification —
    for the 'given' splitter, which densifies over the train+test union.

    ``native=True`` routes the (header-stripped) buffer through the
    threaded C++ parser (csrc/uirt_native.cpp — the per-line Python loop
    dominates startup at ML-20M scale), bit-identical to the fallback
    loop below; falls back automatically when no toolchain exists."""
    if path is None or not os.path.exists(path):
        raise FileNotFoundError(f"rating file not found: {path}")
    with open(path, "rb") as f:
        data = f.read()
    nl = data.find(b"\n")
    first = (data if nl < 0 else data[: nl + 1]).decode("latin-1")
    sep = _sniff_separator(first)
    has_header = not first.split(sep)[0].strip().lstrip("-").isdigit()
    if has_header:
        # Strip the header even when it is the only (newline-less) line.
        body = data[nl + 1 :] if nl >= 0 else b""
    else:
        body = data

    if native:
        from tfrec_tpu.data.uirt_native import NativeUnavailable, parse_buffer

        try:
            return parse_buffer(body, sep)
        except NativeUnavailable:
            pass  # toolchain-free host: the Python loop below is exact

    # Split on \n ONLY (matching the native parser and the original
    # readlines semantics): str.splitlines would also break on \x0b/\x85/
    # etc., silently diverging from the C++ path on stray control bytes.
    rows = body.decode("latin-1").split("\n")
    if rows and rows[-1] == "":
        rows.pop()
    n = len(rows)
    raw_u = np.empty(n, dtype=np.int64)
    raw_i = np.empty(n, dtype=np.int64)
    ratings = np.ones(n, dtype=np.float32)
    times = np.zeros(n, dtype=np.float64)
    count = 0
    for line in rows:
        parts = line.split(sep)
        if len(parts) < 2 or not parts[0].strip():
            continue
        raw_u[count] = int(float(parts[0]))
        raw_i[count] = int(float(parts[1]))
        if len(parts) >= 3 and parts[2].strip():
            ratings[count] = float(parts[2])
        if len(parts) >= 4 and parts[3].strip():
            times[count] = float(parts[3])
        count += 1
    return raw_u[:count], raw_i[:count], ratings[:count], times[:count]


def load_uirt(path: str) -> Interactions:
    """Load a user-item-rating[-time] file into densified Interactions."""
    raw_u, raw_i, ratings, times = load_uirt_raw(path)
    users, items, nu, ni = densify_ids(raw_u, raw_i)
    return Interactions(
        users=users,
        items=items,
        ratings=ratings,
        times=times,
        num_users=nu,
        num_items=ni,
    )


def load_ml1m_user_features(path: str) -> Tuple[Dict[int, np.ndarray], Tuple[int, ...]]:
    """Parse ml-1m users.dat (UserID::Gender::Age::Occupation::Zip) into
    per-user categorical feature vectors [gender, age_bucket, occupation].

    Returns (raw_user_id -> int32[3], vocab sizes per field).
    """
    genders: Dict[str, int] = {}
    ages: Dict[str, int] = {}
    occs: Dict[str, int] = {}
    feats: Dict[int, np.ndarray] = {}
    with open(path, "r", encoding="latin-1") as f:
        for line in f:
            parts = line.rstrip("\n").split("::")
            if len(parts) < 4:
                continue
            uid = int(parts[0])
            g = genders.setdefault(parts[1], len(genders))
            a = ages.setdefault(parts[2], len(ages))
            o = occs.setdefault(parts[3], len(occs))
            feats[uid] = np.array([g, a, o], dtype=np.int32)
    return feats, (len(genders), len(ages), len(occs))


def load_ml1m_item_genres(path: str) -> Tuple[Dict[int, int], int]:
    """Parse movies.dat (MovieID::Title::Genres); the first genre becomes a
    single categorical field (multi-hot bags arrive with the embedding-bag
    combiner work)."""
    genres: Dict[str, int] = {}
    first_genre: Dict[int, int] = {}
    with open(path, "r", encoding="latin-1") as f:
        for line in f:
            parts = line.rstrip("\n").split("::")
            if len(parts) < 3:
                continue
            mid = int(parts[0])
            g = parts[2].split("|")[0]
            first_genre[mid] = genres.setdefault(g, len(genres))
    return first_genre, len(genres)
