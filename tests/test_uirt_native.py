"""Native UIRT parser: bit-identical to the Python loop across formats,
separators, headers, blank fields, and thread-boundary splits; exactly
as loud on malformed numeric fields."""

import numpy as np
import pytest

from tfrec_tpu.data.movielens import load_uirt_raw
from tfrec_tpu.data.uirt_native import NativeUnavailable, parse_buffer


def _assert_same(a, b):
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text, encoding="latin-1")
    return str(p)


CASES = {
    "ml100k_tabs": "1\t10\t3.0\t881250949\n2\t20\t5\t881250950\n1\t30\t1\t881250951\n",
    "ml1m_colons": "1::10::3::978300760\n2::20::5::978300761\n",
    "csv_header": "userId,movieId,rating,timestamp\n1,10,3.5,1112486027\n7,2,4.0,1112484676\n",
    "two_fields": "5 7\n8 9\n",
    "blank_rating": "1\t10\t\t99\n2\t20\t4.0\t\n",
    "skip_lines": "1\t10\t3\t1\n\n\t\t\t\n2\t20\t4\t2\n",
    "no_trailing_newline": "1\t10\t3\t1\n2\t20\t4\t2",
    "negative_ids": "-1\t10\t3\t1\n2\t-20\t4\t2\n",
    "float_ids": "1.0\t10.0\t3\t1\n",
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_native_matches_python_loop(tmp_path, name):
    path = _write(tmp_path, f"{name}.txt", CASES[name])
    try:
        got = load_uirt_raw(path, native=True)
    except NativeUnavailable:
        pytest.skip("no toolchain")
    want = load_uirt_raw(path, native=False)
    _assert_same(got, want)


def test_native_matches_python_at_scale_and_across_threads(tmp_path):
    rng = np.random.default_rng(0)
    n = 50_000
    lines = [
        f"{u}::{i}::{r:.1f}::{t}"
        for u, i, r, t in zip(
            rng.integers(0, 5000, n), rng.integers(0, 9000, n),
            rng.integers(1, 11, n) / 2.0, rng.integers(0, 2**31, n),
        )
    ]
    path = _write(tmp_path, "big.dat", "\n".join(lines) + "\n")
    try:
        got = load_uirt_raw(path, native=True)
    except NativeUnavailable:
        pytest.skip("no toolchain")
    want = load_uirt_raw(path, native=False)
    _assert_same(got, want)
    # Thread-boundary correctness: many threads over a small buffer must
    # still produce every row exactly once, in order.
    buf = CASES["ml100k_tabs"].encode("latin-1") * 40
    one = parse_buffer(buf, "\t", n_threads=1)
    many = parse_buffer(buf, "\t", n_threads=13)
    _assert_same(one, many)
    assert len(one[0]) == 120


def test_native_is_as_loud_as_python_on_malformed_fields(tmp_path):
    path = _write(tmp_path, "bad.txt", "1\t10\t3\t1\n2\tgarbage\t4\t2\n")
    try:
        with pytest.raises(ValueError):
            load_uirt_raw(path, native=True)
    except NativeUnavailable:
        pytest.skip("no toolchain")
    with pytest.raises(ValueError):
        load_uirt_raw(path, native=False)


@pytest.mark.parametrize("content", [
    "5::\n7::8\n",            # empty item field must NOT swallow line 2
    "9\t9\t1\t1\n2\t\t4\t5\n",  # empty item (tabs)
    "9\t9\t1\t1\n1\t2x\t3\t4\n",  # trailing garbage in a numeric field
    # Malformed FIRST lines would be eaten by the header sniffer (both
    # paths, consistently) — a valid first row keeps them as data rows.
    "9\t9\t1\t1\nnan\t5\t3\t4\n",   # non-finite id
    "9\t9\t1\t1\n1e30\t5\t3\t4\n",  # id overflowing int64
    "9\t9\t1\t1\n0x10\t5\t3\t4\n",  # C-only hex syntax (Python raises)
])
def test_native_rejects_what_python_rejects(tmp_path, content):
    """Review repros: unbounded strtod silently consumed the next field/
    line and accepted garbage where the Python loop raises. Both paths
    must now raise on the same content."""
    path = _write(tmp_path, "case.txt", content)
    try:
        with pytest.raises((ValueError, OverflowError)):
            load_uirt_raw(path, native=True)
    except NativeUnavailable:
        pytest.skip("no toolchain")
    with pytest.raises((ValueError, OverflowError)):
        load_uirt_raw(path, native=False)


def test_header_only_file_without_newline(tmp_path):
    """A just-created export holding only a header (no trailing newline)
    must load as empty, not crash on int(float('userId'))."""
    path = _write(tmp_path, "hdr.csv", "userId,movieId,rating,timestamp")
    for native in (True, False):
        try:
            out = load_uirt_raw(path, native=native)
        except NativeUnavailable:
            continue
        assert all(len(x) == 0 for x in out)
