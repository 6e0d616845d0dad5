"""Native C++ Criteo parser vs the Python reference — must be
bit-identical (same hashing, same dense transform)."""

import numpy as np
import pytest

from tfrec_tpu.data.criteo import iter_criteo_batches

native = pytest.importorskip("tfrec_tpu.data.criteo_native")

try:
    native.load()
    HAVE = True
except native.NativeUnavailable:
    HAVE = False

pytestmark = pytest.mark.skipif(not HAVE, reason="no g++ toolchain")


def _write(path, n, seed=0, malformed_every=0):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n):
            if malformed_every and i % malformed_every == 5:
                f.write("garbage line without fields\n")
                continue
            label = rng.integers(0, 2)
            dense = "\t".join(
                str(rng.integers(-2, 100)) if rng.random() > 0.1 else ""
                for _ in range(13)
            )
            cats = "\t".join(
                format(rng.integers(0, 1 << 32), "x") if rng.random() > 0.1 else ""
                for _ in range(26)
            )
            f.write(f"{label}\t{dense}\t{cats}\n")


@pytest.mark.parametrize("malformed", [0, 97])
def test_native_parser_matches_python(tmp_path, malformed):
    path = str(tmp_path / "c.tsv")
    _write(path, 3000, malformed_every=malformed)
    vocab = [777] * 26
    py = list(iter_criteo_batches(path, 256, vocab))
    nat = list(native.iter_criteo_batches_native(path, 256, vocab))
    assert len(py) == len(nat) and len(py) > 0
    for (d1, c1, l1), (d2, c2, l2) in zip(py, nat):
        np.testing.assert_allclose(d1, d2, rtol=1e-6)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(l1, l2)


def test_native_parser_small_chunks(tmp_path):
    """Chunk boundaries mid-line must not lose or duplicate rows."""
    path = str(tmp_path / "c.tsv")
    _write(path, 500)
    vocab = [100] * 26
    big = list(native.iter_criteo_batches_native(path, 100, vocab))
    small = list(
        native.iter_criteo_batches_native(path, 100, vocab, chunk_bytes=1000)
    )
    assert len(big) == len(small) == 5
    for (d1, c1, l1), (d2, c2, l2) in zip(big, small):
        np.testing.assert_array_equal(c1, c2)


def test_native_parser_max_examples(tmp_path):
    path = str(tmp_path / "c.tsv")
    _write(path, 400)
    vocab = [100] * 26
    got = list(native.iter_criteo_batches_native(path, 64, vocab, max_examples=200))
    assert len(got) == 3  # 200 examples -> 3 full batches of 64
