"""C++ evaluator vs the device/jnp metric path — the parity test the native
module exists for (SURVEY.md §2c.3)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tfrec_tpu.eval.metrics import ranking_metrics_from_topk
from tfrec_tpu.eval.retrieval import padded_positives, topk_scores

pytest.importorskip("ctypes")
native = pytest.importorskip("tfrec_tpu.eval.native")

try:
    native.load()
    HAVE_NATIVE = True
except native.NativeUnavailable:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="no g++ toolchain")


def _random_problem(seed, num_users=40, num_items=120):
    rng = np.random.default_rng(seed)
    scores = rng.normal(size=(num_users, num_items)).astype(np.float32)
    def rand_csr(density):
        m = (rng.random((num_users, num_items)) < density).astype(np.float32)
        return sp.csr_matrix(m)
    train = rand_csr(0.10)
    test_dense = (rng.random((num_users, num_items)) < 0.05).astype(np.float32)
    # test and train disjoint
    test_dense[train.toarray() > 0] = 0
    test = sp.csr_matrix(test_dense)
    return scores, train, test


@pytest.mark.parametrize("seed", [0, 1])
def test_native_matches_device_metrics(seed):
    scores, train, test = _random_problem(seed)
    ks = (5, 20)
    got = native.evaluate_scores_native(scores, train, test, ks)

    tr_p, tr_c = padded_positives(train)
    te_p, te_c = padded_positives(test)
    _, topk_items = topk_scores(jnp.asarray(scores), max(ks), jnp.asarray(tr_p), jnp.asarray(tr_c))
    want = ranking_metrics_from_topk(topk_items, jnp.asarray(te_p), jnp.asarray(te_c), ks)
    for k in ks:
        for name in ("precision", "recall", "map", "ndcg", "mrr"):
            np.testing.assert_allclose(
                got[f"{name}@{k}"], float(want[f"{name}@{k}"]),
                rtol=1e-5, atol=1e-6, err_msg=f"{name}@{k}",
            )


def test_native_dot_matches_scores_path():
    rng = np.random.default_rng(2)
    u = rng.normal(size=(30, 8)).astype(np.float32)
    v = rng.normal(size=(90, 8)).astype(np.float32)
    bias = rng.normal(size=90).astype(np.float32)
    scores = u @ v.T + bias[None, :]
    _, train, test = _random_problem(3, 30, 90)
    ks = (10,)
    a = native.evaluate_dot_native(u, v, bias, train, test, ks)
    b = native.evaluate_scores_native(scores, train, test, ks)
    for key in a:
        np.testing.assert_allclose(a[key], b[key], rtol=1e-4, atol=1e-6, err_msg=key)


def test_native_threads_deterministic():
    scores, train, test = _random_problem(4)
    a = native.evaluate_scores_native(scores, train, test, (10,), num_threads=1)
    b = native.evaluate_scores_native(scores, train, test, (10,), num_threads=4)
    for key in a:
        assert a[key] == b[key], key
