// Native threaded top-k ranking evaluator.
//
// TPU-native framework parity note (SURVEY.md §2a "eval-native", §2c.3):
// the reference family's only native component is a C++/Cython threaded
// evaluator that scores-all-items / top-k / computes ranking metrics on the
// host. The DEFAULT eval path in this framework runs on-device
// (tfrec_tpu/parallel/topk.py); this host module mirrors the reference's
// native component 1:1 for (a) bit-parity testing of the device path and
// (b) CPU-only deployments (BASELINE.json config 1 is CPU-runnable).
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread eval_native.cpp -o libtfrec_eval.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Metrics {
  double precision = 0, recall = 0, map = 0, ndcg = 0, mrr = 0;
};

// Top-k by partial sort over (score, id), excluding per-user train items.
void eval_user(const float* scores, int num_items, const int32_t* excl,
               int n_excl, const int32_t* test, int n_test, int k,
               double* out5) {
  // Mask exclusions via a sentinel copy-free check: exclusions are sorted.
  std::vector<std::pair<float, int32_t>> heap;
  heap.reserve(num_items);
  for (int32_t i = 0; i < num_items; ++i) {
    if (n_excl &&
        std::binary_search(excl, excl + n_excl, i))
      continue;
    heap.emplace_back(scores[i], i);
  }
  const int kk = std::min<int>(k, (int)heap.size());
  std::partial_sort(
      heap.begin(), heap.begin() + kk, heap.end(),
      [](const auto& a, const auto& b) {
        // Tie-break on id for determinism (matches lax.top_k's
        // lowest-index-wins convention for equal scores).
        if (a.first != b.first) return a.first > b.first;
        return a.second < b.second;
      });

  double hits = 0, ap = 0, dcg = 0, mrr = 0;
  for (int r = 0; r < kk; ++r) {
    const int32_t item = heap[r].second;
    if (std::binary_search(test, test + n_test, item)) {
      hits += 1.0;
      ap += hits / (r + 1.0);
      dcg += 1.0 / std::log2(r + 2.0);
      if (mrr == 0) mrr = 1.0 / (r + 1.0);
    }
  }
  double idcg = 0;
  const int ideal = std::min<int>(n_test, k);
  for (int r = 0; r < ideal; ++r) idcg += 1.0 / std::log2(r + 2.0);
  out5[0] = hits / k;                                        // precision@k
  out5[1] = n_test ? hits / n_test : 0.0;                    // recall@k
  out5[2] = ap / std::max(1, std::min<int>(n_test, k));      // map@k
  out5[3] = idcg > 0 ? dcg / idcg : 0.0;                     // ndcg@k
  out5[4] = mrr;                                             // mrr@k
}

}  // namespace

extern "C" {

// scores: [num_users, num_items] row-major.
// excl_indptr/test_indptr: CSR offsets [num_users+1]; ids sorted per row.
// out: [num_users, 5] (precision, recall, map, ndcg, mrr) @k.
// Users with zero test items get all-zero rows (callers mask).
void tfrec_eval_topk(const float* scores, int32_t num_users,
                     int32_t num_items, const int32_t* excl_indptr,
                     const int32_t* excl_ids, const int32_t* test_indptr,
                     const int32_t* test_ids, int32_t k, int32_t num_threads,
                     double* out) {
  if (num_threads <= 0)
    num_threads = (int32_t)std::thread::hardware_concurrency();
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    for (;;) {
      const int32_t u = next.fetch_add(1);
      if (u >= num_users) return;
      const int32_t* excl = excl_ids + excl_indptr[u];
      const int n_excl = excl_indptr[u + 1] - excl_indptr[u];
      const int32_t* test = test_ids + test_indptr[u];
      const int n_test = test_indptr[u + 1] - test_indptr[u];
      double* row = out + (size_t)u * 5;
      if (n_test == 0) {
        std::memset(row, 0, 5 * sizeof(double));
        continue;
      }
      eval_user(scores + (size_t)u * num_items, num_items, excl, n_excl,
                test, n_test, k, row);
    }
  };
  std::vector<std::thread> pool;
  const int nt = std::min<int32_t>(num_threads, std::max<int32_t>(1, num_users));
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// Host-side scored retrieval: scores = U @ V^T (+ bias), then eval.
// user_vecs [num_users, dim], item_vecs [num_items, dim], bias [num_items]
// or nullptr. Blocked matmul keeps memory bounded.
void tfrec_eval_dot(const float* user_vecs, const float* item_vecs,
                    const float* item_bias, int32_t num_users,
                    int32_t num_items, int32_t dim,
                    const int32_t* excl_indptr, const int32_t* excl_ids,
                    const int32_t* test_indptr, const int32_t* test_ids,
                    int32_t k, int32_t num_threads, double* out) {
  if (num_threads <= 0)
    num_threads = (int32_t)std::thread::hardware_concurrency();
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    std::vector<float> scores(num_items);
    for (;;) {
      const int32_t u = next.fetch_add(1);
      if (u >= num_users) return;
      const int n_test = test_indptr[u + 1] - test_indptr[u];
      double* row = out + (size_t)u * 5;
      if (n_test == 0) {
        std::memset(row, 0, 5 * sizeof(double));
        continue;
      }
      const float* uv = user_vecs + (size_t)u * dim;
      for (int32_t i = 0; i < num_items; ++i) {
        const float* iv = item_vecs + (size_t)i * dim;
        float s = item_bias ? item_bias[i] : 0.0f;
        for (int32_t d = 0; d < dim; ++d) s += uv[d] * iv[d];
        scores[i] = s;
      }
      eval_user(scores.data(), num_items, excl_ids + excl_indptr[u],
                excl_indptr[u + 1] - excl_indptr[u],
                test_ids + test_indptr[u], n_test, k, row);
    }
  };
  std::vector<std::thread> pool;
  const int nt = std::min<int32_t>(num_threads, std::max<int32_t>(1, num_users));
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
