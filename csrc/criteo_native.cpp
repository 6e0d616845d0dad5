// Native Criteo TSV parser: label \t 13 ints \t 26 hex-categorical tokens.
//
// The host input pipeline is the classic CTR-training bottleneck (the
// reference family samples/parses in Python on the hot path — SURVEY.md
// §3a). This parser turns a raw text buffer into ready (dense, cat, label)
// arrays at C++ speed; tfrec_tpu/data/criteo_native.py streams file chunks
// through it. Threaded: the buffer is split at line boundaries and parsed
// in parallel into disjoint output rows.
//
// Categorical hashing MUST match the Python fallback
// (tfrec_tpu/data/criteo.py:_hash_token): FNV-1a over "<field>:<token>"
// bytes, mod vocab. Dense ints get log1p(max(x, 0)) like the Python path.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread criteo_native.cpp -o libtfrec_criteo.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kDense = 13;
constexpr int kCat = 26;

inline uint64_t fnv1a(const char* s, size_t n, uint64_t h) {
  for (size_t i = 0; i < n; ++i) {
    h ^= (uint64_t)(unsigned char)s[i];
    h *= 1099511628211ULL;
  }
  return h;
}

inline uint64_t hash_token(int field, const char* tok, size_t n) {
  // Matches python: FNV-1a over f"{field}:{token}".encode()
  char prefix[8];
  int p = 0;
  if (field >= 10) prefix[p++] = (char)('0' + field / 10);
  prefix[p++] = (char)('0' + field % 10);
  prefix[p++] = ':';
  uint64_t h = fnv1a(prefix, p, 14695981039346656037ULL);
  return fnv1a(tok, n, h);
}

// Parse rows in [begin, end) writing to out arrays starting at row_off.
// Returns rows written.
int64_t parse_range(const char* begin, const char* end,
                    const int32_t* vocab_sizes, int64_t row_off,
                    int64_t max_rows, float* dense_out, int32_t* cat_out,
                    float* label_out) {
  int64_t row = row_off;
  const char* p = begin;
  while (p < end && row - row_off < max_rows) {
    const char* line_end = (const char*)memchr(p, '\n', end - p);
    if (!line_end) break;
    // split into fields
    const char* field_start = p;
    int field_idx = 0;
    float* drow = dense_out + row * kDense;
    int32_t* crow = cat_out + row * kCat;
    bool ok = true;
    for (const char* q = p; q <= line_end && field_idx <= kDense + kCat; ++q) {
      if (q == line_end || *q == '\t') {
        const size_t n = q - field_start;
        if (field_idx == 0) {
          label_out[row] = (n && field_start[0] == '1') ? 1.0f : 0.0f;
        } else if (field_idx <= kDense) {
          float v = 0.0f;
          if (n) {
            // fast integer parse (criteo dense are ints, may be negative)
            bool neg = field_start[0] == '-';
            long x = 0;
            for (size_t i = neg ? 1 : 0; i < n; ++i) {
              char c = field_start[i];
              if (c < '0' || c > '9') { x = 0; break; }
              x = x * 10 + (c - '0');
            }
            if (neg) x = -x;
            v = x > 0 ? log1pf((float)x) : 0.0f;
          }
          drow[field_idx - 1] = v;
        } else {
          const int c = field_idx - kDense - 1;
          crow[c] = n ? (int32_t)(hash_token(c, field_start, n) %
                                  (uint64_t)vocab_sizes[c])
                      : 0;
        }
        ++field_idx;
        field_start = q + 1;
      }
    }
    ok = (field_idx == 1 + kDense + kCat);
    if (ok) ++row;
    p = line_end + 1;
  }
  return row - row_off;
}

}  // namespace

extern "C" {

// Count complete lines in buf (stops at max_rows).
int64_t tfrec_criteo_count_lines(const char* buf, int64_t len, int64_t max_rows) {
  int64_t n = 0;
  const char* p = buf;
  const char* end = buf + len;
  while (p < end && n < max_rows) {
    const char* q = (const char*)memchr(p, '\n', end - p);
    if (!q) break;
    ++n;
    p = q + 1;
  }
  return n;
}

// Parse up to max_rows complete lines from buf into the output arrays.
// Returns rows parsed; *bytes_consumed is set to the offset after the last
// parsed line (resume point for the next chunk).
int64_t tfrec_criteo_parse(const char* buf, int64_t len, int64_t max_rows,
                           const int32_t* vocab_sizes, int32_t num_threads,
                           float* dense_out, int32_t* cat_out,
                           float* label_out, int64_t* bytes_consumed) {
  const char* end = buf + len;
  if (num_threads <= 1) {
    int64_t rows = parse_range(buf, end, vocab_sizes, 0, max_rows, dense_out,
                               cat_out, label_out);
    // find consumed offset: rows-th newline
    const char* p = buf;
    for (int64_t i = 0; i < rows; ++i)
      p = (const char*)memchr(p, '\n', end - p) + 1;
    *bytes_consumed = p - buf;
    return rows;
  }
  // Threaded: split buffer into segments at line boundaries, one output
  // region per segment (line counts computed first so rows are contiguous).
  const int nt = num_threads;
  std::vector<const char*> seg(nt + 1);
  seg[0] = buf;
  for (int t = 1; t < nt; ++t) {
    const char* guess = buf + (len * t) / nt;
    const char* nl = (const char*)memchr(guess, '\n', end - guess);
    seg[t] = nl ? nl + 1 : end;
  }
  seg[nt] = end;
  std::vector<int64_t> counts(nt, 0);
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; ++t)
    pool.emplace_back([&, t]() {
      counts[t] =
          tfrec_criteo_count_lines(seg[t], seg[t + 1] - seg[t], max_rows);
    });
  for (auto& th : pool) th.join();
  pool.clear();
  // prefix offsets, capped at max_rows
  std::vector<int64_t> offs(nt + 1, 0);
  for (int t = 0; t < nt; ++t) {
    int64_t take = counts[t];
    if (offs[t] + take > max_rows) take = max_rows - offs[t];
    if (take < 0) take = 0;
    counts[t] = take;
    offs[t + 1] = offs[t] + take;
  }
  std::vector<int64_t> parsed(nt, 0);
  for (int t = 0; t < nt; ++t)
    pool.emplace_back([&, t]() {
      parsed[t] = parse_range(seg[t], seg[t + 1], vocab_sizes, offs[t],
                              counts[t], dense_out, cat_out, label_out);
    });
  for (auto& th : pool) th.join();
  // Malformed lines shift rows within a segment and would leave gaps in
  // the packed output; fall back to the single-threaded path in that case.
  for (int t = 0; t < nt; ++t)
    if (parsed[t] != counts[t])
      return tfrec_criteo_parse(buf, len, max_rows, vocab_sizes, 1,
                                dense_out, cat_out, label_out,
                                bytes_consumed);
  int64_t total = offs[nt];
  // consumed bytes: end of the last fully-parsed segment region. Find the
  // newline ending row `counts[last]` within the last active segment.
  int last = nt - 1;
  while (last >= 0 && counts[last] == 0) --last;
  const char* p = last >= 0 ? seg[last] : buf;
  for (int64_t i = 0; last >= 0 && i < counts[last]; ++i)
    p = (const char*)memchr(p, '\n', end - p) + 1;
  *bytes_consumed = p - buf;
  return total;
}

}  // extern "C"
