// Native UIRT rating-file parser: user<sep>item[<sep>rating[<sep>time]]
// lines (ml-100k tabs, ml-1m/10m "::", generic CSV/space), the other half
// of the host input pipeline next to the Criteo parser (SURVEY.md §3a:
// the reference family parses in Python on the hot path; at ML-20M scale
// the per-line Python loop dominates startup).
//
// Semantics MUST match tfrec_tpu/data/movielens.py:load_uirt_raw
// bit-identically (tests pin it): fields parsed as strtod then cast
// (Python int(float(x))), missing rating -> 1.0, missing time -> 0.0,
// lines with <2 fields or an empty first field are skipped. Line i of the
// buffer writes row i; a validity mask lets the caller compact without
// any cross-thread coordination, preserving source order exactly.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread uirt_native.cpp -o libtfrec_uirt.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Find the next separator occurrence in [p, end); multi-char separators
// ("::") match exactly. Returns end if none.
inline const char* find_sep(const char* p, const char* end, const char* sep,
                            int sep_len) {
  if (sep_len == 1) {
    const char* q = (const char*)memchr(p, sep[0], end - p);
    return q ? q : end;
  }
  while (p + sep_len <= end) {
    const char* q = (const char*)memchr(p, sep[0], end - p - (sep_len - 1));
    if (!q) return end;
    if (memcmp(q, sep, sep_len) == 0) return q;
    p = q + 1;
  }
  return end;
}

inline bool field_empty(const char* b, const char* e) {
  while (b < e) {
    if (*b != ' ' && *b != '\t' && *b != '\r') return false;
    ++b;
  }
  return true;
}

// Parse one field [b, e) exactly the way Python float() does: the whole
// field must be one number (surrounding whitespace ok), nothing consumed
// from beyond the field (strtod itself is unbounded — an empty field
// would otherwise silently swallow the NEXT field or line), and no C-only
// hex-float syntax. Returns false on any malformed content.
inline bool parse_field(const char* b, const char* e, double* out) {
  char* end = nullptr;
  double v = strtod(b, &end);
  if (end <= b || end > e) return false;
  for (const char* p = b; p < end; ++p) {
    if (*p == 'x' || *p == 'X') return false;  // strtod hex; Python raises
  }
  while (end < e) {  // trailing garbage ("2x3") raises in Python
    if (*end != ' ' && *end != '\t' && *end != '\r') return false;
    ++end;
  }
  *out = v;
  return true;
}

// Python's int(float(x)) raises on nan/inf and numpy's int64 assignment
// raises OverflowError out of range; match by rejecting (code 2).
inline bool to_int64(double v, int64_t* out) {
  if (!(v >= -9223372036854775808.0 && v < 9223372036854775808.0)) {
    return false;  // also rejects NaN (comparisons are false)
  }
  *out = (int64_t)v;
  return true;
}

// Parse lines in [begin, end), whose first line has global index
// line_off, writing each line i to row i. Returns lines seen.
int64_t parse_range(const char* begin, const char* end, const char* sep,
                    int sep_len, int64_t line_off, int64_t max_rows,
                    int64_t* users, int64_t* items, float* ratings,
                    double* times, uint8_t* valid) {
  const char* p = begin;
  int64_t line = line_off;
  while (p < end && line < max_rows) {
    const char* nl = (const char*)memchr(p, '\n', end - p);
    const char* line_end = nl ? nl : end;
    // Split into at most 4 fields.
    const char* f[5];
    const char* fe[5];
    int nf = 0;
    const char* q = p;
    while (nf < 4 && q <= line_end) {
      const char* s = find_sep(q, line_end, sep, sep_len);
      f[nf] = q;
      fe[nf] = s;
      ++nf;
      if (s == line_end) break;
      q = s + sep_len;
    }
    // valid codes: 0 = skipped (Python's skip rule: <2 fields or empty
    // first field), 1 = parsed, 2 = malformed number where the Python
    // loader would RAISE — the bridge turns any 2 into a ValueError so
    // native stays exactly as loud as the Python path.
    valid[line] = 0;
    if (nf >= 2 && !field_empty(f[0], fe[0])) {
      double u = 0.0, iv = 0.0, rv = 0.0, tv = 0.0;
      int64_t ui = 0, ii = 0;
      bool ok = parse_field(f[0], fe[0], &u) && parse_field(f[1], fe[1], &iv)
                && to_int64(u, &ui) && to_int64(iv, &ii);
      float r = 1.0f;
      double t = 0.0;
      if (ok && nf >= 3 && !field_empty(f[2], fe[2])) {
        ok = parse_field(f[2], fe[2], &rv);
        if (ok) r = (float)rv;
      }
      if (ok && nf >= 4 && !field_empty(f[3], fe[3])) {
        ok = parse_field(f[3], fe[3], &tv);
        if (ok) t = tv;
      }
      if (ok) {
        users[line] = ui;
        items[line] = ii;
        ratings[line] = r;
        times[line] = t;
        valid[line] = 1;
      } else {
        valid[line] = 2;
      }
    }
    ++line;
    if (!nl) break;
    p = nl + 1;
  }
  return line - line_off;
}

int64_t count_lines(const char* p, const char* end) {
  int64_t n = 0;
  while (p < end) {
    const char* nl = (const char*)memchr(p, '\n', end - p);
    if (!nl) {
      ++n;  // trailing line without newline
      break;
    }
    ++n;
    p = nl + 1;
  }
  return n;
}

}  // namespace

extern "C" {

// Number of lines in the buffer (rows the caller must allocate).
int64_t tfrec_uirt_count(const char* buf, int64_t len) {
  return count_lines(buf, buf + len);
}

// Parse the buffer with n_threads, writing line i to row i and setting
// valid[i] for well-formed rows. Returns lines processed (== row count).
int64_t tfrec_uirt_parse(const char* buf, int64_t len, const char* sep,
                         int32_t sep_len, int64_t* users, int64_t* items,
                         float* ratings, double* times, uint8_t* valid,
                         int64_t max_rows, int32_t n_threads) {
  const char* end = buf + len;
  if (n_threads < 1) n_threads = 1;
  // Split at line boundaries into n_threads chunks; each chunk's global
  // starting line index is counted up front (cheap memchr scan).
  std::vector<const char*> starts;
  std::vector<int64_t> line_offs;
  starts.push_back(buf);
  line_offs.push_back(0);
  for (int t = 1; t < n_threads; ++t) {
    const char* target = buf + (len * t) / n_threads;
    if (target <= starts.back()) continue;
    const char* nl = (const char*)memchr(target, '\n', end - target);
    if (!nl) break;
    const char* s = nl + 1;
    if (s >= end) break;
    line_offs.push_back(line_offs.back() +
                        count_lines(starts.back(), s));
    starts.push_back(s);
  }
  starts.push_back(end);

  int64_t total = 0;
  std::vector<std::thread> threads;
  std::vector<int64_t> seen(starts.size() - 1, 0);
  for (size_t t = 0; t + 1 < starts.size(); ++t) {
    threads.emplace_back([&, t] {
      seen[t] = parse_range(starts[t], starts[t + 1], sep, sep_len,
                            line_offs[t], max_rows, users, items, ratings,
                            times, valid);
    });
  }
  for (auto& th : threads) th.join();
  for (int64_t s : seen) total += s;
  return total;
}

}  // extern "C"
