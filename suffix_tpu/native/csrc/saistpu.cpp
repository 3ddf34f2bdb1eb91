// Native host-side components: linear-time suffix array (SA-IS) and
// Kasai LCP over raw bytes.
//
// Role in the framework (SURVEY.md §2): a fast CPU oracle for conformance
// testing at corpus scale, and the single-core CPU baseline that the TPU
// engines are measured against. This is a from-scratch implementation of
// the SA-IS algorithm (Nong, Zhang & Chan, 2009) using the conventional
// explicit-sentinel formulation; the suffix array of a text is unique, so
// its output matches the reference crate (src/table.rs:388-574, which uses
// a sentinel-free variant) byte for byte.
//
// Build: g++ -O3 -march=native -shared -fPIC saistpu.cpp -o libsaistpu.so

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Generic SA-IS over an integer alphabet [0, sigma). The input sequence
// `s` must end with a unique smallest sentinel (value 0) at s[n-1].
// Writes the suffix array of s (including the sentinel suffix) to sa.
void sais_core(const std::vector<uint32_t>& s, uint32_t sigma,
               std::vector<uint32_t>& sa) {
  const size_t n = s.size();
  sa.assign(n, 0);
  if (n == 1) {
    sa[0] = 0;
    return;
  }

  // Types: true = S-type (suffix smaller than its right neighbor).
  std::vector<bool> is_s(n);
  is_s[n - 1] = true;
  for (size_t i = n - 1; i-- > 0;) {
    is_s[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && is_s[i + 1]);
  }
  auto is_lms = [&](size_t i) { return i > 0 && is_s[i] && !is_s[i - 1]; };

  std::vector<uint32_t> bucket(sigma, 0);
  for (size_t i = 0; i < n; i++) bucket[s[i]]++;

  std::vector<uint32_t> heads(sigma), tails(sigma);
  auto reset_ptrs = [&]() {
    uint32_t sum = 0;
    for (uint32_t c = 0; c < sigma; c++) {
      heads[c] = sum;
      sum += bucket[c];
      tails[c] = sum;  // exclusive end; insert with --tails[c]
    }
  };

  const uint32_t EMPTY = UINT32_MAX;

  // Induced sort: seed with the given LMS positions (in the order
  // provided, inserted from bucket tails), then induce L left-to-right
  // and S right-to-left.
  auto induce = [&](const std::vector<uint32_t>& lms_seed) {
    std::fill(sa.begin(), sa.end(), EMPTY);
    reset_ptrs();
    for (size_t j = lms_seed.size(); j-- > 0;) {
      uint32_t i = lms_seed[j];
      sa[--tails[s[i]]] = i;
    }
    for (size_t k = 0; k < n; k++) {
      uint32_t i = sa[k];
      if (i != EMPTY && i > 0 && !is_s[i - 1]) {
        sa[heads[s[i - 1]]++] = i - 1;
      }
    }
    reset_ptrs();
    for (size_t k = n; k-- > 0;) {
      uint32_t i = sa[k];
      if (i != EMPTY && i > 0 && is_s[i - 1]) {
        sa[--tails[s[i - 1]]] = i - 1;
      }
    }
  };

  // Pass 1: approximate — seed with LMS positions in text order.
  std::vector<uint32_t> lms;
  lms.reserve(n / 2);
  for (size_t i = 1; i < n; i++) {
    if (is_lms(i)) lms.push_back(static_cast<uint32_t>(i));
  }
  induce(lms);

  // Name LMS substrings in the sorted order they appear in sa.
  const size_t m = lms.size();
  if (m > 0) {
    std::vector<uint32_t> sorted_lms;
    sorted_lms.reserve(m);
    for (size_t k = 0; k < n; k++) {
      uint32_t i = sa[k];
      if (i != EMPTY && i > 0 && is_lms(i)) sorted_lms.push_back(i);
    }

    std::vector<uint32_t> name_of(n, EMPTY);
    uint32_t names = 0;
    uint32_t prev = EMPTY;
    for (uint32_t i : sorted_lms) {
      if (prev == EMPTY) {
        names = 1;
      } else {
        // Compare the two LMS substrings (inclusive of both endpoints).
        size_t a = prev, b = i;
        bool differ = false;
        while (true) {
          if (s[a] != s[b] || is_s[a] != is_s[b]) {
            differ = true;
            break;
          }
          a++;
          b++;
          bool a_end = is_lms(a), b_end = is_lms(b);
          if (a_end || b_end) {
            differ = !(a_end && b_end);
            break;
          }
        }
        if (differ) names++;
      }
      name_of[i] = names - 1;
      prev = i;
    }

    if (names < m) {
      // Recurse on the reduced string of LMS names (text order), with
      // its own appended sentinel? Not needed: the final LMS position is
      // the sentinel itself (smallest, unique), acting as the sentinel
      // of the reduced problem.
      std::vector<uint32_t> reduced;
      reduced.reserve(m);
      for (uint32_t i : lms) reduced.push_back(name_of[i]);
      std::vector<uint32_t> sub_sa;
      sais_core(reduced, names, sub_sa);
      std::vector<uint32_t> ordered(m);
      for (size_t k = 0; k < m; k++) ordered[k] = lms[sub_sa[k]];
      induce(ordered);
    } else {
      induce(sorted_lms);
    }
  }
}

}  // namespace

extern "C" {

// Suffix array of `text` (byte-lexicographic, NO sentinel in the output).
// Returns 0 on success.
int stpu_sais_u8(const uint8_t* text, uint32_t n, uint32_t* out_sa) {
  if (n == 0) return 0;
  std::vector<uint32_t> s(static_cast<size_t>(n) + 1);
  for (uint32_t i = 0; i < n; i++) s[i] = static_cast<uint32_t>(text[i]) + 1;
  s[n] = 0;  // sentinel, strictly smallest
  std::vector<uint32_t> sa;
  sais_core(s, 257, sa);
  // sa[0] is the sentinel suffix; drop it.
  std::memcpy(out_sa, sa.data() + 1, sizeof(uint32_t) * n);
  return 0;
}

// Kasai LCP: lcp[0] = 0, lcp[r] = lcp_len(suffix[sa[r-1]], suffix[sa[r]]).
void stpu_kasai_u8(const uint8_t* text, const uint32_t* sa, uint32_t n,
                   uint32_t* out_lcp) {
  if (n == 0) return;
  std::vector<uint32_t> rank(n);
  for (uint32_t r = 0; r < n; r++) rank[sa[r]] = r;
  uint32_t h = 0;
  for (uint32_t i = 0; i < n; i++) {
    uint32_t r = rank[i];
    if (r == 0) {
      h = 0;
      out_lcp[0] = 0;
      continue;
    }
    uint32_t j = sa[r - 1];
    while (i + h < n && j + h < n && text[i + h] == text[j + h]) h++;
    out_lcp[r] = h;
    if (h > 0) h--;
  }
}

// Batched binary-search queries: for each query, find (start, count) rank
// bounds in the suffix array — the CPU reference path for the batched
// device query engine (same semantics as src/table.rs:223-259).
void stpu_bounds_batch(const uint8_t* text, uint32_t n, const uint32_t* sa,
                       const uint8_t* queries, const uint32_t* q_offsets,
                       uint32_t n_queries, uint32_t* out_start,
                       uint32_t* out_count) {
  for (uint32_t q = 0; q < n_queries; q++) {
    const uint8_t* qs = queries + q_offsets[q];
    const uint32_t qlen = q_offsets[q + 1] - q_offsets[q];
    if (qlen == 0 || n == 0) {
      out_start[q] = 0;
      out_count[q] = 0;
      continue;
    }
    // Lower bound: first rank with suffix >= query (full comparison).
    uint32_t lo = 0, hi = n;
    while (lo < hi) {
      uint32_t mid = lo + (hi - lo) / 2;
      const uint8_t* suf = text + sa[mid];
      uint32_t avail = n - sa[mid];
      uint32_t cmp_len = avail < qlen ? avail : qlen;
      int c = std::memcmp(suf, qs, cmp_len);
      bool suffix_lt = c < 0 || (c == 0 && avail < qlen);
      if (suffix_lt) {
        lo = mid + 1;
      } else {
        hi = mid;
      }
    }
    uint32_t start = lo;
    // Upper bound: first rank >= start whose suffix does not start with
    // the query.
    hi = n;
    while (lo < hi) {
      uint32_t mid = lo + (hi - lo) / 2;
      const uint8_t* suf = text + sa[mid];
      uint32_t avail = n - sa[mid];
      bool starts_with =
          avail >= qlen && std::memcmp(suf, qs, qlen) == 0;
      if (starts_with) {
        lo = mid + 1;
      } else {
        hi = mid;
      }
    }
    out_start[q] = start;
    out_count[q] = lo - start;
  }
}

// Single-query fast path: identical semantics to stpu_bounds_batch with
// one query, but a flat signature so the Python side can call it with
// cached ctypes arguments and no per-call array marshalling.
// out[0] = start, out[1] = count.
void stpu_bounds_one(const uint8_t* text, uint32_t n, const uint32_t* sa,
                     const uint8_t* q, uint32_t qlen, uint32_t* out) {
  uint32_t offsets[2] = {0, qlen};
  stpu_bounds_batch(text, n, sa, q, offsets, 1, out, out + 1);
}

}  // extern "C"
