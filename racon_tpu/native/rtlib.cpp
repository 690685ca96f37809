// rtlib: native host runtime for racon_tpu.
//
// Provides the CPU-side hot paths of the framework:
//   * batched unit-cost global alignment (CIGAR production for overlaps that
//     arrive without one) — the role edlib plays in the reference
//     (reference: src/overlap.cpp:205-224),
//   * Myers bit-parallel edit distance (test scoring, reference:
//     test/racon_test.cpp:14-23),
//   * breaking-point extraction from CIGARs (reference: src/overlap.cpp:226-292),
//   * a scalar POA consensus oracle with the exact racon_tpu POA semantics
//     (mirrors racon_tpu/poa/graph.py) — used as the CPU fallback engine and
//     as the throughput baseline the TPU engine is measured against.
//
// Exposed through a plain C ABI consumed with ctypes (no pybind11 in the
// toolchain).  Build: racon_tpu/native/build.py.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ------------------------------------------------------------------------ //
// unit-cost O(ND) global alignment with traceback
// ------------------------------------------------------------------------ //

constexpr int32_t kInvalid = INT32_MIN / 2;

// Landau-Vishkin / edit-distance WFA: f(d, k) = furthest query index x on
// diagonal k = x - y after exactly d edits, then greedy snake.  CIGAR uses
// 'M' for match+substitution (edlib standard convention).
// Traceback tie order: substitution, deletion, insertion — must match
// racon_tpu/align/aligner.py:align_ond_py.
std::string align_ond(const uint8_t* q, int64_t n, const uint8_t* t, int64_t m) {
  if (n == 0) {
    return m ? std::to_string(m) + "D" : std::string();
  }
  if (m == 0) {
    return std::to_string(n) + "I";
  }

  const int64_t final_k = n - m;
  // wavefronts; wf[d] has 2d+1 entries for k in [-d, d]
  std::vector<std::vector<int32_t>> wf;

  auto snake = [&](int64_t x, int64_t y) -> int64_t {
    const int64_t lim = std::min(n - x, m - y);
    int64_t s = 0;
    while (s < lim && q[x + s] == t[y + s]) ++s;
    return x + s;
  };

  {
    std::vector<int32_t> w0(1);
    w0[0] = static_cast<int32_t>(snake(0, 0));
    wf.push_back(std::move(w0));
  }

  int64_t d = 0;
  while (true) {
    const std::vector<int32_t>& v = wf[d];
    if (std::abs(final_k) <= d) {
      int32_t x = v[final_k + d];
      if (x >= n) break;
    }
    ++d;
    std::vector<int32_t> nv(2 * d + 1, kInvalid);
    for (int64_t k = -d; k <= d; ++k) {
      int32_t x = kInvalid;
      // substitution from diagonal k
      if (k >= -(d - 1) && k <= d - 1 && v[k + d - 1] != kInvalid) {
        x = v[k + d - 1] + 1;
      }
      // deletion (consume target) from diagonal k+1
      if (k + 1 >= -(d - 1) && k + 1 <= d - 1 && v[k + 1 + d - 1] != kInvalid) {
        x = std::max(x, v[k + 1 + d - 1]);
      }
      // insertion (consume query) from diagonal k-1
      if (k - 1 >= -(d - 1) && k - 1 <= d - 1 && v[k - 1 + d - 1] != kInvalid) {
        x = std::max(x, v[k - 1 + d - 1] + 1);
      }
      if (x == kInvalid) continue;
      int64_t y = static_cast<int64_t>(x) - k;
      if (x > n || y > m || y < 0) continue;
      nv[k + d] = static_cast<int32_t>(snake(x, y));
    }
    wf.push_back(std::move(nv));
  }

  // traceback
  std::string ops;  // reversed op chars, one per base
  ops.reserve(n + m);
  int64_t x = n, k = final_k;
  for (; d > 0; --d) {
    const std::vector<int32_t>& pv = wf[d - 1];
    auto cand = [&](int64_t kk, int32_t bump) -> int32_t {
      if (kk < -(d - 1) || kk > d - 1 || pv[kk + d - 1] == kInvalid) {
        return kInvalid;
      }
      int32_t c = pv[kk + d - 1] + bump;
      int64_t y = static_cast<int64_t>(c) - k;
      if (c < 0 || c > n || y < 0 || y > m) return kInvalid;
      return c;
    };
    const int32_t c_sub = cand(k, 1);
    const int32_t c_del = cand(k + 1, 0);
    const int32_t c_ins = cand(k - 1, 1);
    const int32_t px = std::max(c_sub, std::max(c_del, c_ins));
    ops.append(static_cast<size_t>(x - px), 'M');  // snake
    if (px == c_sub) {
      ops.push_back('M');
      x = px - 1;
    } else if (px == c_del) {
      ops.push_back('D');
      x = px;
      k = k + 1;
    } else {
      ops.push_back('I');
      x = px - 1;
      k = k - 1;
    }
  }
  ops.append(static_cast<size_t>(x), 'M');

  // reverse + run-length encode
  std::string cigar;
  cigar.reserve(64);
  int64_t i = static_cast<int64_t>(ops.size()) - 1;
  while (i >= 0) {
    const char op = ops[i];
    int64_t j = i;
    while (j >= 0 && ops[j] == op) --j;
    cigar += std::to_string(i - j);
    cigar.push_back(op);
    i = j;
  }
  return cigar;
}

// ------------------------------------------------------------------------ //
// Myers bit-parallel edit distance (banded blocks not needed: full vectors)
// ------------------------------------------------------------------------ //

int64_t myers_edit_distance(const uint8_t* q, int64_t n, const uint8_t* t,
                            int64_t m) {
  if (n == 0) return m;
  if (m == 0) return n;

  const int64_t W = 64;
  const int64_t blocks = (n + W - 1) / W;
  std::vector<uint64_t> peq(256 * blocks, 0);
  for (int64_t i = 0; i < n; ++i) {
    peq[q[i] * blocks + i / W] |= 1ULL << (i % W);
  }
  std::vector<uint64_t> pv(blocks, ~0ULL), mv(blocks, 0);
  const uint64_t last_mask = 1ULL << ((n - 1) % W);
  int64_t score = n;

  // Hyyrö block algorithm: ternary horizontal delta (hin/hout) chains the
  // 64-row blocks of each column.
  for (int64_t j = 0; j < m; ++j) {
    const uint64_t* eqs = &peq[t[j] * blocks];
    int hin = 1;  // NW boundary: top row delta is +1 per column
    for (int64_t b = 0; b < blocks; ++b) {
      uint64_t eq = eqs[b];
      const uint64_t pvb = pv[b], mvb = mv[b];
      const uint64_t xv = eq | mvb;
      if (hin < 0) eq |= 1;
      const uint64_t xh = (((eq & pvb) + pvb) ^ pvb) | eq;
      uint64_t ph = mvb | ~(xh | pvb);
      uint64_t mh = pvb & xh;
      if (b == blocks - 1) {
        if (ph & last_mask) ++score;
        if (mh & last_mask) --score;
      }
      const int hout = (ph >> 63) ? 1 : ((mh >> 63) ? -1 : 0);
      ph <<= 1;
      mh <<= 1;
      if (hin < 0) {
        mh |= 1;
      } else if (hin > 0) {
        ph |= 1;
      }
      pv[b] = mh | ~(xv | ph);
      mv[b] = ph & xv;
      hin = hout;
    }
  }
  return score;
}

// ------------------------------------------------------------------------ //
// batch runner
// ------------------------------------------------------------------------ //

struct BatchResult {
  std::vector<std::string> items;
};

}  // namespace

extern "C" {

// Align a batch of (query, target) pairs; returns an opaque result handle.
void* rt_align_batch(const uint8_t* qbuf, const int64_t* qoff,
                     const uint8_t* tbuf, const int64_t* toff, int64_t n,
                     int nthreads) {
  auto* result = new BatchResult();
  result->items.resize(n);
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) break;
      result->items[i] =
          align_ond(qbuf + qoff[i], qoff[i + 1] - qoff[i],
                    tbuf + toff[i], toff[i + 1] - toff[i]);
    }
  };
  if (nthreads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int i = 0; i < nthreads; ++i) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  return result;
}

int64_t rt_result_len(void* handle, int64_t i) {
  return static_cast<BatchResult*>(handle)->items[i].size();
}

void rt_result_get(void* handle, int64_t i, char* out) {
  const std::string& s = static_cast<BatchResult*>(handle)->items[i];
  std::memcpy(out, s.data(), s.size());
}

void rt_result_free(void* handle) {
  delete static_cast<BatchResult*>(handle);
}

int64_t rt_edit_distance(const uint8_t* q, int64_t n, const uint8_t* t,
                         int64_t m) {
  return myers_edit_distance(q, n, t, m);
}

}  // extern "C"
