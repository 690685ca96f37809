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

#include <zlib.h>

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
    // word-at-a-time match extension
    while (s + 8 <= lim) {
      uint64_t a, b;
      std::memcpy(&a, q + x + s, 8);
      std::memcpy(&b, t + y + s, 8);
      const uint64_t diff = a ^ b;
      if (diff) {
        s += __builtin_ctzll(diff) >> 3;
        return x + s;
      }
      s += 8;
    }
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
// Banded Myers/Hyyrö bit-parallel NW alignment with traceback.
//
// The edlib-class CIGAR producer (reference: src/overlap.cpp:205-224 uses
// edlibAlign NW+PATH): unit costs, Ukkonen band with doubling — the banded
// result is provably exact whenever the returned distance fits the band —
// and a traceback over stored per-column block vectors.  ~20-50x faster
// than the O(ND) wavefront on long noisy overlaps because the per-column
// work is (band/64) word operations.
//
// Traceback move preference is configurable ("order"): a permutation of
// {up, left, diag} tried in sequence; the first whose score equation holds
// is taken.  Order 0 (diag, up, left — match/mismatch first) is the
// default, calibrated against the reference's golden edit distances.
// ------------------------------------------------------------------------ //

struct MyersStore {
  // per computed (column, block): Pv, Mv, and the score at the block's
  // last valid row (bit min(63, (n-1)%64) for the final block)
  std::vector<uint64_t> pv, mv;
  std::vector<int32_t> bs;
  std::vector<int64_t> off;    // per column: offset of block fb
  std::vector<int32_t> fb, lb; // per column: computed block range
};

// One banded pass.  Returns the exact NW distance if it is <= k, otherwise
// any value > k.  Fills `st` for the traceback.
static int64_t myers_banded_pass(const uint8_t* q, int64_t n,
                                 const uint8_t* t, int64_t m, int64_t k,
                                 MyersStore* st) {
  const int64_t W = 64;
  const int64_t B = (n + W - 1) / W;
  const int64_t D = n - m;
  const int64_t absD = D < 0 ? -D : D;
  if (k < absD) return k + 1;
  const int64_t slack = (k - absD) / 2;
  const int64_t lo_d = (D < 0 ? D : 0) - slack;   // i - j in [lo_d, hi_d]
  const int64_t hi_d = (D > 0 ? D : 0) + slack;

  std::vector<uint64_t> peq(256 * B, 0);
  for (int64_t i = 0; i < n; ++i) {
    peq[q[i] * B + i / W] |= 1ULL << (i % W);
  }
  std::vector<uint64_t> pv(B), mv(B);
  std::vector<int64_t> bot(B);     // score at each block's last valid row
  const int64_t bn = (n - 1) / W;  // block containing the last row
  const uint64_t last_mask = 1ULL << ((n - 1) % W);

  auto rows_of = [&](int64_t b) {
    return b == bn ? (n - b * W) : W;
  };

  // column 0: H[i][0] = i
  auto band_lo = [&](int64_t j) { return std::max<int64_t>(1, j + lo_d); };
  auto band_hi = [&](int64_t j) { return std::min<int64_t>(n, j + hi_d); };
  if (band_lo(0) > band_hi(0) && n > 0) {
    // row range empty at column 0 can only happen when lo_d > n; infeasible
    return k + 1;
  }
  int64_t fb = (band_lo(0) - 1) / W, lb = (band_hi(0) - 1) / W;
  for (int64_t b = fb; b <= lb; ++b) {
    pv[b] = ~0ULL;
    mv[b] = 0;
    bot[b] = b * W + rows_of(b);
  }

  if (st != nullptr) {
    st->off.assign(m + 1, 0);
    st->fb.assign(m + 1, 0);
    st->lb.assign(m + 1, -1);
    st->pv.clear();
    st->mv.clear();
    st->bs.clear();
    st->pv.reserve((lb - fb + 2) * (m + 1));
  }

  for (int64_t j = 1; j <= m; ++j) {
    const int64_t rlo = band_lo(j), rhi = band_hi(j);
    if (rlo > rhi) return k + 1;
    const int64_t nfb = (rlo - 1) / W, nlb = (rhi - 1) / W;
    // activate at most one new block at the bottom (band moves by <= 1/col)
    for (int64_t b = lb + 1; b <= nlb; ++b) {
      pv[b] = ~0ULL;
      mv[b] = 0;
      bot[b] = bot[b - 1] + rows_of(b);
    }
    fb = nfb;
    lb = nlb;

    const uint64_t* eqs = &peq[t[j - 1] * B];
    // hin entering the first computed block: +1 is the exact NW boundary
    // when fb == 0 and a sound upper bound when the band has left rows
    // above fb (those rows cannot lie on a path with distance <= k)
    int hin = 1;
    for (int64_t b = fb; b <= lb; ++b) {
      uint64_t eq = eqs[b];
      const uint64_t pvb = pv[b], mvb = mv[b];
      const uint64_t xv = eq | mvb;
      if (hin < 0) eq |= 1;
      const uint64_t xh = (((eq & pvb) + pvb) ^ pvb) | eq;
      uint64_t ph = mvb | ~(xh | pvb);
      uint64_t mh = pvb & xh;
      const uint64_t track = (b == bn) ? last_mask : (1ULL << 63);
      if (ph & track) ++bot[b];
      if (mh & track) --bot[b];
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

    if (st != nullptr) {
      st->off[j] = static_cast<int64_t>(st->pv.size()) - fb;
      st->fb[j] = static_cast<int32_t>(fb);
      st->lb[j] = static_cast<int32_t>(lb);
      for (int64_t b = fb; b <= lb; ++b) {
        st->pv.push_back(pv[b]);
        st->mv.push_back(mv[b]);
        st->bs.push_back(static_cast<int32_t>(bot[b]));
      }
    }
  }
  if (bn < fb || bn > lb) return k + 1;
  return bot[bn];
}

// Score at DP row r (0..n) in stored column j (1..m); kBig when the row's
// block was not computed in that column.
static int64_t myers_score_at(const MyersStore& st, int64_t n, int64_t r,
                              int64_t j) {
  static constexpr int64_t kBig = 1LL << 40;
  if (j == 0) return r;
  if (r == 0) return j;
  const int64_t W = 64;
  const int64_t bit = r - 1;          // DP row r lives at bit r-1
  const int64_t b = bit / W;
  if (b < st.fb[j] || b > st.lb[j]) return kBig;
  const int64_t idx = st.off[j] + b;
  const uint64_t pv = st.pv[idx], mv = st.mv[idx];
  const int64_t bn = (n - 1) / W;
  const int64_t top_bit = bit % W;
  const int64_t score_bit = (b == bn) ? (n - 1) % W : W - 1;
  // bs = H at DP row (b*64 + score_bit + 1); walk up to row r by
  // subtracting the vertical deltas of bits (top_bit, score_bit]
  if (top_bit > score_bit) return kBig;  // beyond the last valid row
  const uint64_t hi = (score_bit == 63) ? ~0ULL
                                        : ((1ULL << (score_bit + 1)) - 1);
  const uint64_t mask = hi & ~((top_bit == 63) ? ~0ULL
                                               : ((2ULL << top_bit) - 1));
  const int64_t delta = __builtin_popcountll(pv & mask) -
                        __builtin_popcountll(mv & mask);
  return st.bs[idx] - delta;
}

// Vertical delta H[r][j] - H[r-1][j] for stored column j; +2 (impossible)
// when unavailable.
static int myers_vdelta(const MyersStore& st, int64_t n, int64_t r,
                        int64_t j) {
  if (j == 0) return 1;
  const int64_t W = 64;
  const int64_t bit = r - 1;
  const int64_t b = bit / W;
  if (b < st.fb[j] || b > st.lb[j]) return 2;
  const int64_t idx = st.off[j] + b;
  if (st.pv[idx] >> (bit % W) & 1) return 1;
  if (st.mv[idx] >> (bit % W) & 1) return -1;
  return 0;
}

// Global banded Myers alignment with traceback.  order: permutation index
// 0..5 over (diag, up, left) move preference.
std::string myers_align(const uint8_t* q, int64_t n, const uint8_t* t,
                        int64_t m, int order) {
  if (n == 0) return m ? std::to_string(m) + "D" : std::string();
  if (m == 0) return std::to_string(n) + "I";

  static const int kPerm[6][3] = {
      // 0 = diag, 1 = up ('I'), 2 = left ('D')
      {0, 1, 2}, {0, 2, 1}, {1, 0, 2}, {1, 2, 0}, {2, 0, 1}, {2, 1, 0}};
  const int* perm = kPerm[order % 6];

  MyersStore st;
  const int64_t absD = n > m ? n - m : m - n;
  int64_t k = absD + 128;
  int64_t dist;
  // probe passes are score-only (no traceback store — that's pure memory
  // churn for bands that will be re-run anyway)
  while (true) {
    dist = myers_banded_pass(q, n, t, m, k, nullptr);
    if (dist <= k) break;
    if (k >= n + m) break;  // full width: result is exact by construction
    k = std::min<int64_t>(k * 2, n + m);
  }
  // Traceback exactness: the tie checks below query neighbours of path
  // cells, whose true scores are <= dist + 1.  Every such cell is computed
  // EXACTLY (not band-edge overestimated) iff the band slack is >= dist + 1,
  // i.e. k >= absD + 2*(dist + 1).  The single store pass runs at that
  // width, so the greedy traceback is band-independent — the same path
  // edlib's full-matrix traceback takes (its backward move priority is
  // up, left, diagonal = order 3 here; reference call site
  // src/overlap.cpp:205-224 uses edlibAlign NW+PATH).
  k = std::min<int64_t>(absD + 2 * (dist + 1), n + m);
  dist = myers_banded_pass(q, n, t, m, k, &st);

  // traceback from H[n][m]
  std::string ops;
  ops.reserve(n + m);
  int64_t r = n, c = m, score = dist;
  while (r > 0 || c > 0) {
    bool moved = false;
    for (int pi = 0; pi < 3 && !moved; ++pi) {
      const int mv = perm[pi];
      if (mv == 0 && r > 0 && c > 0) {
        const int64_t cost = (q[r - 1] == t[c - 1]) ? 0 : 1;
        if (myers_score_at(st, n, r - 1, c - 1) == score - cost) {
          ops.push_back('M');
          --r;
          --c;
          score -= cost;
          moved = true;
        }
      } else if (mv == 1 && r > 0) {
        const int vd = myers_vdelta(st, n, r, c);
        if (vd == 1) {
          ops.push_back('I');
          --r;
          --score;
          moved = true;
        }
      } else if (mv == 2 && c > 0) {
        if (myers_score_at(st, n, r, c - 1) == score - 1) {
          ops.push_back('D');
          --c;
          --score;
          moved = true;
        }
      }
    }
    if (!moved) {
      // numerically impossible for a consistent DP; fail loudly in debug,
      // degrade to the O(ND) aligner in release
      return align_ond(q, n, t, m);
    }
  }

  // reverse + run-length encode
  std::string cigar;
  cigar.reserve(64);
  int64_t i = static_cast<int64_t>(ops.size()) - 1;
  while (i >= 0) {
    const char op = ops[i];
    int64_t j2 = i;
    while (j2 >= 0 && ops[j2] == op) --j2;
    cigar += std::to_string(i - j2);
    cigar.push_back(op);
    i = j2;
  }
  return cigar;
}

// ------------------------------------------------------------------------ //
// batch runner
// ------------------------------------------------------------------------ //

struct BatchResult {
  std::vector<std::string> items;
  std::vector<uint8_t> flags;
};

// ------------------------------------------------------------------------ //
// POA consensus oracle — exact C++ mirror of racon_tpu/poa/graph.py.
// Same integer column keys, node numbering, tie rules, and consensus
// traversal as the Python oracle and the batched JAX engine, so all three
// implementations are bit-identical.
// ------------------------------------------------------------------------ //

constexpr int64_t kKeyScale = 1 << 16;

// RT_TOPO_MODE=1 ranks nodes with spoa's exact DFS topological sort
// (divergence experiment) instead of the incremental column-key order.
static int rt_topo_mode() {
  static const int m = [] {
    const char* e = getenv("RT_TOPO_MODE");
    return e ? atoi(e) : 0;
  }();
  return m;
}

struct PoaGraph {
  std::vector<int8_t> codes;
  std::vector<std::vector<int32_t>> preds;
  std::vector<std::vector<int64_t>> pred_w;
  std::vector<std::vector<int32_t>> succs;
  std::vector<int32_t> cov;
  std::vector<int32_t> col;                     // node -> column id
  std::vector<int64_t> col_key;                 // column id -> key (or -1)
  std::vector<std::vector<int32_t>> col_members;
  std::vector<std::vector<int32_t>> aligned;    // spoa per-node aligned lists
  int64_t n_cols = 0;
  std::vector<int32_t> order;                   // rank -> node
  std::vector<int32_t> rank;                    // node -> rank

  int32_t add_node(int8_t code, int64_t key) {
    int32_t id = static_cast<int32_t>(codes.size());
    codes.push_back(code);
    preds.emplace_back();
    pred_w.emplace_back();
    succs.emplace_back();
    cov.push_back(0);
    col.push_back(id);
    col_key.push_back(key);
    col_members.push_back({id});
    aligned.emplace_back();
    return id;
  }

  // spoa 4.0.8 Graph::TopologicalSort: DFS over node ids with in-edge
  // dependencies; aligned-node groups are pulled together and emitted
  // contiguously as [first-reached member, its aligned list].  Inserted
  // runs land just before their first demander (hi anchor) rather than
  // at interpolated positions — the residual rank-order difference vs
  // the column-key scheme.
  void spoa_topo_sort() {
    const int32_t n = static_cast<int32_t>(codes.size());
    order.clear();
    std::vector<uint8_t> marks(n, 0);
    std::vector<uint8_t> check(n, 1);
    std::vector<int32_t> stack;
    for (int32_t s = 0; s < n; ++s) {
      if (marks[s]) continue;
      stack.push_back(s);
      while (!stack.empty()) {
        const int32_t v = stack.back();
        bool valid = true;
        if (marks[v] != 2) {
          for (int32_t p : preds[v]) {
            if (marks[p] != 2) {
              stack.push_back(p);
              valid = false;
            }
          }
          if (check[v]) {
            for (int32_t a : aligned[v]) {
              if (marks[a] != 2) {
                stack.push_back(a);
                check[a] = 0;
                valid = false;
              }
            }
          }
          if (valid) {
            marks[v] = 2;
            if (check[v]) {
              order.push_back(v);
              for (int32_t a : aligned[v]) order.push_back(a);
            }
          }
        }
        if (valid) stack.pop_back();
      }
    }
    rank.assign(n, 0);
    for (int32_t r = 0; r < n; ++r) rank[order[r]] = r;
  }

  void add_edge(int32_t tail, int32_t head, int64_t weight) {
    auto& p = preds[head];
    for (size_t k = 0; k < p.size(); ++k) {
      if (p[k] == tail) {
        pred_w[head][k] += weight;
        return;
      }
    }
    p.push_back(tail);
    pred_w[head].push_back(weight);
    succs[tail].push_back(head);
  }

  void rebuild_ranks() {
    // sort columns by (key, col_id); emit members in insertion order
    std::vector<int32_t> cols;
    for (int32_t c = 0; c < static_cast<int32_t>(col_key.size()); ++c) {
      if (col[c] == c) cols.push_back(c);  // node is its own column rep
    }
    std::sort(cols.begin(), cols.end(), [&](int32_t a, int32_t b) {
      return col_key[a] != col_key[b] ? col_key[a] < col_key[b] : a < b;
    });
    order.clear();
    int64_t new_key = 0;
    for (int32_t c : cols) {
      col_key[c] = new_key++ * kKeyScale;
      for (int32_t m : col_members[c]) order.push_back(m);
    }
    n_cols = new_key;
    rank.assign(codes.size(), 0);
    for (int32_t r = 0; r < static_cast<int32_t>(order.size()); ++r) {
      rank[order[r]] = r;
    }
    if (rt_topo_mode() == 1) spoa_topo_sort();  // keys stay as anchors only
  }

  int64_t node_key(int32_t nid) const { return col_key[col[nid]]; }

  // NW-on-DAG alignment; returns (node_id, seq_pos) pairs, -1 for gaps.
  // Mirrors POAGraph.align (graph.py).
  void align(const int8_t* seq, int64_t L, int32_t m, int32_t x, int32_t g,
             int32_t begin_node, int32_t end_node,
             std::vector<std::pair<int32_t, int32_t>>* out) const {
    out->clear();
    const int64_t n = codes.size();
    int64_t rb = 0, re = n - 1;
    if (begin_node >= 0) {
      rb = rank[begin_node];
      re = rank[end_node];
      if (rb > re) std::swap(rb, re);
    }
    const int32_t NEG = INT32_MIN / 2;

    std::vector<uint8_t> in_range(n, 0);
    for (int64_t r = rb; r <= re; ++r) in_range[order[r]] = 1;

    std::vector<int32_t> jgap(L + 1);
    for (int64_t j = 0; j <= L; ++j) jgap[j] = static_cast<int32_t>(g * j);

    std::vector<std::vector<int32_t>> H(n);
    std::vector<uint8_t> has_succ(n, 0);
    std::vector<std::vector<int32_t>> preds_in(n);

    for (int64_t r = rb; r <= re; ++r) {
      const int32_t v = order[r];
      auto& pin = preds_in[v];
      for (int32_t p : preds[v]) {
        if (in_range[p]) pin.push_back(p);
      }
      std::vector<int32_t> row(L + 1, NEG);
      auto fold = [&](const std::vector<int32_t>& hp) {
        const int8_t cv = codes[v];
        for (int64_t j = 1; j <= L; ++j) {
          const int32_t prof = (seq[j - 1] == cv) ? m : x;
          const int32_t diag = hp[j - 1] + prof;
          if (diag > row[j]) row[j] = diag;
        }
        for (int64_t j = 0; j <= L; ++j) {
          const int32_t vert = hp[j] + g;
          if (vert > row[j]) row[j] = vert;
        }
      };
      if (pin.empty()) {
        fold(jgap);
      } else {
        for (int32_t p : pin) fold(H[p]);
      }
      // horizontal closure: prefix max of (row - j*g) + j*g
      int32_t best = row[0];
      for (int64_t j = 1; j <= L; ++j) {
        const int32_t c = row[j] - jgap[j];
        if (c > best) best = c;
        row[j] = best + jgap[j];
      }
      H[v] = std::move(row);
      for (int32_t p : pin) has_succ[p] = 1;
    }

    int32_t best_v = -1;
    int32_t best_score = NEG;
    for (int64_t r = rb; r <= re; ++r) {
      const int32_t v = order[r];
      if (has_succ[v]) continue;
      if (H[v][L] > best_score) {
        best_score = H[v][L];
        best_v = v;
      }
    }

    // traceback: diag (preds in order), then vert, then horiz
    int32_t v = best_v;
    int64_t j = L;
    bool at_virtual = false;
    while (!at_virtual || j > 0) {
      if (at_virtual) {
        out->emplace_back(-1, static_cast<int32_t>(j - 1));
        --j;
        continue;
      }
      const auto& pin = preds_in[v];
      bool moved = false;
      if (j > 0) {
        const int32_t prof = (seq[j - 1] == codes[v]) ? m : x;
        if (pin.empty()) {
          if (H[v][j] == jgap[j - 1] + prof) {
            out->emplace_back(v, static_cast<int32_t>(j - 1));
            --j;
            at_virtual = true;
            moved = true;
          }
        } else {
          for (int32_t p : pin) {
            if (H[v][j] == H[p][j - 1] + prof) {
              out->emplace_back(v, static_cast<int32_t>(j - 1));
              --j;
              v = p;
              moved = true;
              break;
            }
          }
        }
      }
      if (moved) continue;
      if (pin.empty()) {
        if (H[v][j] == jgap[j] + g) {
          out->emplace_back(v, -1);
          at_virtual = true;
          if (j == 0) break;
          continue;
        }
      } else {
        for (int32_t p : pin) {
          if (H[v][j] == H[p][j] + g) {
            out->emplace_back(v, -1);
            v = p;
            moved = true;
            break;
          }
        }
        if (moved) continue;
      }
      if (j > 0 && H[v][j] == H[v][j - 1] + g) {
        out->emplace_back(-1, static_cast<int32_t>(j - 1));
        --j;
        continue;
      }
      fprintf(stderr, "[rtlib::PoaGraph::align] traceback failed\n");
      std::abort();
    }
    std::reverse(out->begin(), out->end());
  }

  // Mirrors POAGraph.add_alignment (graph.py): single-pass node numbering,
  // integer key interpolation, edge weights w[i-1]+w[i], coverage +1.
  void add_alignment(const std::vector<std::pair<int32_t, int32_t>>& alignment,
                     const int8_t* seq, int64_t n, const int32_t* weights) {
    if (n == 0) return;

    std::vector<std::pair<int32_t, int32_t>> consumed;  // (pos, node)
    if (!alignment.empty()) {
      int32_t first = INT32_MAX, last = -1;
      for (const auto& a : alignment) {
        if (a.second != -1) {
          first = std::min(first, a.second);
          last = std::max(last, a.second);
        }
      }
      for (int32_t p = 0; p < first; ++p) consumed.emplace_back(p, -1);
      for (const auto& a : alignment) {
        if (a.second != -1) consumed.emplace_back(a.second, a.first);
      }
      for (int32_t p = last + 1; p < n; ++p) consumed.emplace_back(p, -1);
    } else {
      for (int32_t p = 0; p < n; ++p) consumed.emplace_back(p, -1);
    }

    const int64_t hi_sentinel = (n_cols + 1) * kKeyScale;
    const int64_t lo_sentinel = -kKeyScale;
    const size_t T = consumed.size();
    std::vector<int64_t> anchor_keys(T, -1);
    std::vector<uint8_t> is_anchor(T, 0);
    for (size_t i = 0; i < T; ++i) {
      if (consumed[i].second != -1) {
        anchor_keys[i] = node_key(consumed[i].second);
        is_anchor[i] = 1;
      }
    }

    std::vector<int32_t> resolved(T, -1);
    int64_t run_lo = 0, run_hi = 0, run_k = 0, run_m = 0;
    for (size_t i = 0; i < T; ++i) {
      const int32_t p = consumed[i].first;
      const int32_t nid = consumed[i].second;
      const int8_t letter = seq[p];
      if (nid != -1) {
        if (codes[nid] == letter) {
          resolved[i] = nid;
          continue;
        }
        const int32_t c = col[nid];
        int32_t found = -1;
        for (int32_t mem : col_members[c]) {
          if (codes[mem] == letter) {
            found = mem;
            break;
          }
        }
        if (found != -1) {
          resolved[i] = found;
        } else {
          const int32_t new_id = add_node(letter, 0);
          col_key[new_id] = -1;
          col_members[new_id].clear();
          col[new_id] = c;
          col_members[c].push_back(new_id);
          // spoa aligned-list update rule (Graph::AddAlignment): the
          // anchor is the MATCHED node nid, its aligned list first, the
          // anchor itself last
          for (int32_t a : aligned[nid]) {
            aligned[a].push_back(new_id);
            aligned[new_id].push_back(a);
          }
          aligned[nid].push_back(new_id);
          aligned[new_id].push_back(nid);
          resolved[i] = new_id;
        }
      } else {
        if (i == 0 || is_anchor[i - 1]) {
          size_t jj = i;
          while (jj < T && !is_anchor[jj]) ++jj;
          run_lo = (i > 0) ? anchor_keys[i - 1] : lo_sentinel;
          run_hi = (jj < T) ? anchor_keys[jj] : hi_sentinel;
          run_k = static_cast<int64_t>(jj - i);
          run_m = 0;
        }
        const int64_t key =
            (run_lo + (run_hi - run_lo) * (run_m + 1) / (run_k + 1))
            | 1;  // odd: never collides with (even) column keys
        ++run_m;
        resolved[i] = add_node(letter, key);
      }
    }

    int32_t prev = -1;
    for (size_t i = 0; i < T; ++i) {
      const int32_t cur = resolved[i];
      const int32_t p = consumed[i].first;
      ++cov[cur];
      if (prev != -1) {
        add_edge(prev, cur,
                 static_cast<int64_t>(weights[p - 1]) + weights[p]);
      }
      prev = cur;
    }
    rebuild_ranks();
  }

  // Heaviest-bundle consensus with branch completion
  // (mirrors consensus_host.heaviest_bundle).
  void generate_consensus(std::vector<int32_t>* path) const {
    const int64_t n = codes.size();
    std::vector<int64_t> scores(n, -1);
    std::vector<int32_t> pred_choice(n, -1);

    // pred_choice is never -1 when the tie branch is reached (first edge
    // weight >= 0 always beats the -1 init), but mirror Python's scores[-1]
    // (= last element) exactly for safety.
    auto sc = [&](const std::vector<int64_t>& s, int32_t idx) {
      return idx == -1 ? s[n - 1] : s[idx];
    };

    // RT_CONS_TIE=1 flips the equal-weight rule to keep the FIRST edge
    // (divergence experiments; default matches spoa's `<=` = last wins)
    static const int cons_tie = [] {
      const char* e = getenv("RT_CONS_TIE");
      return e ? atoi(e) : 0;
    }();
    int32_t max_v = -1;
    for (int64_t r = 0; r < n; ++r) {
      const int32_t v = order[r];
      for (size_t k = 0; k < preds[v].size(); ++k) {
        const int32_t p = preds[v][k];
        const int64_t w = pred_w[v][k];
        const bool tie_take = cons_tie
            ? sc(scores, pred_choice[v]) < scores[p]
            : sc(scores, pred_choice[v]) <= scores[p];
        if (scores[v] < w || (scores[v] == w && tie_take)) {
          scores[v] = w;
          pred_choice[v] = p;
        }
      }
      if (pred_choice[v] != -1) scores[v] += scores[pred_choice[v]];
      if (max_v == -1 || scores[max_v] < scores[v]) max_v = v;
    }

    while (!succs[max_v].empty()) {
      std::vector<int64_t> scores_bc(scores);
      for (int32_t h : succs[max_v]) {
        for (int32_t p : preds[h]) {
          if (p != max_v) scores_bc[p] = -1;
        }
      }
      int32_t best2 = -1;
      int64_t best2_score = -1;
      const int64_t r0 = rank[max_v];
      for (int64_t r = r0 + 1; r < n; ++r) {
        const int32_t v = order[r];
        scores_bc[v] = -1;
        pred_choice[v] = -1;
        for (size_t k = 0; k < preds[v].size(); ++k) {
          const int32_t p = preds[v][k];
          const int64_t w = pred_w[v][k];
          if (scores_bc[p] == -1) continue;
          if (scores_bc[v] < w ||
              (scores_bc[v] == w &&
               sc(scores_bc, pred_choice[v]) <= scores_bc[p])) {
            scores_bc[v] = w;
            pred_choice[v] = p;
          }
        }
        if (pred_choice[v] != -1) scores_bc[v] += scores_bc[pred_choice[v]];
        if (best2_score < scores_bc[v]) {
          best2_score = scores_bc[v];
          best2 = v;
        }
      }
      if (best2 == -1) break;
      scores = std::move(scores_bc);
      max_v = best2;
    }

    path->clear();
    int32_t v = max_v;
    while (v != -1) {
      path->push_back(v);
      v = pred_choice[v];
    }
    std::reverse(path->begin(), path->end());
  }
};

const int8_t* kEncode = [] {
  static int8_t table[256];
  for (int i = 0; i < 256; ++i) table[i] = 4;
  table['A'] = 0;
  table['C'] = 1;
  table['G'] = 2;
  table['T'] = 3;
  return table;
}();

constexpr char kDecode[] = "ACGTN";

extern "C" void rt_layer_sort(const int32_t* begins, int64_t n, int32_t* out);

// One window consensus, mirroring racon_tpu/poa/consensus.py.
std::string polish_one_window(
    const uint8_t* backbone, int64_t bb_len, const uint8_t* bb_qual,
    int64_t n_layers, const uint8_t** seqs, const int64_t* seq_lens,
    const uint8_t** quals, const int32_t* begins, const int32_t* ends,
    int32_t m, int32_t x, int32_t g, bool trim, bool* polished) {
  if (n_layers + 1 < 3) {
    *polished = false;
    return std::string(reinterpret_cast<const char*>(backbone), bb_len);
  }
  *polished = true;

  auto encode = [](const uint8_t* s, int64_t len) {
    std::vector<int8_t> out(len);
    for (int64_t i = 0; i < len; ++i) out[i] = kEncode[s[i]];
    return out;
  };
  auto make_weights = [](const uint8_t* q, int64_t len) {
    std::vector<int32_t> w(len, 1);
    if (q != nullptr) {
      for (int64_t i = 0; i < len; ++i) w[i] = static_cast<int32_t>(q[i]) - 33;
    }
    return w;
  };

  PoaGraph graph;
  {
    auto bb = encode(backbone, bb_len);
    auto w = make_weights(bb_qual, bb_len);
    std::vector<std::pair<int32_t, int32_t>> empty;
    graph.add_alignment(empty, bb.data(), bb_len, w.data());
  }

  // Layer order by begin position.  The reference sorts with UNSTABLE
  // std::sort (src/window.cpp:85-86) over ranks [1..n]; for windows with
  // >16 layers libstdc++ introsort permutes equal-begin layers away from
  // input order, and the layer ADD ORDER changes the graph.  Replicating
  // the exact call (same range values, same comparator, same libstdc++)
  // reproduces the reference's permutation bit-exactly.
  // RT_SORT_MODE=0 forces the old stable sort (A/B experiments).
  std::vector<int64_t> layer_order(n_layers);
  static const int sort_mode = [] {
    const char* e = getenv("RT_SORT_MODE");
    return e ? atoi(e) : 1;
  }();
  if (sort_mode == 1) {
    std::vector<int32_t> perm(n_layers);
    rt_layer_sort(begins, n_layers, perm.data());
    for (int64_t i = 0; i < n_layers; ++i) layer_order[i] = perm[i];
  } else {
    for (int64_t i = 0; i < n_layers; ++i) layer_order[i] = i;
    std::stable_sort(layer_order.begin(), layer_order.end(),
                     [&](int64_t a, int64_t b) { return begins[a] < begins[b]; });
  }

  const uint32_t offset = static_cast<uint32_t>(0.01 * bb_len);
  std::vector<std::pair<int32_t, int32_t>> alignment;
  for (int64_t li : layer_order) {
    auto s = encode(seqs[li], seq_lens[li]);
    auto w = make_weights(quals[li], seq_lens[li]);
    const bool full = begins[li] < static_cast<int32_t>(offset) &&
                      ends[li] > static_cast<int32_t>(bb_len - offset);
    if (full) {
      graph.align(s.data(), seq_lens[li], m, x, g, -1, -1, &alignment);
    } else {
      graph.align(s.data(), seq_lens[li], m, x, g, begins[li], ends[li],
                  &alignment);
    }
    graph.add_alignment(alignment, s.data(), seq_lens[li], w.data());
  }

  std::vector<int32_t> path;
  graph.generate_consensus(&path);
  std::string consensus;
  consensus.reserve(path.size());
  for (int32_t v : path) consensus.push_back(kDecode[graph.codes[v]]);

  if (trim) {
    const int64_t average = n_layers / 2;  // (n_sequences - 1) / 2
    int64_t b = 0, e = static_cast<int64_t>(path.size()) - 1;
    while (b < static_cast<int64_t>(path.size()) &&
           graph.cov[path[b]] < average) {
      ++b;
    }
    while (e >= 0 && graph.cov[path[e]] < average) --e;
    if (b < e) {
      consensus = consensus.substr(b, e - b + 1);
    } else {
      fprintf(stderr, "[rtlib::polish_one_window] warning: window might be "
                      "chimeric!\n");
    }
  }
  return consensus;
}

}  // namespace

extern "C" {

// Layer processing order for one window: replicates the reference's
// UNSTABLE std::sort over ranks [1..n] keyed by layer begin position
// (reference: src/window.cpp:79-86).  libstdc++ introsort permutes
// equal-begin layers away from input order for >16 elements, and the
// layer add order changes the POA graph — every engine must share this
// exact permutation (out[i] = 0-based layer index of the i-th layer to
// add).
void rt_layer_sort(const int32_t* begins, int64_t n, int32_t* out) {
  std::vector<uint32_t> rank(n + 1);
  for (int64_t i = 0; i <= n; ++i) rank[i] = static_cast<uint32_t>(i);
  std::sort(rank.begin() + 1, rank.end(), [&](uint32_t lhs, uint32_t rhs) {
    return begins[lhs - 1] < begins[rhs - 1];
  });
  for (int64_t i = 0; i < n; ++i) out[i] = static_cast<int32_t>(rank[i + 1]) - 1;
}

// Align a batch of (query, target) pairs; returns an opaque result handle.
// algo: -1 = O(ND) wavefront, 0..5 = banded Myers with traceback order.
void* rt_align_batch(const uint8_t* qbuf, const int64_t* qoff,
                     const uint8_t* tbuf, const int64_t* toff, int64_t n,
                     int nthreads, int algo) {
  auto* result = new BatchResult();
  result->items.resize(n);
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) break;
      if (algo < 0) {
        result->items[i] =
            align_ond(qbuf + qoff[i], qoff[i + 1] - qoff[i],
                      tbuf + toff[i], toff[i + 1] - toff[i]);
      } else {
        result->items[i] =
            myers_align(qbuf + qoff[i], qoff[i + 1] - qoff[i],
                        tbuf + toff[i], toff[i + 1] - toff[i], algo);
      }
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

int64_t rt_result_count(void* handle) {
  return static_cast<BatchResult*>(handle)->items.size();
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

// Breaking-point extraction from a CIGAR: walk (t, q) coordinates and
// record the (t, q) pairs of the first match and one-past-the-last match
// inside every window span (exact reference semantics,
// src/overlap.cpp:226-292; mirrors the Python walker in
// racon_tpu/core/overlap.py).  out receives flattened (t, q) pairs;
// returns the number of int64 values written, or -1 if out_cap is too
// small.
int64_t rt_breaking_points(const char* cigar, int64_t cigar_len,
                           int64_t t_begin, int64_t t_end, int64_t q_begin,
                           int64_t q_end, int64_t q_length, int strand,
                           int64_t window_length, int64_t* out,
                           int64_t out_cap) {
  // window end positions on the target (inclusive)
  std::vector<int64_t> window_ends;
  for (int64_t i = 0; i < t_end; i += window_length) {
    if (i > t_begin) window_ends.push_back(i - 1);
  }
  window_ends.push_back(t_end - 1);

  size_t w = 0;
  bool found_first = false;
  int64_t first_t = 0, first_q = 0, last_t = 0, last_q = 0;
  int64_t q_ptr = (strand ? q_length - q_end : q_begin) - 1;
  int64_t t_ptr = t_begin - 1;
  int64_t n_out = 0;

  auto close_window = [&]() -> bool {
    if (found_first) {
      if (n_out + 4 > out_cap) return false;
      out[n_out++] = first_t;
      out[n_out++] = first_q;
      out[n_out++] = last_t;
      out[n_out++] = last_q;
    }
    found_first = false;
    ++w;
    return true;
  };

  int64_t i = 0;
  while (i < cigar_len) {
    int64_t n = 0;
    while (i < cigar_len && cigar[i] >= '0' && cigar[i] <= '9') {
      n = n * 10 + (cigar[i] - '0');
      ++i;
    }
    if (i >= cigar_len) break;
    const char op = cigar[i++];
    if (op == 'M' || op == '=' || op == 'X') {
      for (int64_t k = 0; k < n; ++k) {
        ++q_ptr;
        ++t_ptr;
        if (!found_first) {
          found_first = true;
          first_t = t_ptr;
          first_q = q_ptr;
        }
        last_t = t_ptr + 1;
        last_q = q_ptr + 1;
        if (w < window_ends.size() && t_ptr == window_ends[w]) {
          if (!close_window()) return -1;
        }
      }
    } else if (op == 'I') {
      q_ptr += n;
    } else if (op == 'D' || op == 'N') {
      for (int64_t k = 0; k < n; ++k) {
        ++t_ptr;
        if (w < window_ends.size() && t_ptr == window_ends[w]) {
          if (!close_window()) return -1;
        }
      }
    }
    // S/H/P: no coordinate movement (clips folded into q_begin upstream)
  }
  return n_out;
}

// Banded edit distance (score only, band doubling; exact — the result is
// accepted only when it fits the band).  Orders of magnitude faster than
// the full-width Myers on long, similar sequences (genome-scale scoring).
int64_t rt_edit_distance_banded(const uint8_t* q, int64_t n,
                                const uint8_t* t, int64_t m) {
  if (n == 0) return m;
  if (m == 0) return n;
  const int64_t absD = n > m ? n - m : m - n;
  int64_t k = absD + 1024;
  while (true) {
    const int64_t d = myers_banded_pass(q, n, t, m, k, nullptr);
    if (d <= k) return d;
    if (k >= n + m) return d;
    k = std::min<int64_t>(k * 2, n + m);
  }
}

int64_t rt_edit_distance(const uint8_t* q, int64_t n, const uint8_t* t,
                         int64_t m) {
  return myers_edit_distance(q, n, t, m);
}

uint8_t rt_result_flag(void* handle, int64_t i) {
  return static_cast<BatchResult*>(handle)->flags[i];
}

// Polish a batch of windows with the C++ POA oracle.
//
// Layout: window w has layers [layer_off[w], layer_off[w+1]).  Backbones and
// layer sequences/qualities are concatenated buffers with offset arrays;
// a layer with qual_off[i+1] == qual_off[i] has no quality (weights = 1).
// trim[w] combines the window-type and trim policy (kTGS && trim).
void* rt_polish_windows(
    int64_t n_windows, const int64_t* layer_off,
    const uint8_t* bb_buf, const int64_t* bb_off,
    const uint8_t* bbq_buf, const int64_t* bbq_off,
    const uint8_t* seq_buf, const int64_t* seq_off,
    const uint8_t* qual_buf, const int64_t* qual_off,
    const int32_t* begins, const int32_t* ends, const uint8_t* trim,
    int32_t m, int32_t x, int32_t g, int nthreads) {
  auto* result = new BatchResult();
  result->items.resize(n_windows);
  result->flags.resize(n_windows);
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    std::vector<const uint8_t*> seqs, quals;
    std::vector<int64_t> lens;
    while (true) {
      const int64_t w = next.fetch_add(1);
      if (w >= n_windows) break;
      const int64_t lo = layer_off[w], hi = layer_off[w + 1];
      const int64_t n_layers = hi - lo;
      seqs.clear();
      quals.clear();
      lens.clear();
      for (int64_t i = lo; i < hi; ++i) {
        seqs.push_back(seq_buf + seq_off[i]);
        lens.push_back(seq_off[i + 1] - seq_off[i]);
        quals.push_back(qual_off[i + 1] > qual_off[i]
                            ? qual_buf + qual_off[i]
                            : nullptr);
      }
      bool polished = false;
      result->items[w] = polish_one_window(
          bb_buf + bb_off[w], bb_off[w + 1] - bb_off[w],
          bbq_buf + bbq_off[w], n_layers, seqs.data(), lens.data(),
          quals.data(), begins + lo, ends + lo, m, x, g, trim[w] != 0,
          &polished);
      result->flags[w] = polished ? 1 : 0;
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


// Heaviest-bundle consensus for a batch of downloaded device graphs.
// Arrays use the TPU engine download layout (racon_tpu/poa/fused_chunk.py
// pack_for_download_fused): codes [B,Np1] i8, pred [B,Np1,P] i16 (Np1-1 =
// empty sentinel), pred_w [B,Np1,P] i32, pred_cnt [B,Np1] i16, cov [B,Np1]
// i16, order [B,Np1-1] i16 (rank->node), n_nodes [B] i32, skip [B] u8.
// Item w = consensus chars followed by the per-base coverage as raw int16
// (little endian), so item length = 3 * consensus length.
// The algorithm mirrors PoaGraph::generate_consensus /
// consensus_host.heaviest_bundle exactly (same tie rules).
void* rt_consensus_batch(
    const int8_t* codes, const int16_t* pred, const int32_t* pred_w,
    const int16_t* pred_cnt, const int16_t* cov, const int16_t* order,
    const int32_t* n_nodes, const uint8_t* skip,
    int64_t B, int64_t Np1, int64_t P, int nthreads) {
  auto* result = new BatchResult();
  result->items.resize(B);
  result->flags.resize(B, 0);
  const int64_t N = Np1 - 1;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    std::vector<int64_t> scores, scores_bc;
    std::vector<int32_t> pred_choice, succ_off, succ_dat, rank;
    while (true) {
      const int64_t w = next.fetch_add(1);
      if (w >= B) break;
      if (skip[w]) continue;
      const int64_t n = n_nodes[w];
      if (n <= 0) continue;
      const int8_t* c_w = codes + w * Np1;
      const int16_t* pr_w = pred + w * Np1 * P;
      const int32_t* pw_w = pred_w + w * Np1 * P;
      const int16_t* cnt_w = pred_cnt + w * Np1;
      const int16_t* cov_w = cov + w * Np1;
      const int16_t* ord_w = order + w * N;

      rank.assign(n, 0);
      for (int64_t r = 0; r < n; ++r) rank[ord_w[r]] = r;

      // successor lists in CSR form
      succ_off.assign(n + 1, 0);
      int64_t n_edges = 0;
      for (int64_t v = 0; v < n; ++v) {
        for (int64_t k = 0; k < cnt_w[v]; ++k) {
          const int32_t p = pr_w[v * P + k];
          if (p >= N || p < 0) continue;
          ++succ_off[p + 1];
          ++n_edges;
        }
      }
      for (int64_t v = 0; v < n; ++v) succ_off[v + 1] += succ_off[v];
      succ_dat.assign(n_edges, 0);
      {
        std::vector<int32_t> fill(succ_off.begin(), succ_off.end() - 1);
        for (int64_t v = 0; v < n; ++v) {
          for (int64_t k = 0; k < cnt_w[v]; ++k) {
            const int32_t p = pr_w[v * P + k];
            if (p >= N || p < 0) continue;
            succ_dat[fill[p]++] = static_cast<int32_t>(v);
          }
        }
      }

      scores.assign(n, -1);
      pred_choice.assign(n, -1);
      auto sc = [&](const std::vector<int64_t>& s, int32_t idx) {
        return idx == -1 ? s[n - 1] : s[idx];
      };

      int32_t max_v = -1;
      for (int64_t r = 0; r < n; ++r) {
        const int32_t v = ord_w[r];
        for (int64_t k = 0; k < cnt_w[v]; ++k) {
          const int32_t p = pr_w[v * P + k];
          if (p >= N || p < 0) continue;
          const int64_t wt = pw_w[v * P + k];
          if (scores[v] < wt ||
              (scores[v] == wt && sc(scores, pred_choice[v]) <= scores[p])) {
            scores[v] = wt;
            pred_choice[v] = p;
          }
        }
        if (pred_choice[v] != -1) scores[v] += scores[pred_choice[v]];
        if (max_v == -1 || scores[max_v] < scores[v]) max_v = v;
      }

      while (succ_off[max_v + 1] > succ_off[max_v]) {
        scores_bc = scores;
        for (int32_t si = succ_off[max_v]; si < succ_off[max_v + 1]; ++si) {
          const int32_t h = succ_dat[si];
          for (int64_t k = 0; k < cnt_w[h]; ++k) {
            const int32_t p = pr_w[h * P + k];
            if (p >= N || p < 0) continue;
            if (p != max_v) scores_bc[p] = -1;
          }
        }
        int32_t best2 = -1;
        int64_t best2_score = -1;
        const int64_t r0 = rank[max_v];
        for (int64_t r = r0 + 1; r < n; ++r) {
          const int32_t v = ord_w[r];
          scores_bc[v] = -1;
          pred_choice[v] = -1;
          for (int64_t k = 0; k < cnt_w[v]; ++k) {
            const int32_t p = pr_w[v * P + k];
            if (p >= N || p < 0) continue;
            const int64_t wt = pw_w[v * P + k];
            if (scores_bc[p] == -1) continue;
            if (scores_bc[v] < wt ||
                (scores_bc[v] == wt &&
                 sc(scores_bc, pred_choice[v]) <= scores_bc[p])) {
              scores_bc[v] = wt;
              pred_choice[v] = p;
            }
          }
          if (pred_choice[v] != -1) scores_bc[v] += scores_bc[pred_choice[v]];
          if (best2_score < scores_bc[v]) {
            best2_score = scores_bc[v];
            best2 = v;
          }
        }
        if (best2 == -1) break;
        scores = std::move(scores_bc);
        max_v = best2;
      }

      std::vector<int32_t> path;
      {
        int32_t v = max_v;
        while (v != -1) {
          path.push_back(v);
          v = pred_choice[v];
        }
        std::reverse(path.begin(), path.end());
      }
      std::string& out = result->items[w];
      out.resize(path.size() * 3);
      for (size_t i = 0; i < path.size(); ++i) {
        int ci = c_w[path[i]];
        if (ci < 0 || ci > 4) ci = 4;
        out[i] = kDecode[ci];
        const int16_t cv = cov_w[path[i]];
        out[path.size() + 2 * i] = static_cast<char>(cv & 0xff);
        out[path.size() + 2 * i + 1] = static_cast<char>((cv >> 8) & 0xff);
      }
      result->flags[w] = 1;
    }
  };
  std::vector<std::thread> threads;
  const int nt = nthreads < 1 ? 1 : nthreads;
  for (int i = 1; i < nt; ++i) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  return result;
}


}  // extern "C"

// ------------------------------------------------------------------------ //
// FASTA/FASTQ parser (gzip-aware) — the role bioparser's FastaParser /
// FastqParser play in the reference (src/polisher.cpp:85-135).
// Semantics: record name = header token up to the first whitespace,
// multi-line bodies concatenated, '\r' stripped.
// Each result item packs one record:
//   [u32 name_len][name][u64 data_len][data][u64 qual_len][qual]
// ------------------------------------------------------------------------ //

namespace {

bool read_whole_file(const char* path, std::string* out) {
  gzFile f = gzopen(path, "rb");   // handles both plain and gzip
  if (f == nullptr) return false;
  gzbuffer(f, 1 << 20);
  out->clear();
  char buf[1 << 20];
  int n;
  while ((n = gzread(f, buf, sizeof(buf))) > 0) out->append(buf, n);
  gzclose(f);
  return n >= 0;
}

inline const char* next_line(const char* p, const char* end,
                             const char** line_end) {
  const char* nl = static_cast<const char*>(
      memchr(p, '\n', static_cast<size_t>(end - p)));
  const char* le = nl == nullptr ? end : nl;
  while (le > p && (le[-1] == '\r')) --le;
  *line_end = le;
  return nl == nullptr ? end : nl + 1;
}

void append_record(BatchResult* result, const char* name, size_t name_len,
                   const std::string& data, const std::string& qual) {
  std::string item;
  item.reserve(4 + name_len + 16 + data.size() + qual.size());
  uint32_t nl32 = static_cast<uint32_t>(name_len);
  uint64_t dl = data.size(), ql = qual.size();
  item.append(reinterpret_cast<const char*>(&nl32), 4);
  item.append(name, name_len);
  item.append(reinterpret_cast<const char*>(&dl), 8);
  item.append(data);
  item.append(reinterpret_cast<const char*>(&ql), 8);
  item.append(qual);
  result->items.push_back(std::move(item));
  result->flags.push_back(1);
}

size_t name_token_len(const char* p, const char* end) {
  const char* q = p;
  while (q < end && *q != ' ' && *q != '\t') ++q;
  return static_cast<size_t>(q - p);
}

}  // namespace

extern "C" void* rt_parse_sequences(const char* path, int is_fastq,
                                    int* error) {
  *error = 0;
  std::string buf;
  if (!read_whole_file(path, &buf)) {
    *error = 1;
    return nullptr;
  }
  auto* result = new BatchResult();
  const char* p = buf.data();
  const char* end = p + buf.size();
  std::string data, qual;

  if (!is_fastq) {
    const char* name = nullptr;
    size_t name_len = 0;
    while (p < end) {
      const char* le;
      const char* next = next_line(p, end, &le);
      if (le > p) {
        if (*p == '>') {
          if (name != nullptr) append_record(result, name, name_len, data, qual);
          name = p + 1;
          name_len = name_token_len(name, le);
          data.clear();
        } else if (name != nullptr) {
          data.append(p, static_cast<size_t>(le - p));
        }
      }
      p = next;
    }
    if (name != nullptr) append_record(result, name, name_len, data, qual);
    return result;
  }

  while (p < end) {
    const char* le;
    const char* next = next_line(p, end, &le);
    if (le == p) { p = next; continue; }      // blank line
    if (*p != '@') {
      *error = 2;                              // malformed header
      delete result;
      return nullptr;
    }
    const char* name = p + 1;
    const size_t name_len = name_token_len(name, le);
    p = next;

    data.clear();
    while (p < end) {                          // body lines until '+'
      const char* lb = p;
      p = next_line(p, end, &le);
      if (lb < le && *lb == '+') break;
      data.append(lb, static_cast<size_t>(le - lb));
    }
    qual.clear();
    while (qual.size() < data.size() && p < end) {
      const char* lb = p;
      p = next_line(p, end, &le);
      qual.append(lb, static_cast<size_t>(le - lb));
    }
    append_record(result, name, name_len, data, qual);
  }
  return result;
}

// ------------------------------------------------------------------------ //
// Overlap parsers: MHAP / PAF / SAM (gzip-aware) — the role bioparser's
// MhapParser / PafParser / SamParser play (reference: src/polisher.cpp:
// 311-314).  Numeric fields are packed little-endian; names as strings.
// Record layouts per item:
//   MHAP: 10 x i64 (a_id b_id a_rc a_begin a_end a_length b_rc b_begin
//                   b_end b_length)
//   PAF:  [u32 qn_len][q_name][u32 tn_len][t_name][u8 strand('+'/'-')]
//         [7 x i64: q_length q_begin q_end t_length t_begin t_end 0]
//   SAM:  [u32 qn_len][q_name][u32 tn_len][t_name][u32 cigar_len][cigar]
//         [2 x i64: flag t_pos]
// ------------------------------------------------------------------------ //

namespace {

struct Field {
  const char* p;
  size_t len;
};

// split a line on tabs/spaces into at most max_n fields
int split_fields(const char* p, const char* end, Field* out, int max_n,
                 bool tabs_only) {
  int n = 0;
  const char* s = p;
  while (s < end && n < max_n) {
    const char* e = s;
    while (e < end && !(*e == '\t' || (!tabs_only && *e == ' '))) ++e;
    out[n].p = s;
    out[n].len = static_cast<size_t>(e - s);
    ++n;
    s = e + 1;
    if (!tabs_only) {
      while (s < end && (*s == ' ' || *s == '\t')) ++s;
    }
  }
  return n;
}

int64_t to_i64(const Field& f) {
  int64_t v = 0;
  bool neg = false;
  size_t i = 0;
  if (f.len > 0 && (f.p[0] == '-' || f.p[0] == '+')) {
    neg = f.p[0] == '-';
    i = 1;
  }
  for (; i < f.len; ++i) {
    const char c = f.p[i];
    if (c < '0' || c > '9') break;
    v = v * 10 + (c - '0');
  }
  return neg ? -v : v;
}

void put_u32(std::string* s, uint32_t v) {
  s->append(reinterpret_cast<const char*>(&v), 4);
}

void put_i64(std::string* s, int64_t v) {
  s->append(reinterpret_cast<const char*>(&v), 8);
}

}  // namespace

// fmt: 0 = MHAP, 1 = PAF, 2 = SAM
namespace {

// Parse complete overlap lines in [p, end) into result; returns the
// position after the last line consumed (lines are only consumed when
// fully contained, unless final == true).
const char* parse_overlap_lines(const char* p, const char* end, int fmt,
                                bool final, BatchResult* result) {
  Field f[16];
  std::string item;
  while (p < end) {
    const char* le;
    const char* next = next_line(p, end, &le);
    const char* lb = p;
    if (!final && next == end && (end == le || end[-1] != '\n')) {
      return lb;   // possibly truncated final line; wait for more data
    }
    p = next;
    if (le == lb) continue;
    if (fmt == 2 && *lb == '@') continue;      // SAM header
    item.clear();
    if (fmt == 0) {                            // MHAP (space or tab)
      const int n = split_fields(lb, le, f, 12, false);
      if (n < 12) continue;
      // a_id b_id [err shared] a_rc a_begin a_end a_length
      //                        b_rc b_begin b_end b_length
      static const int idx[10] = {0, 1, 4, 5, 6, 7, 8, 9, 10, 11};
      for (int k = 0; k < 10; ++k) put_i64(&item, to_i64(f[idx[k]]));
    } else if (fmt == 1) {                     // PAF (tabs)
      const int n = split_fields(lb, le, f, 12, true);
      if (n < 12) continue;
      put_u32(&item, static_cast<uint32_t>(f[0].len));
      item.append(f[0].p, f[0].len);
      put_u32(&item, static_cast<uint32_t>(f[5].len));
      item.append(f[5].p, f[5].len);
      item.push_back(f[4].len > 0 ? f[4].p[0] : '+');
      put_i64(&item, to_i64(f[1]));
      put_i64(&item, to_i64(f[2]));
      put_i64(&item, to_i64(f[3]));
      put_i64(&item, to_i64(f[6]));
      put_i64(&item, to_i64(f[7]));
      put_i64(&item, to_i64(f[8]));
      put_i64(&item, 0);
    } else {                                   // SAM (tabs)
      const int n = split_fields(lb, le, f, 11, true);
      if (n < 11) continue;
      put_u32(&item, static_cast<uint32_t>(f[0].len));
      item.append(f[0].p, f[0].len);
      put_u32(&item, static_cast<uint32_t>(f[2].len));
      item.append(f[2].p, f[2].len);
      put_u32(&item, static_cast<uint32_t>(f[5].len));
      item.append(f[5].p, f[5].len);
      put_i64(&item, to_i64(f[1]));
      put_i64(&item, to_i64(f[3]));
    }
    result->items.push_back(item);
    result->flags.push_back(1);
  }
  return p;
}

}  // namespace

extern "C" void* rt_parse_overlaps(const char* path, int fmt, int* error) {
  *error = 0;
  std::string buf;
  if (!read_whole_file(path, &buf)) {
    *error = 1;
    return nullptr;
  }
  auto* result = new BatchResult();
  parse_overlap_lines(buf.data(), buf.data() + buf.size(), fmt, true,
                      result);
  return result;
}

// ------------------------------------------------------------------------ //
// Streaming (chunked) sequence reader — the reference ingests reads and
// overlaps in 1 GiB chunks to bound peak memory (src/polisher.cpp:30,
// 200-265).  A stream handle keeps the gzFile open across calls; each
// rt_stream_next returns records totalling at most max_bytes of sequence
// data (at least one record if any remain).
// ------------------------------------------------------------------------ //

namespace {

struct SeqStream {
  gzFile f = nullptr;
  bool is_fastq = false;
  std::string carry;      // partial line data carried between reads
  size_t off = 0;         // consumed prefix of carry (compacted lazily —
                          // a per-record erase(0, n) is quadratic: each
                          // memmoves the whole tail, ~99 s on a 138 MB
                          // read set)
  bool eof = false;
};

// read more data into carry until it holds at least one complete record
// block or EOF; returns false on read error
bool stream_fill(SeqStream* s, size_t want) {
  char buf[1 << 20];
  while (!s->eof && s->carry.size() < want) {
    const int n = gzread(s->f, buf, sizeof(buf));
    if (n < 0) return false;
    if (n == 0) {
      s->eof = true;
      break;
    }
    s->carry.append(buf, n);
  }
  return true;
}

}  // namespace

// Streaming overlap reader: same 1 GiB-chunk contract as the sequence
// stream (reference interleaves overlap parsing with transmute/filter,
// src/polisher.cpp:311-349).
extern "C" void* rt_open_ovl_stream(const char* path) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) return nullptr;
  gzbuffer(f, 1 << 20);
  auto* s = new SeqStream();
  s->f = f;
  return s;
}

extern "C" void rt_close_ovl_stream(void* handle) {
  auto* s = static_cast<SeqStream*>(handle);
  if (s->f != nullptr) gzclose(s->f);
  delete s;
}

// Returns a BatchResult of packed overlap records parsed from at most
// ~max_bytes of file text, or an empty result at end of stream.
extern "C" void* rt_ovl_stream_next(void* handle, int64_t max_bytes,
                                    int fmt, int* error) {
  *error = 0;
  auto* s = static_cast<SeqStream*>(handle);
  auto* result = new BatchResult();
  size_t want = static_cast<size_t>(max_bytes);
  while (true) {
    if (!stream_fill(s, want)) {
      *error = 1;
      delete result;
      return nullptr;
    }
    const char* begin = s->carry.data();
    const size_t window = std::min(s->carry.size(),
                                   static_cast<size_t>(max_bytes));
    const bool final = s->eof && window == s->carry.size();
    const char* consumed =
        parse_overlap_lines(begin, begin + window, fmt, final, result);
    if (consumed == begin && window < s->carry.size()) {
      // a single line longer than max_bytes: consume it whole
      consumed = parse_overlap_lines(begin, begin + s->carry.size(), fmt,
                                     s->eof, result);
    }
    s->carry.erase(0, static_cast<size_t>(consumed - begin));
    if (!result->items.empty() || s->eof) {
      // at EOF the final=true parse consumes even an unterminated last
      // line, so an empty result here really is end-of-stream
      if (s->eof && result->items.empty()) s->carry.clear();
      return result;
    }
    // the carry holds only part of one line (possibly longer than
    // max_bytes): read more and retry, never returning a spurious
    // empty chunk mid-stream
    want = s->carry.size() + (1 << 20);
  }
}

extern "C" void* rt_open_seq_stream(const char* path, int is_fastq) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) return nullptr;
  gzbuffer(f, 1 << 20);
  auto* s = new SeqStream();
  s->f = f;
  s->is_fastq = is_fastq != 0;
  return s;
}

extern "C" void rt_close_seq_stream(void* handle) {
  auto* s = static_cast<SeqStream*>(handle);
  if (s->f != nullptr) gzclose(s->f);
  delete s;
}

// Returns a BatchResult of packed records (same layout as
// rt_parse_sequences) totalling <= max_bytes of sequence data, or an empty
// result at end of stream.  error: 0 ok, 1 io, 2 malformed.
extern "C" void* rt_stream_next(void* handle, int64_t max_bytes,
                                int* error) {
  *error = 0;
  auto* s = static_cast<SeqStream*>(handle);
  auto* result = new BatchResult();
  std::string data, qual;
  int64_t emitted = 0;

  // compact + refill: drop the consumed prefix (one memmove of the small
  // unconsumed tail) and read until at least `want` unconsumed bytes are
  // in view.  Keeping the buffer O(read-ahead) instead of O(file) is what
  // makes this linear — the old per-record erase(0, n) memmoved the whole
  // remaining file for every record.
  const auto refill = [&](size_t want) {
    s->carry.erase(0, s->off);
    s->off = 0;
    return stream_fill(s, want);
  };

  while (emitted < max_bytes) {
    // keep a decent window of unconsumed data to scan records from
    if (!s->eof && s->carry.size() - s->off < (1 << 22)) {
      // want is measured post-compaction: base it on the unconsumed
      // size, or the read-ahead window grows ~4 MB per refill
      if (!refill(s->carry.size() - s->off + (1 << 22))) {
        *error = 1;
        delete result;
        return nullptr;
      }
    }
    const char* base = s->carry.data();
    const char* end = base + s->carry.size();
    // skip blank lines
    const char* rec = base + s->off;
    while (rec < end && (*rec == '\n' || *rec == '\r')) ++rec;
    s->off = static_cast<size_t>(rec - base);
    if (rec >= end) {
      if (s->eof) break;   // done
      continue;            // only blanks in view: refill
    }

    // find the end of one complete record
    const char* q = rec;
    const char* le;
    if (!s->is_fastq) {
      if (*q != '>') {
        *error = 2;
        delete result;
        return nullptr;
      }
      const char* nxt = static_cast<const char*>(
          memchr(q + 1, '>', static_cast<size_t>(end - q - 1)));
      // record complete when the next '>' at line start or EOF is in buffer
      while (nxt != nullptr && nxt > base && nxt[-1] != '\n') {
        nxt = static_cast<const char*>(
            memchr(nxt + 1, '>', static_cast<size_t>(end - nxt - 1)));
      }
      if (nxt == nullptr && !s->eof) {
        // record longer than the window: compact and read more
        if (!refill((s->carry.size() - s->off) * 2 + (1 << 22))) {
          *error = 1;
          delete result;
          return nullptr;
        }
        continue;   // rescan with more data
      }
      const char* rend = nxt == nullptr ? end : nxt;
      // parse [rec, rend)
      q = next_line(rec, rend, &le);
      const char* name = rec + 1;
      const size_t name_len = name_token_len(name, le);
      data.clear();
      while (q < rend) {
        const char* lb = q;
        q = next_line(q, rend, &le);
        data.append(lb, static_cast<size_t>(le - lb));
      }
      qual.clear();
      append_record(result, name, name_len, data, qual);
      emitted += static_cast<int64_t>(data.size());
      s->off = static_cast<size_t>(rend - base);
    } else {
      if (*q != '@') {
        *error = 2;
        delete result;
        return nullptr;
      }
      // try to parse one full record; if we run out of buffer and not
      // at EOF, refill and retry
      const char* cursor = q;
      cursor = next_line(cursor, end, &le);
      const char* name = q + 1;
      const size_t name_len = name_token_len(name, le);
      data.clear();
      bool plus = false;
      while (cursor < end) {
        const char* lb = cursor;
        cursor = next_line(cursor, end, &le);
        if (lb < le && *lb == '+') {
          plus = true;
          break;
        }
        data.append(lb, static_cast<size_t>(le - lb));
      }
      qual.clear();
      while (plus && qual.size() < data.size() && cursor < end) {
        const char* lb = cursor;
        cursor = next_line(cursor, end, &le);
        qual.append(lb, static_cast<size_t>(le - lb));
      }
      if ((!plus || qual.size() < data.size()) && !s->eof) {
        // incomplete record: compact, refill and rescan
        if (!refill((s->carry.size() - s->off) * 2 + (1 << 22))) {
          *error = 1;
          delete result;
          return nullptr;
        }
        continue;
      }
      append_record(result, name, name_len, data, qual);
      emitted += static_cast<int64_t>(data.size());
      s->off = static_cast<size_t>(cursor - base);
    }
  }
  // drop everything consumed this call so the carried tail stays small
  s->carry.erase(0, s->off);
  s->off = 0;
  return result;
}
