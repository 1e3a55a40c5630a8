// Native host-side graph-builder runtime for multistgraph_tpu.
//
// The TPU owns the training math (JAX/XLA/Pallas); everything the host does
// per-graph — tiling COO edge lists into MXU-aligned BSR blocks, community
// detection for tile-locality reordering, all-pairs banded DTW for semantic
// graphs — is pure CPU work that the reference does with numpy/scipy-style
// Python (and that our numpy fallbacks reproduce). At the 1M-node scale of
// BASELINE.json configs 4-5 the numpy paths cost seconds-to-minutes
// (np.add.at scatter, per-round np.unique sorts); these C++ kernels bring
// graph construction down to memory speed and are loaded via ctypes with
// automatic numpy fallback (see native/__init__.py).
//
// Behavioral contract: every function is bit-compatible with its numpy
// reference implementation in ops/bsr.py / models/stgode.py — accumulation
// order, tie-breaking, and ordering rules match exactly, and tests/
// test_native.py asserts equality.
//
// Plain C ABI (extern "C") so ctypes can bind without pybind11.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <numeric>
#include <thread>
#include <vector>

namespace {

int64_t clamp_threads(int64_t nthreads) {
  int64_t hw = static_cast<int64_t>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 1;
  if (nthreads <= 0 || nthreads > hw) nthreads = hw;
  return nthreads;
}

// Run fn(t) on nthreads threads (fn(0) inline on the caller thread).
template <typename F>
void parallel_run(int64_t nthreads, F fn) {
  if (nthreads <= 1) {
    fn(0);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(nthreads - 1);
  for (int64_t t = 1; t < nthreads; ++t) pool.emplace_back([&fn, t] { fn(t); });
  fn(0);
  for (auto& th : pool) th.join();
}

struct BsrPlan {
  int64_t num_edges = 0;
  int64_t block = 0;
  int64_t n_blocks = 0;            // blocks per side
  std::vector<int64_t> uniq_keys;  // sorted tile keys, key = rb*n_blocks+cb
  // Edges regrouped by tile (stable within a tile, so per-element float
  // accumulation order == original edge order == np.add.at order):
  std::vector<int64_t> tile_off;   // (nnz+1) edge offsets per tile
  std::vector<int64_t> edge_perm;  // original edge index, tile-grouped
  std::vector<uint8_t> row_in;     // src % block, tile-grouped (block <= 256)
  std::vector<uint8_t> col_in;     // dst % block, tile-grouped
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// BSR construction (mirrors ops/bsr.py:bsr_from_coo, which mirrors the dense
// support build at /root/reference/libcity/model/traffic_flow_prediction/
// MultiATGCN.py adjacency handling — tiled for the MXU instead of dense NxN).
//
// Two-phase plan/fill API: the plan (tile discovery + per-edge tile index)
// depends only on the edge STRUCTURE, so multi-view graphs sharing one edge
// set (OD / distance / semantic weights over the same links) pay the sort
// once and refill values per view.
// ---------------------------------------------------------------------------

void* msg_bsr_plan(const int64_t* src, const int64_t* dst, int64_t num_edges,
                   int64_t num_nodes, int64_t block, int64_t nthreads) {
  auto* plan = new BsrPlan();
  plan->num_edges = num_edges;
  plan->block = block;
  plan->n_blocks = (num_nodes + block - 1) / block;
  const int64_t nb = plan->n_blocks;
  nthreads = clamp_threads(nthreads);
  const int64_t chunk = (num_edges + nthreads - 1) / nthreads;

  // Sort (tile_key, edge_index) pairs: one sort yields the unique tiles AND
  // the tile-grouped edge order (index as tie-break == stable grouping).
  struct KeyIdx {
    int64_t key, idx;
  };
  std::vector<KeyIdx> pairs(static_cast<size_t>(num_edges));
  parallel_run(nthreads, [&](int64_t t) {
    const int64_t lo = t * chunk, hi = std::min(num_edges, lo + chunk);
    for (int64_t e = lo; e < hi; ++e)
      pairs[e] = {(src[e] / block) * nb + (dst[e] / block), e};
  });
  std::sort(pairs.begin(), pairs.end(), [](const KeyIdx& a, const KeyIdx& b) {
    return a.key != b.key ? a.key < b.key : a.idx < b.idx;
  });

  plan->edge_perm.resize(static_cast<size_t>(num_edges));
  plan->row_in.resize(static_cast<size_t>(num_edges));
  plan->col_in.resize(static_cast<size_t>(num_edges));
  plan->uniq_keys.clear();
  plan->tile_off.clear();
  for (int64_t i = 0; i < num_edges; ++i) {
    const int64_t e = pairs[i].idx;
    plan->edge_perm[i] = e;
    plan->row_in[i] = static_cast<uint8_t>(src[e] % block);
    plan->col_in[i] = static_cast<uint8_t>(dst[e] % block);
    if (plan->uniq_keys.empty() || pairs[i].key != plan->uniq_keys.back()) {
      plan->uniq_keys.push_back(pairs[i].key);
      plan->tile_off.push_back(i);
    }
  }
  plan->tile_off.push_back(num_edges);
  return plan;
}

int64_t msg_bsr_nnz(void* plan_ptr) {
  return static_cast<int64_t>(
      static_cast<BsrPlan*>(plan_ptr)->uniq_keys.size());
}

void msg_bsr_tiles(void* plan_ptr, int32_t* row_of, int32_t* col_of) {
  auto* plan = static_cast<BsrPlan*>(plan_ptr);
  const int64_t nb = plan->n_blocks;
  for (size_t i = 0; i < plan->uniq_keys.size(); ++i) {
    row_of[i] = static_cast<int32_t>(plan->uniq_keys[i] / nb);
    col_of[i] = static_cast<int32_t>(plan->uniq_keys[i] % nb);
  }
}

// Accumulates weights into caller-zeroed values (nnz, block, block).
// Parallel over disjoint tile ranges; within a tile edges keep their
// original order, so per-element float accumulation is bit-identical to
// np.add.at over the raw edge list.
void msg_bsr_fill(void* plan_ptr, const float* weights, float* values,
                  int64_t nthreads) {
  auto* plan = static_cast<BsrPlan*>(plan_ptr);
  const int64_t tile_sz = plan->block * plan->block;
  const int64_t nnz = static_cast<int64_t>(plan->uniq_keys.size());
  nthreads = clamp_threads(nthreads);
  // Static edge-balanced tile partition: thread t starts at the first tile
  // whose edge offset reaches t/nthreads of all edges.
  std::vector<int64_t> tile_lo(static_cast<size_t>(nthreads) + 1);
  for (int64_t t = 0; t <= nthreads; ++t) {
    const int64_t target = plan->num_edges * t / nthreads;
    tile_lo[t] = std::lower_bound(plan->tile_off.begin(),
                                  plan->tile_off.end() - 1, target) -
                 plan->tile_off.begin();
  }
  tile_lo[nthreads] = nnz;
  parallel_run(nthreads, [&](int64_t t) {
    for (int64_t tile = tile_lo[t]; tile < tile_lo[t + 1]; ++tile) {
      float* out = values + tile * tile_sz;
      for (int64_t i = plan->tile_off[tile]; i < plan->tile_off[tile + 1]; ++i)
        out[static_cast<int64_t>(plan->row_in[i]) * plan->block +
            plan->col_in[i]] += weights[plan->edge_perm[i]];
    }
  });
}

void msg_bsr_free(void* plan_ptr) { delete static_cast<BsrPlan*>(plan_ptr); }

// ---------------------------------------------------------------------------
// Community ordering via synchronous label propagation
// (mirrors ops/bsr.py:community_order bit-for-bit: per round each node with
// neighbors adopts the most frequent neighbor label, ties to the LARGEST
// label; final order = communities by size desc (ties: smaller canonical
// label first), nodes within a community by degree desc (ties: node id)).
// ---------------------------------------------------------------------------

void msg_community_order(const int64_t* src, const int64_t* dst,
                         int64_t num_edges, int64_t num_nodes, int64_t rounds,
                         int64_t* perm_out, int64_t nthreads) {
  nthreads = clamp_threads(nthreads);
  // Symmetrized CSR (each directed edge contributes both directions).
  const int64_t deg_edges = 2 * num_edges;
  std::vector<int64_t> offsets(static_cast<size_t>(num_nodes) + 1, 0);
  for (int64_t e = 0; e < num_edges; ++e) {
    ++offsets[src[e] + 1];
    ++offsets[dst[e] + 1];
  }
  std::partial_sum(offsets.begin(), offsets.end(), offsets.begin());
  std::vector<int64_t> nbr(static_cast<size_t>(deg_edges));
  {
    std::vector<int64_t> cursor(offsets.begin(), offsets.end() - 1);
    for (int64_t e = 0; e < num_edges; ++e) {
      nbr[cursor[src[e]]++] = dst[e];
      nbr[cursor[dst[e]]++] = src[e];
    }
  }

  std::vector<int64_t> labels(static_cast<size_t>(num_nodes));
  std::iota(labels.begin(), labels.end(), int64_t{0});
  std::vector<int64_t> next(labels);

  const int64_t chunk = (num_nodes + nthreads - 1) / nthreads;
  for (int64_t r = 0; r < rounds; ++r) {
    std::atomic<bool> changed{false};
    parallel_run(nthreads, [&](int64_t t) {
      std::vector<int64_t> scratch;
      const int64_t lo = t * chunk, hi = std::min(num_nodes, lo + chunk);
      bool local_changed = false;
      for (int64_t n = lo; n < hi; ++n) {
        const int64_t s = offsets[n], e = offsets[n + 1];
        if (s == e) continue;  // isolated: keeps its label (numpy semantics)
        scratch.clear();
        for (int64_t i = s; i < e; ++i) scratch.push_back(labels[nbr[i]]);
        std::sort(scratch.begin(), scratch.end());
        int64_t best_label = scratch[0], best_count = 0;
        int64_t run_label = scratch[0], run_count = 0;
        for (size_t i = 0; i < scratch.size(); ++i) {
          if (scratch[i] != run_label) {
            if (run_count >= best_count) {  // >= : larger label wins ties
              best_count = run_count;
              best_label = run_label;
            }
            run_label = scratch[i];
            run_count = 0;
          }
          ++run_count;
        }
        if (run_count >= best_count) best_label = run_label;
        next[n] = best_label;
        local_changed |= (best_label != labels[n]);
      }
      if (local_changed) changed.store(true, std::memory_order_relaxed);
    });
    if (!changed.load()) break;
    std::swap(labels, next);
    std::copy(labels.begin(), labels.end(), next.begin());
  }

  // Canonicalize labels to 0..C-1 in ascending-label order (np.unique).
  std::vector<int64_t> uniq(labels);
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
  const int64_t ncomm = static_cast<int64_t>(uniq.size());
  std::vector<int64_t> dense(static_cast<size_t>(num_nodes));
  parallel_run(nthreads, [&](int64_t t) {
    const int64_t lo = t * chunk, hi = std::min(num_nodes, lo + chunk);
    for (int64_t n = lo; n < hi; ++n)
      dense[n] = std::lower_bound(uniq.begin(), uniq.end(), labels[n]) -
                 uniq.begin();
  });

  std::vector<int64_t> sizes(static_cast<size_t>(ncomm), 0);
  for (int64_t n = 0; n < num_nodes; ++n) ++sizes[dense[n]];
  // comm_rank: communities by size desc, ties by canonical id asc (stable).
  std::vector<int64_t> comm_ids(static_cast<size_t>(ncomm));
  std::iota(comm_ids.begin(), comm_ids.end(), int64_t{0});
  std::stable_sort(comm_ids.begin(), comm_ids.end(),
                   [&](int64_t a, int64_t b) { return sizes[a] > sizes[b]; });
  std::vector<int64_t> comm_rank(static_cast<size_t>(ncomm));
  for (int64_t i = 0; i < ncomm; ++i) comm_rank[comm_ids[i]] = i;

  // degree = np.bincount([src, dst]) == symmetrized-CSR row lengths.
  std::vector<int64_t> degree(static_cast<size_t>(num_nodes));
  for (int64_t n = 0; n < num_nodes; ++n)
    degree[n] = offsets[n + 1] - offsets[n];

  std::iota(perm_out, perm_out + num_nodes, int64_t{0});
  std::stable_sort(perm_out, perm_out + num_nodes, [&](int64_t a, int64_t b) {
    const int64_t ra = comm_rank[dense[a]], rb = comm_rank[dense[b]];
    if (ra != rb) return ra < rb;
    return degree[a] > degree[b];  // hubs first; full ties keep node id order
  });
}

// ---------------------------------------------------------------------------
// All-pairs banded DTW over per-node profiles
// (mirrors models/stgode.py:dtw_profile_distances: Sakoe-Chiba band,
// float32 DP, |a-b| local cost; STGODE's semantic graph — paper §4.1).
// ---------------------------------------------------------------------------

void msg_dtw_band(const float* profiles, int64_t num_nodes, int64_t plen,
                  int64_t band, float* out, int64_t nthreads) {
  nthreads = clamp_threads(nthreads);
  const float inf = std::numeric_limits<float>::infinity();
  // Round-robin rows across threads so the (shrinking) upper-triangle work
  // stays balanced.
  parallel_run(nthreads, [&](int64_t t) {
    std::vector<float> dp(static_cast<size_t>(plen) * plen);
    for (int64_t i = t; i < num_nodes; i += nthreads) {
      const float* pi = profiles + i * plen;
      out[i * num_nodes + i] = 0.0f;
      for (int64_t j = i + 1; j < num_nodes; ++j) {
        const float* pj = profiles + j * plen;
        std::fill(dp.begin(), dp.end(), inf);
        for (int64_t a = 0; a < plen; ++a) {
          const int64_t lo = std::max<int64_t>(0, a - band);
          const int64_t hi = std::min<int64_t>(plen, a + band + 1);
          for (int64_t b = lo; b < hi; ++b) {
            const float c = std::fabs(pi[a] - pj[b]);
            if (a == 0 && b == 0) {
              dp[0] = c;
              continue;
            }
            float best = inf;
            if (a > 0) best = std::min(best, dp[(a - 1) * plen + b]);
            if (b > 0) best = std::min(best, dp[a * plen + b - 1]);
            if (a > 0 && b > 0)
              best = std::min(best, dp[(a - 1) * plen + b - 1]);
            dp[a * plen + b] = c + best;
          }
        }
        const float d = dp[plen * plen - 1];
        out[i * num_nodes + j] = d;
        out[j * num_nodes + i] = d;
      }
    }
  });
}

}  // extern "C"
