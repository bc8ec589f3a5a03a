// Native AMG setup kernels (host side).
//
// TPU-native replacement for the *native* setup phase the reference gets
// from the AMGX C++ library (torch_amgx.py:140 solver.setup): strength-of-
// connection + greedy aggregation and the Galerkin RAP coarse-operator
// product. The solve phase runs on the TPU; this setup phase is a host
// graph algorithm with data-dependent shapes, so it is implemented in C++
// (deterministic, single-pass, no Python/scipy in the loop) and reached
// through a ctypes binding (tpu_sparse/native/__init__.py).
//
// Conventions: CSR with int32 indptr/indices, float64 values, symmetric
// pattern (SPD-style operators — the AMG target class). Aggregate ids are
// int64.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Greedy size-targeted aggregation with symmetric strength-of-connection
// |a_ij| >= theta * sqrt(|a_ii a_jj|). Mirrors the AGGREGATION/SIZE_4
// selector behavior the reference configures (torch_amgx.py:50-73).
// Deterministic: nodes visited in index order.
// Returns the number of aggregates; agg_out[i] in [0, n_agg).
int64_t ts_aggregate(int64_t n, const int32_t* indptr,
                     const int32_t* indices, const double* data,
                     double theta, int32_t target_size, int64_t* agg_out) {
  std::vector<double> diag(n, 0.0);
  for (int64_t i = 0; i < n; ++i)
    for (int32_t k = indptr[i]; k < indptr[i + 1]; ++k)
      if (indices[k] == i) diag[i] += data[k];

  std::vector<int64_t> agg(n, -1);
  int64_t next = 0;

  // Phase 1: seed an aggregate at each unassigned node, absorbing up to
  // target_size-1 unassigned strong neighbors.
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] != -1) continue;
    agg[i] = next;
    int32_t taken = 1;
    for (int32_t k = indptr[i]; k < indptr[i + 1] && taken < target_size;
         ++k) {
      int32_t j = indices[k];
      if (j == i || agg[j] != -1) continue;
      double thr = theta * std::sqrt(std::fabs(diag[i] * diag[j]));
      if (std::fabs(data[k]) >= thr) {
        agg[j] = next;
        ++taken;
      }
    }
    ++next;
  }

  // Phase 2: merge singleton aggregates into a neighboring aggregate.
  std::vector<int64_t> sizes(next, 0);
  for (int64_t i = 0; i < n; ++i) ++sizes[agg[i]];
  for (int64_t i = 0; i < n; ++i) {
    if (sizes[agg[i]] != 1) continue;
    for (int32_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      int32_t j = indices[k];
      if (j == i) continue;
      int64_t t = agg[j];
      if (t != agg[i] && sizes[t] < 2 * target_size) {
        --sizes[agg[i]];
        agg[i] = t;
        ++sizes[t];
        break;
      }
    }
  }

  // Compact ids in first-use order (== ascending original id order).
  std::vector<int64_t> remap(next, -1);
  int64_t na = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (remap[agg[i]] == -1) remap[agg[i]] = na++;
    agg_out[i] = remap[agg[i]];
  }
  return na;
}

// Galerkin RAP for a piecewise-constant (unsmoothed-aggregation)
// prolongator: Ac[agg[i], agg[j]] = sum A[i, j]. One relabel + sort +
// coalesce pass; caller provides output buffers of capacity >= nnz(A).
// Returns nnz(Ac), or -1 if the capacity is insufficient.
int64_t ts_rap_pc(int64_t n, int64_t nc, const int32_t* indptr,
                  const int32_t* indices, const double* data,
                  const int64_t* agg, int32_t* indptr_c, int32_t* indices_c,
                  double* data_c, int64_t cap) {
  int64_t nnz = indptr[n];
  std::vector<std::pair<int64_t, double>> entries;
  entries.reserve(nnz);
  for (int64_t i = 0; i < n; ++i) {
    int64_t r = agg[i];
    for (int32_t k = indptr[i]; k < indptr[i + 1]; ++k)
      entries.emplace_back(r * nc + agg[indices[k]], data[k]);
  }
  std::sort(entries.begin(), entries.end(),
            [](const auto& a, const auto& b) { return a.first < b.first; });

  int64_t out = 0;
  for (int64_t k = 0; k < (int64_t)entries.size();) {
    int64_t key = entries[k].first;
    double v = 0.0;
    while (k < (int64_t)entries.size() && entries[k].first == key)
      v += entries[k++].second;
    if (out >= cap) return -1;
    indices_c[out] = (int32_t)(key % nc);
    data_c[out] = v;
    // stash the coarse row temporarily in indptr space via counts below
    entries[out].first = key / nc;  // reuse as row id storage
    ++out;
  }
  // build indptr_c from row ids
  for (int64_t r = 0; r <= nc; ++r) indptr_c[r] = 0;
  for (int64_t k = 0; k < out; ++k) ++indptr_c[entries[k].first + 1];
  for (int64_t r = 0; r < nc; ++r) indptr_c[r + 1] += indptr_c[r];
  return out;
}

// Row L1 norms (the L1-Jacobi smoother diagonal).
void ts_l1_row_norms(int64_t n, const int32_t* indptr, const double* data,
                     double* out) {
  for (int64_t i = 0; i < n; ++i) {
    double s = 0.0;
    for (int32_t k = indptr[i]; k < indptr[i + 1]; ++k)
      s += std::fabs(data[k]);
    out[i] = s;
  }
}

}  // extern "C"
