// meshkit: native host-side mesh runtime for fourc_tpu.
//
// Counterpart of the reference's C++ mesh machinery on the host side:
// GridGenerator (ref: src/core/io/src/4C_io_gridgenerator.hpp:35 —
// create_rectangular_cuboid_discretization), Isorropia/Zoltan partitioning
// (ref: src/core/rebalance/src/4C_rebalance_graph_based.cpp:59-110, here
// recursive coordinate bisection), and the assembly-map construction that
// Epetra graphs perform (ref: 4C_linalg_sparsematrix.hpp `savegraph`) —
// here a counting sort producing the deterministic segment-sum permutation.
//
// The TPU compute path stays JAX/XLA; this library removes the Python-loop
// host bottlenecks (mesh generation, reordering, dof-map construction) that
// dominate setup time at 1M+ dofs.  Built as a plain C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmeshkit.so meshkit.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// hex8 connectivity of an nx*ny*nz lattice box, lexicographic node ids
// (i*py + j)*pz + k; element order = i,j,k row-major (matches gridgen.box).
void hex_box_conn(int32_t nx, int32_t ny, int32_t nz, int32_t* conn) {
  const int64_t py = ny + 1, pz = nz + 1;
  static const int off[8][3] = {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
                                {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};
  int64_t e = 0;
  for (int32_t i = 0; i < nx; ++i)
    for (int32_t j = 0; j < ny; ++j)
      for (int32_t k = 0; k < nz; ++k, ++e)
        for (int a = 0; a < 8; ++a)
          conn[e * 8 + a] = (int32_t)(((i + off[a][0]) * py + (j + off[a][1])) * pz +
                                      (k + off[a][2]));
}

// lattice coordinates of the (nx+1)*(ny+1)*(nz+1) box nodes
void hex_box_coords(int32_t nx, int32_t ny, int32_t nz, const double* lo,
                    const double* hi, double* coords) {
  const int64_t px = nx + 1, py = ny + 1, pz = nz + 1;
  int64_t n = 0;
  for (int64_t i = 0; i < px; ++i)
    for (int64_t j = 0; j < py; ++j)
      for (int64_t k = 0; k < pz; ++k, ++n) {
        coords[n * 3 + 0] = lo[0] + (hi[0] - lo[0]) * (double)i / nx;
        coords[n * 3 + 1] = lo[1] + (hi[1] - lo[1]) * (double)j / ny;
        coords[n * 3 + 2] = lo[2] + (hi[2] - lo[2]) * (double)k / nz;
      }
}

// recursive coordinate bisection: permutation grouping n points into
// 2^levels geometrically compact parts (Zoltan RCB analog)
void rcb_order(const double* pts, int64_t n, int32_t dim, int32_t levels,
               int32_t* perm) {
  std::vector<int32_t> idx(n);
  std::iota(idx.begin(), idx.end(), 0);
  struct Range { int64_t lo, hi; };
  std::vector<Range> parts{{0, n}};
  for (int32_t l = 0; l < levels; ++l) {
    std::vector<Range> next;
    next.reserve(parts.size() * 2);
    for (const Range& r : parts) {
      const int64_t len = r.hi - r.lo;
      if (len <= 1) {
        next.push_back(r);
        next.push_back({r.hi, r.hi});
        continue;
      }
      // widest-extent axis
      double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
      for (int64_t t = r.lo; t < r.hi; ++t)
        for (int32_t d = 0; d < dim; ++d) {
          const double v = pts[(int64_t)idx[t] * dim + d];
          mn[d] = std::min(mn[d], v);
          mx[d] = std::max(mx[d], v);
        }
      int32_t ax = 0;
      for (int32_t d = 1; d < dim; ++d)
        if (mx[d] - mn[d] > mx[ax] - mn[ax]) ax = d;
      const int64_t half = r.lo + len / 2;
      std::nth_element(idx.begin() + r.lo, idx.begin() + half,
                       idx.begin() + r.hi, [&](int32_t a, int32_t b) {
                         const double va = pts[(int64_t)a * dim + ax];
                         const double vb = pts[(int64_t)b * dim + ax];
                         return va != vb ? va < vb : a < b;
                       });
      next.push_back({r.lo, half});
      next.push_back({half, r.hi});
    }
    parts.swap(next);
  }
  std::memcpy(perm, idx.data(), n * sizeof(int32_t));
}

// deterministic assembly map: for flattened element dofs edof[M], produce a
// stable permutation `perm` sorting by dof id plus the sorted ids — the
// segment-sum metadata (counting sort, O(M + ndof))
void build_dof_perm(const int32_t* edof, int64_t m, int64_t ndof,
                    int32_t* perm, int32_t* sorted_dof) {
  std::vector<int64_t> count(ndof + 1, 0);
  for (int64_t t = 0; t < m; ++t) count[edof[t] + 1]++;
  for (int64_t d = 0; d < ndof; ++d) count[d + 1] += count[d];
  for (int64_t t = 0; t < m; ++t) {
    const int64_t pos = count[edof[t]]++;
    perm[pos] = (int32_t)t;
    sorted_dof[pos] = edof[t];
  }
}

// ---- geometric search (core/geomsearch.py fast paths; ArborX analog,
// ref: src/core/geometric_search/src/4C_geometric_search_bvh.cpp) ----

static inline uint32_t expand_bits3(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

// Karras linear BVH over n AABBs. Outputs (same layout/convention as the
// numpy builder in core/geomsearch.py — identical node numbering):
//   left/right: (n-1) child node ids; order: (n) leaf slot -> box id;
//   lo_all/hi_all: (2n-1, 3) float32 node bounds (internal then leaves).
void lbvh_build(const double* box_lo, const double* box_hi, int64_t n,
                int32_t* left, int32_t* right, int32_t* order,
                float* lo_all, float* hi_all) {
  std::vector<double> c((size_t)n * 3);
  double smn[3] = {1e300, 1e300, 1e300}, smx[3] = {-1e300, -1e300, -1e300};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      const double v = 0.5 * (box_lo[i * 3 + d] + box_hi[i * 3 + d]);
      c[i * 3 + d] = v;
      smn[d] = std::min(smn[d], v);
      smx[d] = std::max(smx[d], v);
    }
  double ext[3];
  for (int d = 0; d < 3; ++d)
    ext[d] = smx[d] > smn[d] ? smx[d] - smn[d] : 1.0;
  std::vector<uint64_t> code(n);
  for (int64_t i = 0; i < n; ++i) {
    uint32_t q[3];
    for (int d = 0; d < 3; ++d) {
      double t = (c[i * 3 + d] - smn[d]) / ext[d] * 1024.0;
      q[d] = (uint32_t)std::min(std::max(t, 0.0), 1023.0);
    }
    code[i] = (uint64_t)(expand_bits3(q[0]) << 2 | expand_bits3(q[1]) << 1 |
                         expand_bits3(q[2]));
  }
  std::vector<int32_t> ord(n);
  std::iota(ord.begin(), ord.end(), 0);
  std::stable_sort(ord.begin(), ord.end(), [&](int32_t a, int32_t b) {
    return code[a] < code[b];
  });
  std::memcpy(order, ord.data(), n * sizeof(int32_t));
  if (n == 1) {
    for (int d = 0; d < 3; ++d) {
      lo_all[d] = (float)box_lo[d];
      hi_all[d] = (float)box_hi[d];
    }
    return;
  }
  // tie-broken keys: (code << 32) | sorted-slot index
  std::vector<uint64_t> keys(n);
  for (int64_t s = 0; s < n; ++s)
    keys[s] = (code[ord[s]] << 32) | (uint64_t)s;
  auto split_of = [&](int64_t i, int64_t j) -> int64_t {
    const uint64_t first = keys[i];
    const int common = __builtin_clzll(first ^ keys[j]);
    int64_t lo_s = i, hi_s = j;
    while (lo_s + 1 < hi_s) {
      const int64_t mid = (lo_s + hi_s) / 2;
      if (__builtin_clzll(first ^ keys[mid]) > common)
        lo_s = mid;
      else
        hi_s = mid;
    }
    return lo_s;
  };
  // preorder over multi-leaf ranges (LIFO order matches the numpy builder)
  std::vector<std::pair<int64_t, int64_t>> stack{{0, n - 1}}, rng_of;
  rng_of.reserve(n - 1);
  // map (i,j) -> internal id without a hash map: an internal node's id is
  // its preorder index; children are found by re-splitting below
  while (!stack.empty()) {
    auto [i, j] = stack.back();
    stack.pop_back();
    rng_of.push_back({i, j});
    const int64_t split = split_of(i, j);
    if (split + 1 < j) stack.push_back({split + 1, j});
    if (split > i) stack.push_back({i, split});
  }
  // ids: hash (i,j) -> preorder id (flat map over start index works since
  // ranges with the same start are nested; use unordered key i*2^32|j)
  std::vector<int64_t> id_key(rng_of.size());
  for (size_t t = 0; t < rng_of.size(); ++t)
    id_key[t] = rng_of[t].first * (int64_t)n + rng_of[t].second;
  std::vector<int32_t> id_val(rng_of.size());
  std::iota(id_val.begin(), id_val.end(), 0);
  std::sort(id_val.begin(), id_val.end(), [&](int32_t a, int32_t b) {
    return id_key[a] < id_key[b];
  });
  std::vector<int64_t> id_key_sorted(rng_of.size());
  for (size_t t = 0; t < rng_of.size(); ++t)
    id_key_sorted[t] = id_key[id_val[t]];
  auto id_of = [&](int64_t i, int64_t j) -> int32_t {
    const int64_t k = i * (int64_t)n + j;
    const auto it = std::lower_bound(id_key_sorted.begin(),
                                     id_key_sorted.end(), k);
    return id_val[it - id_key_sorted.begin()];
  };
  for (size_t t = 0; t < rng_of.size(); ++t) {
    const auto [i, j] = rng_of[t];
    const int64_t split = split_of(i, j);
    left[t] = split == i ? (int32_t)(n - 1 + i) : id_of(i, split);
    right[t] = split + 1 == j ? (int32_t)(n - 1 + j) : id_of(split + 1, j);
  }
  for (int64_t s = 0; s < n; ++s)
    for (int d = 0; d < 3; ++d) {
      lo_all[(n - 1 + s) * 3 + d] = (float)box_lo[(int64_t)ord[s] * 3 + d];
      hi_all[(n - 1 + s) * 3 + d] = (float)box_hi[(int64_t)ord[s] * 3 + d];
    }
  for (int64_t t = n - 2; t >= 0; --t) {
    const int32_t l = left[t], r = right[t];
    for (int d = 0; d < 3; ++d) {
      lo_all[t * 3 + d] = std::min(lo_all[(int64_t)l * 3 + d],
                                   lo_all[(int64_t)r * 3 + d]);
      hi_all[t * 3 + d] = std::max(hi_all[(int64_t)l * 3 + d],
                                   hi_all[(int64_t)r * 3 + d]);
    }
  }
}

// matching octree analog: for each of the na points of A (dim components),
// the nearest B point within tol, else -1 (hash grid of cell size 2*tol;
// ref: 4C_geometric_search_matchingoctree.cpp)
void match_nodes(const double* a, int64_t na, const double* b, int64_t nb,
                 int32_t dim, double tol, int64_t* out) {
  const double cell = 2.0 * tol;
  struct KV { int64_t key[3]; int32_t idx; };
  auto quant = [&](const double* p, int64_t* k) {
    for (int d = 0; d < 3; ++d)
      k[d] = d < dim ? (int64_t)std::floor(p[d] / cell) : 0;
  };
  std::vector<KV> kv(nb);
  for (int64_t j = 0; j < nb; ++j) {
    quant(b + j * dim, kv[j].key);
    kv[j].idx = (int32_t)j;
  }
  auto less3 = [](const int64_t* x, const int64_t* y) {
    for (int d = 0; d < 3; ++d)
      if (x[d] != y[d]) return x[d] < y[d];
    return false;
  };
  std::sort(kv.begin(), kv.end(),
            [&](const KV& x, const KV& y) { return less3(x.key, y.key); });
  const int noff = dim == 2 ? 9 : (dim == 3 ? 27 : 3);
  for (int64_t i = 0; i < na; ++i) {
    int64_t base[3];
    quant(a + i * dim, base);
    int64_t best = -1;
    double bd = tol;
    for (int o = 0; o < noff; ++o) {
      int64_t k[3] = {base[0], base[1], base[2]};
      int oo = o;
      for (int d = 0; d < dim; ++d) {
        k[d] += (oo % 3) - 1;
        oo /= 3;
      }
      KV probe;
      std::memcpy(probe.key, k, sizeof(k));
      auto it = std::lower_bound(
          kv.begin(), kv.end(), probe,
          [&](const KV& x, const KV& y) { return less3(x.key, y.key); });
      for (; it != kv.end() && !less3(probe.key, it->key); ++it) {
        double d2 = 0.0;
        for (int d = 0; d < dim; ++d) {
          const double dd = a[i * dim + d] - b[(int64_t)it->idx * dim + d];
          d2 += dd * dd;
        }
        const double dist = std::sqrt(d2);
        if (dist <= bd) {
          best = it->idx;
          bd = dist;
        }
      }
    }
    out[i] = best;
  }
}

// node -> element adjacency in CSR form (for graph partitioning / coloring)
void node_element_csr(const int32_t* conn, int64_t e_count, int32_t nen,
                      int64_t n_nodes, int64_t* offsets, int32_t* items) {
  std::vector<int64_t> count(n_nodes + 1, 0);
  for (int64_t t = 0; t < e_count * nen; ++t) count[conn[t] + 1]++;
  for (int64_t v = 0; v < n_nodes; ++v) count[v + 1] += count[v];
  std::memcpy(offsets, count.data(), (n_nodes + 1) * sizeof(int64_t));
  std::vector<int64_t> cur(count.begin(), count.end() - 1);
  for (int64_t e = 0; e < e_count; ++e)
    for (int32_t a = 0; a < nen; ++a) {
      const int32_t v = conn[e * nen + a];
      items[cur[v]++] = (int32_t)e;
    }
}

}  // extern "C"
