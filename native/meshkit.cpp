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
