// gpsat_tpu native host kernels.
//
// TPU-native equivalents of the reference's in-repo numba @guvectorize
// kernels (SURVEY.md §2.10; ref: GPSat/prediction_locations.py:18-43,
// GPSat/postprocessing.py:22-52) plus the tile-assembly hot loop the
// reference runs per expert in Python (GPSat/dataloader.py:2354-2447).
// Device compute stays in JAX/XLA; these run on host where the work is
// irregular (ragged index sets, 1e8-row masks) and feed the padded
// tile batches.
//
// Plain C ABI for ctypes binding (no pybind11 in this image). Threaded
// with std::thread (no OpenMP dependency).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline unsigned hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 4 : n;
}

template <typename F>
void parallel_for(int64_t n, F&& body) {
  unsigned nt = hw_threads();
  if (n < 4096 || nt <= 1) {
    for (int64_t i = 0; i < n; ++i) body(i);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nt - 1) / nt;
  for (unsigned t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    threads.emplace_back([lo, hi, &body] {
      for (int64_t i = lo; i < hi; ++i) body(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// ABI version, checked by the ctypes loader (gpsat_tpu/native.py) before
// any argtypes are trusted. Bump whenever an exported signature changes
// (e.g. v2 added the `inclusive` argument to gpsat_grid_index_query;
// v3 added the lz4/unshuffle codec kernels); a stale prebuilt .so then
// falls back to the numpy/scipy paths instead of being called with
// shifted pointer arguments.
int64_t gpsat_abi_version() { return 4; }

// Euclidean-ball mask: out[i] = ||locs[i,:] - ref||_2 < max_dist.
// Per-dimension prefilter then full norm, matching the numba kernel's
// shape (ref: prediction_locations.py:18-43); built for ~1e8 rows.
void gpsat_max_dist_bool(const double* locs, int64_t n, int64_t d,
                         const double* ref, double max_dist, uint8_t* out) {
  const double r2 = max_dist * max_dist;
  parallel_for(n, [&](int64_t i) {
    const double* row = locs + i * d;
    bool ok = true;
    for (int64_t j = 0; j < d; ++j) {
      const double diff = row[j] - ref[j];
      if (diff * diff >= r2) { ok = false; break; }
    }
    if (ok) {
      double s = 0.0;
      for (int64_t j = 0; j < d; ++j) {
        const double diff = row[j] - ref[j];
        s += diff * diff;
      }
      ok = s < r2;
    }
    out[i] = ok ? 1 : 0;
  });
}

// NaN-aware Gaussian-kernel weighted mean (ref: postprocessing.py:22-52):
// out[i] = sum_j w_ij v_j / sum_j w_ij over finite v_j, NaN when all
// weights vanish. n_t targets x n_s sources.
void gpsat_gaussian_2d_weight(const double* x0, const double* y0, int64_t n_t,
                              const double* x, const double* y,
                              const double* vals, int64_t n_s,
                              double l_x, double l_y, double* out) {
  parallel_for(n_t, [&](int64_t i) {
    double w_sum = 0.0, w_val = 0.0;
    const double xi = x0[i], yi = y0[i];
    for (int64_t j = 0; j < n_s; ++j) {
      const double v = vals[j];
      if (std::isnan(v)) continue;
      const double dx = (x[j] - xi) / l_x;
      const double dy = (y[j] - yi) / l_y;
      const double w = std::exp(-0.5 * (dx * dx + dy * dy));
      w_sum += w;
      w_val += w * v;
    }
    out[i] = (w_sum == 0.0) ? NAN : (w_val / w_sum);
  });
}

// Stable inverse softplus / scaled inverse sigmoid
// (ref: utils.py:2329-2356, 2386-2394).
void gpsat_inverse_softplus(const double* y, int64_t n, double shift, double* out) {
  const double thresh = std::log(2.220446049250313e-16) + 2.0;
  parallel_for(n, [&](int64_t i) {
    const double v = y[i] - shift;
    if (v <= 0.0) out[i] = -INFINITY;
    else if (v < std::exp(thresh)) out[i] = std::log(v);
    else if (v > -thresh) out[i] = v;
    else out[i] = std::log(-std::expm1(-v)) + v;
  });
}

void gpsat_inverse_sigmoid(const double* y, int64_t n, double low, double high, double* out) {
  parallel_for(n, [&](int64_t i) {
    if (y[i] <= low) out[i] = -INFINITY;
    else if (y[i] >= high) out[i] = INFINITY;
    else out[i] = -std::log((high - low) / (y[i] - low) - 1.0);
  });
}

// --------------------------------------------------------------------
// Grid-hash radius index: replaces per-expert KDTree.query_ball_point
// (ref: dataloader.py:2354-2447) with one build + parallel queries over
// all experts. 2-d; cell size = radius so each query scans <= 9 cells.
// --------------------------------------------------------------------

struct GridIndex {
  double x_min, y_min, cell;
  int64_t nx, ny;
  std::vector<int64_t> cell_start;   // CSR offsets [nx*ny + 1]
  std::vector<int64_t> point_ids;    // point ids sorted by cell
  std::vector<double> xs, ys;
};

static GridIndex* g_index = nullptr;

void gpsat_grid_index_build(const double* x, const double* y, int64_t n, double cell) {
  delete g_index;
  g_index = new GridIndex();
  GridIndex& g = *g_index;
  g.cell = cell;
  g.xs.assign(x, x + n);
  g.ys.assign(y, y + n);
  double x_min = INFINITY, y_min = INFINITY, x_max = -INFINITY, y_max = -INFINITY;
  for (int64_t i = 0; i < n; ++i) {
    x_min = x[i] < x_min ? x[i] : x_min;
    y_min = y[i] < y_min ? y[i] : y_min;
    x_max = x[i] > x_max ? x[i] : x_max;
    y_max = y[i] > y_max ? y[i] : y_max;
  }
  g.x_min = x_min;
  g.y_min = y_min;
  g.nx = n ? (int64_t)((x_max - x_min) / cell) + 1 : 1;
  g.ny = n ? (int64_t)((y_max - y_min) / cell) + 1 : 1;

  const int64_t ncell = g.nx * g.ny;
  std::vector<int64_t> counts(ncell + 1, 0);
  std::vector<int64_t> cid(n);
  for (int64_t i = 0; i < n; ++i) {
    int64_t cx = (int64_t)((x[i] - x_min) / cell);
    int64_t cy = (int64_t)((y[i] - y_min) / cell);
    cid[i] = cy * g.nx + cx;
    counts[cid[i] + 1]++;
  }
  for (int64_t c = 0; c < ncell; ++c) counts[c + 1] += counts[c];
  g.cell_start = counts;
  g.point_ids.resize(n);
  std::vector<int64_t> cursor(g.cell_start.begin(), g.cell_start.end() - 1);
  for (int64_t i = 0; i < n; ++i) g.point_ids[cursor[cid[i]]++] = i;
}

// Count then fill: for E experts, first call with fill=0 to get per-expert
// counts; allocate; call with fill=1 and CSR offsets to collect indices.
// `inclusive` picks the boundary rule: d <= r (scipy query_ball_point
// semantics, used by local_select) vs d < r (the reference's
// _max_dist_bool semantics, used by prediction locations).
void gpsat_grid_index_query(const double* ex, const double* ey, int64_t n_experts,
                            double radius, int fill, int inclusive,
                            int64_t* counts_or_offsets, int64_t* out_indices) {
  const GridIndex& g = *g_index;
  const double r2 = radius * radius;
  parallel_for(n_experts, [&](int64_t e) {
    const double qx = ex[e], qy = ey[e];
    int64_t cx = (int64_t)std::floor((qx - g.x_min) / g.cell);
    int64_t cy = (int64_t)std::floor((qy - g.y_min) / g.cell);
    const int64_t reach = (int64_t)std::ceil(radius / g.cell);
    int64_t count = 0;
    int64_t write = fill ? counts_or_offsets[e] : 0;
    for (int64_t dy = -reach; dy <= reach; ++dy) {
      const int64_t yy = cy + dy;
      if (yy < 0 || yy >= g.ny) continue;
      for (int64_t dx = -reach; dx <= reach; ++dx) {
        const int64_t xx = cx + dx;
        if (xx < 0 || xx >= g.nx) continue;
        const int64_t c = yy * g.nx + xx;
        for (int64_t k = g.cell_start[c]; k < g.cell_start[c + 1]; ++k) {
          const int64_t p = g.point_ids[k];
          const double ddx = g.xs[p] - qx;
          const double ddy = g.ys[p] - qy;
          const double dd = ddx * ddx + ddy * ddy;
          if (inclusive ? (dd <= r2) : (dd < r2)) {
            if (fill) out_indices[write++] = p;
            else count++;
          }
        }
      }
    }
    if (!fill) counts_or_offsets[e] = count;
  });
}

void gpsat_grid_index_free() {
  delete g_index;
  g_index = nullptr;
}

// --------------------------------------------------------------------
// zarr/blosc codec kernels. The reference's zarr engine (xarray ->
// zarr-python, ref: GPSat/dataloader.py:60-66,1294-1414) writes stores
// with the zarr default compressor Blosc(cname='lz4', shuffle=SHUFFLE).
// Frame parsing (irregular, tiny) stays in Python
// (gpsat_tpu/data/blosc.py); the byte-crunching inner loops live here.
// --------------------------------------------------------------------

// LZ4 *block* decompression (https://lz4.org block format: sequences of
// [token | literal-len ext | literals | 2B LE offset | match-len ext]).
// Returns bytes written to dst, or -1 on malformed/overflowing input.
// Bounds-checked throughout: never reads past src+src_len or writes past
// dst+dst_len, so a corrupt chunk fails cleanly instead of scribbling.
int64_t gpsat_lz4_decompress(const uint8_t* src, int64_t src_len,
                             uint8_t* dst, int64_t dst_len) {
  const uint8_t* ip = src;
  const uint8_t* const iend = src + src_len;
  uint8_t* op = dst;
  uint8_t* const oend = dst + dst_len;
  while (ip < iend) {
    const uint8_t token = *ip++;
    int64_t lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do {
        if (ip >= iend) return -1;
        b = *ip++;
        lit += b;
      } while (b == 255);
    }
    if (lit > iend - ip || lit > oend - op) return -1;
    std::memcpy(op, ip, lit);
    ip += lit;
    op += lit;
    if (ip >= iend) break;  // final sequence carries literals only
    if (iend - ip < 2) return -1;
    const int64_t offset = ip[0] | ((int64_t)ip[1] << 8);
    ip += 2;
    if (offset == 0 || offset > op - dst) return -1;
    int64_t mlen = (token & 0xF) + 4;
    if ((token & 0xF) == 15) {
      uint8_t b;
      do {
        if (ip >= iend) return -1;
        b = *ip++;
        mlen += b;
      } while (b == 255);
    }
    if (mlen > oend - op) return -1;
    const uint8_t* match = op - offset;
    // byte-by-byte: offset < mlen (overlapping match / RLE) is legal
    for (int64_t i = 0; i < mlen; ++i) op[i] = match[i];
    op += mlen;
  }
  return op - dst;
}

// Inverse of blosc's byte-shuffle filter over one block: src holds
// `typesize` sub-streams, stream j being byte j of each of the n
// elements; trailing len % typesize bytes pass through unchanged
// (matching c-blosc's shuffle() leftover rule).
void gpsat_byte_unshuffle(const uint8_t* src, int64_t len, int64_t typesize,
                          uint8_t* dst) {
  const int64_t n = len / typesize;
  const int64_t m = n * typesize;
  for (int64_t j = 0; j < typesize; ++j) {
    const uint8_t* s = src + j * n;
    uint8_t* d = dst + j;
    for (int64_t i = 0; i < n; ++i) d[i * typesize] = s[i];
  }
  std::memcpy(dst + m, src + m, len - m);
}

// blosclz stream decompression (c-blosc 1.21 / blosclz 2.x format, a
// FastLZ derivative: 5-bit-masked initial literal token; match tokens
// carry a 3-bit length (7 = extended, +bytes while 255) and a 5-bit
// offset high byte; code==255 with ofs==31<<8 switches to an explicit
// big-endian 16-bit far distance beyond MAX_DISTANCE; distance 0 is an
// RLE run of the previous byte). Returns bytes written or -1 on
// malformed input; bounds-checked like gpsat_lz4_decompress. Mirrors
// the pure-Python _blosclz_decompress_py, which is oracle-tested
// against libblosc 1.21.3 output.
int64_t gpsat_blosclz_decompress(const uint8_t* src, int64_t src_len,
                                 uint8_t* dst, int64_t dst_len) {
  const int64_t kMaxDistance = 8191;
  const uint8_t* ip = src;
  const uint8_t* const iend = src + src_len;
  uint8_t* op = dst;
  uint8_t* const oend = dst + dst_len;
  if (src_len == 0) return 0;
  uint32_t ctrl = (*ip++) & 31u;
  for (;;) {
    if (ctrl >= 32u) {
      int64_t len = (int64_t)(ctrl >> 5u) - 1;
      int64_t ofs = (int64_t)(ctrl & 31u) << 8u;
      if (len == 7 - 1) {
        uint8_t code;
        do {
          if (ip >= iend) return -1;
          code = *ip++;
          len += code;
        } while (code == 255);
      }
      if (ip >= iend) return -1;
      const uint8_t code = *ip++;
      len += 3;
      int64_t ref = (op - dst) - ofs - code;
      if (code == 255 && ofs == (31 << 8)) {
        if (ip + 1 >= iend) return -1;
        ofs = ((int64_t)ip[0] << 8) | (int64_t)ip[1];
        ip += 2;
        ref = (op - dst) - ofs - kMaxDistance;
      }
      if (len > oend - op) return -1;
      if (ref - 1 < 0) return -1;
      bool more = ip < iend;
      if (more) ctrl = *ip++;
      if (ref == op - dst) {  // RLE run of the previous byte
        std::memset(op, dst[ref - 1], (size_t)len);
        op += len;
      } else {
        const uint8_t* m = dst + ref - 1;
        for (int64_t i = 0; i < len; ++i) op[i] = m[i];  // overlap-legal
        op += len;
      }
      if (!more) break;
    } else {
      ctrl++;
      if ((int64_t)ctrl > oend - op || (int64_t)ctrl > iend - ip) return -1;
      std::memcpy(op, ip, ctrl);
      op += ctrl;
      ip += ctrl;
      if (ip >= iend) break;
      ctrl = *ip++;
    }
  }
  return op - dst;
}

}  // extern "C"
