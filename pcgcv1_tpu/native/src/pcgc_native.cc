// pcgc_native: host-side entropy-coding runtime for pcgcv1_tpu.
//
// TPU-native equivalents of the reference's native components
// (NJUVISION/PCGCv1):
//   - TF contrib coder_ops range coder (models/entropy_model.py:6)
//     -> RangeEncoder/RangeDecoder + quantized-CDF symbol coders below.
//   - tmc3 lossless cube-position coding (dataprocess/inout_bitstream.py:33)
//     -> adaptive-arithmetic octree coder below.
//
// Everything feeding the range coder is computed deterministically (see
// det_math.h) so encode/decode never diverge — the fix for the reference's
// GPU decode-mismatch bug (its README.md:111-114).
//
// Quantized CDF schema (shared by all coders): for N symbols and total
// T = 2^16, with a monotone model CDF F evaluated at symbol boundaries
// x_j = min_v - 0.5 + j:
//     qcdf(j) = j + floor((T - N) * (F(x_j) - F(x_0)) / (F(x_N) - F(x_0)))
// giving qcdf(0) = 0, qcdf(N) = T, and frequency >= 1 per symbol (the role
// of the reference's likelihood_bound, entropy_model.py:19). This is O(1)
// per evaluation — no materialized per-voxel PMF tables (the reference
// builds [B*16^3, C, N] tables on device, conditional_entropy_model.py:
// 95-124; we evaluate lazily in C++ instead).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#include "det_math.h"
#include "range_coder.h"

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace pcgc {
namespace {

constexpr double kMinScale = 1e-9;   // transform.py:145 lower bound
constexpr double kMinMass = 1e-290;  // uniform fallback guard

// ---------------------------------------------------------------------------
// Laplace conditional coder (per-element loc/scale).
// Reference capability: models/conditional_entropy_model.py.
// ---------------------------------------------------------------------------

struct LaplaceCdf {
  double loc, b, lo, inv_z;
  uint32_t n, avail;
  bool uniform;

  LaplaceCdf(float loc_f, float scale_f, int32_t min_v, int32_t max_v) {
    loc = static_cast<double>(loc_f);
    b = static_cast<double>(scale_f);
    if (b < kMinScale) b = kMinScale;
    n = static_cast<uint32_t>(max_v - min_v + 1);
    avail = kProbTotal - n;
    lo = laplace_cdf(min_v - 0.5, loc, b);
    double hi = laplace_cdf(max_v + 0.5, loc, b);
    double z = hi - lo;
    uniform = !(z > kMinMass);
    inv_z = uniform ? 0.0 : static_cast<double>(avail) / z;
    min_v_ = min_v;
  }

  inline uint32_t Q(uint32_t j) const {
    if (j == 0) return 0;
    if (j >= n) return kProbTotal;
    if (uniform)
      return static_cast<uint32_t>(
          (static_cast<uint64_t>(j) * kProbTotal) / n);
    double f = laplace_cdf(min_v_ - 0.5 + static_cast<double>(j), loc, b);
    double t = (f - lo) * inv_z;
    if (t < 0.0) t = 0.0;
    uint32_t q = j + static_cast<uint32_t>(t);
    return q > kProbTotal ? kProbTotal : q;
  }

 private:
  int32_t min_v_;
};

int64_t LaplaceEncodeOne(const int32_t* values, const float* loc,
                         const float* scale, int64_t n, int32_t min_v,
                         int32_t max_v, std::vector<uint8_t>* out) {
  RangeEncoder enc(out);
  for (int64_t i = 0; i < n; ++i) {
    LaplaceCdf c(loc[i], scale[i], min_v, max_v);
    uint32_t j = static_cast<uint32_t>(values[i] - min_v);
    if (j >= c.n) return -1;
    uint32_t a = c.Q(j), b2 = c.Q(j + 1);
    enc.Encode(a, b2 - a);
  }
  enc.Finish();
  return static_cast<int64_t>(out->size());
}

void LaplaceDecodeOne(const uint8_t* buf, int64_t nbytes, int64_t n,
                      const float* loc, const float* scale, int32_t min_v,
                      int32_t max_v, int32_t* values) {
  RangeDecoder dec(buf, static_cast<size_t>(nbytes));
  for (int64_t i = 0; i < n; ++i) {
    LaplaceCdf c(loc[i], scale[i], min_v, max_v);
    uint32_t pos = dec.Peek();
    // binary search: largest j with Q(j) <= pos
    uint32_t a = 0, b2 = c.n;  // invariant Q(a) <= pos < Q(b2)
    while (b2 - a > 1) {
      uint32_t m = (a + b2) >> 1;
      if (c.Q(m) <= pos)
        a = m;
      else
        b2 = m;
    }
    uint32_t qa = c.Q(a), qb = c.Q(a + 1);
    dec.Consume(qa, qb - qa);
    values[i] = static_cast<int32_t>(a) + min_v;
  }
}

}  // namespace
}  // namespace pcgc

extern "C" {

int pcgc_version() { return 1; }

// --------------------------- Laplace conditional ---------------------------

// Returns bytes written or -1 on error (symbol out of range / cap exceeded).
int64_t pcgc_laplace_encode(const int32_t* values, const float* loc,
                            const float* scale, int64_t n, int32_t min_v,
                            int32_t max_v, uint8_t* out, int64_t cap) {
  std::vector<uint8_t> buf;
  buf.reserve(static_cast<size_t>(n / 2 + 64));
  int64_t sz = pcgc::LaplaceEncodeOne(values, loc, scale, n, min_v, max_v,
                                      &buf);
  if (sz < 0 || sz > cap) return -1;
  std::memcpy(out, buf.data(), static_cast<size_t>(sz));
  return sz;
}

int pcgc_laplace_decode(const uint8_t* buf, int64_t nbytes, int64_t n,
                        const float* loc, const float* scale, int32_t min_v,
                        int32_t max_v, int32_t* values) {
  pcgc::LaplaceDecodeOne(buf, nbytes, n, loc, scale, min_v, max_v, values);
  return 0;
}

// Batch over B independent items (e.g. per-cube y streams,
// transform.py:157-168 in the reference), parallelized across items.
// out is [B, cap_per] row-major; lens[b] receives bytes (or -1).
int pcgc_laplace_encode_batch(const int32_t* values, const float* loc,
                              const float* scale, int32_t B, int64_t elems,
                              const int32_t* min_vs, const int32_t* max_vs,
                              uint8_t* out, int64_t cap_per, int64_t* lens) {
  int err = 0;
#pragma omp parallel for schedule(dynamic)
  for (int32_t b = 0; b < B; ++b) {
    const int64_t off = static_cast<int64_t>(b) * elems;
    int64_t sz = pcgc_laplace_encode(values + off, loc + off, scale + off,
                                     elems, min_vs[b], max_vs[b],
                                     out + static_cast<int64_t>(b) * cap_per,
                                     cap_per);
    lens[b] = sz;
    if (sz < 0) err = -1;
  }
  return err;
}

// bufs: concatenated streams; offsets[b]/lens[b] locate item b.
int pcgc_laplace_decode_batch(const uint8_t* bufs, const int64_t* offsets,
                              const int64_t* lens, int32_t B, int64_t elems,
                              const int32_t* min_vs, const int32_t* max_vs,
                              const float* loc, const float* scale,
                              int32_t* values) {
#pragma omp parallel for schedule(dynamic)
  for (int32_t b = 0; b < B; ++b) {
    const int64_t off = static_cast<int64_t>(b) * elems;
    pcgc::LaplaceDecodeOne(bufs + offsets[b], lens[b], elems, loc + off,
                           scale + off, min_vs[b], max_vs[b], values + off);
  }
  return 0;
}

// ---------------- Quantized-prior (code-based) Laplace coder ---------------
//
// The hyper path ships (loc, scale) from device to host for every latent
// element. To cut that transfer 4x and make the prior itself integer-
// deterministic, the device emits codes:
//   loc_q   int8:   loc = loc_q / 8                  (1/8-voxel grid)
//   scale_q uint8:  scale = 2^(scale_q / 8 - 20)     (1/8-octave grid)
// and the coder reconstructs doubles from the codes below. Rate impact of
// the grids is negligible (<0.5%); determinism now only requires the
// device to produce identical *codes*, not identical floats.

namespace pcgc {
namespace {

inline double LocFromCode(int8_t q) { return static_cast<double>(q) * 0.125; }

inline double ScaleFromCode(uint8_t q) {
  // 2^(q/8 - 20), deterministic: ldexp(det_exp(ln2 * frac), int_part)
  double e = static_cast<double>(q) * 0.125 - 20.0;
  double fl = std::floor(e);
  double frac = e - fl;
  return std::ldexp(det_exp(frac * 6.93147180559945286227e-01),
                    static_cast<int>(fl));
}

int64_t LaplaceQEncodeOne(const int32_t* values, const int8_t* loc_q,
                          const uint8_t* scale_q, int64_t n, int32_t min_v,
                          int32_t max_v, std::vector<uint8_t>* out) {
  RangeEncoder enc(out);
  for (int64_t i = 0; i < n; ++i) {
    LaplaceCdf c(static_cast<float>(LocFromCode(loc_q[i])),
                 static_cast<float>(ScaleFromCode(scale_q[i])), min_v,
                 max_v);
    uint32_t j = static_cast<uint32_t>(values[i] - min_v);
    if (j >= c.n) return -1;
    uint32_t a = c.Q(j), b2 = c.Q(j + 1);
    enc.Encode(a, b2 - a);
  }
  enc.Finish();
  return static_cast<int64_t>(out->size());
}

void LaplaceQDecodeOne(const uint8_t* buf, int64_t nbytes, int64_t n,
                       const int8_t* loc_q, const uint8_t* scale_q,
                       int32_t min_v, int32_t max_v, int32_t* values) {
  RangeDecoder dec(buf, static_cast<size_t>(nbytes));
  for (int64_t i = 0; i < n; ++i) {
    LaplaceCdf c(static_cast<float>(LocFromCode(loc_q[i])),
                 static_cast<float>(ScaleFromCode(scale_q[i])), min_v,
                 max_v);
    uint32_t pos = dec.Peek();
    uint32_t a = 0, b2 = c.n;
    while (b2 - a > 1) {
      uint32_t m = (a + b2) >> 1;
      if (c.Q(m) <= pos)
        a = m;
      else
        b2 = m;
    }
    uint32_t qa = c.Q(a), qb = c.Q(a + 1);
    dec.Consume(qa, qb - qa);
    values[i] = static_cast<int32_t>(a) + min_v;
  }
}

}  // namespace
}  // namespace pcgc

extern "C" {

int pcgc_laplace_q_encode_batch(const int32_t* values, const int8_t* loc_q,
                                const uint8_t* scale_q, int32_t B,
                                int64_t elems, const int32_t* min_vs,
                                const int32_t* max_vs, uint8_t* out,
                                int64_t cap_per, int64_t* lens) {
  int err = 0;
#pragma omp parallel for schedule(dynamic)
  for (int32_t b = 0; b < B; ++b) {
    const int64_t off = static_cast<int64_t>(b) * elems;
    std::vector<uint8_t> buf;
    buf.reserve(static_cast<size_t>(elems / 2 + 64));
    int64_t sz = pcgc::LaplaceQEncodeOne(values + off, loc_q + off,
                                         scale_q + off, elems, min_vs[b],
                                         max_vs[b], &buf);
    if (sz < 0 || sz > cap_per) {
      lens[b] = -1;
      err = -1;
      continue;
    }
    std::memcpy(out + static_cast<int64_t>(b) * cap_per, buf.data(),
                static_cast<size_t>(sz));
    lens[b] = sz;
  }
  return err;
}

int pcgc_laplace_q_decode_batch(const uint8_t* bufs, const int64_t* offsets,
                                const int64_t* lens, int32_t B,
                                int64_t elems, const int32_t* min_vs,
                                const int32_t* max_vs, const int8_t* loc_q,
                                const uint8_t* scale_q, int32_t* values) {
#pragma omp parallel for schedule(dynamic)
  for (int32_t b = 0; b < B; ++b) {
    const int64_t off = static_cast<int64_t>(b) * elems;
    pcgc::LaplaceQDecodeOne(bufs + offsets[b], lens[b], elems, loc_q + off,
                            scale_q + off, min_vs[b], max_vs[b],
                            values + off);
  }
  return 0;
}

}  // extern "C"

// --------------------- Factorized bottleneck CDF tables --------------------

// Evaluate the per-channel univariate density network of the factorized
// entropy model (Balle et al. 2018; reference models/entropy_model.py:72-98:
// K stages of logits = softplus(matrix) @ logits + bias;
// logits += tanh(factor) * tanh(logits); CDF = sigmoid(logits)) in
// deterministic double precision, and emit quantized CDF tables
// [C, N+1] under the schema above.
//
// matrices: [C, sum_i dims[i+1]*dims[i]]  (row-major per stage)
// biases/factors: [C, sum_i dims[i+1]]
// dims: [num_stages+1], dims[0] == dims[num_stages] == 1.
void pcgc_factorized_cdf(const float* matrices, const float* biases,
                         const float* factors, int32_t C, int32_t num_stages,
                         const int32_t* dims, int32_t min_v, int32_t max_v,
                         uint32_t* qcdf) {
  const int32_t N = max_v - min_v + 1;
  const uint32_t avail = pcgc::kProbTotal - static_cast<uint32_t>(N);
  int64_t mat_stride = 0, vec_stride = 0;
  for (int s = 0; s < num_stages; ++s) {
    mat_stride += static_cast<int64_t>(dims[s + 1]) * dims[s];
    vec_stride += dims[s + 1];
  }
#pragma omp parallel for schedule(static)
  for (int32_t c = 0; c < C; ++c) {
    const float* mc = matrices + c * mat_stride;
    const float* bc = biases + c * vec_stride;
    const float* fc = factors + c * vec_stride;
    // F at the N+1 boundaries
    std::vector<double> f(N + 1);
    for (int32_t j = 0; j <= N; ++j) {
      double v[16], u[16];
      v[0] = min_v - 0.5 + static_cast<double>(j);
      int in_dim = 1;
      const float* m = mc;
      const float* bb = bc;
      const float* ff = fc;
      for (int s = 0; s < num_stages; ++s) {
        int out_dim = dims[s + 1];
        for (int a = 0; a < out_dim; ++a) {
          double acc = static_cast<double>(bb[a]);
          for (int b2 = 0; b2 < in_dim; ++b2)
            acc += pcgc::det_softplus(static_cast<double>(m[a * in_dim + b2]))
                   * v[b2];
          u[a] = acc + pcgc::det_tanh(static_cast<double>(ff[a]))
                           * pcgc::det_tanh(acc);
        }
        for (int a = 0; a < out_dim; ++a) v[a] = u[a];
        m += static_cast<int64_t>(out_dim) * in_dim;
        bb += out_dim;
        ff += out_dim;
        in_dim = out_dim;
      }
      f[j] = pcgc::det_sigmoid(v[0]);
    }
    double lo = f[0], z = f[N] - lo;
    uint32_t* q = qcdf + static_cast<int64_t>(c) * (N + 1);
    q[0] = 0;
    q[N] = pcgc::kProbTotal;
    for (int32_t j = 1; j < N; ++j) {
      uint32_t qj;
      if (!(z > pcgc::kMinMass)) {
        qj = static_cast<uint32_t>(
            (static_cast<uint64_t>(j) * pcgc::kProbTotal) / N);
      } else {
        double t = (f[j] - lo) * (static_cast<double>(avail) / z);
        if (t < 0.0) t = 0.0;
        if (t > avail) t = avail;
        qj = static_cast<uint32_t>(j) + static_cast<uint32_t>(t);
      }
      q[j] = qj;
    }
  }
}

// ------------------------- Generic table symbol coder ----------------------

// values: [M, C] row-major, each in [0, N); channel of element i is i % C.
// qcdf: [C, N+1]. Returns bytes or -1.
int64_t pcgc_cdf_encode(const int32_t* values, int64_t M, int32_t C,
                        int32_t N, const uint32_t* qcdf, uint8_t* out,
                        int64_t cap) {
  std::vector<uint8_t> buf;
  buf.reserve(static_cast<size_t>(M * C / 2 + 64));
  pcgc::RangeEncoder enc(&buf);
  const int64_t total = M * C;
  for (int64_t i = 0; i < total; ++i) {
    const uint32_t* q = qcdf + (i % C) * (N + 1);
    int32_t v = values[i];
    if (v < 0 || v >= N) return -1;
    enc.Encode(q[v], q[v + 1] - q[v]);
  }
  enc.Finish();
  if (static_cast<int64_t>(buf.size()) > cap) return -1;
  std::memcpy(out, buf.data(), buf.size());
  return static_cast<int64_t>(buf.size());
}

int pcgc_cdf_decode(const uint8_t* buf, int64_t nbytes, int64_t M, int32_t C,
                    int32_t N, const uint32_t* qcdf, int32_t* values) {
  pcgc::RangeDecoder dec(buf, static_cast<size_t>(nbytes));
  const int64_t total = M * C;
  for (int64_t i = 0; i < total; ++i) {
    const uint32_t* q = qcdf + (i % C) * (N + 1);
    uint32_t pos = dec.Peek();
    // binary search largest j with q[j] <= pos
    int32_t a = 0, b2 = N;
    while (b2 - a > 1) {
      int32_t m = (a + b2) >> 1;
      if (q[m] <= pos)
        a = m;
      else
        b2 = m;
    }
    dec.Consume(q[a], q[a + 1] - q[a]);
    values[i] = a;
  }
  return 0;
}

// ------------------------------ Octree coder -------------------------------

// Lossless octree geometry coder — the TPU-native equivalent of the
// reference's use of MPEG G-PCC tmc3 for cube-position side info
// (dataprocess/inout_bitstream.py:33-34,119-120) and lossless anchors.
// Pre-order DFS over the octree of deduplicated points; each internal node
// emits an 8-bit child-occupancy mask coded bit-by-bit with adaptive binary
// models. Context = (level, exact sibling-bit prefix, own octant within
// the parent, occupancy of the three causal face neighbors (x-1, y-1,
// z-1) at the node's level). The face neighbors have strictly smaller
// Morton codes (Morton is monotone per coordinate), so in pre-order DFS
// their existence bits are always decoded before the current node's byte
// — the decoder maintains append-only per-level sorted code lists and
// binary-searches them, mirroring what the encoder derives from its
// sorted input.

namespace {

inline uint64_t Morton3(uint32_t x, uint32_t y, uint32_t z, int depth) {
  uint64_t code = 0;
  for (int i = depth - 1; i >= 0; --i) {
    code = (code << 3) | (((x >> i) & 1u) << 2) | (((y >> i) & 1u) << 1) |
           ((z >> i) & 1u);
  }
  return code;
}

struct OctreeModels {
  // Context = (level, child octant, exact sibling-bit prefix, the 3
  // same-level face neighbors adjacent to the child's octant sides).
  // BFS coding makes the FULL previous level available, so both the
  // negative and positive face neighbors are known (G-PCC-style).
  std::vector<pcgc::BitModel> m;
  int depth;
  explicit OctreeModels(int d)
      : m(static_cast<size_t>(d) * 255 * 8), depth(d) {}
  pcgc::BitModel& At(int level, int child, int prefix, int nbr3) {
    static const int base[8] = {0, 1, 3, 7, 15, 31, 63, 127};
    return m[(static_cast<size_t>(level) * 255 + base[child] + prefix) * 8
             + nbr3];
  }
};

struct Coord3 {
  uint32_t x, y, z;
};

inline Coord3 Deinterleave(uint64_t code, int level) {
  Coord3 p{0, 0, 0};
  for (int i = 0; i < level; ++i) {
    p.x |= ((code >> (3 * i + 2)) & 1u) << i;
    p.y |= ((code >> (3 * i + 1)) & 1u) << i;
    p.z |= ((code >> (3 * i)) & 1u) << i;
  }
  return p;
}

inline uint64_t Interleave(uint32_t x, uint32_t y, uint32_t z, int level) {
  uint64_t m = 0;
  for (int i = 0; i < level; ++i)
    m |= (static_cast<uint64_t>((x >> i) & 1u) << (3 * i + 2)) |
         (static_cast<uint64_t>((y >> i) & 1u) << (3 * i + 1)) |
         (static_cast<uint64_t>((z >> i) & 1u) << (3 * i));
  return m;
}

inline bool SortedContains(const std::vector<uint64_t>& v, uint64_t code) {
  auto it = std::lower_bound(v.begin(), v.end(), code);
  return it != v.end() && *it == code;
}

// 6-bit face-neighbor occupancy of the level-l node `code` given the full
// sorted list of level-l occupied codes. bit0/1: x-1/x+1, bit2/3: y-1/y+1,
// bit4/5: z-1/z+1.
inline int NeighborPattern(const std::vector<uint64_t>& level_codes,
                           uint64_t code, int level) {
  if (level == 0) return 0;
  Coord3 p = Deinterleave(code, level);
  const uint32_t lim = 1u << level;
  int pat = 0;
  if (p.x > 0 && SortedContains(level_codes,
                                Interleave(p.x - 1, p.y, p.z, level)))
    pat |= 1;
  if (p.x + 1 < lim && SortedContains(level_codes,
                                      Interleave(p.x + 1, p.y, p.z, level)))
    pat |= 2;
  if (p.y > 0 && SortedContains(level_codes,
                                Interleave(p.x, p.y - 1, p.z, level)))
    pat |= 4;
  if (p.y + 1 < lim && SortedContains(level_codes,
                                      Interleave(p.x, p.y + 1, p.z, level)))
    pat |= 8;
  if (p.z > 0 && SortedContains(level_codes,
                                Interleave(p.x, p.y, p.z - 1, level)))
    pat |= 16;
  if (p.z + 1 < lim && SortedContains(level_codes,
                                      Interleave(p.x, p.y, p.z + 1, level)))
    pat |= 32;
  return pat;
}

// The 3 neighbor bits facing child octant c (bits: x=c>>2, y=(c>>1)&1,
// z=c&1): pick the x-1 or x+1 neighbor depending on which side the octant
// touches, likewise y, z.
inline int ChildNeighborCtx(int pat, int c) {
  int nx = (c & 4) ? (pat >> 1) & 1 : pat & 1;
  int ny = (c & 2) ? (pat >> 3) & 1 : (pat >> 2) & 1;
  int nz = (c & 1) ? (pat >> 5) & 1 : (pat >> 4) & 1;
  return (nx << 2) | (ny << 1) | nz;
}

void OctreeEncodeBfs(const std::vector<uint64_t>& codes, int depth,
                     OctreeModels* models, pcgc::RangeEncoder* enc) {
  // nodes at the current level as (code, lo, hi) ranges into `codes`
  struct Node {
    uint64_t code;
    int64_t lo, hi;
  };
  std::vector<Node> nodes{{0, 0, static_cast<int64_t>(codes.size())}};
  std::vector<uint64_t> level_codes{0};
  for (int level = 0; level < depth; ++level) {
    const int shift = 3 * (depth - 1 - level);
    std::vector<Node> next;
    next.reserve(nodes.size() * 2);
    for (const Node& nd : nodes) {
      int64_t child_lo[9];
      child_lo[0] = nd.lo;
      for (int c = 0; c < 8; ++c) {
        int64_t a = child_lo[c], b = nd.hi;
        while (a < b) {
          int64_t m = (a + b) >> 1;
          if (static_cast<int>((codes[m] >> shift) & 7) <= c)
            a = m + 1;
          else
            b = m;
        }
        child_lo[c + 1] = a;
      }
      const int pat = NeighborPattern(level_codes, nd.code, level);
      int prefix = 0;
      for (int c = 0; c < 8; ++c) {
        int bit = child_lo[c + 1] > child_lo[c];
        pcgc::BitModel& bm =
            models->At(level, c, prefix, ChildNeighborCtx(pat, c));
        enc->EncodeBit(bit, bm.p0);
        bm.Update(bit);
        prefix = (prefix << 1) | bit;
        if (bit)
          next.push_back({(nd.code << 3) | static_cast<uint64_t>(c),
                          child_lo[c], child_lo[c + 1]});
      }
    }
    nodes = std::move(next);
    level_codes.clear();
    level_codes.reserve(nodes.size());
    for (const Node& nd : nodes) level_codes.push_back(nd.code);
  }
}

void OctreeDecodeBfs(int depth, OctreeModels* models,
                     pcgc::RangeDecoder* dec, std::vector<uint64_t>* out) {
  std::vector<uint64_t> nodes{0};
  for (int level = 0; level < depth; ++level) {
    std::vector<uint64_t> next;
    next.reserve(nodes.size() * 2);
    for (uint64_t code : nodes) {
      const int pat = NeighborPattern(nodes, code, level);
      int prefix = 0;
      for (int c = 0; c < 8; ++c) {
        pcgc::BitModel& bm =
            models->At(level, c, prefix, ChildNeighborCtx(pat, c));
        int bit = dec->DecodeBit(bm.p0);
        bm.Update(bit);
        prefix = (prefix << 1) | bit;
        if (bit) next.push_back((code << 3) | static_cast<uint64_t>(c));
      }
    }
    nodes = std::move(next);
  }
  *out = std::move(nodes);
}

}  // namespace

// coords: [n, 3] uint32, all < 2^depth, depth in [1, 21].
// Returns bytes written or -1.
int64_t pcgc_octree_encode(const uint32_t* coords, int64_t n, int32_t depth,
                           uint8_t* out, int64_t cap) {
  if (depth < 1 || depth > 21 || n < 1) return -1;
  std::vector<uint64_t> codes(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    if (coords[3 * i] >> depth || coords[3 * i + 1] >> depth ||
        coords[3 * i + 2] >> depth)
      return -1;
    codes[i] =
        Morton3(coords[3 * i], coords[3 * i + 1], coords[3 * i + 2], depth);
  }
  std::sort(codes.begin(), codes.end());
  codes.erase(std::unique(codes.begin(), codes.end()), codes.end());
  std::vector<uint8_t> buf;
  pcgc::RangeEncoder enc(&buf);
  OctreeModels models(depth);
  OctreeEncodeBfs(codes, depth, &models, &enc);
  enc.Finish();
  if (static_cast<int64_t>(buf.size()) > cap) return -1;
  std::memcpy(out, buf.data(), buf.size());
  return static_cast<int64_t>(buf.size());
}

// Returns number of decoded points (coords filled up to cap points) or -1.
int64_t pcgc_octree_decode(const uint8_t* buf, int64_t nbytes, int32_t depth,
                           uint32_t* coords, int64_t cap) {
  if (depth < 1 || depth > 21) return -1;
  pcgc::RangeDecoder dec(buf, static_cast<size_t>(nbytes));
  OctreeModels models(depth);
  std::vector<uint64_t> codes;
  OctreeDecodeBfs(depth, &models, &dec, &codes);
  if (static_cast<int64_t>(codes.size()) > cap) return -1;
  for (size_t i = 0; i < codes.size(); ++i) {
    uint32_t x = 0, y = 0, z = 0;
    uint64_t code = codes[i];
    for (int l = 0; l < depth; ++l) {
      int oct = static_cast<int>((code >> (3 * (depth - 1 - l))) & 7);
      x = (x << 1) | ((oct >> 2) & 1);
      y = (y << 1) | ((oct >> 1) & 1);
      z = (z << 1) | (oct & 1);
    }
    coords[3 * i] = x;
    coords[3 * i + 1] = y;
    coords[3 * i + 2] = z;
  }
  return static_cast<int64_t>(codes.size());
}

}  // extern "C"

// ------------------------- mask-wire rANS decode ---------------------------
// Host decoder for the device's nibble-alphabet interleaved rANS units
// (entropy/rans.py mask_encode): the decompression pipeline entropy-codes
// the bit-packed occupancy masks on the TPU before download (the largest
// remaining D2H transfer), and this decodes them back to packed bytes.
// Stream: L interleaved lanes, uint16 words in ascending (step, lane)
// order, PRECISION = 16, states start (encode) and end (decode) at 2^16.

namespace pcgc {
namespace {

// MIRROR of entropy/rans.py cdf16_from_hist — pure integer, keep in
// lockstep; any divergence corrupts mask decode.
void Cdf16FromHist(const int32_t* hist, uint32_t* cdf /*[17]*/) {
  constexpr int64_t kTotal = 1 << 16;
  int64_t m = 0, nnz = 0;
  for (int i = 0; i < 16; ++i) {
    m += hist[i];
    nnz += hist[i] > 0;
  }
  if (m < 1) m = 1;
  int64_t f[16];
  int64_t fsum = 0;
  int argmax = 0;
  for (int i = 0; i < 16; ++i) {
    f[i] = (static_cast<int64_t>(hist[i]) * (kTotal - nnz)) / m +
           (hist[i] > 0 ? 1 : 0);
    fsum += f[i];
    if (hist[i] > hist[argmax]) argmax = i;  // first max, like jnp.argmax
  }
  f[argmax] += kTotal - fsum;
  for (int i = 0; i < 16; ++i)
    if (f[i] > kTotal - 1) f[i] = kTotal - 1;
  cdf[0] = 0;
  uint32_t acc = 0;
  for (int i = 0; i < 16; ++i) {
    acc += static_cast<uint32_t>(f[i]);
    cdf[i + 1] = acc;
  }
}

}  // namespace
}  // namespace pcgc

extern "C" {

// Returns 0 on success; -2 = word underrun, -3 = final-state integrity
// failure (corrupt stream or histogram mismatch). out_bytes: n_bytes.
int pcgc_rans_mask_decode(const uint16_t* words, int64_t n_words,
                          const uint32_t* states_in, int32_t lanes,
                          const int32_t* hist, uint8_t* out_bytes,
                          int64_t n_bytes) {
  constexpr uint64_t kRansL = 1ull << 16;
  uint32_t cdf[17];
  pcgc::Cdf16FromHist(hist, cdf);
  std::vector<uint8_t> lut(1 << 16);
  for (int s = 0; s < 16; ++s)
    for (uint32_t d = cdf[s]; d < cdf[s + 1]; ++d) lut[d] = s;
  std::vector<uint64_t> x(states_in, states_in + lanes);
  const int64_t n_nib = 2 * n_bytes;
  const int64_t t = n_nib / lanes;
  std::vector<uint8_t> nib(static_cast<size_t>(n_nib));
  int64_t p = 0;
  for (int64_t step = 0; step < t; ++step) {
    uint8_t* row = nib.data() + step * lanes;
    for (int32_t l = 0; l < lanes; ++l) {
      const uint64_t dv = x[l] & 0xFFFF;
      const int u = lut[dv];
      row[l] = static_cast<uint8_t>(u);
      x[l] = static_cast<uint64_t>(cdf[u + 1] - cdf[u]) * (x[l] >> 16) +
             dv - cdf[u];
      if (x[l] < kRansL) {
        if (p >= n_words) return -2;
        x[l] = (x[l] << 16) | words[p++];
      }
    }
  }
  for (int32_t l = 0; l < lanes; ++l)
    if (x[l] != kRansL) return -3;
  for (int64_t i = 0; i < n_bytes; ++i)
    out_bytes[i] =
        static_cast<uint8_t>((nib[2 * i] << 4) | (nib[2 * i + 1] & 15));
  return 0;
}

}  // extern "C"
