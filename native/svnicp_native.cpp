// svnicp_native: host-side data loading and frame staging, C++17.
//
// Native replacement for the host runtime the reference implements in C++
// around its GPU core: scan ingest and conversion (ref:
// svn-icp/src/core/ICPUtils.cpp:27-43 pointcloud2vector + OdometryPipeline
// message handling :328-354), range cropping (:692-704), per-point timestamp
// extraction for deskewing (:363-413), and the sensor ring buffers
// (include/data/Buffer.h). The TPU compute path stays JAX; this library
// removes the per-frame Python/numpy overhead on the ingest side and gives
// the ingest thread a lock-free SPSC queue.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// KITTI velodyne .bin reader: float32 x,y,z,intensity records.
// Returns number of points written (<= capacity), or -1 on I/O error.
// ---------------------------------------------------------------------------
int svn_read_kitti_bin(const char* path, float* out_xyz, int capacity) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<float> buf(4096 * 4);
  int n = 0;
  size_t got;
  while ((got = std::fread(buf.data(), sizeof(float), buf.size(), f)) > 0) {
    size_t pts = got / 4;
    for (size_t i = 0; i < pts && n < capacity; ++i) {
      out_xyz[3 * n + 0] = buf[4 * i + 0];
      out_xyz[3 * n + 1] = buf[4 * i + 1];
      out_xyz[3 * n + 2] = buf[4 * i + 2];
      ++n;
    }
    if (n >= capacity) break;
  }
  std::fclose(f);
  return n;
}

// ---------------------------------------------------------------------------
// Frame staging: crop by range and pad into a fixed-capacity buffer in one
// pass (ref: crop_pointcloud :692-704 + the tensor staging :574-581).
// out_xyz: [capacity*3] zero-padded; out_valid: [capacity] 0/1 bytes.
// Returns the number of valid points staged.
// ---------------------------------------------------------------------------
int svn_stage_scan(const float* xyz, int n, float min_range, float max_range,
                   float* out_xyz, uint8_t* out_valid, int capacity) {
  const float min2 = min_range * min_range;
  const float max2 = max_range * max_range;
  int m = 0;
  for (int i = 0; i < n && m < capacity; ++i) {
    const float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
    const float d2 = x * x + y * y + z * z;
    if (d2 > min2 && d2 < max2 && std::isfinite(d2)) {
      out_xyz[3 * m + 0] = x;
      out_xyz[3 * m + 1] = y;
      out_xyz[3 * m + 2] = z;
      out_valid[m] = 1;
      ++m;
    }
  }
  std::memset(out_xyz + 3 * m, 0, sizeof(float) * 3 * (capacity - m));
  std::memset(out_valid + m, 0, capacity - m);
  return m;
}

// Crop variant carrying per-point timestamps (same selection and order).
int svn_stage_scan_ts(const float* xyz, const float* ts, int n,
                      float min_range, float max_range, float* out_xyz,
                      float* out_ts, int capacity) {
  const float min2 = min_range * min_range;
  const float max2 = max_range * max_range;
  int m = 0;
  for (int i = 0; i < n && m < capacity; ++i) {
    const float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
    const float d2 = x * x + y * y + z * z;
    if (d2 > min2 && d2 < max2 && std::isfinite(d2)) {
      out_xyz[3 * m + 0] = x;
      out_xyz[3 * m + 1] = y;
      out_xyz[3 * m + 2] = z;
      out_ts[m] = ts[i];
      ++m;
    }
  }
  std::memset(out_xyz + 3 * m, 0, sizeof(float) * 3 * (capacity - m));
  std::memset(out_ts + m, 0, sizeof(float) * (capacity - m));
  return m;
}

// ---------------------------------------------------------------------------
// Two-stage uniform downsample on the host — the reference's CPU PCL
// UniformSampling (ref: OdometryPipeline.cpp:684-690) done natively so the
// device upload shrinks from the raw scan to the two downsampled clouds
// (the remote-tunnel transfer is the measured frame-floor bottleneck).
//
// Bit-compatible with svnicp_tpu.core.pointcloud.downsample_uniform:
//  - voxel id: floor(p / v) per axis in f32, packed 10 bits/axis;
//  - keep the point nearest the voxel CENTER (strict <, first wins);
//  - compact voxels in ascending (hash32(key) & -2) order (spatially
//    uniform capacity truncation), ties by ascending key;
//  - stage B (1.5*v) consumes stage A's output in that order.
// ---------------------------------------------------------------------------

}  // extern "C" (reopened below; the helpers need C++ linkage/templates)

#include <algorithm>

namespace {

inline uint32_t svn_hash32(uint32_t x) {
  x ^= x >> 16; x *= 0x7FEB352Du; x ^= x >> 15; x *= 0x846CA68Bu; x ^= x >> 16;
  return x;
}

// NOTE (key packing below): must DIVIDE like the device path (jnp
// floor(p / v)); multiplying by a precomputed reciprocal differs for some
// float32 inputs at non-power-of-two voxel sizes (e.g.
// floor(7.4999995f * (1/1.5f)) = 5 vs floor(/1.5) = 4) and would break the
// bit-compatibility contract.

// One uniform-downsample stage; returns count written to out (<= capacity).
// Open-addressing flat table of packed entries, two passes with software
// prefetch (the probe is a random 256+ KB access per point — memory latency,
// not hashing, dominated the unordered_map version), and nth_element +
// partial sort for the capacity truncation. Measured 4.3 ms -> ~1 ms at 32k
// points on the per-frame critical path.
int svn_downsample_stage(const float* xyz, int n, float voxel, float* out,
                         int capacity, const float* ts = nullptr,
                         float* out_ts = nullptr) {
  struct Entry { int32_t key; float d; int32_t idx; };   // one cache line
  size_t tsize = 64;
  while (tsize < (size_t)n * 2) tsize <<= 1;
  static thread_local std::vector<Entry> table;
  static thread_local std::vector<int32_t> keybuf;
  static thread_local std::vector<float> dbuf;
  table.assign(tsize, Entry{-1, 0.0f, 0});               // 30-bit keys: -1 = empty
  if (keybuf.size() < (size_t)n) { keybuf.resize(n); dbuf.resize(n); }
  const size_t mask = tsize - 1;

  // pass 1 (sequential, vectorizable): voxel key + distance-to-center
  for (int i = 0; i < n; ++i) {
    const float* p = xyz + 3 * i;
    float d = 0.0f;
    uint32_t packed = 0;
    const int bits = 10, kmask = (1 << bits) - 1, half = 1 << (bits - 1);
    for (int a = 0; a < 3; ++a) {
      // divide (not reciprocal-multiply) and (f+0.5)*v (not f*v+0.5*v) for
      // bit-compatibility with the device/numpy paths — both expressions
      // differ by ulps on some inputs, which flips near-tie selections
      const float f = std::floor(p[a] / voxel);
      const float e = p[a] - (f + 0.5f) * voxel;
      d += e * e;
      packed = (packed << bits) | (uint32_t)(((int)f + half) & kmask);
    }
    keybuf[i] = (int32_t)packed;
    dbuf[i] = d;
  }

  // pass 2: probe with a prefetch window hiding the random-access latency
  constexpr int PF = 12;
  for (int i = 0; i < n; ++i) {
    if (i + PF < n)
      __builtin_prefetch(&table[svn_hash32((uint32_t)keybuf[i + PF]) & mask]);
    const int32_t key = keybuf[i];
    const float d = dbuf[i];
    size_t slot = svn_hash32((uint32_t)key) & mask;
    for (;;) {
      Entry& e = table[slot];
      if (e.key == key) {
        if (d < e.d) { e.d = d; e.idx = i; }
        break;
      }
      if (e.key == -1) {
        e = Entry{key, d, i};
        break;
      }
      slot = (slot + 1) & mask;
    }
  }

  struct Row { int32_t rank; int32_t key; int idx; };
  static thread_local std::vector<Row> rows;
  rows.clear();
  rows.reserve(tsize / 2);
  for (size_t s = 0; s < tsize; ++s) {
    if (table[s].key == -1) continue;
    const int32_t rank = (int32_t)(svn_hash32((uint32_t)table[s].key) & ~1u);
    rows.push_back(Row{rank, table[s].key, table[s].idx});
  }
  const auto lt = [](const Row& a, const Row& b) {
    if (a.rank != b.rank) return a.rank < b.rank;
    return a.key < b.key;
  };
  const int m = (int)rows.size() < capacity ? (int)rows.size() : capacity;
  if ((int)rows.size() > capacity) {
    std::nth_element(rows.begin(), rows.begin() + capacity, rows.end(), lt);
    rows.resize(capacity);
  }
  std::sort(rows.begin(), rows.end(), lt);
  for (int j = 0; j < m; ++j) {
    std::memcpy(out + 3 * j, xyz + 3 * rows[j].idx, sizeof(float) * 3);
    if (out_ts) out_ts[j] = ts[rows[j].idx];
  }
  return m;
}

}  // namespace

extern "C" {

// Single stage: downsample(input, factor*voxel) capped at capacity,
// zero-padded. Used by the device-derived-source staging path (the device
// recomputes stage B from the shipped stage-A cloud).
int svn_downsample_one_stage(const float* xyz, int n, float voxel,
                             float* out, int capacity) {
  const int m = svn_downsample_stage(xyz, n, voxel, out, capacity);
  std::memset(out + 3 * m, 0, sizeof(float) * 3 * (capacity - m));
  return m;
}

// Single stage carrying per-point timestamps for the selected rows (the
// fast-path device deskew needs the downsampled cloud's sweep times).
int svn_downsample_one_stage_ts(const float* xyz, const float* ts, int n,
                                float voxel, float* out, float* out_ts,
                                int capacity) {
  const int m = svn_downsample_stage(xyz, n, voxel, out, capacity, ts, out_ts);
  std::memset(out + 3 * m, 0, sizeof(float) * 3 * (capacity - m));
  std::memset(out_ts + m, 0, sizeof(float) * (capacity - m));
  return m;
}

// to_map = downsample(input, 0.5*voxel) capped at map_capacity;
// source = downsample(to_map, 1.5*voxel) capped at src_capacity.
// Outputs are zero-padded to their capacities; returns via out-params.
void svn_downsample_two_stage(const float* xyz, int n, float voxel,
                              float* out_map, int map_capacity, int* n_map,
                              float* out_src, int src_capacity, int* n_src) {
  const int m = svn_downsample_stage(xyz, n, 0.5f * voxel, out_map, map_capacity);
  const int s = svn_downsample_stage(out_map, m, 1.5f * voxel, out_src, src_capacity);
  std::memset(out_map + 3 * m, 0, sizeof(float) * 3 * (map_capacity - m));
  std::memset(out_src + 3 * s, 0, sizeof(float) * 3 * (src_capacity - s));
  *n_map = m;
  *n_src = s;
}

// ---------------------------------------------------------------------------
// Per-point timestamp extraction from an interleaved point record stream
// (PointCloud2-style): `stride` bytes per point, field at `offset`.
// dtype_code: 0 = float32, 1 = float64, 2 = uint32.
// Timestamps are min-max normalized to [0,1] (ref: deskew :414-423);
// returns 0 if degenerate (all equal — caller skips deskewing, ref :418).
// ---------------------------------------------------------------------------
static inline double svn_ts_read(const uint8_t* p, int dtype_code) {
  switch (dtype_code) {
    case 0: { float f; std::memcpy(&f, p, 4); return f; }
    case 1: { double d; std::memcpy(&d, p, 8); return d; }
    default: { uint32_t u; std::memcpy(&u, p, 4); return u; }
  }
}

int svn_extract_timestamps(const uint8_t* data, int n, int stride, int offset,
                           int dtype_code, float* out) {
  if (dtype_code < 0 || dtype_code > 2) return -1;
  double mn = 1e300, mx = -1e300;
  for (int i = 0; i < n; ++i) {
    const double v = svn_ts_read(data + (size_t)i * stride + offset, dtype_code);
    if (v < mn) mn = v;
    if (v > mx) mx = v;
  }
  if (!(mx > mn)) return 0;
  // normalize in DOUBLE before the f32 narrowing: absolute sensor stamps
  // (epoch seconds ~1e9 as f64) lose the entire intra-sweep range if cast
  // to f32 first (float32 has ~7 digits; 1e9 + 0.05 == 1e9f)
  const double inv = 1.0 / (mx - mn);
  for (int i = 0; i < n; ++i) {
    const double v = svn_ts_read(data + (size_t)i * stride + offset, dtype_code);
    out[i] = (float)((v - mn) * inv);
  }
  return 1;
}

// ---------------------------------------------------------------------------
// Lock-free SPSC ring buffer of fixed-size scan slots (one producer thread
// feeding sensor data, one consumer draining frames — the reference used a
// mutex + try-lock overflow side-buffer, Buffer.h:78-109).
// ---------------------------------------------------------------------------
struct SvnRing {
  int slots;
  int slot_floats;
  std::vector<float> data;      // [slots * slot_floats]
  std::vector<double> stamps;   // [slots]
  std::vector<int> counts;      // [slots]
  std::atomic<uint64_t> head{0};  // next write
  std::atomic<uint64_t> tail{0};  // next read
};

void* svn_ring_create(int slots, int slot_floats) {
  auto* r = new SvnRing();
  r->slots = slots;
  r->slot_floats = slot_floats;
  r->data.resize((size_t)slots * slot_floats);
  r->stamps.resize(slots);
  r->counts.resize(slots);
  return r;
}

void svn_ring_destroy(void* h) { delete static_cast<SvnRing*>(h); }

int svn_ring_size(void* h) {
  auto* r = static_cast<SvnRing*>(h);
  return (int)(r->head.load(std::memory_order_acquire) -
               r->tail.load(std::memory_order_acquire));
}

// Push one scan; drops (returns 0) when full.
int svn_ring_push(void* h, const float* xyz, int n, double stamp) {
  auto* r = static_cast<SvnRing*>(h);
  const uint64_t head = r->head.load(std::memory_order_relaxed);
  const uint64_t tail = r->tail.load(std::memory_order_acquire);
  if (head - tail >= (uint64_t)r->slots) return 0;
  const int slot = (int)(head % r->slots);
  const int m = n * 3 <= r->slot_floats ? n : r->slot_floats / 3;
  std::memcpy(&r->data[(size_t)slot * r->slot_floats], xyz, sizeof(float) * 3 * m);
  r->counts[slot] = m;
  r->stamps[slot] = stamp;
  r->head.store(head + 1, std::memory_order_release);
  return 1;
}

// Pop the oldest scan into out; returns point count, -1 when empty.
int svn_ring_pop(void* h, float* out_xyz, double* out_stamp) {
  auto* r = static_cast<SvnRing*>(h);
  const uint64_t tail = r->tail.load(std::memory_order_relaxed);
  const uint64_t head = r->head.load(std::memory_order_acquire);
  if (tail >= head) return -1;
  const int slot = (int)(tail % r->slots);
  const int n = r->counts[slot];
  std::memcpy(out_xyz, &r->data[(size_t)slot * r->slot_floats], sizeof(float) * 3 * n);
  *out_stamp = r->stamps[slot];
  r->tail.store(tail + 1, std::memory_order_release);
  return n;
}

}  // extern "C"
