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

// ---------------------------------------------------------------------------
// Per-point timestamp extraction from an interleaved point record stream
// (PointCloud2-style): `stride` bytes per point, field at `offset`.
// dtype_code: 0 = float32, 1 = float64, 2 = uint32.
// Timestamps are min-max normalized to [0,1] (ref: deskew :414-423);
// returns 0 if degenerate (all equal — caller skips deskewing, ref :418).
// ---------------------------------------------------------------------------
int svn_extract_timestamps(const uint8_t* data, int n, int stride, int offset,
                           int dtype_code, float* out) {
  double mn = 1e300, mx = -1e300;
  for (int i = 0; i < n; ++i) {
    const uint8_t* p = data + (size_t)i * stride + offset;
    double v = 0;
    switch (dtype_code) {
      case 0: { float f; std::memcpy(&f, p, 4); v = f; break; }
      case 1: { double d; std::memcpy(&d, p, 8); v = d; break; }
      case 2: { uint32_t u; std::memcpy(&u, p, 4); v = u; break; }
      default: return -1;
    }
    out[i] = (float)v;
    if (v < mn) mn = v;
    if (v > mx) mx = v;
  }
  if (!(mx > mn)) return 0;
  const float inv = (float)(1.0 / (mx - mn));
  const float fmn = (float)mn;
  for (int i = 0; i < n; ++i) out[i] = (out[i] - fmn) * inv;
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
