// vrtcore — native host runtime for the TPU volume renderer.
//
// The TPU compute path is JAX/XLA; this library is the CPU side of the
// framework: data-loading/preprocessing ops that should not burn TPU time
// (and that the reference implements in C++ too):
//   - Henyey-Greenstein illumination LUT generation
//     (parity with reference src/C/mex/HenyeyGreenstein.cc:29-96)
//   - central-difference gradient volumes (MATLAB gradient semantics,
//     reference src/matlab/VolumeRender/Volume.m:181-205)
//   - trilinear resize, normalize, pad, MIP (Volume.m:93-178)
//   - epoch-millisecond timestamps (reference src/C/mex/timestamp.cpp)
//   - FNV-1a content hashing for identical-volume dedup (the host-side
//     analog of the MManager similarity check, mm/mmanager.hxx:25-295)
//
// All volume arrays are C-order (D, H, W) float32 — the same layout the
// JAX side uses. Multithreaded with std::thread; no external deps.
//
// Build: make -C native   (produces libvrtcore.so)

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float kPi = 3.14159265358979323846f;

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

// Run fn(begin, end) over [0, total) split across threads.
template <typename F>
void parallel_for(int64_t total, F fn) {
  int nt = std::min<int64_t>(hw_threads(), std::max<int64_t>(total, 1));
  if (nt <= 1) {
    fn(int64_t{0}, total);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (total + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t b = t * chunk;
    int64_t e = std::min<int64_t>(b + chunk, total);
    if (b >= e) break;
    threads.emplace_back([=] { fn(b, e); });
  }
  for (auto& th : threads) th.join();
}

inline int64_t clamp_idx(int64_t i, int64_t n) {
  return i < 0 ? 0 : (i >= n ? n - 1 : i);
}

}  // namespace

extern "C" {

// ---- timestamp (reference timestamp.cpp:15-34) ----------------------------

uint64_t vrt_timestamp_ms() {
  using namespace std::chrono;
  return static_cast<uint64_t>(
      duration_cast<milliseconds>(system_clock::now().time_since_epoch()).count());
}

// ---- content hash (dedup) -------------------------------------------------

// 64-bit FNV-1a over the raw bytes; used by the session layer to detect
// identical volumes and alias them (one device buffer, fewer gathers).
uint64_t vrt_hash(const float* data, int64_t n) {
  const uint8_t* bytes = reinterpret_cast<const uint8_t*>(data);
  int64_t nbytes = n * static_cast<int64_t>(sizeof(float));
  // hash in parallel chunks, then combine (order-dependent combine keeps
  // the result deterministic for a given chunking; fix chunk count)
  const int kChunks = 16;
  int64_t chunk = (nbytes + kChunks - 1) / kChunks;
  uint64_t partial[kChunks];
  parallel_for(kChunks, [&](int64_t cb, int64_t ce) {
    for (int64_t c = cb; c < ce; ++c) {
      uint64_t h = 1469598103934665603ull;
      int64_t b = c * chunk, e = std::min<int64_t>(b + chunk, nbytes);
      for (int64_t i = b; i < e; ++i) {
        h ^= bytes[i];
        h *= 1099511628211ull;
      }
      partial[c] = h;
    }
  });
  uint64_t h = 1469598103934665603ull;
  for (int c = 0; c < kChunks; ++c) {
    h ^= partial[c];
    h *= 1099511628211ull;
  }
  return h;
}

// ---- Henyey-Greenstein LUT (reference HenyeyGreenstein.cc:62-91) ----------

// out: (n, n, n) C-order, axes (c=gamma, a=alpha, b=beta), b fastest —
// identical layout to the reference's column-major output.
int vrt_hg_lut(float* out, int n, float g) {
  if (n <= 0 || g < -1.f || g > 1.f) return -1;
  float frac = kPi / static_cast<float>(n);
  float g2 = g * g;
  float num = 1.f - g2;
  int64_t page = static_cast<int64_t>(n) * n;
  parallel_for(n, [&](int64_t cb, int64_t ce) {
    for (int64_t c = cb; c < ce; ++c) {
      float gamma = static_cast<float>(c) * frac;
      float cg = std::cos(gamma);
      for (int64_t a = 0; a < n; ++a) {
        float alpha = static_cast<float>(a) * frac;
        float sa = std::sin(alpha), ca = std::cos(alpha);
        float* row = out + c * page + a * n;
        for (int64_t b = 0; b < n; ++b) {
          float beta = static_cast<float>(b) * frac;
          float cos_theta = sa * std::sin(beta) + cg * ca * std::cos(beta);
          float den = std::sqrt(std::pow(1.f + g2 - 2.f * g * cos_theta, 3.f));
          row[b] = 1.f / (4.f * kPi) * num / den;
        }
      }
    }
  });
  return 0;
}

// ---- central-difference gradients (numpy.gradient semantics) --------------

// vol: (d, h, w); gx/gy/gz same shape. gx = d/dx (w axis), gy = d/dy,
// gz = d/dz; interior (f[i+1]-f[i-1])/2, one-sided at edges.
int vrt_gradient(const float* vol, float* gx, float* gy, float* gz,
                 int64_t d, int64_t h, int64_t w) {
  int64_t sy = w, sz = w * h;
  parallel_for(d, [&](int64_t zb, int64_t ze) {
    for (int64_t z = zb; z < ze; ++z) {
      for (int64_t y = 0; y < h; ++y) {
        const float* row = vol + z * sz + y * sy;
        float* ox = gx + z * sz + y * sy;
        float* oy = gy + z * sz + y * sy;
        float* oz = gz + z * sz + y * sy;
        for (int64_t x = 0; x < w; ++x) {
          // x axis
          if (w == 1) ox[x] = 0.f;
          else if (x == 0) ox[x] = row[1] - row[0];
          else if (x == w - 1) ox[x] = row[x] - row[x - 1];
          else ox[x] = 0.5f * (row[x + 1] - row[x - 1]);
          // y axis
          const float* yp = vol + z * sz + clamp_idx(y + 1, h) * sy;
          const float* ym = vol + z * sz + clamp_idx(y - 1, h) * sy;
          float dy = (y == 0 || y == h - 1) ? 1.f : 2.f;
          oy[x] = h == 1 ? 0.f : (yp[x] - ym[x]) / dy;
          // z axis
          const float* zp = vol + clamp_idx(z + 1, d) * sz + y * sy;
          const float* zm = vol + clamp_idx(z - 1, d) * sz + y * sy;
          float dz = (z == 0 || z == d - 1) ? 1.f : 2.f;
          oz[x] = d == 1 ? 0.f : (zp[x] - zm[x]) / dz;
        }
      }
    }
  });
  return 0;
}

// ---- trilinear resize -----------------------------------------------------

// Align-corners=false / half-pixel-center resampling with edge clamp;
// matches jax.image.resize(method="linear", antialias=False) exactly
// (no antialias prefilter on downscale).
int vrt_resize_trilinear(const float* src, int64_t sd, int64_t sh, int64_t sw,
                         float* dst, int64_t dd, int64_t dh, int64_t dw) {
  int64_t ssy = sw, ssz = sw * sh;
  float rz = static_cast<float>(sd) / dd;
  float ry = static_cast<float>(sh) / dh;
  float rx = static_cast<float>(sw) / dw;
  parallel_for(dd, [&](int64_t zb, int64_t ze) {
    for (int64_t z = zb; z < ze; ++z) {
      float fz = (static_cast<float>(z) + 0.5f) * rz - 0.5f;
      int64_t z0 = static_cast<int64_t>(std::floor(fz));
      float wz = fz - z0;
      int64_t z0c = clamp_idx(z0, sd), z1c = clamp_idx(z0 + 1, sd);
      for (int64_t y = 0; y < dh; ++y) {
        float fy = (static_cast<float>(y) + 0.5f) * ry - 0.5f;
        int64_t y0 = static_cast<int64_t>(std::floor(fy));
        float wy = fy - y0;
        int64_t y0c = clamp_idx(y0, sh), y1c = clamp_idx(y0 + 1, sh);
        float* out = dst + (z * dh + y) * dw;
        for (int64_t x = 0; x < dw; ++x) {
          float fx = (static_cast<float>(x) + 0.5f) * rx - 0.5f;
          int64_t x0 = static_cast<int64_t>(std::floor(fx));
          float wx = fx - x0;
          int64_t x0c = clamp_idx(x0, sw), x1c = clamp_idx(x0 + 1, sw);
          auto at = [&](int64_t zz, int64_t yy, int64_t xx) {
            return src[zz * ssz + yy * ssy + xx];
          };
          float c00 = at(z0c, y0c, x0c) + wx * (at(z0c, y0c, x1c) - at(z0c, y0c, x0c));
          float c10 = at(z0c, y1c, x0c) + wx * (at(z0c, y1c, x1c) - at(z0c, y1c, x0c));
          float c01 = at(z1c, y0c, x0c) + wx * (at(z1c, y0c, x1c) - at(z1c, y0c, x0c));
          float c11 = at(z1c, y1c, x0c) + wx * (at(z1c, y1c, x1c) - at(z1c, y1c, x0c));
          float c0 = c00 + wy * (c10 - c00);
          float c1 = c01 + wy * (c11 - c01);
          out[x] = c0 + wz * (c1 - c0);
        }
      }
    }
  });
  return 0;
}

// ---- normalize / pad / MIP ------------------------------------------------

int vrt_normalize(float* vol, int64_t n, float new_min, float new_max) {
  std::atomic<int> _dummy{0};
  (void)_dummy;
  float mn = vol[0], mx = vol[0];
  // reduction in chunks
  const int kChunks = 32;
  float mins[kChunks], maxs[kChunks];
  int64_t chunk = (n + kChunks - 1) / kChunks;
  parallel_for(kChunks, [&](int64_t cb, int64_t ce) {
    for (int64_t c = cb; c < ce; ++c) {
      int64_t b = c * chunk, e = std::min<int64_t>(b + chunk, n);
      float lmn = b < e ? vol[b] : 0.f, lmx = lmn;
      for (int64_t i = b; i < e; ++i) {
        lmn = std::min(lmn, vol[i]);
        lmx = std::max(lmx, vol[i]);
      }
      mins[c] = lmn;
      maxs[c] = lmx;
    }
  });
  for (int c = 0; c < kChunks; ++c) {
    if (c * chunk < n) {
      mn = std::min(mn, mins[c]);
      mx = std::max(mx, maxs[c]);
    }
  }
  float scale = (mx - mn) != 0.f ? (new_max - new_min) / (mx - mn) : 0.f;
  parallel_for(n, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) vol[i] = (vol[i] - mn) * scale + new_min;
  });
  return 0;
}

int vrt_pad(const float* src, int64_t d, int64_t h, int64_t w,
            float* dst, int64_t pad, float value) {
  int64_t nd = d + 2 * pad, nh = h + 2 * pad, nw = w + 2 * pad;
  parallel_for(nd, [&](int64_t zb, int64_t ze) {
    for (int64_t z = zb; z < ze; ++z) {
      for (int64_t y = 0; y < nh; ++y) {
        float* row = dst + (z * nh + y) * nw;
        bool inside_zy = (z >= pad && z < pad + d && y >= pad && y < pad + h);
        if (!inside_zy) {
          std::fill(row, row + nw, value);
          continue;
        }
        std::fill(row, row + pad, value);
        std::fill(row + pad + w, row + nw, value);
        std::memcpy(row + pad, src + ((z - pad) * h + (y - pad)) * w,
                    w * sizeof(float));
      }
    }
  });
  return 0;
}

// MIP along z: out (h, w) = max over z of vol[z, y, x]
int vrt_mip(const float* vol, float* out, int64_t d, int64_t h, int64_t w) {
  int64_t sz = w * h;
  parallel_for(h, [&](int64_t yb, int64_t ye) {
    for (int64_t y = yb; y < ye; ++y) {
      float* orow = out + y * w;
      std::memcpy(orow, vol + y * w, w * sizeof(float));
      for (int64_t z = 1; z < d; ++z) {
        const float* row = vol + z * sz + y * w;
        for (int64_t x = 0; x < w; ++x) orow[x] = std::max(orow[x], row[x]);
      }
    }
  });
  return 0;
}

}  // extern "C"
