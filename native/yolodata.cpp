// yolodata: native host-side image kernels for the detection data pipeline.
//
// TPU-native replacement for the reference's C data loader
// (/root/reference .../src/data.c:957 load_data_detection + src/image.c
// resize/HSV/flip, fanned out over 64 pthreads in load_threads,
// src/data.c:1062). The Python loader (data/loader.py) calls these through
// ctypes for the pixel-heavy work — jittered crop/place, bilinear resize,
// HSV distortion, horizontal flip — batched across a std::thread pool so
// host preprocessing overlaps the TPU step. Geometry (crop parameters, box
// remapping) stays in Python where the RNG lives; this file only moves
// pixels.
//
// Build: make -C native  ->  libyolodata.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline uint8_t clamp_u8(float v) {
    return static_cast<uint8_t>(v < 0.f ? 0.f : (v > 255.f ? 255.f : v + 0.5f));
}

// Bilinear sample from an RGB8 image with a virtual gray border: coordinates
// outside [0,h)x[0,w) read as pad value (the crop/place canvas fill,
// data.c place_image semantics with 0.5-gray padding).
inline void sample_bilinear(const uint8_t* src, int h, int w,
                            float fy, float fx, uint8_t pad, uint8_t* out3) {
    int x0 = static_cast<int>(std::floor(fx));
    int y0 = static_cast<int>(std::floor(fy));
    float ax = fx - x0, ay = fy - y0;
    for (int c = 0; c < 3; ++c) {
        float acc = 0.f;
        for (int dy = 0; dy < 2; ++dy) {
            for (int dx = 0; dx < 2; ++dx) {
                int yy = y0 + dy, xx = x0 + dx;
                float wgt = (dy ? ay : 1.f - ay) * (dx ? ax : 1.f - ax);
                float v = (yy < 0 || yy >= h || xx < 0 || xx >= w)
                              ? static_cast<float>(pad)
                              : static_cast<float>(src[(yy * w + xx) * 3 + c]);
                acc += wgt * v;
            }
        }
        out3[c] = clamp_u8(acc);
    }
}

// RGB <-> HSV on floats in [0,1]; matches darknet's rgb_to_hsv/hsv_to_rgb
// (src/image.c) with hue in [0,6).
inline void rgb_to_hsv(float r, float g, float b, float* hh, float* ss,
                       float* vv) {
    float mx = std::max(r, std::max(g, b));
    float mn = std::min(r, std::min(g, b));
    float delta = mx - mn;
    *vv = mx;
    if (mx == 0.f) { *ss = 0.f; *hh = 0.f; return; }
    *ss = delta / mx;
    if (delta == 0.f) { *hh = 0.f; return; }
    float h;
    if (r == mx) h = (g - b) / delta;
    else if (g == mx) h = 2.f + (b - r) / delta;
    else h = 4.f + (r - g) / delta;
    if (h < 0.f) h += 6.f;
    *hh = h;
}

inline void hsv_to_rgb(float h, float s, float v, float* r, float* g,
                       float* b) {
    if (s == 0.f) { *r = *g = *b = v; return; }
    int i = static_cast<int>(std::floor(h)) % 6;
    float f = h - std::floor(h);
    float p = v * (1.f - s);
    float q = v * (1.f - s * f);
    float t = v * (1.f - s * (1.f - f));
    switch (i) {
        case 0: *r = v; *g = t; *b = p; break;
        case 1: *r = q; *g = v; *b = p; break;
        case 2: *r = p; *g = v; *b = t; break;
        case 3: *r = p; *g = q; *b = v; break;
        case 4: *r = t; *g = p; *b = v; break;
        default: *r = v; *g = p; *b = q; break;
    }
}

struct Aug {
    int32_t crop_x0, crop_y0, crop_w, crop_h;  // crop box in source pixels
    float dhue, dsat, dexp;                    // hue shift [0,1), scale factors
    int32_t flip;                              // 1 = horizontal flip
};

void process_one(const uint8_t* src, int sh, int sw, const Aug& a,
                 uint8_t* dst, int out_size, uint8_t pad) {
    const float sx = static_cast<float>(a.crop_w) / out_size;
    const float sy = static_cast<float>(a.crop_h) / out_size;
    for (int oy = 0; oy < out_size; ++oy) {
        // half-pixel-center mapping (cv2.INTER_LINEAR convention)
        float fy = a.crop_y0 + (oy + 0.5f) * sy - 0.5f;
        uint8_t* row = dst + oy * out_size * 3;
        for (int ox = 0; ox < out_size; ++ox) {
            int wx = a.flip ? (out_size - 1 - ox) : ox;
            float fx = a.crop_x0 + (ox + 0.5f) * sx - 0.5f;
            uint8_t px[3];
            sample_bilinear(src, sh, sw, fy, fx, pad, px);
            if (a.dhue != 0.f || a.dsat != 1.f || a.dexp != 1.f) {
                float r = px[0] / 255.f, g = px[1] / 255.f, b = px[2] / 255.f;
                float h, s, v;
                rgb_to_hsv(r, g, b, &h, &s, &v);
                h += a.dhue * 6.f;
                if (h >= 6.f) h -= 6.f;
                if (h < 0.f) h += 6.f;
                s = std::min(s * a.dsat, 1.f);
                v = std::min(v * a.dexp, 1.f);
                hsv_to_rgb(h, s, v, &r, &g, &b);
                px[0] = clamp_u8(r * 255.f);
                px[1] = clamp_u8(g * 255.f);
                px[2] = clamp_u8(b * 255.f);
            }
            std::memcpy(row + wx * 3, px, 3);
        }
    }
}

}  // namespace

extern "C" {

// Process a batch of images into a (n, out_size, out_size, 3) uint8 buffer.
// srcs[i]: HWC RGB8 source; augs[i]: per-image parameters. nthreads <= 0
// uses hardware_concurrency.
void yd_process_batch(const uint8_t** srcs, const int32_t* hs,
                      const int32_t* ws, int32_t n, const Aug* augs,
                      uint8_t* out, int32_t out_size, uint8_t pad,
                      int32_t nthreads) {
    if (nthreads <= 0) {
        nthreads = static_cast<int32_t>(std::thread::hardware_concurrency());
        if (nthreads <= 0) nthreads = 4;
    }
    nthreads = std::min(nthreads, n);
    std::atomic<int32_t> next(0);
    auto worker = [&]() {
        for (;;) {
            int32_t i = next.fetch_add(1);
            if (i >= n) return;
            process_one(srcs[i], hs[i], ws[i], augs[i],
                        out + static_cast<size_t>(i) * out_size * out_size * 3,
                        out_size, pad);
        }
    };
    if (nthreads <= 1) {
        worker();
        return;
    }
    std::vector<std::thread> pool;
    pool.reserve(nthreads);
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
}

int32_t yd_version(void) { return 1; }

}  // extern "C"
