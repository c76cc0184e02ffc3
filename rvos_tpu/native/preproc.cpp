// Native host-side image preprocessing for the TPU data path.
//
// The reference's host pipeline is cv2/PIL inside torch DataLoader
// workers; on a TPU host the CPU budget competes with the device feed,
// so the per-frame hot ops are implemented here and called via ctypes
// (no pybind11 in this image).  All functions operate on contiguous
// C-order buffers supplied by numpy.
//
// Ops: uint8->float32 normalize (ImageNet mean/std, fused),
// nearest-neighbor label resize, bilinear RGB resize, box blur
// (perturbation k in {3,5,9}), salt-and-pepper noise, Gaussian noise
// (xorshift128+ normal via Box-Muller).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// img: [h, w, 3] uint8 or float32-compatible layout; out: [h, w, 3] f32
void normalize_u8(const uint8_t* img, float* out, int h, int w,
                  const float* mean, const float* std_) {
    const float inv255 = 1.0f / 255.0f;
    float invs[3] = {1.0f / std_[0], 1.0f / std_[1], 1.0f / std_[2]};
    const int n = h * w;
    for (int i = 0; i < n; ++i) {
        const uint8_t* p = img + i * 3;
        float* q = out + i * 3;
        q[0] = (p[0] * inv255 - mean[0]) * invs[0];
        q[1] = (p[1] * inv255 - mean[1]) * invs[1];
        q[2] = (p[2] * inv255 - mean[2]) * invs[2];
    }
}

void normalize_f32(const float* img, float* out, int h, int w,
                   const float* mean, const float* std_) {
    const float inv255 = 1.0f / 255.0f;
    float invs[3] = {1.0f / std_[0], 1.0f / std_[1], 1.0f / std_[2]};
    const int n = h * w;
    for (int i = 0; i < n; ++i) {
        const float* p = img + i * 3;
        float* q = out + i * 3;
        q[0] = (p[0] * inv255 - mean[0]) * invs[0];
        q[1] = (p[1] * inv255 - mean[1]) * invs[1];
        q[2] = (p[2] * inv255 - mean[2]) * invs[2];
    }
}

// nearest resize of a uint8 label map (torch 'nearest' grid: floor(i*scale))
void resize_nearest_u8(const uint8_t* src, uint8_t* dst, int sh, int sw,
                       int dh, int dw) {
    const float hs = (float)sh / dh;
    const float ws = (float)sw / dw;
    for (int y = 0; y < dh; ++y) {
        int sy = std::min((int)(y * hs), sh - 1);
        const uint8_t* row = src + (size_t)sy * sw;
        uint8_t* orow = dst + (size_t)y * dw;
        for (int x = 0; x < dw; ++x) {
            int sx = std::min((int)(x * ws), sw - 1);
            orow[x] = row[sx];
        }
    }
}

// bilinear (align_corners=false, OpenCV-style half-pixel) RGB f32 resize
void resize_bilinear_f32(const float* src, float* dst, int sh, int sw,
                         int dh, int dw, int c) {
    const float hs = (float)sh / dh;
    const float ws = (float)sw / dw;
    for (int y = 0; y < dh; ++y) {
        float fy = (y + 0.5f) * hs - 0.5f;
        int y0 = (int)std::floor(fy);
        float wy = fy - y0;
        int y1 = std::min(std::max(y0 + 1, 0), sh - 1);
        y0 = std::min(std::max(y0, 0), sh - 1);
        for (int x = 0; x < dw; ++x) {
            float fx = (x + 0.5f) * ws - 0.5f;
            int x0 = (int)std::floor(fx);
            float wx = fx - x0;
            int x1 = std::min(std::max(x0 + 1, 0), sw - 1);
            x0 = std::min(std::max(x0, 0), sw - 1);
            const float* p00 = src + ((size_t)y0 * sw + x0) * c;
            const float* p01 = src + ((size_t)y0 * sw + x1) * c;
            const float* p10 = src + ((size_t)y1 * sw + x0) * c;
            const float* p11 = src + ((size_t)y1 * sw + x1) * c;
            float* q = dst + ((size_t)y * dw + x) * c;
            for (int k = 0; k < c; ++k) {
                float top = p00[k] * (1 - wx) + p01[k] * wx;
                float bot = p10[k] * (1 - wx) + p11[k] * wx;
                q[k] = top * (1 - wy) + bot * wy;
            }
        }
    }
}

// normalized box blur, border replicate (cv2.blur default), f32 [h,w,3]
void box_blur_f32(const float* src, float* dst, int h, int w, int k) {
    int r = k / 2;
    float inv = 1.0f / (k * k);
    // horizontal pass into temp
    float* tmp = new float[(size_t)h * w * 3];
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            float acc[3] = {0, 0, 0};
            for (int dx = -r; dx <= k - 1 - r; ++dx) {
                int xx = std::min(std::max(x + dx, 0), w - 1);
                const float* p = src + ((size_t)y * w + xx) * 3;
                acc[0] += p[0]; acc[1] += p[1]; acc[2] += p[2];
            }
            float* q = tmp + ((size_t)y * w + x) * 3;
            q[0] = acc[0]; q[1] = acc[1]; q[2] = acc[2];
        }
    }
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            float acc[3] = {0, 0, 0};
            for (int dy = -r; dy <= k - 1 - r; ++dy) {
                int yy = std::min(std::max(y + dy, 0), h - 1);
                const float* p = tmp + ((size_t)yy * w + x) * 3;
                acc[0] += p[0]; acc[1] += p[1]; acc[2] += p[2];
            }
            float* q = dst + ((size_t)y * w + x) * 3;
            q[0] = acc[0] * inv; q[1] = acc[1] * inv; q[2] = acc[2] * inv;
        }
    }
    delete[] tmp;
}

static inline uint64_t xorshift128p(uint64_t* s) {
    uint64_t x = s[0];
    uint64_t const y = s[1];
    s[0] = y;
    x ^= x << 23;
    s[1] = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s[1] + y;
}

void gaussian_noise_f32(float* img, int h, int w, float std_, uint64_t seed) {
    uint64_t s[2] = {seed ^ 0x9e3779b97f4a7c15ULL, seed | 1};
    const int n = h * w * 3;
    const float two_pi = 6.28318530718f;
    for (int i = 0; i + 1 < n; i += 2) {
        float u1 = (float)((xorshift128p(s) >> 11) * (1.0 / 9007199254740992.0));
        float u2 = (float)((xorshift128p(s) >> 11) * (1.0 / 9007199254740992.0));
        if (u1 < 1e-12f) u1 = 1e-12f;
        float mag = std_ * std::sqrt(-2.0f * std::log(u1));
        float z0 = mag * std::cos(two_pi * u2);
        float z1 = mag * std::sin(two_pi * u2);
        img[i] = std::min(std::max(img[i] + z0, 0.0f), 255.0f);
        img[i + 1] = std::min(std::max(img[i + 1] + z1, 0.0f), 255.0f);
    }
}

void salt_pepper_f32(float* img, int h, int w, int n_points, uint64_t seed) {
    uint64_t s[2] = {seed ^ 0xdeadbeefcafef00dULL, seed | 1};
    for (int i = 0; i < n_points; ++i) {
        int y = (int)(xorshift128p(s) % (uint64_t)h);
        int x = (int)(xorshift128p(s) % (uint64_t)w);
        float v = (i % 2 == 1) ? 255.0f : 0.0f;
        float* p = img + ((size_t)y * w + x) * 3;
        p[0] = v; p[1] = v; p[2] = v;
    }
}

}  // extern "C"
