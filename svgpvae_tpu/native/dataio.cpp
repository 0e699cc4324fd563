// Native data-plane kernels for svgpvae_tpu.
//
// The reference delegates its input pipeline to tf.data's C++ runtime
// (utils.py:799-875, SPRITES_utils.py:164-214); this library is the
// equivalent native tier for the host-side hot ops of this framework's
// data layer:
//
//   * svt_rasterize_balls — render GP trajectories into binary ball video
//     frames (reference math: utils.py:93-108 / 138-192)
//   * svt_rotate_images_bilinear — batched center rotation of square
//     images (the rotated-MNIST dataset factory's hot loop,
//     utils.py:564-576; bilinear interpolation, vs scipy's cubic spline)
//
// Built on first use with g++ -O3 -march=native -fopenmp (see
// svgpvae_tpu/native/__init__.py) and bound via ctypes.  All buffers are
// caller-allocated contiguous float32/float64 arrays.

#include <cmath>
#include <cstdint>

extern "C" {

// paths: (batch, tmax, 2) pixel-space coordinates (x, y)
// out:   (batch, tmax, py, px) float32 binary frames
// Frame convention matches the reference: x runs along the last (column)
// axis, y along the row axis.
void svt_rasterize_balls(const float* paths, int batch, int tmax,
                         int px, int py, float r, float* out) {
    const float rr = r * r;
#pragma omp parallel for collapse(2) schedule(static)
    for (int b = 0; b < batch; ++b) {
        for (int t = 0; t < tmax; ++t) {
            const float cx = paths[(b * tmax + t) * 2 + 0];
            const float cy = paths[(b * tmax + t) * 2 + 1];
            float* frame = out + ((int64_t)(b * tmax + t)) * px * py;
            for (int y = 0; y < py; ++y) {
                const float dy2 = (y - cy) * (y - cy);
                for (int x = 0; x < px; ++x) {
                    const float dx2 = (x - cx) * (x - cx);
                    frame[y * px + x] = (dx2 + dy2 < rr) ? 1.0f : 0.0f;
                }
            }
        }
    }
}

// src: (n, h, w) float64 images; angles_deg: (a,) rotation angles;
// dst: (n, a, h, w) float64 rotated images (counter-clockwise, about the
// image center, bilinear interpolation, zero fill) — matches
// scipy.ndimage.rotate(reshape=False, order=1) conventions.
void svt_rotate_images_bilinear(const double* src, int n, int h, int w,
                                const double* angles_deg, int a,
                                double* dst) {
    const double cy = (h - 1) * 0.5;
    const double cx = (w - 1) * 0.5;
#pragma omp parallel for collapse(2) schedule(static)
    for (int i = 0; i < n; ++i) {
        for (int k = 0; k < a; ++k) {
            const double th = angles_deg[k] * M_PI / 180.0;
            // inverse mapping: output pixel -> source coordinates
            const double c = std::cos(th), s = std::sin(th);
            const double* img = src + (int64_t)i * h * w;
            double* out = dst + ((int64_t)(i * a + k)) * h * w;
            for (int y = 0; y < h; ++y) {
                for (int x = 0; x < w; ++x) {
                    // scipy.ndimage.rotate rotates in the (row, col) plane;
                    // inverse rotation of output coords about the center
                    const double ry = y - cy, rx = x - cx;
                    const double sy = c * ry + s * rx + cy;
                    const double sx = -s * ry + c * rx + cx;
                    double val = 0.0;
                    if (sy >= 0.0 && sy <= h - 1 && sx >= 0.0 &&
                        sx <= w - 1) {
                        const int y0 = (int)std::floor(sy);
                        const int x0 = (int)std::floor(sx);
                        const int y1 = y0 + 1 < h ? y0 + 1 : y0;
                        const int x1 = x0 + 1 < w ? x0 + 1 : x0;
                        const double fy = sy - y0, fx = sx - x0;
                        val = img[y0 * w + x0] * (1 - fy) * (1 - fx) +
                              img[y0 * w + x1] * (1 - fy) * fx +
                              img[y1 * w + x0] * fy * (1 - fx) +
                              img[y1 * w + x1] * fy * fx;
                    }
                    out[y * w + x] = val;
                }
            }
        }
    }
}

}  // extern "C"
