// Native host-side runtime for AICamera-TPU.
//
// The reference leans on vendored native code for its host path: scipy's
// C++ Hungarian solver (reference src/tracker/core/linear_assignment.py:4)
// and OpenCV's C++ imgproc for letterboxing (src/utils/image_processing.py).
// This library provides first-party equivalents, exposed to Python via
// ctypes (aicamera_tpu/native):
//
//  - lapjv_solve: Jonker-Volgenant shortest-augmenting-path optimal
//    assignment (used as the CPU fallback associator and as an independent
//    oracle validating the on-device Pallas/XLA solver).
//  - letterbox_u8: fused bilinear resize + pad + BGR->RGB + [0,1]
//    normalize producing NHWC float32 (CPU deployment path; the TPU path
//    uses the Pallas kernel).
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// Solve the rectangular assignment problem: minimize sum of cost[i, col_i]
// over distinct columns. cost is row-major (nr x nc), nr <= nc required
// (transpose on the caller side otherwise). Writes col4row[nr] (assigned
// column per row). Returns 0 on success.
int lapjv_solve(const float* cost, int nr, int nc, int* col4row) {
    if (nr <= 0 || nc <= 0 || nr > nc) return -1;
    const double INF = std::numeric_limits<double>::infinity();

    std::vector<double> u(nr, 0.0), v(nc, 0.0);
    std::vector<int> row4col(nc, -1);
    std::vector<int> path(nc, -1);
    std::vector<double> shortest(nc);
    std::vector<char> sr(nr), sc(nc);

    for (int cur = 0; cur < nr; ++cur) {
        std::fill(shortest.begin(), shortest.end(), INF);
        std::fill(sr.begin(), sr.end(), 0);
        std::fill(sc.begin(), sc.end(), 0);

        double min_val = 0.0;
        int i = cur;
        int sink = -1;
        while (sink == -1) {
            sr[i] = 1;
            int j_min = -1;
            double lowest = INF;
            for (int j = 0; j < nc; ++j) {
                if (sc[j]) continue;
                double r = min_val + (double)cost[(size_t)i * nc + j]
                           - u[i] - v[j];
                if (r < shortest[j]) {
                    shortest[j] = r;
                    path[j] = i;
                }
                if (shortest[j] < lowest ||
                    (shortest[j] == lowest && row4col[j] == -1)) {
                    lowest = shortest[j];
                    j_min = j;
                }
            }
            if (j_min < 0 || lowest == INF) return -2;  // infeasible
            min_val = lowest;
            sc[j_min] = 1;
            if (row4col[j_min] == -1) {
                sink = j_min;
            } else {
                i = row4col[j_min];
            }
        }

        // dual updates (col4row is maintained incrementally in the output)
        u[cur] += min_val;
        for (int r = 0; r < nr; ++r) {
            if (sr[r] && r != cur) {
                u[r] += min_val - shortest[col4row[r]];
            }
        }
        for (int j = 0; j < nc; ++j) {
            if (sc[j]) v[j] -= min_val - shortest[j];
        }

        // augment along the alternating path back from the sink
        int j = sink;
        while (true) {
            int pi = path[j];
            row4col[j] = pi;
            int tmp = col4row[pi];
            col4row[pi] = j;
            if (pi == cur) break;
            j = tmp;
        }
    }
    return 0;
}

// Fused letterbox: uint8 BGR HWC (src_h x src_w x 3) -> float32 RGB NHWC
// (dst_h x dst_w x 3), bilinear (cv2 half-pixel convention, no
// antialiasing), 114-padding outside the content box, values in [0, 1].
// unpad_h/unpad_w/top/left define the content placement (computed by the
// Python letterbox_spec — reference image_processing.py:37-67 semantics).
void letterbox_u8(const uint8_t* src, int src_h, int src_w,
                  float* dst, int dst_h, int dst_w,
                  int unpad_h, int unpad_w, int top, int left) {
    const float pad = 114.0f / 255.0f;
    const float inv255 = 1.0f / 255.0f;
    const float sy_scale = (float)src_h / (float)unpad_h;
    const float sx_scale = (float)src_w / (float)unpad_w;

    // precompute horizontal taps
    std::vector<int> x0(unpad_w);
    std::vector<float> fx(unpad_w);
    for (int x = 0; x < unpad_w; ++x) {
        float sx = (x + 0.5f) * sx_scale - 0.5f;
        sx = std::min(std::max(sx, 0.0f), (float)(src_w - 1));
        int i0 = (int)sx;
        i0 = std::min(i0, src_w - 1);
        x0[x] = i0;
        fx[x] = sx - (float)i0;
    }

    for (int y = 0; y < dst_h; ++y) {
        float* out_row = dst + (size_t)y * dst_w * 3;
        if (y < top || y >= top + unpad_h) {
            for (int x = 0; x < dst_w * 3; ++x) out_row[x] = pad;
            continue;
        }
        float sy = (y - top + 0.5f) * sy_scale - 0.5f;
        sy = std::min(std::max(sy, 0.0f), (float)(src_h - 1));
        int y0i = std::min((int)sy, src_h - 1);
        int y1i = std::min(y0i + 1, src_h - 1);
        float fy = sy - (float)y0i;
        const uint8_t* r0 = src + (size_t)y0i * src_w * 3;
        const uint8_t* r1 = src + (size_t)y1i * src_w * 3;

        for (int x = 0; x < left; ++x)
            for (int c = 0; c < 3; ++c) out_row[x * 3 + c] = pad;
        for (int x = 0; x < unpad_w; ++x) {
            int i0 = x0[x];
            int i1 = std::min(i0 + 1, src_w - 1);
            float f = fx[x];
            float* o = out_row + (size_t)(left + x) * 3;
            for (int c = 0; c < 3; ++c) {
                float a = (1.0f - fy) * r0[i0 * 3 + c] + fy * r1[i0 * 3 + c];
                float b = (1.0f - fy) * r0[i1 * 3 + c] + fy * r1[i1 * 3 + c];
                float val = (1.0f - f) * a + f * b;
                // BGR -> RGB: channel c of output takes source channel 2-c
                o[2 - c] = std::nearbyint(val) * inv255;
            }
        }
        for (int x = left + unpad_w; x < dst_w; ++x)
            for (int c = 0; c < 3; ++c) out_row[x * 3 + c] = pad;
    }
}

}  // extern "C"
