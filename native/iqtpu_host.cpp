// Native host-side kernels for interpret_quality_tpu.
//
// The TPU owns all model compute (JAX/XLA); these C++ routines cover the
// host data path, which in the reference is pure Python/numpy:
//   * farthest-point sampling used by the ShapeNet eval loader to resample
//     every cloud to 1024 points (reference final_data_shapley.py:71-92 —
//     a Python loop over 1024 iterations per cloud), and
//   * .pts text parsing (reference uses np.loadtxt, ~40x slower than this
//     scanner for the ~2500-line ShapeNet files read every training epoch).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
// Build: scripts/build_native.sh (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// Farthest-point sampling with the first point fixed at index 0.
// pts: (n, 3) row-major float32.  out_idx: (npoint,) int64.
// f32 arithmetic in numpy's op order (sub, square, sum) — with
// -ffp-contract=off (build_native.sh) this rounds identically to the
// reference's numpy loop, keeping the resampled partitions bit-identical.
void iqtpu_fps_f32(const float* pts, int64_t n, int64_t npoint,
                   int64_t* out_idx) {
    if (n <= 0 || npoint <= 0) return;
    float* dist = static_cast<float*>(malloc(sizeof(float) * n));
    for (int64_t i = 0; i < n; ++i) dist[i] = 1e10f;
    int64_t farthest = 0;
    for (int64_t s = 0; s < npoint; ++s) {
        out_idx[s] = farthest;
        const float cx = pts[3 * farthest];
        const float cy = pts[3 * farthest + 1];
        const float cz = pts[3 * farthest + 2];
        float best = -1.0f;
        int64_t best_i = 0;
        for (int64_t i = 0; i < n; ++i) {
            const float dx = pts[3 * i] - cx;
            const float dy = pts[3 * i + 1] - cy;
            const float dz = pts[3 * i + 2] - cz;
            const float d = dx * dx + dy * dy + dz * dz;
            if (d < dist[i]) dist[i] = d;
            if (dist[i] > best) { best = dist[i]; best_i = i; }
        }
        farthest = best_i;
    }
    free(dist);
}

// Batched FPS: pts (b, n, 3), out_idx (b, npoint).
void iqtpu_fps_batch_f32(const float* pts, int64_t b, int64_t n,
                         int64_t npoint, int64_t* out_idx) {
    for (int64_t i = 0; i < b; ++i)
        iqtpu_fps_f32(pts + i * n * 3, n, npoint, out_idx + i * npoint);
}

// Parse whitespace-separated floats from a text buffer (e.g. a ShapeNet
// .pts file).  Writes up to max_vals values to out; returns the number of
// values parsed.
// CONTRACT: buf must point at a NUL-terminated buffer of at least len
// bytes (CPython bytes objects are) — strtof scans to the first non-float
// byte and is not bounded by `end`, so a token straddling buf+len parses
// whole rather than truncating at len.
int64_t iqtpu_parse_floats(const char* buf, int64_t len, float* out,
                           int64_t max_vals) {
    int64_t count = 0;
    const char* p = buf;
    const char* end = buf + len;
    while (p < end && count < max_vals) {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' ||
                           *p == '\r')) ++p;
        if (p >= end) break;
        char* next = nullptr;
        const float v = strtof(p, &next);
        if (next == p) { ++p; continue; }  // skip unparsable byte
        out[count++] = v;
        p = next;
    }
    return count;
}

// Squared-distance-based region assignment: for each of n points pick the
// nearest of r centres.  pts (n,3), centres (r,3), out (n,) int32.
void iqtpu_region_assign_f32(const float* pts, int64_t n,
                             const float* centres, int64_t r, int32_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const float x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
        float best = 1e30f;
        int32_t best_j = 0;
        for (int64_t j = 0; j < r; ++j) {
            const float dx = x - centres[3 * j];
            const float dy = y - centres[3 * j + 1];
            const float dz = z - centres[3 * j + 2];
            const float d = dx * dx + dy * dy + dz * dz;
            if (d < best) { best = d; best_j = static_cast<int32_t>(j); }
        }
        out[i] = best_j;
    }
}

}  // extern "C"
