// chroma_tpu native helpers: the CPU-side heavy lifting of geometry
// preparation, playing the role of the reference's CUDA BVH builder
// kernels (reference: chroma/cuda/bvh.cu) for the TPU stack.
//
// Exposed via a plain C ABI and loaded with ctypes
// (chroma_tpu/native.py); the numpy implementations remain as a
// fallback so the framework runs without a compiler.
//
// Functions:
//   quantize_and_morton : per-triangle AABB 16-bit quantization +
//                         48-bit Morton codes (bvh.cu make_leaves)
//   radix_sort_u64      : LSD radix argsort of Morton codes
//   coarsen_group       : one recursive-grid grouping round (grid.py)
//   segment_min_max_u32 : child-AABB unions per parent run

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// Spread the low 16 bits of x to every third bit slot.
static inline uint64_t spread3_16(uint64_t x) {
    x = (x | (x << 16)) & 0x00000000FF0000FFull;
    x = (x | (x << 8))  & 0x000000F00F00F00Full;
    x = (x | (x << 4))  & 0x00000C30C30C30C3ull;
    x = (x | (x << 2))  & 0x0000249249249249ull;
    return x;
}

// Quantize per-triangle AABBs onto the 16-bit world grid and compute
// centroid Morton codes.  vertices: (nv,3) f32; triangles: (nt,3) i32.
// Outputs: lo/hi (nt,3) u32 (widened by one grid unit like the
// reference), morton (nt) u64.
void quantize_and_morton(const float* vertices, const int32_t* triangles,
                         int64_t ntris, const float* world_origin,
                         float world_scale, uint32_t* lo, uint32_t* hi,
                         uint64_t* morton) {
    const float inv_scale = 1.0f / world_scale;
    for (int64_t t = 0; t < ntris; ++t) {
        float mn[3], mx[3], cen[3];
        for (int k = 0; k < 3; ++k) {
            mn[k] = 3.4e38f; mx[k] = -3.4e38f; cen[k] = 0.0f;
        }
        for (int j = 0; j < 3; ++j) {
            const float* v = vertices + 3 * (int64_t)triangles[3 * t + j];
            for (int k = 0; k < 3; ++k) {
                float x = v[k];
                if (x < mn[k]) mn[k] = x;
                if (x > mx[k]) mx[k] = x;
                cen[k] += x;
            }
        }
        uint64_t code = 0;
        for (int k = 0; k < 3; ++k) {
            // truncating quantization, matching the reference builder
            uint32_t ql = (uint32_t)((mn[k] - world_origin[k]) * inv_scale);
            uint32_t qh = (uint32_t)((mx[k] - world_origin[k]) * inv_scale);
            uint32_t qc = (uint32_t)((cen[k] / 3.0f - world_origin[k])
                                     * inv_scale);
            lo[3 * t + k] = ql > 0 ? ql - 1 : 0;
            hi[3 * t + k] = qh + 1;
            code |= spread3_16(qc) << k;
        }
        morton[t] = code;
    }
}

// Stable LSD radix argsort of u64 keys; writes the permutation into
// order (caller allocates n int64).
void radix_sort_u64(const uint64_t* keys, int64_t n, int64_t* order) {
    std::vector<int64_t> a(n), b(n);
    for (int64_t i = 0; i < n; ++i) a[i] = i;
    std::vector<int64_t> count(1 << 16);
    for (int pass = 0; pass < 4; ++pass) {
        const int shift = pass * 16;
        std::fill(count.begin(), count.end(), 0);
        for (int64_t i = 0; i < n; ++i)
            ++count[(keys[a[i]] >> shift) & 0xFFFF];
        int64_t total = 0;
        for (size_t c = 0; c < count.size(); ++c) {
            int64_t tmp = count[c];
            count[c] = total;
            total += tmp;
        }
        for (int64_t i = 0; i < n; ++i)
            b[count[(keys[a[i]] >> shift) & 0xFFFF]++] = a[i];
        a.swap(b);
    }
    std::memcpy(order, a.data(), n * sizeof(int64_t));
}

// One recursive-grid grouping round: coarsen sorted Morton codes until
// the mean fan-out reaches target_degree, then emit run starts split
// at max_child.  Returns the number of parents; first_child must have
// room for n entries.  codes is modified in place (coarsened).
int64_t coarsen_group(uint64_t* codes, int64_t n, double target_degree,
                      int64_t max_child, int64_t* first_child) {
    if (n <= 0) return 0;
    // count unique runs
    auto count_unique = [&]() {
        int64_t u = 1;
        for (int64_t i = 1; i < n; ++i) u += (codes[i] != codes[i - 1]);
        return u;
    };
    int64_t nunique = count_unique();
    while ((double)n / (double)(nunique > 0 ? nunique : 1) < target_degree
           && nunique > 1) {
        for (int64_t i = 0; i < n; ++i) codes[i] >>= 1;
        nunique = count_unique();
    }
    int64_t nparent = 0;
    int64_t run_start = 0;
    for (int64_t i = 1; i <= n; ++i) {
        if (i == n || codes[i] != codes[i - 1]) {
            for (int64_t s = run_start; s < i; s += max_child)
                first_child[nparent++] = s;
            run_start = i;
        }
    }
    return nparent;
}

// Per-parent AABB unions: for each parent p covering children
// [first_child[p], first_child[p]+nchild[p]), min/max-reduce the
// (n,3) u32 lo/hi arrays into (np,3) outputs.
void segment_min_max_u32(const uint32_t* lo, const uint32_t* hi,
                         const int64_t* first_child, const int64_t* nchild,
                         int64_t nparent, uint32_t* out_lo,
                         uint32_t* out_hi) {
    for (int64_t p = 0; p < nparent; ++p) {
        const int64_t s = first_child[p];
        const int64_t e = s + nchild[p];
        uint32_t mn[3] = {0xFFFFFFFFu, 0xFFFFFFFFu, 0xFFFFFFFFu};
        uint32_t mx[3] = {0, 0, 0};
        for (int64_t i = s; i < e; ++i) {
            for (int k = 0; k < 3; ++k) {
                uint32_t l = lo[3 * i + k], h = hi[3 * i + k];
                if (l < mn[k]) mn[k] = l;
                if (h > mx[k]) mx[k] = h;
            }
        }
        for (int k = 0; k < 3; ++k) {
            out_lo[3 * p + k] = mn[k];
            out_hi[3 * p + k] = mx[k];
        }
    }
}

}  // extern "C"
