// Native host-side kernels for ATQ-TPU.
//
// The reference packs ternary weights with a per-element Python loop
// (/root/reference/atq/bit_packing.py:60-69) — O(n) interpreter-bound.
// These C++ kernels pack/unpack at memory bandwidth and serve the
// host-side paths (checkpoint export, serving-weight preparation) where the
// arrays are numpy-resident; the on-device paths use jnp/Pallas.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this environment).
//
// Encoding (reference-compatible): -1 -> 00, 0 -> 01, +1 -> 10,
// 4 values/byte, value i at bit position 2*(i % 4) of byte i/4.

#include <cstdint>
#include <cstring>

extern "C" {

// Flat reference-format packing. Returns 0 on success, -1 if a non-ternary
// value is encountered (mirrors the reference's validation).
int atq_pack_ternary(const float* in, uint8_t* out, int64_t n) {
    const int64_t packed = (n + 3) / 4;
    std::memset(out, 0, static_cast<size_t>(packed));
    for (int64_t i = 0; i < n; ++i) {
        const float v = in[i];
        uint8_t code;
        if (v == -1.0f) code = 0;
        else if (v == 0.0f) code = 1;
        else if (v == 1.0f) code = 2;
        else return -1;
        out[i >> 2] |= static_cast<uint8_t>(code << ((i & 3) * 2));
    }
    return 0;
}

void atq_unpack_ternary(const uint8_t* in, float* out, int64_t n) {
    static const float lut[4] = {-1.0f, 0.0f, 1.0f, 0.0f};
    for (int64_t i = 0; i < n; ++i) {
        out[i] = lut[(in[i >> 2] >> ((i & 3) * 2)) & 3];
    }
}

// Planar packing (kernel-native layout, core/packing.py:pack_planar):
// each row's K axis is padded to k_padded (multiple of 4) and split into 4
// contiguous quarters; byte b of a row packs (Q0[b], Q1[b], Q2[b], Q3[b]).
int atq_pack_planar(const float* in, uint8_t* out, int64_t rows,
                    int64_t cols, int64_t k_padded) {
    const int64_t kq = k_padded / 4;
    for (int64_t r = 0; r < rows; ++r) {
        const float* row = in + r * cols;
        uint8_t* orow = out + r * kq;
        for (int64_t b = 0; b < kq; ++b) {
            uint8_t byte = 0;
            for (int s = 0; s < 4; ++s) {
                const int64_t col = s * kq + b;
                uint8_t code = 1;  // padding encodes 0
                if (col < cols) {
                    const float v = row[col];
                    if (v == -1.0f) code = 0;
                    else if (v == 0.0f) code = 1;
                    else if (v == 1.0f) code = 2;
                    else return -1;
                }
                byte |= static_cast<uint8_t>(code << (s * 2));
            }
            orow[b] = byte;
        }
    }
    return 0;
}

// Ternarize: sparsity-targeted threshold given precomputed threshold value
// (the threshold selection itself happens where the sort lives). Counts the
// nonzeros and returns them; also accumulates sum(w * w_t) for the optimal
// alpha so callers can finish the reference's alpha formula.
int64_t atq_ternarize(const float* w, float* w_t, int64_t n, float threshold,
                      double* dot_accum) {
    int64_t nnz = 0;
    double acc = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        const float v = w[i];
        float t = 0.0f;
        if (v > threshold) { t = 1.0f; ++nnz; acc += v; }
        else if (v < -threshold) { t = -1.0f; ++nnz; acc -= v; }
        w_t[i] = t;
    }
    if (dot_accum) *dot_accum = acc;
    return nnz;
}

}  // extern "C"
