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

// Hybrid ELL+COO export of a sparse correction matrix (serving path,
// atq_tpu/serve/packed_model.py). Row-major walk; the first `c` nonzeros
// of each row land in the (n, c) ELL arrays (idx zeroed by the caller =
// column 0 / value 0 padding), the rest spill in order into the COO
// triple, which the caller preallocates at the exact spill count it
// computed from the per-row nonzero histogram. Returns the number of COO
// entries written.
int64_t atq_sparse_ell(const float* corr, int64_t n, int64_t k, int64_t c,
                       int32_t* idx, float* val, int32_t* coo_row,
                       int32_t* coo_col, float* coo_val) {
    int64_t spill = 0;
    for (int64_t r = 0; r < n; ++r) {
        const float* row = corr + r * k;
        int64_t filled = 0;
        for (int64_t col = 0; col < k; ++col) {
            const float v = row[col];
            if (v == 0.0f) continue;
            if (filled < c) {
                idx[r * c + filled] = static_cast<int32_t>(col);
                val[r * c + filled] = v;
                ++filled;
            } else {
                coo_row[spill] = static_cast<int32_t>(r);
                coo_col[spill] = static_cast<int32_t>(col);
                coo_val[spill] = v;
                ++spill;
            }
        }
    }
    return spill;
}

}  // extern "C"
