/* Fused multi-source FMA over contiguous host buffers.
 *
 * The compiled-table wrapper step is `out = sum_k coeff_k * src_k` over the
 * latent.  Issued as individual torch ops this costs ~10 dispatches per step
 * (~40us); this kernel does the whole combination in one pass over memory.
 * Built as a plain shared library, loaded via ctypes — no Python.h needed.
 *
 * Contract: all sources are contiguous, same length, same dtype; coeffs are
 * float64; out may NOT alias any src.
 */

#include <stddef.h>
#include <stdint.h>

#define RESTRICT __restrict__

void fused_fma_f32(const float *RESTRICT const *srcs, const double *RESTRICT coeffs,
                   int64_t n_srcs, float *RESTRICT out, int64_t numel) {
    if (n_srcs == 0) {
        for (int64_t i = 0; i < numel; ++i) out[i] = 0.0f;
        return;
    }
    {
        const float *s = srcs[0];
        const float c = (float)coeffs[0];
        for (int64_t i = 0; i < numel; ++i) out[i] = s[i] * c;
    }
    for (int64_t k = 1; k < n_srcs; ++k) {
        const float *s = srcs[k];
        const float c = (float)coeffs[k];
        if (c == 0.0f) continue;
        for (int64_t i = 0; i < numel; ++i) out[i] += s[i] * c;
    }
}

void fused_fma_f64(const double *RESTRICT const *srcs, const double *RESTRICT coeffs,
                   int64_t n_srcs, double *RESTRICT out, int64_t numel) {
    if (n_srcs == 0) {
        for (int64_t i = 0; i < numel; ++i) out[i] = 0.0;
        return;
    }
    {
        const double *s = srcs[0];
        const double c = coeffs[0];
        for (int64_t i = 0; i < numel; ++i) out[i] = s[i] * c;
    }
    for (int64_t k = 1; k < n_srcs; ++k) {
        const double *s = srcs[k];
        const double c = coeffs[k];
        if (c == 0.0) continue;
        for (int64_t i = 0; i < numel; ++i) out[i] += s[i] * c;
    }
}

/* Triple-output variant: computes the final sample plus the two history
 * store rows in a single pass (one read of each source). */
void fused_fma3_f32(const float *RESTRICT const *srcs, const double *RESTRICT coeffs,
                    int64_t n_srcs, float *RESTRICT out0, float *RESTRICT out1,
                    float *RESTRICT out2, int64_t numel) {
    fused_fma_f32(srcs, coeffs, n_srcs, out0, numel);
    fused_fma_f32(srcs, coeffs + n_srcs, n_srcs, out1, numel);
    fused_fma_f32(srcs, coeffs + 2 * n_srcs, n_srcs, out2, numel);
}

void fused_fma3_f64(const double *RESTRICT const *srcs, const double *RESTRICT coeffs,
                    int64_t n_srcs, double *RESTRICT out0, double *RESTRICT out1,
                    double *RESTRICT out2, int64_t numel) {
    fused_fma_f64(srcs, coeffs, n_srcs, out0, numel);
    fused_fma_f64(srcs, coeffs + n_srcs, n_srcs, out1, numel);
    fused_fma_f64(srcs, coeffs + 2 * n_srcs, n_srcs, out2, numel);
}
