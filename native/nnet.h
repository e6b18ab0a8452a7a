/* Minimal float32 neural net primitives for the RADAE edge runtime.
 *
 * Self-contained implementation (no external ML deps) of the four layer
 * types the RADAE core codec needs: dense, GRU (torch gate order r,z,n),
 * causal 2-tap dilated conv, and a gated linear unit.  Row-major weight
 * layout (out_features, in_features) matching the radae_tpu export format.
 *
 * Provides the same capability as the reference's patched opus nnet layer
 * calls (reference: src/rade_enc.c:55-114 uses compute_generic_dense/
 * gru/conv1d) with an independent implementation.
 */

#ifndef RADAE_NNET_H
#define RADAE_NNET_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Every weight matrix optionally carries an int8 copy (per-output-row
 * absmax scales).  When the w8 pointer is set the forward paths use it
 * instead of the float weights: the step is weight-bandwidth-bound at
 * batch 1, so reading 1 byte/weight instead of 4 is a direct speedup.
 * This mirrors the reference C runtime, whose opus nnet primitives run
 * 8-bit quantized weight arrays (reference: src/rade_enc_data.h /
 * opus compute_generic_dense); the net is trained with 8-bit activation
 * quantization noise (radae_base.py:80-81) precisely to tolerate this. */

typedef struct {
    const float *w;     /* (out, in) row-major */
    const float *b;     /* (out) */
    const int8_t *w8;   /* optional int8 copy of w */
    const float *w8s;   /* per-row dequant scales (out) */
    int in_dim, out_dim;
} rn_dense;

typedef struct {
    const float *w_ih;  /* (3H, in) rows: r, z, n */
    const float *w_hh;  /* (3H, H)  */
    const float *b_ih;  /* (3H) */
    const float *b_hh;  /* (3H) */
    const int8_t *w_ih8, *w_hh8;
    const float *w_ih8s, *w_hh8s;
    int in_dim, hidden;
} rn_gru;

typedef struct {
    const float *w;     /* (out, in, 2) */
    const float *b;     /* (out) */
    const int8_t *w8;
    const float *w8s;
    int in_dim, out_dim, dilation;
} rn_conv2;

typedef struct {
    const float *w;     /* fused weight-norm gate (F, F) */
    const int8_t *w8;
    const float *w8s;
    int feat;
} rn_glu;

/* Quantize a (rows, cols) float matrix to int8 with per-row absmax
 * scales.  Returns one malloc'd block (caller frees) laid out as
 * rows float scales followed by rows*cols int8; sets *w8/*scale into it;
 * NULL on allocation failure. */
void *rn_quantize_rows(const float *w, int rows, int cols,
                       const int8_t **w8, const float **scale);

/* y = W x + b */
void rn_dense_fwd(const rn_dense *d, float *y, const float *x);
/* y = tanh(W x + b) */
void rn_dense_tanh_fwd(const rn_dense *d, float *y, const float *x);
/* h <- GRU(x, h); y = h.  h has hidden floats. */
void rn_gru_fwd(const rn_gru *g, float *h, const float *x);
/* y = tanh(W0 x_hist + W1 x + b); hist holds the input from `dilation`
 * steps ago (caller-managed ring of dilation * in_dim floats). */
void rn_conv2_fwd(const rn_conv2 *c, float *y, const float *x_hist,
                  const float *x);
/* y = x * sigmoid(W x) */
void rn_glu_fwd(const rn_glu *g, float *y, const float *x);

/* activations */
float rn_sigmoid(float x);
float rn_tanh(float x);

#ifdef __cplusplus
}
#endif
#endif
