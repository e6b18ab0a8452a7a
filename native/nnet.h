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

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
    const float *w;     /* (out, in) row-major */
    const float *b;     /* (out) */
    int in_dim, out_dim;
} rn_dense;

typedef struct {
    const float *w_ih;  /* (3H, in) rows: r, z, n */
    const float *w_hh;  /* (3H, H)  */
    const float *b_ih;  /* (3H) */
    const float *b_hh;  /* (3H) */
    int in_dim, hidden;
} rn_gru;

typedef struct {
    const float *w;     /* (out, in, 2) */
    const float *b;     /* (out) */
    int in_dim, out_dim, dilation;
} rn_conv2;

typedef struct {
    const float *w;     /* fused weight-norm gate (F, F) */
    int feat;
} rn_glu;

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
