/* Minimal float32 nnet primitives — see nnet.h. */

#include "nnet.h"

#include <math.h>
#include <stdlib.h>
#include <string.h>

float rn_sigmoid(float x) { return 1.0f / (1.0f + expf(-x)); }
float rn_tanh(float x) { return tanhf(x); }

static void matvec(float *y, const float *w, const float *x,
                   int out_dim, int in_dim)
{
    for (int o = 0; o < out_dim; o++) {
        const float *row = w + (size_t)o * in_dim;
        float acc = 0.0f;
        for (int i = 0; i < in_dim; i++)
            acc += row[i] * x[i];
        y[o] = acc;
    }
}

/* int8-weight matvec: int8 -> float converts vectorize well under -O3
 * (pmovsxbd + cvtdq2ps) and each weight byte is read once, so the
 * quantized path trades a little convert ALU for 4x less weight
 * bandwidth — the binding constraint of the batch-1 GRU stack. */
static void qmatvec(float *y, const int8_t *w8, const float *scale,
                    const float *x, int out_dim, int in_dim)
{
    for (int o = 0; o < out_dim; o++) {
        const int8_t *row = w8 + (size_t)o * in_dim;
        float acc = 0.0f;
        for (int i = 0; i < in_dim; i++)
            acc += (float)row[i] * x[i];
        y[o] = acc * scale[o];
    }
}

static float q_row_mse(const float *row, int cols, float s)
{
    float inv = 1.0f / s, mse = 0.0f;
    for (int c = 0; c < cols; c++) {
        float v = row[c] * inv;
        v = v > 127.0f ? 127.0f : (v < -127.0f ? -127.0f : v);
        int qi = (int)(v > 0.0f ? v + 0.5f : v - 0.5f);
        float e = row[c] - s * qi;
        mse += e * e;
    }
    return mse;
}

void *rn_quantize_rows(const float *w, int rows, int cols,
                       const int8_t **w8, const float **scale)
{
    void *blk = malloc((size_t)rows * sizeof(float) + (size_t)rows * cols);
    if (!blk) return NULL;
    float *s = (float *)blk;
    int8_t *q = (int8_t *)(s + rows);
    for (int r = 0; r < rows; r++) {
        const float *row = w + (size_t)r * cols;
        float amax = 0.0f;
        for (int c = 0; c < cols; c++) {
            float a = fabsf(row[c]);
            if (a > amax) amax = a;
        }
        float s0 = amax > 0.0f ? amax / 127.0f : 1.0f;
        /* per-row MSE-optimal scale: absmax clips nothing but wastes
         * resolution on outlier weights; searching a few sub-absmax
         * candidates (saturating the outliers) roughly halves the row
         * quantization MSE at load time for free */
        float best_s = s0, best_m = q_row_mse(row, cols, s0);
        for (int k = 0; k < 8; k++) {
            float cand = s0 * (0.64f + 0.045f * k);     /* 0.64 .. 0.955 */
            float m = q_row_mse(row, cols, cand);
            if (m < best_m) { best_m = m; best_s = cand; }
        }
        s[r] = best_s;
        float inv = 1.0f / best_s;
        int8_t *qrow = q + (size_t)r * cols;
        for (int c = 0; c < cols; c++) {
            float v = row[c] * inv;
            v = v > 127.0f ? 127.0f : (v < -127.0f ? -127.0f : v);
            qrow[c] = (int8_t)(v > 0.0f ? v + 0.5f : v - 0.5f);
        }
    }
    *w8 = q;
    *scale = s;
    return blk;
}

void rn_dense_fwd(const rn_dense *d, float *y, const float *x)
{
    if (d->w8)
        qmatvec(y, d->w8, d->w8s, x, d->out_dim, d->in_dim);
    else
        matvec(y, d->w, x, d->out_dim, d->in_dim);
    for (int o = 0; o < d->out_dim; o++)
        y[o] += d->b[o];
}

void rn_dense_tanh_fwd(const rn_dense *d, float *y, const float *x)
{
    rn_dense_fwd(d, y, x);
    for (int o = 0; o < d->out_dim; o++)
        y[o] = tanhf(y[o]);
}

void rn_gru_fwd(const rn_gru *g, float *h, const float *x)
{
    /* gates: r, z, n stacked along rows of w_ih / w_hh */
    int H = g->hidden;
    float xg[3 * 512];
    float hg[3 * 512];

    if (g->w_ih8)
        qmatvec(xg, g->w_ih8, g->w_ih8s, x, 3 * H, g->in_dim);
    else
        matvec(xg, g->w_ih, x, 3 * H, g->in_dim);
    if (g->w_hh8)
        qmatvec(hg, g->w_hh8, g->w_hh8s, h, 3 * H, H);
    else
        matvec(hg, g->w_hh, h, 3 * H, H);
    for (int i = 0; i < 3 * H; i++) {
        xg[i] += g->b_ih[i];
        hg[i] += g->b_hh[i];
    }
    for (int i = 0; i < H; i++) {
        float r = rn_sigmoid(xg[i] + hg[i]);
        float z = rn_sigmoid(xg[H + i] + hg[H + i]);
        float n = tanhf(xg[2 * H + i] + r * hg[2 * H + i]);
        h[i] = (1.0f - z) * n + z * h[i];
    }
}

void rn_conv2_fwd(const rn_conv2 *c, float *y, const float *x_hist,
                  const float *x)
{
    if (c->w8 && c->in_dim <= 1024) {
        /* interleave the two taps once so the weight row is consumed as
         * one contiguous dot product (same layout as the weights); the
         * dim guard keeps a future wider config on the float path below
         * instead of overrunning the stack buffer (current max in_dim
         * is 768, validated at init) */
        float xcat[2 * 1024];
        for (int i = 0; i < c->in_dim; i++) {
            xcat[2 * i] = x_hist[i];
            xcat[2 * i + 1] = x[i];
        }
        for (int o = 0; o < c->out_dim; o++) {
            const int8_t *row = c->w8 + (size_t)o * c->in_dim * 2;
            float acc = 0.0f;
            for (int i = 0; i < 2 * c->in_dim; i++)
                acc += (float)row[i] * xcat[i];
            y[o] = tanhf(acc * c->w8s[o] + c->b[o]);
        }
        return;
    }
    for (int o = 0; o < c->out_dim; o++) {
        const float *w = c->w + (size_t)o * c->in_dim * 2;
        float acc = c->b[o];
        for (int i = 0; i < c->in_dim; i++) {
            acc += w[2 * i] * x_hist[i];       /* tap 0: x[t - dilation] */
            acc += w[2 * i + 1] * x[i];        /* tap 1: x[t] */
        }
        y[o] = tanhf(acc);
    }
}

void rn_glu_fwd(const rn_glu *g, float *y, const float *x)
{
    if (g->w8) {
        for (int o = 0; o < g->feat; o++) {
            const int8_t *row = g->w8 + (size_t)o * g->feat;
            float acc = 0.0f;
            for (int i = 0; i < g->feat; i++)
                acc += (float)row[i] * x[i];
            y[o] = x[o] * rn_sigmoid(acc * g->w8s[o]);
        }
        return;
    }
    for (int o = 0; o < g->feat; o++) {
        const float *row = g->w + (size_t)o * g->feat;
        float acc = 0.0f;
        for (int i = 0; i < g->feat; i++)
            acc += row[i] * x[i];
        y[o] = x[o] * rn_sigmoid(acc);
    }
}
