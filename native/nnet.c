/* Minimal float32 nnet primitives — see nnet.h. */

#include "nnet.h"

#include <math.h>
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

void rn_dense_fwd(const rn_dense *d, float *y, const float *x)
{
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

    matvec(xg, g->w_ih, x, 3 * H, g->in_dim);
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
    for (int o = 0; o < g->feat; o++) {
        const float *row = g->w + (size_t)o * g->feat;
        float acc = 0.0f;
        for (int i = 0; i < g->feat; i++)
            acc += row[i] * x[i];
        y[o] = x[o] * rn_sigmoid(acc);
    }
}
