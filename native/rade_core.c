#include "rade_core.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static const int ENC_GRU_IN[RC_NLAYERS] = {64, 224, 384, 544, 704};
static const int ENC_CONV_IN[RC_NLAYERS] = {128, 288, 448, 608, 768};
static const int ENC_CONV_DIL[RC_NLAYERS] = {1, 2, 2, 2, 2};
static const int DEC_GRU_IN[RC_NLAYERS] = {96, 224, 352, 480, 608};
static const int DEC_CONV_IN[RC_NLAYERS] = {192, 320, 448, 576, 704};

static int bind_dense(rn_dense *d, const rw_blob *w, const char *prefix)
{
    char name[128];
    snprintf(name, sizeof name, "%s/w", prefix);
    const rw_tensor *tw = rw_find(w, name);
    snprintf(name, sizeof name, "%s/b", prefix);
    const rw_tensor *tb = rw_find(w, name);
    if (!tw || !tb || tw->ndim != 2) return -1;
    d->w = tw->data; d->b = tb->data;
    d->out_dim = tw->dims[0]; d->in_dim = tw->dims[1];
    return 0;
}

static int bind_gru(rn_gru *g, const rw_blob *w, const char *prefix)
{
    char name[128];
    const rw_tensor *t;
    snprintf(name, sizeof name, "%s/w_ih", prefix);
    if (!(t = rw_find(w, name))) return -1;
    g->w_ih = t->data; g->in_dim = t->dims[1]; g->hidden = t->dims[0] / 3;
    snprintf(name, sizeof name, "%s/w_hh", prefix);
    if (!(t = rw_find(w, name))) return -1;
    g->w_hh = t->data;
    snprintf(name, sizeof name, "%s/b_ih", prefix);
    if (!(t = rw_find(w, name))) return -1;
    g->b_ih = t->data;
    snprintf(name, sizeof name, "%s/b_hh", prefix);
    if (!(t = rw_find(w, name))) return -1;
    g->b_hh = t->data;
    return 0;
}

static int bind_conv(rn_conv2 *c, const rw_blob *w, const char *prefix,
                     int dilation)
{
    char name[128];
    const rw_tensor *t;
    snprintf(name, sizeof name, "%s/w", prefix);
    if (!(t = rw_find(w, name)) || t->ndim != 3) return -1;
    c->w = t->data; c->out_dim = t->dims[0]; c->in_dim = t->dims[1];
    snprintf(name, sizeof name, "%s/b", prefix);
    if (!(t = rw_find(w, name))) return -1;
    c->b = t->data;
    c->dilation = dilation;
    return 0;
}

static int bind_glu(rn_glu *g, const rw_blob *w, const char *prefix)
{
    char name[128];
    snprintf(name, sizeof name, "%s/w", prefix);
    const rw_tensor *t = rw_find(w, name);
    if (!t || t->ndim != 2 || t->dims[0] != t->dims[1]) return -1;
    g->w = t->data;
    g->feat = t->dims[0];
    return 0;
}

int rc_encoder_init(rc_encoder *e, const rw_blob *w, int bottleneck)
{
    char prefix[64];
    memset(e, 0, sizeof *e);
    e->bottleneck = bottleneck;
    if (bind_dense(&e->dense_1, w, "encoder/dense_1")) return -1;
    e->feature_dim = e->dense_1.in_dim / 4;
    for (int i = 0; i < RC_NLAYERS; i++) {
        snprintf(prefix, sizeof prefix, "encoder/gru%d", i + 1);
        if (bind_gru(&e->gru[i], w, prefix)) return -2;
        if (e->gru[i].in_dim != ENC_GRU_IN[i]) return -3;
        snprintf(prefix, sizeof prefix, "encoder/conv%d", i + 1);
        if (bind_conv(&e->conv[i], w, prefix, ENC_CONV_DIL[i])) return -4;
        if (e->conv[i].in_dim != ENC_CONV_IN[i]) return -5;
    }
    if (bind_dense(&e->z_dense, w, "encoder/z_dense")) return -6;
    e->latent_dim = e->z_dense.out_dim;
    rc_encoder_reset(e);
    return 0;
}

int rc_decoder_init(rc_decoder *d, const rw_blob *w)
{
    char prefix[64];
    memset(d, 0, sizeof *d);
    if (bind_dense(&d->dense_1, w, "decoder/dense_1")) return -1;
    d->latent_dim = d->dense_1.in_dim;
    for (int i = 0; i < RC_NLAYERS; i++) {
        snprintf(prefix, sizeof prefix, "decoder/gru%d", i + 1);
        if (bind_gru(&d->gru[i], w, prefix)) return -2;
        if (d->gru[i].in_dim != DEC_GRU_IN[i]) return -3;
        snprintf(prefix, sizeof prefix, "decoder/glu%d", i + 1);
        if (bind_glu(&d->glu[i], w, prefix)) return -4;
        snprintf(prefix, sizeof prefix, "decoder/conv%d", i + 1);
        if (bind_conv(&d->conv[i], w, prefix, 1)) return -5;
        if (d->conv[i].in_dim != DEC_CONV_IN[i]) return -6;
    }
    if (bind_dense(&d->output, w, "decoder/output")) return -7;
    d->feature_dim = d->output.out_dim / 4;
    rc_decoder_reset(d);
    return 0;
}

/* -- int8 weight quantization (per-output-row absmax scales) ------------- */

static int q_add(void **qmem, int *n, void *blk)
{
    if (!blk || *n >= RC_MAX_QMEM) { free(blk); return -1; }
    qmem[(*n)++] = blk;
    return 0;
}

static int q_dense(rn_dense *d, void **qmem, int *n)
{
    return q_add(qmem, n, rn_quantize_rows(d->w, d->out_dim, d->in_dim,
                                           &d->w8, &d->w8s));
}

static int q_gru(rn_gru *g, void **qmem, int *n)
{
    if (q_add(qmem, n, rn_quantize_rows(g->w_ih, 3 * g->hidden, g->in_dim,
                                        &g->w_ih8, &g->w_ih8s))) return -1;
    if (q_add(qmem, n, rn_quantize_rows(g->w_hh, 3 * g->hidden, g->hidden,
                                        &g->w_hh8, &g->w_hh8s))) {
        g->w_ih8 = NULL;
        return -1;
    }
    return 0;
}

static int q_conv(rn_conv2 *c, void **qmem, int *n)
{
    return q_add(qmem, n, rn_quantize_rows(c->w, c->out_dim, 2 * c->in_dim,
                                           &c->w8, &c->w8s));
}

static int q_glu(rn_glu *g, void **qmem, int *n)
{
    return q_add(qmem, n, rn_quantize_rows(g->w, g->feat, g->feat,
                                           &g->w8, &g->w8s));
}

/* Clear every layer's int8 view so no forward path can dereference a
 * freed (or never-allocated) qmem block: called by the free functions
 * and when a partial quantize is rolled back to all-float. */
static void enc_clear_int8(rc_encoder *e)
{
    e->dense_1.w8 = NULL; e->dense_1.w8s = NULL;
    e->z_dense.w8 = NULL; e->z_dense.w8s = NULL;
    for (int i = 0; i < RC_NLAYERS; i++) {
        e->gru[i].w_ih8 = NULL; e->gru[i].w_ih8s = NULL;
        e->gru[i].w_hh8 = NULL; e->gru[i].w_hh8s = NULL;
        e->conv[i].w8 = NULL; e->conv[i].w8s = NULL;
    }
}

static void dec_clear_int8(rc_decoder *d)
{
    d->dense_1.w8 = NULL; d->dense_1.w8s = NULL;
    d->output.w8 = NULL; d->output.w8s = NULL;
    for (int i = 0; i < RC_NLAYERS; i++) {
        d->gru[i].w_ih8 = NULL; d->gru[i].w_ih8s = NULL;
        d->gru[i].w_hh8 = NULL; d->gru[i].w_hh8s = NULL;
        d->glu[i].w8 = NULL; d->glu[i].w8s = NULL;
        d->conv[i].w8 = NULL; d->conv[i].w8s = NULL;
    }
}

void rc_encoder_free(rc_encoder *e)
{
    for (int i = 0; i < e->nqmem; i++) free(e->qmem[i]);
    e->nqmem = 0;
    enc_clear_int8(e);
}

void rc_decoder_free(rc_decoder *d)
{
    for (int i = 0; i < d->nqmem; i++) free(d->qmem[i]);
    d->nqmem = 0;
    dec_clear_int8(d);
}

int rc_encoder_quantize(rc_encoder *e)
{
    int rc = 0;
    rc |= q_dense(&e->dense_1, e->qmem, &e->nqmem);
    for (int i = 0; i < RC_NLAYERS; i++) {
        rc |= q_gru(&e->gru[i], e->qmem, &e->nqmem);
        rc |= q_conv(&e->conv[i], e->qmem, &e->nqmem);
    }
    rc |= q_dense(&e->z_dense, e->qmem, &e->nqmem);
    if (rc) { rc_encoder_free(e); return -1; }  /* all-or-nothing: stay float */
    return 0;
}

int rc_decoder_quantize(rc_decoder *d)
{
    int rc = 0;
    rc |= q_dense(&d->dense_1, d->qmem, &d->nqmem);
    for (int i = 0; i < RC_NLAYERS; i++) {
        rc |= q_gru(&d->gru[i], d->qmem, &d->nqmem);
        rc |= q_glu(&d->glu[i], d->qmem, &d->nqmem);
        rc |= q_conv(&d->conv[i], d->qmem, &d->nqmem);
    }
    rc |= q_dense(&d->output, d->qmem, &d->nqmem);
    if (rc) { rc_decoder_free(d); return -1; }
    return 0;
}

void rc_encoder_reset(rc_encoder *e)
{
    memset(e->h, 0, sizeof e->h);
    memset(e->hist, 0, sizeof e->hist);
    memset(e->hist_pos, 0, sizeof e->hist_pos);
}

void rc_decoder_reset(rc_decoder *d)
{
    memset(d->h, 0, sizeof d->h);
    memset(d->hist, 0, sizeof d->hist);
    memset(d->hist_pos, 0, sizeof d->hist_pos);
}

/* shared stack walk: run layer i's GRU (+optional GLU) then conv, growing
 * the concat buffer x in place */
static int run_layer(float *x, int xlen,
                     const rn_gru *gru, float *h,
                     const rn_glu *glu,
                     const rn_conv2 *conv,
                     float (*hist)[RC_ENC_CAT],
                     int *hist_pos)
{
    /* GRU consumes current x (xlen == gru->in_dim) and appends h */
    rn_gru_fwd(gru, h, x);
    if (glu) {
        float y[96];
        rn_glu_fwd(glu, y, h);
        memcpy(x + xlen, y, gru->hidden * sizeof(float));
    } else {
        memcpy(x + xlen, h, gru->hidden * sizeof(float));
    }
    xlen += gru->hidden;

    /* conv consumes the grown x (xlen == conv->in_dim) and appends out */
    int d = conv->dilation;
    float *slot = hist[*hist_pos];
    /* slot currently holds x from d steps ago */
    float y[96];
    rn_conv2_fwd(conv, y, slot, x);
    memcpy(slot, x, conv->in_dim * sizeof(float));
    *hist_pos = (*hist_pos + 1) % d;
    memcpy(x + xlen, y, conv->out_dim * sizeof(float));
    return xlen + conv->out_dim;
}

void rc_encoder_step(rc_encoder *e, float *z, const float *features)
{
    float x[RC_ENC_CAT];
    rn_dense_tanh_fwd(&e->dense_1, x, features);
    int xlen = 64;
    for (int i = 0; i < RC_NLAYERS; i++)
        xlen = run_layer(x, xlen, &e->gru[i], e->h[i], NULL, &e->conv[i],
                         e->hist[i], &e->hist_pos[i]);
    rn_dense_fwd(&e->z_dense, z, x);
    if (e->bottleneck == 1)
        for (int i = 0; i < e->latent_dim; i++)
            z[i] = rn_tanh(z[i]);
}

void rc_decoder_step(rc_decoder *d, float *features, const float *z)
{
    float x[RC_DEC_CAT];
    rn_dense_tanh_fwd(&d->dense_1, x, z);
    int xlen = 96;
    for (int i = 0; i < RC_NLAYERS; i++)
        xlen = run_layer(x, xlen, &d->gru[i], d->h[i], &d->glu[i],
                         &d->conv[i], d->hist[i], &d->hist_pos[i]);
    rn_dense_fwd(&d->output, features, x);
}
