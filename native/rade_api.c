/* Native RADE API implementation — see rade_api.h.
 *
 * Receiver architecture mirrors the radae_tpu streaming rx
 * (radae_tpu/apps/rxe.py; reference behavior radae_rxe.py:171-330):
 * BPF -> ring buffer -> acquisition state machine (search/candidate/sync
 * with 3 consecutive matches) -> timing-slip nin handling -> freq
 * correction -> per-frame OFDM demod + LS pilot EQ -> stateful core
 * decoder -> auxdata unique-word accounting.
 */

#include "rade_api.h"

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "rade_core.h"
#include "rade_ofdm.h"
#include "snr_cal.h"

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

#define RADE_VERSION 1
#define NB_TOTAL_FEATURES 36
#define NUM_USED_FEATURES 20
#define TUNSYNC_S 3.0f
#define UW_ERROR_THRESH 7

enum rx_state { ST_SEARCH, ST_CANDIDATE, ST_SYNC };

struct rade {
    int flags;
    rw_blob blob;
    ro_modem modem;
    rc_encoder enc;
    rc_decoder dec;
    int auxdata;               /* feature_dim == 21 */

    /* tx */
    ro_bpf txbpf;              /* unused by default */

    /* rx */
    ro_bpf rxbpf;
    ro_acq acq;
    rc_cplx rx_buf[2 * 960 + RO_MAX_M + RO_MAX_NCP];
    rc_cplx rx_scratch[2 * 960 + RO_MAX_M + RO_MAX_NCP]; /* freq-corrected
        frame (~17 KB): per-instance, not stack — worker threads on musl
        default to 128 KB stacks */
    int rx_buf_len;
    int nin;
    enum rx_state state;
    int tmax, tmax_candidate;
    float fmax;
    int valid_count, synced_count, uw_errors, mf;
    int Nmf_unsync, synced_count_one_sec;
    rc_cplx rx_phase;
    float snrdB_3k_est;
    int verbose;
    float foff_err;
};

void rade_initialize(void) {}
void rade_finalize(void) {}
int rade_version(void) { return RADE_VERSION; }

struct rade *rade_open(const char *model_file, int flags)
{
    struct rade *r = calloc(1, sizeof *r);
    if (!r) return NULL;
    r->flags = flags;
    if (rw_load(&r->blob, model_file)) { free(r); return NULL; }

    /* bottleneck 3 flagship waveform, time_offset -16 */
    if (rc_encoder_init(&r->enc, &r->blob, 3)
        || rc_decoder_init(&r->dec, &r->blob)) {
        rw_free(&r->blob); free(r); return NULL;
    }
    const char *env_q = getenv("RADE_INT8");
    if ((flags & RADE_USE_INT8) || (env_q && env_q[0] == '1')) {
        /* best-effort: on alloc failure quantize rolls itself back and
           the codec keeps running float */
        rc_encoder_quantize(&r->enc);
        rc_decoder_quantize(&r->dec);
    }
    r->auxdata = (r->enc.feature_dim == 21);
    if (ro_modem_init(&r->modem, r->enc.latent_dim, 3, -16)) {
        rc_encoder_free(&r->enc); rc_decoder_free(&r->dec);
        rw_free(&r->blob); free(r); return NULL;
    }
    ro_modem *m = &r->modem;

    float w_lo = m->w[0] * m->Fs / (2 * M_PI);
    float w_hi = m->w[m->Nc - 1] * m->Fs / (2 * M_PI);
    ro_bpf_init(&r->rxbpf, m->Fs, 1.2f * (w_hi - w_lo), (w_hi + w_lo) / 2);
    ro_acq_init(&r->acq, m);

    r->rx_buf_len = 2 * m->Nmf + m->M + m->Ncp;
    r->nin = m->Nmf;
    r->state = ST_SEARCH;
    r->rx_phase = 1.0f;
    r->Nmf_unsync = (int)(TUNSYNC_S * m->Fs / m->Nmf);
    r->synced_count_one_sec = m->Fs / m->Nmf;
    r->verbose = !(flags & RADE_VERBOSE_0);
    /* developer false-sync test: +10 Hz injected at sync, matching the
       reference ABI semantics (reference: src/rade_api.c:263-264) */
    if (flags & RADE_FOFF_TEST) r->foff_err = 10.0f;
    return r;
}

void rade_close(struct rade *r)
{
    if (!r) return;
    rc_encoder_free(&r->enc);
    rc_decoder_free(&r->dec);
    rw_free(&r->blob);
    free(r);
}

int rade_n_tx_out(struct rade *r) { return r->modem.Nmf; }
int rade_n_tx_eoo_out(struct rade *r) { return r->modem.eoo_len; }
int rade_nin_max(struct rade *r) { return r->modem.Nmf + r->modem.M; }
int rade_nin(struct rade *r) { return r->nin; }
int rade_n_features_in_out(struct rade *r)
{
    return r->modem.Nzmf * 4 * NB_TOTAL_FEATURES;
}
int rade_n_eoo_bits(struct rade *r) { return 2 * r->modem.Nseoo; }
int rade_sync(struct rade *r) { return r->state == ST_SYNC; }
float rade_freq_offset(struct rade *r) { return r->fmax; }
int rade_snrdB_3k_est(struct rade *r) { return (int)r->snrdB_3k_est; }

void rade_tx_set_eoo_bits(struct rade *r, const float eoo_bits[])
{
    ro_set_eoo_bits(&r->modem, eoo_bits);
}

int rade_tx(struct rade *r, RADE_COMP tx_out[], const float features_in[])
{
    ro_modem *m = &r->modem;
    int F = r->enc.feature_dim;
    float feats[4 * 21];
    float z[3 * 80];

    for (int step = 0; step < m->Nzmf; step++) {
        for (int f = 0; f < 4; f++) {
            const float *src = features_in
                + (size_t)(step * 4 + f) * NB_TOTAL_FEATURES;
            memcpy(feats + f * F, src, NUM_USED_FEATURES * sizeof(float));
            if (r->auxdata)
                feats[f * F + 20] = -1.0f;   /* auxdata UW symbol */
        }
        rc_encoder_step(&r->enc, z + (size_t)step * r->enc.latent_dim, feats);
    }
    ro_tx_frame(m, (rc_cplx *)tx_out, z);
    return m->Nmf;
}

int rade_tx_eoo(struct rade *r, RADE_COMP tx_eoo_out[])
{
    memcpy(tx_eoo_out, r->modem.eoo, r->modem.eoo_len * sizeof(rc_cplx));
    return r->modem.eoo_len;
}

static void update_snr(struct rade *r, float S1, float S2)
{
    ro_modem *m = &r->modem;
    float snr = S1 / (2.0f * S2) - 1.0f;
    if (snr <= 0) snr = 0.1f;
    float snrdB = 10.0f * log10f(snr);
    snrdB = (snrdB - RO_SNR_CAL_C) / RO_SNR_CAL_M;  /* see snr_cal.h */
    float Rs = (float)m->Fs / m->M;
    float snr3k = snrdB + 10.0f * log10f(Rs * m->Nc / 3000.0f)
                + 10.0f * log10f((float)(m->M + m->Ncp) / m->M);
    r->snrdB_3k_est = 0.9f * r->snrdB_3k_est + 0.1f * snr3k;
}

int rade_rx(struct rade *r, float features_out[], int *has_eoo_out,
            float eoo_out[], const RADE_COMP rx_in[])
{
    ro_modem *m = &r->modem;
    ro_acq *a = &r->acq;
    int Nmf = m->Nmf, M = m->M, Ncp = m->Ncp;
    int nin = r->nin;
    int candidate = 0, valid_output = 0, endofover = 0, uw_fail = 0;

    if (has_eoo_out) *has_eoo_out = 0;

    /* BPF and slide the ring buffer */
    rc_cplx filt[2048];
    ro_bpf_run(&r->rxbpf, filt, (const rc_cplx *)rx_in, nin);
    memmove(r->rx_buf, r->rx_buf + nin,
            (r->rx_buf_len - nin) * sizeof(rc_cplx));
    memcpy(r->rx_buf + r->rx_buf_len - nin, filt, nin * sizeof(rc_cplx));

    float z[6 * 80];

    if (r->state == ST_SEARCH || r->state == ST_CANDIDATE) {
        candidate = ro_acq_detect(a, r->rx_buf, &r->tmax, &r->fmax);
    } else {
        int t_lo = r->tmax - 8 < 0 ? 0 : r->tmax - 8;
        float fmax_hat = r->fmax;
        ro_acq_refine(a, r->rx_buf, &r->tmax, &fmax_hat,
                      t_lo, r->tmax + 8, r->fmax - 1.0f, r->fmax + 1.0f, 0.1f);
        r->fmax = 0.9f * r->fmax + 0.1f * fmax_hat;
        ro_acq_check(a, r->rx_buf, r->tmax, r->fmax, &candidate, &endofover);

        /* timing slips */
        r->nin = Nmf;
        if (r->tmax >= Nmf - M) { r->nin = Nmf + M; r->tmax -= M; }
        if (r->tmax < M) { r->nin = Nmf - M; r->tmax += M; }

        r->synced_count++;
        if (r->synced_count % r->synced_count_one_sec == 0) {
            if (r->uw_errors > UW_ERROR_THRESH) uw_fail = 1;
            r->uw_errors = 0;
        }

        /* freq correction with carried phase */
        int win = Nmf + M + Ncp;
        float w = 2.0 * M_PI * r->fmax / m->Fs;
        rc_cplx dec = cexpf(-I * (float)w);
        rc_cplx *rx1 = r->rx_scratch;
        const rc_cplx *src = r->rx_buf + r->tmax - Ncp;
        rc_cplx ph = r->rx_phase;
        for (int n = 0; n < win; n++) {
            ph *= dec;
            rx1[n] = src[n] * ph;
        }
        r->rx_phase = ph / cabsf(ph);

        if (!endofover) {
            float S1, S2;
            ro_rx_frame(m, z, rx1, &S1, &S2);
            update_snr(r, S1, S2);
            valid_output = 1;
        } else {
            ro_rx_eoo_frame(m, z, rx1);
        }
    }

    /* state machine */
    enum rx_state next = r->state;
    if (r->state == ST_SEARCH) {
        if (candidate) {
            next = ST_CANDIDATE;
            r->tmax_candidate = r->tmax;
            r->valid_count = 1;
        }
    } else if (r->state == ST_CANDIDATE) {
        if (candidate && abs(r->tmax - r->tmax_candidate) < Ncp) {
            if (++r->valid_count > 3) {
                next = ST_SYNC;
                rc_decoder_reset(&r->dec);
                r->synced_count = 0;
                r->uw_errors = 0;
                uw_fail = 0;
                r->valid_count = r->Nmf_unsync;
                int t_lo = r->tmax - 1 < 0 ? 0 : r->tmax - 1;
                ro_acq_refine(a, r->rx_buf, &r->tmax, &r->fmax,
                              t_lo, r->tmax + 2,
                              r->fmax - 10.0f, r->fmax + 10.0f, 0.25f);
                r->fmax += r->foff_err;
                r->foff_err = 0;
            }
        } else {
            next = ST_SEARCH;
        }
    } else {
        if (candidate) {
            r->valid_count = r->Nmf_unsync;
        } else if (--r->valid_count == 0) {
            next = ST_SEARCH;
        }
        if (endofover || uw_fail)
            next = ST_SEARCH;
    }
    r->state = next;
    if (r->state == ST_SEARCH)
        r->nin = Nmf;
    r->mf++;

    int ret = 0;
    if (valid_output) {
        int F = r->dec.feature_dim;
        float feats[4 * 21];
        for (int step = 0; step < m->Nzmf; step++) {
            rc_decoder_step(&r->dec, feats,
                            z + (size_t)step * r->dec.latent_dim);
            for (int f = 0; f < 4; f++) {
                float *dst = features_out
                    + (size_t)(step * 4 + f) * NB_TOTAL_FEATURES;
                memcpy(dst, feats + f * F,
                       NUM_USED_FEATURES * sizeof(float));
                memset(dst + NUM_USED_FEATURES, 0,
                       (NB_TOTAL_FEATURES - NUM_USED_FEATURES) * sizeof(float));
                if (r->auxdata && f == 0 && feats[f * F + 20] > 0)
                    r->uw_errors++;
            }
        }
        ret = m->Nzmf * 4 * NB_TOTAL_FEATURES;
    }
    if (endofover && eoo_out && has_eoo_out) {
        memcpy(eoo_out, z, 2 * m->Nseoo * sizeof(float));
        *has_eoo_out = 1;
    }
    return ret;
}
