#include "rade_ofdm.h"

#include <math.h>
#include <string.h>

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

static const float BARKER13[13] = {1, 1, 1, 1, 1, -1, -1, 1, 1, -1, 1, -1, 1};

int ro_modem_init(ro_modem *m, int latent_dim, int bottleneck,
                  int time_offset)
{
    memset(m, 0, sizeof *m);
    m->latent_dim = latent_dim;
    m->bottleneck = bottleneck;
    m->time_offset = time_offset;
    m->Fs = 8000;

    /* derived modem geometry (radae_tpu/config.py; radae.py:128-235) */
    const float Tf = 0.01f, cp_secs = 0.004f;
    const int enc_stride = 4, bps = 2, Nzmf = 3;
    float Tz = Tf * enc_stride;
    m->Rb = latent_dim / Tz;
    float Ts = 0.03f;                       /* pilots on */
    m->Rs = 1.0f / Ts;
    int Nsmf = Nzmf * latent_dim / bps;
    int Ns = (int)(Nzmf * Tz / Ts);
    m->Tmf = Ns * Ts;
    int Nc = Nsmf / Ns;
    if (Ns * Nc * bps != Nzmf * latent_dim || Nc > RO_MAX_NC) return -1;

    float Rs_dash = m->Rs * (Ns + 1) / Ns;
    float Ts_dash = 1.0f / Rs_dash;
    Rs_dash = Rs_dash / (1.0f - cp_secs / Ts_dash);
    m->Rs_dash = Rs_dash;
    m->M = (int)lroundf(m->Fs / Rs_dash);
    m->Ncp = (int)(cp_secs * m->Fs);
    m->Ns = Ns;
    m->Nc = Nc;
    m->Nzmf = Nzmf;
    m->Nmf = (Ns + 1) * (m->M + m->Ncp);
    m->Nseoo = (Ns - 1) * Nc;
    if (m->M > RO_MAX_M || m->Ncp > RO_MAX_NCP) return -2;

    float carrier_1_freq = 1500.0f - Rs_dash * Nc / 2;
    int carrier_1_index = (int)lroundf(carrier_1_freq / Rs_dash);
    for (int c = 0; c < Nc; c++) {
        m->w[c] = 2.0 * M_PI * (carrier_1_index + c) / m->M;
        for (int n = 0; n < m->M; n++) {
            m->Winv[c][n] = cexpf(I * (float)(m->w[c] * n)) / (float)m->M;
            m->Wfwd[n][c] = cexpf(-I * (float)(m->w[c] * n));
        }
        m->P[c] = sqrtf(2.0f) * BARKER13[c % 13];
        m->Pend[c] = (c & 1) ? -m->P[c] : m->P[c];
    }

    for (int n = 0; n < m->M; n++) {
        rc_cplx acc = 0, acc_end = 0;
        for (int c = 0; c < Nc; c++) {
            acc += m->P[c] * m->Winv[c][n];
            acc_end += m->Pend[c] * m->Winv[c][n];
        }
        m->p[n] = acc;
        m->pend[n] = acc_end;
    }
    for (int n = 0; n < m->Ncp; n++) {
        m->p_cp[n] = m->p[m->M - m->Ncp + n];
        m->pend_cp[n] = m->pend[m->M - m->Ncp + n];
    }
    memcpy(m->p_cp + m->Ncp, m->p, m->M * sizeof(rc_cplx));
    memcpy(m->pend_cp + m->Ncp, m->pend, m->M * sizeof(rc_cplx));

    m->pilot_gain = 1.0f;
    if (bottleneck == 3)
        m->pilot_gain = powf(10.0f, -2.0f / 20.0f) * m->M / sqrtf((float)Nc);

    /* LS pilot-fit projection matrices (ops/pilots.py ls_pmat) */
    const float a = 0.0025f * m->Fs;
    for (int c = 0; c < Nc; c++) {
        int mid = c < 1 ? 1 : (c > Nc - 2 ? Nc - 2 : c);
        rc_cplx A[3][2];
        for (int r = 0; r < 3; r++) {
            A[r][0] = 1.0f;
            A[r][1] = cexpf(-I * (float)(m->w[mid - 1 + r] * a));
        }
        /* AtA = A^H A (2x2), invert, P = inv(AtA) A^H */
        rc_cplx ata[2][2] = {{0, 0}, {0, 0}};
        for (int r = 0; r < 3; r++)
            for (int i = 0; i < 2; i++)
                for (int j = 0; j < 2; j++)
                    ata[i][j] += conjf(A[r][i]) * A[r][j];
        rc_cplx det = ata[0][0] * ata[1][1] - ata[0][1] * ata[1][0];
        rc_cplx inv[2][2] = {{ata[1][1] / det, -ata[0][1] / det},
                             {-ata[1][0] / det, ata[0][0] / det}};
        for (int i = 0; i < 2; i++)
            for (int r = 0; r < 3; r++)
                m->Pmat[c][i][r] = inv[i][0] * conjf(A[r][0])
                                 + inv[i][1] * conjf(A[r][1]);
    }

    /* EOO frame: P E 0 0 0 E (config.py eoo) */
    int MC = m->M + m->Ncp;
    m->eoo_len = m->Nmf + MC;
    memset(m->eoo, 0, sizeof m->eoo);
    memcpy(m->eoo, m->p_cp, MC * sizeof(rc_cplx));
    memcpy(m->eoo + MC, m->pend_cp, MC * sizeof(rc_cplx));
    memcpy(m->eoo + m->Nmf, m->pend_cp, MC * sizeof(rc_cplx));
    for (int n = 0; n < m->eoo_len; n++) {
        rc_cplx v = m->eoo[n] * m->pilot_gain;
        if (bottleneck == 3 && cabsf(v) > 0)
            v = tanhf(cabsf(v)) * v / cabsf(v);
        m->eoo[n] = v;
    }
    return 0;
}

static void idft_row(const ro_modem *m, rc_cplx *out, const rc_cplx *sym)
{
    for (int n = 0; n < m->M; n++) {
        rc_cplx acc = 0;
        for (int c = 0; c < m->Nc; c++)
            acc += sym[c] * m->Winv[c][n];
        out[n] = acc;
    }
}

static void dft_row(const ro_modem *m, rc_cplx *out, const rc_cplx *x)
{
    for (int c = 0; c < m->Nc; c++) {
        rc_cplx acc = 0;
        for (int n = 0; n < m->M; n++)
            acc += x[n] * m->Wfwd[n][c];
        out[c] = acc;
    }
}

void ro_tx_frame(const ro_modem *m, rc_cplx *tx, const float *z)
{
    int MC = m->M + m->Ncp;
    rc_cplx sym[RO_MAX_NC];
    rc_cplx row[RO_MAX_M];
    int zi = 0;

    for (int r = 0; r < m->Ns + 1; r++) {
        if (r == 0) {
            for (int c = 0; c < m->Nc; c++)
                sym[c] = m->pilot_gain * m->P[c];
        } else {
            for (int c = 0; c < m->Nc; c++) {
                sym[c] = z[zi] + I * z[zi + 1];
                zi += 2;
            }
        }
        idft_row(m, row, sym);
        rc_cplx *dst = tx + (size_t)r * MC;
        for (int n = 0; n < m->Ncp; n++)
            dst[n] = row[m->M - m->Ncp + n];
        memcpy(dst + m->Ncp, row, m->M * sizeof(rc_cplx));
    }
    if (m->bottleneck == 3) {
        for (int n = 0; n < m->Nmf; n++) {
            float r = cabsf(tx[n]);
            if (r > 1e-12f)
                tx[n] = tanhf(r) * tx[n] / r;
        }
    }
}

/* LS 3-pilot channel estimate for one pilot row */
static void est_pilots_row(const ro_modem *m, rc_cplx *hout,
                           const rc_cplx *pilot_row)
{
    const float a = 0.0025f * m->Fs;
    rc_cplx ratio[RO_MAX_NC];
    for (int c = 0; c < m->Nc; c++)
        ratio[c] = pilot_row[c] / m->P[c];
    for (int c = 0; c < m->Nc; c++) {
        int mid = c < 1 ? 1 : (c > m->Nc - 2 ? m->Nc - 2 : c);
        rc_cplx g0 = 0, g1 = 0;
        for (int r = 0; r < 3; r++) {
            g0 += m->Pmat[c][0][r] * ratio[mid - 1 + r];
            g1 += m->Pmat[c][1][r] * ratio[mid - 1 + r];
        }
        hout[c] = g0 + g1 * cexpf(-I * (float)(m->w[c] * a));
    }
}

void ro_rx_frame(const ro_modem *m, float *z, const rc_cplx *rx,
                 float *S1, float *S2)
{
    int MC = m->M + m->Ncp;
    int nrows = m->Ns + 2;                /* 6 for the Ns=4 waveform */
    rc_cplx sym[8][RO_MAX_NC] = {{0}};
    if (nrows > 8) return;

    for (int r = 0; r < nrows; r++)
        dft_row(m, sym[r], rx + (size_t)r * MC + m->Ncp + m->time_offset);

    rc_cplx h0[RO_MAX_NC], h1[RO_MAX_NC];
    est_pilots_row(m, h0, sym[0]);
    est_pilots_row(m, h1, sym[m->Ns + 1]);

    /* SNR statistics from the first pilot row (dsp.py:437-446) */
    float s1 = 0, s2 = 0;
    for (int c = 0; c < m->Nc; c++) {
        float mag = cabsf(sym[0][c]);
        s1 += mag * mag;
        rc_cplx rot = conjf(h0[c] / (cabsf(h0[c]) + 1e-12f));
        rc_cplx e = sym[0][c] * rot;
        s2 += cimagf(e) * cimagf(e);
    }
    if (S1) *S1 = s1;
    if (S2) *S2 = s2 + 1e-12f;

    /* coarse magnitude from both pilot rows */
    float mag2 = 0;
    for (int c = 0; c < m->Nc; c++)
        mag2 += crealf(h0[c] * conjf(h0[c])) + crealf(h1[c] * conjf(h1[c]));
    float mag = sqrtf(mag2 / (2 * m->Nc)) + 1e-6f;
    if (m->bottleneck == 3)
        mag = mag * cabsf(m->P[0]) / m->pilot_gain;

    int zi = 0;
    for (int r = 1; r <= m->Ns; r++) {
        for (int c = 0; c < m->Nc; c++) {
            /* linear phase interpolation between the two pilots */
            rc_cplx ch = h0[c] + (h1[c] - h0[c]) * ((float)r / (m->Ns + 1));
            rc_cplx rot = conjf(ch / (cabsf(ch) + 1e-12f));
            rc_cplx d = sym[r][c] * rot / mag;
            z[zi++] = crealf(d);
            z[zi++] = cimagf(d);
        }
    }
}

void ro_rx_eoo_frame(const ro_modem *m, float *z, const rc_cplx *rx)
{
    int MC = m->M + m->Ncp;
    int Ns = m->Ns + 1;
    rc_cplx sym[7][RO_MAX_NC];
    for (int r = 0; r < Ns + 2 && r < 7; r++)
        dft_row(m, sym[r], rx + (size_t)r * MC + m->Ncp + m->time_offset);

    /* row-major (r, c) order matching ops/ofdm qpsk_demap of (Ns-2, Nc) */
    int zi;
    rc_cplx rot[RO_MAX_NC];
    for (int c = 0; c < m->Nc; c++) {
        rc_cplx s = sym[0][c] / m->P[c] + sym[1][c] / m->Pend[c]
                  + sym[Ns][c] / m->Pend[c];
        rot[c] = conjf(s / (cabsf(s) + 1e-12f));
    }
    zi = 0;
    for (int r = 2; r < Ns; r++)
        for (int c = 0; c < m->Nc; c++) {
            rc_cplx d = sym[r][c] * rot[c];
            z[zi++] = crealf(d);
            z[zi++] = cimagf(d);
        }
}

void ro_set_eoo_bits(ro_modem *m, const float *bits)
{
    int MC = m->M + m->Ncp;
    rc_cplx sym[RO_MAX_NC];
    rc_cplx row[RO_MAX_M];
    int bi = 0;
    for (int r = 0; r < m->Ns - 1; r++) {
        for (int c = 0; c < m->Nc; c++) {
            sym[c] = bits[bi] + I * bits[bi + 1];
            bi += 2;
        }
        idft_row(m, row, sym);
        rc_cplx *dst = m->eoo + 2 * MC + (size_t)r * MC;
        for (int n = 0; n < m->Ncp; n++)
            dst[n] = row[m->M - m->Ncp + n] * m->pilot_gain;
        for (int n = 0; n < m->M; n++)
            dst[m->Ncp + n] = row[n] * m->pilot_gain;
        if (m->bottleneck == 3)
            for (int n = 0; n < MC; n++) {
                float rr = cabsf(dst[n]);
                if (rr > 1e-12f)
                    dst[n] = tanhf(rr) * dst[n] / rr;
            }
    }
}

/* ---------------- acquisition ---------------- */

void ro_acq_init(ro_acq *a, const ro_modem *m)
{
    memset(a, 0, sizeof *a);
    a->m = m;
    a->rng = 123456789u;
    for (int f = 0; f < RO_FCOARSE; f++) {
        a->fcoarse[f] = -50.0f + 2.5f * f;
        float w = 2.0 * M_PI * a->fcoarse[f] / m->Fs;
        for (int n = 0; n < m->M; n++) {
            rc_cplx v = cexpf(I * (float)(w * n)) * m->p[n];
            a->p_wr[n][f] = crealf(v);
            a->p_wi[n][f] = cimagf(v);
        }
    }
}

static void corr_row(const ro_acq *a, float *out, const rc_cplx *rx)
{
    /* acc[f] = sum_n conj(rx[n]) * exp(iwn) p[n]; split-complex planes so
       the f loop vectorizes as plain float FMAs */
    const ro_modem *m = a->m;
    const float *x = (const float *)rx;          /* interleaved re/im */
    float accr[RO_FCOARSE], acci[RO_FCOARSE];
    memset(accr, 0, sizeof accr);
    memset(acci, 0, sizeof acci);
    for (int n = 0; n < m->M; n++) {
        float xr = x[2 * n], xi = x[2 * n + 1];
        const float *pr = a->p_wr[n], *pi = a->p_wi[n];
        for (int f = 0; f < RO_FCOARSE; f++) {
            accr[f] += xr * pr[f] + xi * pi[f];
            acci[f] += xr * pi[f] - xi * pr[f];
        }
    }
    for (int f = 0; f < RO_FCOARSE; f++)
        out[f] = sqrtf(accr[f] * accr[f] + acci[f] * acci[f]);
}

static float grid_thresh(const ro_acq *a, float Pacq_error)
{
    const ro_modem *m = a->m;
    double sum1 = 0, sum2 = 0;
    int n = m->Nmf * RO_FCOARSE;
    for (int t = 0; t < m->Nmf; t++)
        for (int f = 0; f < RO_FCOARSE; f++) {
            sum1 += a->Dt1[t][f];
            sum2 += a->Dt2[t][f];
        }
    double sigma_r = ((sum1 / n) + (sum2 / n)) / 2.0 / sqrt(M_PI / 2);
    return (float)(2.0 * sigma_r * sqrt(-log(Pacq_error / 5.0)));
}

int ro_acq_detect(ro_acq *a, const rc_cplx *rx, int *tmax, float *fmax)
{
    const ro_modem *m = a->m;
    float best = 0;
    int bt = 0, bf = 0;
    for (int t = 0; t < m->Nmf; t++) {
        corr_row(a, a->Dt1[t], rx + t);
        corr_row(a, a->Dt2[t], rx + t + m->Nmf);
        for (int f = 0; f < RO_FCOARSE; f++) {
            float d = a->Dt1[t][f] + a->Dt2[t][f];
            if (d > best) { best = d; bt = t; bf = f; }
        }
    }
    a->Dthresh = grid_thresh(a, 1e-5f);
    a->Dtmax12 = best;
    a->f_ind_max = bf;
    *tmax = bt;
    *fmax = a->fcoarse[bf];
    return best > a->Dthresh;
}

void ro_acq_refine(ro_acq *a, const rc_cplx *rx, int *tmax, float *fmax,
                   int t_lo, int t_hi, float f_lo, float f_hi, float f_step)
{
    const ro_modem *m = a->m;
    float best = 0;
    int bt = *tmax;
    float bf = *fmax;
    /* the replica exp(-iwn)conj(p[n]) depends on f only: build it ONCE per
       candidate freq (incremental phasor, no per-sample cexpf) instead of
       recomputing it for every timing hypothesis t */
    float wvr[RO_MAX_M], wvi[RO_MAX_M];
    for (float f = f_lo; f < f_hi; f += f_step) {
        float w = 2.0 * M_PI * f / m->Fs;
        rc_cplx shift_nmf = cexpf(-I * (float)(w * m->Nmf));
        rc_cplx ph = 1.0f, step = cexpf(-I * w);
        for (int n = 0; n < m->M; n++) {
            rc_cplx wv = ph * conjf(m->p[n]);
            wvr[n] = crealf(wv);
            wvi[n] = cimagf(wv);
            ph *= step;
        }
        for (int t = t_lo; t < t_hi; t++) {
            const float *x1 = (const float *)(rx + t);
            const float *x2 = (const float *)(rx + t + m->Nmf);
            float d1r = 0, d1i = 0, d2r = 0, d2i = 0;
            for (int n = 0; n < m->M; n++) {
                d1r += x1[2 * n] * wvr[n] - x1[2 * n + 1] * wvi[n];
                d1i += x1[2 * n] * wvi[n] + x1[2 * n + 1] * wvr[n];
                d2r += x2[2 * n] * wvr[n] - x2[2 * n + 1] * wvi[n];
                d2i += x2[2 * n] * wvi[n] + x2[2 * n + 1] * wvr[n];
            }
            rc_cplx d = (d1r + I * d1i)
                      + (d2r + I * d2i) * shift_nmf;
            float mag = cabsf(d);
            if (mag > best) { best = mag; bt = t; bf = f; }
        }
    }
    *tmax = bt;
    *fmax = bf;
}

void ro_acq_check(ro_acq *a, const rc_cplx *rx, int tmax, float fmax,
                  int *valid, int *endofover)
{
    const ro_modem *m = a->m;

    /* refresh 5% of the stats grid */
    int nupdate = m->Nmf / 20;
    for (int i = 0; i < nupdate; i++) {
        a->rng = a->rng * 1664525u + 1013904223u;
        int t = a->rng % m->Nmf;
        corr_row(a, a->Dt1[t], rx + t);
        corr_row(a, a->Dt2[t], rx + t + m->Nmf);
    }
    float Dthresh = grid_thresh(a, 1e-4f);
    float Dthresh_eoo = grid_thresh(a, 1e-5f);

    float w = 2.0 * M_PI * fmax / m->Fs;
    rc_cplx d1 = 0, d2 = 0, e1 = 0, e2 = 0;
    int MC = m->M + m->Ncp;
    for (int n = 0; n < m->M; n++) {
        rc_cplx wv = cexpf(-I * (float)(w * n));
        d1 += conjf(wv * rx[tmax + n]) * m->p[n];
        d2 += conjf(wv * rx[tmax + m->Nmf + n]) * m->p[n];
        e1 += conjf(wv * rx[tmax + MC + n]) * m->pend[n];
        e2 += conjf(wv * rx[tmax + m->Nmf + n]) * m->pend[n];
    }
    a->Dtmax12 = cabsf(d1) + cabsf(d2);
    a->Dtmax12_eoo = cabsf(e1) + cabsf(e2);
    a->Dthresh = Dthresh;
    *valid = a->Dtmax12 > Dthresh;
    *endofover = a->Dtmax12_eoo > Dthresh_eoo;
}

/* ---------------- BPF ---------------- */

void ro_bpf_init(ro_bpf *b, float Fs, float bandwidth, float centre)
{
    float B = bandwidth / Fs;
    b->alpha = 2.0 * M_PI * centre / Fs;
    for (int i = 0; i < RO_BPF_NTAP; i++) {
        float n = i - (RO_BPF_NTAP - 1) / 2.0f;
        float x = n * B;
        b->h[i] = (x == 0.0f) ? B : B * sinf(M_PI * x) / (M_PI * x);
    }
    memset(b->mem, 0, sizeof b->mem);
    b->phase = 1.0f;
}

void ro_bpf_run(ro_bpf *b, rc_cplx *out, const rc_cplx *in, int n)
{
    /* mix down, FIR, mix back up, carrying filter memory + LO phase */
    rc_cplx dec = cexpf(-I * b->alpha);
    rc_cplx ph = b->phase;
    /* build extended input: mem + baseband, in per-instance scratch */
    rc_cplx *ext = b->ext;
    rc_cplx *phases = b->phases;
    if (n > RO_BPF_MAXBLOCK) n = RO_BPF_MAXBLOCK;
    memcpy(ext, b->mem, (RO_BPF_NTAP - 1) * sizeof(rc_cplx));
    for (int i = 0; i < n; i++) {
        ph *= dec;
        phases[i] = ph;
        ext[RO_BPF_NTAP - 1 + i] = in[i] * ph;
    }
    b->phase = ph / cabsf(ph);
    for (int i = 0; i < n; i++) {
        rc_cplx acc = 0;
        for (int k = 0; k < RO_BPF_NTAP; k++)
            acc += ext[i + k] * b->h[k];
        out[i] = acc * conjf(phases[i]);
    }
    memcpy(b->mem, ext + n, (RO_BPF_NTAP - 1) * sizeof(rc_cplx));
}
