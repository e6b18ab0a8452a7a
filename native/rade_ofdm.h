/* C OFDM modem for the RADAE edge runtime: modem-constant derivation,
 * single-frame transmitter/receiver, pilot acquisition, and streaming BPF.
 *
 * Same derived-parameter math and signal processing as the radae_tpu
 * Python/JAX implementation (radae_tpu/config.py, ops/ofdm.py, ops/pilots.py,
 * dsp/acquisition.py; reference behavior: radae/radae.py:128-235,
 * radae/dsp.py:152-526).
 */

#ifndef RADE_OFDM_H
#define RADE_OFDM_H

#include <complex.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef float complex rc_cplx;

#define RO_MAX_NC 30
#define RO_MAX_M 160
#define RO_MAX_NCP 32
#define RO_FCOARSE 40            /* +-50 Hz in 2.5 Hz steps */

typedef struct {
    int latent_dim, bottleneck;
    int Fs, M, Ncp, Ns, Nc, Nzmf, Nmf, Nseoo;
    int time_offset;
    float Rs, Rs_dash, Rb, Tmf;
    float pilot_gain;
    float w[RO_MAX_NC];                          /* rad/sample */
    rc_cplx P[RO_MAX_NC], Pend[RO_MAX_NC];
    rc_cplx p[RO_MAX_M], pend[RO_MAX_M];         /* time-domain pilots */
    rc_cplx p_cp[RO_MAX_M + RO_MAX_NCP];
    rc_cplx pend_cp[RO_MAX_M + RO_MAX_NCP];
    rc_cplx Winv[RO_MAX_NC][RO_MAX_M];
    rc_cplx Wfwd[RO_MAX_M][RO_MAX_NC];
    rc_cplx Pmat[RO_MAX_NC][2][3];               /* LS pilot-fit projection */
    rc_cplx eoo[6 * (RO_MAX_M + RO_MAX_NCP)];    /* (Ns+2)(M+Ncp) samples */
    int eoo_len;
} ro_modem;

/* Derive all modem constants for the flagship waveform family
 * (pilots on, cp 0.004, LS EQ).  Returns 0 on success. */
int ro_modem_init(ro_modem *m, int latent_dim, int bottleneck,
                  int time_offset);

/* One modem frame tx: z[Nzmf*latent_dim] -> tx[Nmf] (PA-clamped). */
void ro_tx_frame(const ro_modem *m, rc_cplx *tx, const float *z);

/* One modem frame rx: rx[Nmf + M + Ncp] (PDDDDP window starting at the CP
 * of this frame's pilot) -> z[Nzmf*latent_dim].  Returns the two SNR
 * statistics S1/S2 for the embedded estimator. */
void ro_rx_frame(const ro_modem *m, float *z, const rc_cplx *rx,
                 float *S1, float *S2);

/* EOO frame rx: soft +-1 data symbols -> z[2*Nseoo]. */
void ro_rx_eoo_frame(const ro_modem *m, float *z, const rc_cplx *rx);

/* Embed EOO data bits (+-1 floats, 2*Nseoo of them) into m->eoo. */
void ro_set_eoo_bits(ro_modem *m, const float *bits);

/* -- acquisition (reference dsp.py:152-320 semantics) -------------------- */

typedef struct {
    const ro_modem *m;
    /* freq-shifted conjugate pilots, split-complex planes so the coarse
       correlation inner loop vectorizes (C _Complex defeats SLP) */
    float p_wr[RO_MAX_M][RO_FCOARSE], p_wi[RO_MAX_M][RO_FCOARSE];
    float fcoarse[RO_FCOARSE];
    float Dt1[960][RO_FCOARSE], Dt2[960][RO_FCOARSE];  /* |corr| grids */
    float Dthresh, Dtmax12, Dtmax12_eoo;
    int f_ind_max;
    unsigned rng;                                /* grid-refresh PRNG */
} ro_acq;

void ro_acq_init(ro_acq *a, const ro_modem *m);
/* Coarse search over a 2*Nmf+M+Ncp buffer.  Returns 1 if candidate. */
int ro_acq_detect(ro_acq *a, const rc_cplx *rx, int *tmax, float *fmax);
/* Fine time/freq refinement. */
void ro_acq_refine(ro_acq *a, const rc_cplx *rx, int *tmax, float *fmax,
                   int t_lo, int t_hi, float f_lo, float f_hi, float f_step);
/* In-sync spot check; sets *valid and *endofover. */
void ro_acq_check(ro_acq *a, const rc_cplx *rx, int tmax, float fmax,
                  int *valid, int *endofover);

/* -- streaming complex band-pass filter ---------------------------------- */

#define RO_BPF_NTAP 101
#define RO_BPF_MAXBLOCK 8192

typedef struct {
    rc_cplx h[RO_BPF_NTAP];
    rc_cplx mem[RO_BPF_NTAP - 1];
    rc_cplx phase;
    float alpha;
    /* per-instance scratch (~130 KB): would overflow small worker-thread
       stacks (musl defaults to 128 KB) if stack-local, and must not be
       static (one instance per ro_bpf keeps multiple contexts re-entrant) */
    rc_cplx ext[RO_BPF_NTAP - 1 + RO_BPF_MAXBLOCK];
    rc_cplx phases[RO_BPF_MAXBLOCK];
} ro_bpf;

void ro_bpf_init(ro_bpf *b, float Fs, float bandwidth, float centre);
void ro_bpf_run(ro_bpf *b, rc_cplx *out, const rc_cplx *in, int n);

#ifdef __cplusplus
}
#endif
#endif
