/*---------------------------------------------------------------------------*\

  rade_api.h — Radio Autoencoder C API (radae_tpu native runtime)

  Drop-in equivalent of the reference's C ABI v1 surface (reference:
  src/rade_api.h:82-129) implemented FULLY NATIVELY: the core
  encoder/decoder, OFDM modem, pilot acquisition and the sync state
  machine all run in C (the reference embeds a CPython interpreter for
  the DSP/state machine; this runtime has no Python dependency).

\*---------------------------------------------------------------------------*/

#ifndef RADE_API_H
#define RADE_API_H

#include <sys/types.h>

#ifdef __cplusplus
extern "C" {
#endif

#define RADE_MODEM_SAMPLE_RATE 8000
#define RADE_SPEECH_SAMPLE_RATE 16000

/* rade_open() flags.  The C encoder/decoder are always used in this
 * native runtime; the flags are accepted for source compatibility. */
#define RADE_USE_C_ENCODER 0x1
#define RADE_USE_C_DECODER 0x2
#define RADE_FOFF_TEST     0x4
#define RADE_VERBOSE_0     0x8
/* Run the core codec with int8-quantized weights (per-row scales,
 * quantized at load): ~4x less weight bandwidth on the batch-1 GRU
 * stack.  Also enabled by environment RADE_INT8=1.  Parity with the
 * float path is gated at the reference's loss-delta < 0.01 contract. */
#define RADE_USE_INT8      0x10

#ifndef RADE_COMP_DEFINED
#define RADE_COMP_DEFINED
typedef struct { float real; float imag; } RADE_COMP;
#endif

struct rade;

void rade_initialize(void);
void rade_finalize(void);

/* model_file: path to an RTPW weight blob (radae_tpu.export). */
struct rade *rade_open(const char *model_file, int flags);
void rade_close(struct rade *r);

int rade_version(void);

int rade_n_tx_out(struct rade *r);        /* samples per tx frame (Nmf) */
int rade_n_tx_eoo_out(struct rade *r);    /* samples in the EOO frame */
int rade_nin_max(struct rade *r);
int rade_n_features_in_out(struct rade *r);
int rade_n_eoo_bits(struct rade *r);

/* features_in: rade_n_features_in_out() floats (36 per 10 ms frame).
 * Returns number of RADE_COMP samples written to tx_out. */
int rade_tx(struct rade *r, RADE_COMP tx_out[], const float features_in[]);
void rade_tx_set_eoo_bits(struct rade *r, const float eoo_bits[]);
int rade_tx_eoo(struct rade *r, RADE_COMP tx_eoo_out[]);

/* call before each rade_rx() to learn how many samples to provide */
int rade_nin(struct rade *r);

/* Returns non-zero when features_out[] holds valid output (the count of
 * floats written).  *has_eoo_out set when eoo_out[] holds EOO soft bits. */
int rade_rx(struct rade *r, float features_out[], int *has_eoo_out,
            float eoo_out[], const RADE_COMP rx_in[]);

int rade_sync(struct rade *r);
float rade_freq_offset(struct rade *r);
int rade_snrdB_3k_est(struct rade *r);

#ifdef __cplusplus
}
#endif
#endif
