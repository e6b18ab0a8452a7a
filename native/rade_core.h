/* Pure-C stateful RADAE core encoder/decoder.
 *
 * Same DenseNet-with-skips topology as the radae_tpu JAX modules
 * (radae_tpu/models/core.py; reference architecture radae_base.py:157-354):
 *   encoder: dense(4F->64) + 5 x [GRU(64) | conv k2(96, dil 1/2/2/2/2)]
 *            with concat skips -> dense(864 -> latent) [+tanh bottleneck 1]
 *   decoder: dense(latent->96) + 5 x [GRU(96)+GLU | conv k2(32)]
 *            -> dense(736 -> 4F)
 * Streams one z-step (4 x 10 ms frames) at a time with carried GRU/conv
 * state.  Quantization noise n(x) is omitted (inference is deterministic;
 * the +-1/254 dither is a training regulariser).
 */

#ifndef RADAE_CORE_H
#define RADAE_CORE_H

#include "nnet.h"
#include "weights.h"

#ifdef __cplusplus
extern "C" {
#endif

#define RC_NLAYERS 5
#define RC_ENC_CAT 864
#define RC_DEC_CAT 736
#define RC_MAX_HIST 2          /* max conv dilation */

#define RC_MAX_QMEM 32          /* owned int8 weight blocks per codec */

typedef struct {
    rn_dense dense_1, z_dense;
    rn_gru gru[RC_NLAYERS];
    rn_conv2 conv[RC_NLAYERS];
    int feature_dim, latent_dim, bottleneck;
    /* state */
    float h[RC_NLAYERS][96];
    float hist[RC_NLAYERS][RC_MAX_HIST][RC_ENC_CAT];
    int hist_pos[RC_NLAYERS];
    /* owned int8 weight copies (rc_encoder_quantize) */
    void *qmem[RC_MAX_QMEM];
    int nqmem;
} rc_encoder;

typedef struct {
    rn_dense dense_1, output;
    rn_gru gru[RC_NLAYERS];
    rn_glu glu[RC_NLAYERS];
    rn_conv2 conv[RC_NLAYERS];
    int feature_dim, latent_dim;
    float h[RC_NLAYERS][96];
    float hist[RC_NLAYERS][RC_MAX_HIST][RC_ENC_CAT];
    int hist_pos[RC_NLAYERS];
    void *qmem[RC_MAX_QMEM];
    int nqmem;
} rc_decoder;

/* Bind weights from a blob ("encoder/..." / "decoder/..." names).
 * Returns 0 on success. */
int rc_encoder_init(rc_encoder *e, const rw_blob *w, int bottleneck);
int rc_decoder_init(rc_decoder *d, const rw_blob *w);

/* Switch every weight matrix to an int8 copy with per-row scales
 * (reference parity: the reference C runtime runs 8-bit quantized
 * weights through the opus nnet primitives).  Biases and activations
 * stay float.  Returns 0 on success; on failure the codec keeps
 * running in float.  rc_*_free releases the copies. */
int rc_encoder_quantize(rc_encoder *e);
int rc_decoder_quantize(rc_decoder *d);
void rc_encoder_free(rc_encoder *e);
void rc_decoder_free(rc_decoder *d);

void rc_encoder_reset(rc_encoder *e);
void rc_decoder_reset(rc_decoder *d);

/* One z-step: features[4 * feature_dim] -> z[latent_dim]. */
void rc_encoder_step(rc_encoder *e, float *z, const float *features);
/* One z-step: z[latent_dim] -> features[4 * feature_dim]. */
void rc_decoder_step(rc_decoder *d, float *features, const float *z);

#ifdef __cplusplus
}
#endif
#endif
