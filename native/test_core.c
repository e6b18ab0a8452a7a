/* Standalone core codec test driver (reference: src/test_rade_enc.c /
 * test_rade_dec.c equivalents).
 *
 * usage: test_core enc|dec weights.bin in.f32 out.f32 [bottleneck]
 *   enc: in = features (4*F floats per step), out = z (latent floats/step)
 *   dec: in = z, out = features
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "rade_core.h"

int main(int argc, char **argv)
{
    if (argc < 5) {
        fprintf(stderr, "usage: %s enc|dec weights.bin in.f32 out.f32 [bottleneck]\n",
                argv[0]);
        return 1;
    }
    int enc = strcmp(argv[1], "enc") == 0;
    int bottleneck = argc > 5 ? atoi(argv[5]) : 3;

    rw_blob blob;
    if (rw_load(&blob, argv[2])) {
        fprintf(stderr, "failed to load weights %s\n", argv[2]);
        return 1;
    }
    FILE *fin = fopen(argv[3], "rb");
    FILE *fout = fopen(argv[4], "wb");
    if (!fin || !fout) { fprintf(stderr, "file open failed\n"); return 1; }

    const char *env_q = getenv("RADE_INT8");
    int use_int8 = env_q && env_q[0] == '1';

    if (enc) {
        rc_encoder e;
        int rc = rc_encoder_init(&e, &blob, bottleneck);
        if (rc) { fprintf(stderr, "encoder init failed %d\n", rc); return 1; }
        if (use_int8 && rc_encoder_quantize(&e)) {
            fprintf(stderr, "encoder quantize failed\n"); return 1;
        }
        int in_n = 4 * e.feature_dim;
        float *in = malloc(in_n * sizeof(float));
        float *z = malloc(e.latent_dim * sizeof(float));
        int steps = 0;
        while (fread(in, sizeof(float), in_n, fin) == (size_t)in_n) {
            rc_encoder_step(&e, z, in);
            fwrite(z, sizeof(float), e.latent_dim, fout);
            steps++;
        }
        fprintf(stderr, "enc: %d steps, F=%d latent=%d\n", steps,
                e.feature_dim, e.latent_dim);
    } else {
        rc_decoder d;
        int rc = rc_decoder_init(&d, &blob);
        if (rc) { fprintf(stderr, "decoder init failed %d\n", rc); return 1; }
        if (use_int8 && rc_decoder_quantize(&d)) {
            fprintf(stderr, "decoder quantize failed\n"); return 1;
        }
        int out_n = 4 * d.feature_dim;
        float *z = malloc(d.latent_dim * sizeof(float));
        float *out = malloc(out_n * sizeof(float));
        int steps = 0;
        while (fread(z, sizeof(float), d.latent_dim, fin) == (size_t)d.latent_dim) {
            rc_decoder_step(&d, out, z);
            fwrite(out, sizeof(float), out_n, fout);
            steps++;
        }
        fprintf(stderr, "dec: %d steps, F=%d latent=%d\n", steps,
                d.feature_dim, d.latent_dim);
    }
    fclose(fin);
    fclose(fout);
    rw_free(&blob);
    return 0;
}
