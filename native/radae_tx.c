/* Streaming tx demo main over the C API: features.f32 on stdin, IQ.f32
 * on stdout; sends EOO + silence at EOF (reference behavior:
 * src/radae_tx.c:47-52). */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "rade_api.h"

int main(int argc, char **argv)
{
    if (argc < 2) {
        fprintf(stderr, "usage: %s weights.bin [--eoo_data_test]\n", argv[0]);
        return 1;
    }
    rade_initialize();
    struct rade *r = rade_open(argv[1], 0);
    if (!r) { fprintf(stderr, "rade_open failed\n"); return 1; }

    int n_in = rade_n_features_in_out(r);
    int n_out = rade_n_tx_out(r);
    float *features = malloc(n_in * sizeof(float));
    RADE_COMP *tx = malloc((n_out > rade_n_tx_eoo_out(r) ?
                            n_out : rade_n_tx_eoo_out(r)) * sizeof(RADE_COMP));

    if (argc > 2 && strcmp(argv[2], "--eoo_data_test") == 0) {
        int nb = rade_n_eoo_bits(r);
        float *bits = malloc(nb * sizeof(float));
        unsigned s = 65647;
        for (int i = 0; i < nb; i++) {
            s = s * 1664525u + 1013904223u;
            bits[i] = (s >> 16 & 1) ? 1.0f : -1.0f;
        }
        rade_tx_set_eoo_bits(r, bits);
        FILE *f = fopen("eoo_tx.f32", "wb");
        fwrite(bits, sizeof(float), nb, f);
        fclose(f);
        free(bits);
    }

    while (fread(features, sizeof(float), n_in, stdin) == (size_t)n_in) {
        int n = rade_tx(r, tx, features);
        fwrite(tx, sizeof(RADE_COMP), n, stdout);
    }
    int n = rade_tx_eoo(r, tx);
    fwrite(tx, sizeof(RADE_COMP), n, stdout);
    /* trailing silence so the rx can process the EOO frame */
    memset(tx, 0, n * sizeof(RADE_COMP));
    fwrite(tx, sizeof(RADE_COMP), n, stdout);

    rade_close(r);
    rade_finalize();
    free(features);
    free(tx);
    return 0;
}
