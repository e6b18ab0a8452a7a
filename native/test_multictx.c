/* Multi-context re-entrancy test: two `struct rade` receivers interleaved
 * in one process must behave exactly like a single receiver run alone
 * (ABI contexts share no mutable globals).  Context A consumes the given
 * IQ stream and writes its features to out.f32; context B concurrently
 * chews a deterministic noise stream between every A call.
 *
 * usage: test_multictx weights.bin rx.f32 out.f32 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "rade_api.h"

int main(int argc, char **argv)
{
    if (argc < 4) {
        fprintf(stderr, "usage: %s weights.bin rx.f32 out.f32\n", argv[0]);
        return 1;
    }
    rade_initialize();
    struct rade *a = rade_open(argv[1], RADE_VERBOSE_0);
    struct rade *b = rade_open(argv[1], RADE_VERBOSE_0);
    if (!a || !b) { fprintf(stderr, "rade_open failed\n"); return 1; }

    FILE *fin = fopen(argv[2], "rb");
    FILE *fout = fopen(argv[3], "wb");
    if (!fin || !fout) { fprintf(stderr, "io failed\n"); return 1; }

    int n_feat = rade_n_features_in_out(a);
    int n_eoo = rade_n_eoo_bits(a);
    float *features = malloc(n_feat * sizeof(float));
    float *eoo = malloc(n_eoo * sizeof(float));
    int nmax = rade_nin_max(a);
    RADE_COMP *rx = malloc(nmax * sizeof(RADE_COMP));
    RADE_COMP *rxb = malloc(nmax * sizeof(RADE_COMP));

    unsigned s = 123457;
    while (1) {
        /* context B: deterministic pseudo-noise frame (keeps its BPF,
           acquisition and state machine churning between A's calls) */
        int ninb = rade_nin(b);
        for (int i = 0; i < ninb; i++) {
            s = s * 1664525u + 1013904223u;
            rxb[i].real = ((int)(s >> 16 & 0x7fff) - 16384) / 65536.0f;
            s = s * 1664525u + 1013904223u;
            rxb[i].imag = ((int)(s >> 16 & 0x7fff) - 16384) / 65536.0f;
        }
        int hb = 0;
        rade_rx(b, features, &hb, eoo, rxb);

        int nin = rade_nin(a);
        if (fread(rx, sizeof(RADE_COMP), nin, fin) != (size_t)nin)
            break;
        int has_eoo = 0;
        int n = rade_rx(a, features, &has_eoo, eoo, rx);
        if (n > 0)
            fwrite(features, sizeof(float), n, fout);
    }
    fclose(fin); fclose(fout);
    rade_close(a);
    rade_close(b);
    rade_finalize();
    free(features); free(eoo); free(rx); free(rxb);
    return 0;
}
