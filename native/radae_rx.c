/* Streaming rx demo main over the C API: IQ.f32 on stdin, features.f32
 * on stdout; writes EOO soft bits to eoo_rx.f32 (reference behavior:
 * src/radae_rx.c:31,48-50). */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "rade_api.h"

int main(int argc, char **argv)
{
    if (argc < 2) {
        fprintf(stderr, "usage: %s weights.bin [foff_test]\n", argv[0]);
        return 1;
    }
    int flags = RADE_VERBOSE_0;
    if (argc > 2 && atoi(argv[2]) == 1)
        flags |= RADE_FOFF_TEST;

    rade_initialize();
    struct rade *r = rade_open(argv[1], flags);
    if (!r) { fprintf(stderr, "rade_open failed\n"); return 1; }

    int n_feat = rade_n_features_in_out(r);
    int n_eoo = rade_n_eoo_bits(r);
    float *features = malloc(n_feat * sizeof(float));
    float *eoo = malloc(n_eoo * sizeof(float));
    RADE_COMP *rx = malloc(rade_nin_max(r) * sizeof(RADE_COMP));

    int frames = 0, prev_sync = 0, n_unsync = 0, n_sync = 0;
    while (1) {
        int nin = rade_nin(r);
        if (fread(rx, sizeof(RADE_COMP), nin, stdin) != (size_t)nin)
            break;
        int has_eoo = 0;
        int n = rade_rx(r, features, &has_eoo, eoo, rx);
        if (n > 0)
            fwrite(features, sizeof(float), n, stdout);
        if (has_eoo) {
            FILE *f = fopen("eoo_rx.f32", "wb");
            fwrite(eoo, sizeof(float), n_eoo, f);
            fclose(f);
            fprintf(stderr, "EOO detected\n");
        }
        int s = rade_sync(r);
        if (s && !prev_sync) { n_sync++; fprintf(stderr, "sync\n"); }
        if (!s && prev_sync) { n_unsync++; fprintf(stderr, "unsync\n"); }
        prev_sync = s;
        frames++;
    }
    fprintf(stderr, "%d frames, sync=%d syncs=%d unsyncs=%d freq=%.2f snr=%d\n",
            frames, rade_sync(r), n_sync, n_unsync,
            rade_freq_offset(r), rade_snrdB_3k_est(r));
    rade_close(r);
    rade_finalize();
    free(features); free(eoo); free(rx);
    return 0;
}
