/* Weight blob container: "RTPW" format written by radae_tpu.export.
 *
 * Layout (little endian):
 *   char magic[4] = "RTPW"; uint32 version; uint32 n_tensors;
 *   repeated: uint32 name_len; char name[name_len];
 *             uint32 ndim; uint32 dims[ndim]; float data[prod(dims)];
 *
 * Replaces the reference's opus WeightHead "DNNw" blob + parse_weights
 * (reference: src/write_rade_weights.c:52-88) with an independent format.
 */

#ifndef RADAE_WEIGHTS_H
#define RADAE_WEIGHTS_H

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

#define RW_MAX_TENSORS 256
#define RW_MAX_NAME 96

typedef struct {
    char name[RW_MAX_NAME];
    const float *data;
    uint32_t ndim;
    uint32_t dims[4];
    size_t size;
} rw_tensor;

typedef struct {
    rw_tensor tensors[RW_MAX_TENSORS];
    int n;
    void *owned;            /* malloc'd file buffer (freed by rw_free) */
} rw_blob;

/* Parse a blob from memory (zero-copy: tensors point into buf). */
int rw_parse(rw_blob *b, const void *buf, size_t len);
/* Load + parse a blob file.  Returns 0 on success. */
int rw_load(rw_blob *b, const char *path);
void rw_free(rw_blob *b);
/* Find a tensor by name; NULL if absent. */
const rw_tensor *rw_find(const rw_blob *b, const char *name);

#ifdef __cplusplus
}
#endif
#endif
