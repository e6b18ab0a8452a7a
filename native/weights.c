#include "weights.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int rw_parse(rw_blob *b, const void *vbuf, size_t len)
{
    const uint8_t *p = (const uint8_t *)vbuf;
    const uint8_t *end = p + len;
    memset(b->tensors, 0, sizeof(b->tensors));
    b->n = 0;

    if (len < 12 || memcmp(p, "RTPW", 4) != 0) return -1;
    uint32_t version, n_tensors;
    memcpy(&version, p + 4, 4);
    memcpy(&n_tensors, p + 8, 4);
    if (version != 1 || n_tensors > RW_MAX_TENSORS) return -2;
    p += 12;

    for (uint32_t t = 0; t < n_tensors; t++) {
        uint32_t name_len, ndim;
        if (p + 4 > end) return -3;
        memcpy(&name_len, p, 4); p += 4;
        if (name_len >= RW_MAX_NAME || p + name_len > end) return -4;
        rw_tensor *tt = &b->tensors[b->n];
        memcpy(tt->name, p, name_len);
        tt->name[name_len] = 0;
        p += name_len;
        if (p + 4 > end) return -5;
        memcpy(&ndim, p, 4); p += 4;
        if (ndim > 4 || p + 4 * ndim > end) return -6;
        tt->ndim = ndim;
        size_t sz = 1;
        for (uint32_t d = 0; d < ndim; d++) {
            memcpy(&tt->dims[d], p, 4); p += 4;
            sz *= tt->dims[d];
        }
        if (p + 4 * sz > end) return -7;
        tt->data = (const float *)p;
        tt->size = sz;
        p += 4 * sz;
        b->n++;
    }
    return 0;
}

int rw_load(rw_blob *b, const char *path)
{
    FILE *f = fopen(path, "rb");
    if (!f) return -10;
    fseek(f, 0, SEEK_END);
    long len = ftell(f);
    fseek(f, 0, SEEK_SET);
    void *buf = malloc(len);
    if (!buf) { fclose(f); return -11; }
    if (fread(buf, 1, len, f) != (size_t)len) { free(buf); fclose(f); return -12; }
    fclose(f);
    int rc = rw_parse(b, buf, len);
    if (rc) { free(buf); return rc; }
    b->owned = buf;
    return 0;
}

void rw_free(rw_blob *b)
{
    free(b->owned);
    b->owned = NULL;
    b->n = 0;
}

const rw_tensor *rw_find(const rw_blob *b, const char *name)
{
    for (int i = 0; i < b->n; i++)
        if (strcmp(b->tensors[i].name, name) == 0)
            return &b->tensors[i];
    return NULL;
}
