/* Minimal stand-in for bwa's bwa.h (see bntseq.h for rationale). */
#ifndef EMA_STUB_BWA_H
#define EMA_STUB_BWA_H

#include <assert.h>   /* the real bwa header chain exposes assert */

#include "bwa/bntseq.h"

typedef struct {
    bntseq_t *bns;
} bwaidx_t;

void bwa_idx_destroy(bwaidx_t *idx);

#endif
