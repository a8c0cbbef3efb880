/* Minimal stand-in for bwa's bntseq.h — only the fields the reference
 * align core actually touches (ref->bns->n_seqs, ->anns[i].name/len in
 * write_sam_header, align.c:199-201).  The real bwa submodule is empty
 * in this checkout; these stubs let src/align.c compile for the
 * candidate-replay oracle. */
#ifndef EMA_STUB_BNTSEQ_H
#define EMA_STUB_BNTSEQ_H

#include <stdint.h>

typedef struct {
    char *name;
    int32_t len;
} bntann1_t;

typedef struct {
    int32_t n_seqs;
    bntann1_t *anns;
} bntseq_t;

#endif
