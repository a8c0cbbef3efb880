/* Minimal stand-in for bwa's bwamem.h — only the option/alnreg fields
 * read by the reference align core (mem_approx_mapq_se_insist,
 * align.c:958-984, and the max_occ override at align.c:185). */
#ifndef EMA_STUB_BWAMEM_H
#define EMA_STUB_BWAMEM_H

#include <stdint.h>
#include <stddef.h>

#define MEM_MAPQ_COEF 30.0

typedef struct {
    int a, b;                /* match score / mismatch penalty */
    int min_seed_len;
    int max_occ;
    int mapQ_coef_len;
    float mapQ_coef_fac;
} mem_opt_t;

typedef struct {
    int64_t rb, re;          /* reference interval */
    int qb, qe;              /* query interval */
    int score;
    int sub;                 /* second-best score */
    int csub;                /* second-best within chain */
    int sub_n;
    int seedcov;
    float frac_rep;
} mem_alnreg_t;

typedef struct { size_t n, m; mem_alnreg_t *a; } mem_alnreg_v;

typedef struct {
    int64_t pos;
    int rid;
} mem_aln_t;

mem_opt_t *mem_opt_init(void);

#endif
