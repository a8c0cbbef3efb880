/* Candidate-replay stub for the reference's bwabridge (bwabridge.h:92-106).
 *
 * The reference align core (src/align.c + samdict/samrecord/split/techs/
 * util) depends on bwa only through this bridge.  This stub replaces the
 * bwa seeding/extension machinery with a replay of externally supplied
 * per-read candidate lists (produced by ema_tpu), so the reference's OWN
 * compiled cloud/EM/selection/print code can be run as a record-level
 * concordance oracle without the (empty) bwa submodule.
 *
 * Replay file (whitespace-separated text):
 *   NCONTIGS n
 *   <name> <len>                           x n
 *   NENTRIES m                             one entry per (ident, mate)
 *   E <ident> <mate> <ncand>
 *   <chrom> <pos0> <rev> <score> <sub> <csub> <sub_n> <seedcov>
 *     <frac_rep> <qb> <qe> <rb> <re> <edit_dist> <cigar>   x ncand
 *
 * Candidates must be in best-first order (the reference anchors its
 * edit-distance window on candidate 0, align.c:1018-1024).  read_s/read_e
 * are taken from qb/qe (clip = len - (read_e - read_s), align.c:1010).
 */
#include <assert.h>
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stddef.h>

#include "bwabridge.h"
#include "samrecord.h"
#include "util.h"

/* ------------------------------------------------------------------ */
/* arena (bwabridge.c:20-70 semantics: per-thread free list)           */
/* ------------------------------------------------------------------ */

typedef struct {
    void **ptrs;
    size_t n, cap;
} Arena;

static Arena arena_store;
#pragma omp threadprivate(arena_store)

void arena_init(void)
{
    arena_store.cap = 1024;
    arena_store.n = 0;
    arena_store.ptrs = malloc(arena_store.cap * sizeof(void *));
}

void arena_push(void *p)
{
    if (arena_store.n == arena_store.cap) {
        arena_store.cap *= 2;
        arena_store.ptrs = realloc(arena_store.ptrs,
                                   arena_store.cap * sizeof(void *));
    }
    arena_store.ptrs[arena_store.n++] = p;
}

void arena_clear(void)
{
    for (size_t i = 0; i < arena_store.n; i++)
        free(arena_store.ptrs[i]);
    arena_store.n = 0;
}

void arena_destroy(void)
{
    arena_clear();
    free(arena_store.ptrs);
    arena_store.ptrs = NULL;
}

/* ------------------------------------------------------------------ */
/* replay database                                                     */
/* ------------------------------------------------------------------ */

typedef struct {
    mem_alnreg_t reg;        /* must be first: recovered from chained_hit */
    int64_t pos;             /* 0-based global-contig-local position */
    int chrom_idx;
    int rev;
    int edit_dist;
    int n_cigar;
    uint32_t cigar[64];
} StubCand;

typedef struct {
    char *ident;             /* without '@' */
    int mate;
    int n_cands;
    StubCand *cands;
} StubEntry;

static StubEntry *entries;
static size_t n_entries;
static char **contig_names;
static int n_contigs;

static int entry_cmp(const void *va, const void *vb)
{
    const StubEntry *a = va, *b = vb;
    int c = strcmp(a->ident, b->ident);
    return c ? c : (a->mate - b->mate);
}

static int parse_cigar(const char *s, uint32_t *out)
{
    int n = 0;
    while (*s && *s != '*') {
        char *end;
        long len = strtol(s, &end, 10);
        if (end == s) break;
        uint32_t op;
        switch (*end) {
        case 'M': op = 0; break;
        case 'I': op = 1; break;
        case 'D': op = 2; break;
        case 'S': op = 4; break;  /* the reference maps both 3,4 -> S/clip */
        case 'H': op = 4; break;
        default: op = 0; break;
        }
        assert(n < 64);
        out[n++] = ((uint32_t)len << 4) | op;
        s = end + 1;
    }
    return n;
}

bwaidx_t *load_reference(const char *path)
{
    FILE *f = fopen(path, "r");
    if (!f) IOERROR(path);

    char tok[256];
    long n;
    assert(fscanf(f, "%255s %ld", tok, &n) == 2
           && strcmp(tok, "NCONTIGS") == 0);
    n_contigs = (int)n;

    bntseq_t *bns = safe_calloc(1, sizeof(*bns));
    bns->n_seqs = n_contigs;
    bns->anns = safe_calloc(n_contigs, sizeof(*bns->anns));
    contig_names = safe_calloc(n_contigs, sizeof(*contig_names));
    for (int i = 0; i < n_contigs; i++) {
        char name[256];
        long len;
        assert(fscanf(f, "%255s %ld", name, &len) == 2);
        contig_names[i] = strdup(name);
        bns->anns[i].name = contig_names[i];
        bns->anns[i].len = (int32_t)len;
    }

    assert(fscanf(f, "%255s %ld", tok, &n) == 2
           && strcmp(tok, "NENTRIES") == 0);
    n_entries = (size_t)n;
    entries = safe_calloc(n_entries ? n_entries : 1, sizeof(*entries));

    for (size_t e = 0; e < n_entries; e++) {
        char ident[512];
        int mate, ncand;
        assert(fscanf(f, "%255s %511s %d %d", tok, ident, &mate, &ncand) == 4
               && strcmp(tok, "E") == 0);
        entries[e].ident = strdup(ident);
        entries[e].mate = mate;
        entries[e].n_cands = ncand;
        entries[e].cands = safe_calloc(ncand ? ncand : 1,
                                       sizeof(StubCand));
        for (int c = 0; c < ncand; c++) {
            StubCand *sc = &entries[e].cands[c];
            char chrom[256], cig[1024];
            long pos, rb, re;
            int rev, score, sub, csub, sub_n, seedcov, qb, qe, ed;
            double frep;
            assert(fscanf(f, "%255s %ld %d %d %d %d %d %d %lf %d %d %ld %ld %d %1023s",
                          chrom, &pos, &rev, &score, &sub, &csub, &sub_n,
                          &seedcov, &frep, &qb, &qe, &rb, &re, &ed,
                          cig) == 15);
            sc->chrom_idx = -1;
            for (int i = 0; i < n_contigs; i++)
                if (strcmp(contig_names[i], chrom) == 0) {
                    sc->chrom_idx = i;
                    break;
                }
            assert(sc->chrom_idx >= 0);
            sc->pos = pos;
            sc->rev = rev;
            sc->edit_dist = ed;
            sc->n_cigar = parse_cigar(cig, sc->cigar);
            sc->reg.rb = rb;
            sc->reg.re = re;
            sc->reg.qb = qb;
            sc->reg.qe = qe;
            sc->reg.score = score;
            sc->reg.sub = sub;
            sc->reg.csub = csub;
            sc->reg.sub_n = sub_n;
            sc->reg.seedcov = seedcov;
            sc->reg.frac_rep = (float)frep;
        }
    }
    fclose(f);

    qsort(entries, n_entries, sizeof(*entries), entry_cmp);

    bwaidx_t *idx = safe_calloc(1, sizeof(*idx));
    idx->bns = bns;
    return idx;
}

void bwa_idx_destroy(bwaidx_t *idx)
{
    (void)idx;
}

mem_opt_t *mem_opt_init(void)
{
    /* bwa mem defaults for the fields the reference reads
     * (lh3/bwa bwamem.c mem_opt_init) */
    mem_opt_t *o = safe_calloc(1, sizeof(*o));
    o->a = 1;
    o->b = 4;
    o->min_seed_len = 19;
    o->max_occ = 500;
    o->mapQ_coef_len = 50;
    o->mapQ_coef_fac = (float)log(50.0);
    return o;
}

/* ------------------------------------------------------------------ */
/* replayed bridge calls                                               */
/* ------------------------------------------------------------------ */

static StubEntry *find_entry(const char *read_field, int mate)
{
    /* the bridge only receives the read sequence pointer, which lives
     * inside a FASTQRecord — recover the record to key by ident */
    const FASTQRecord *fqr = (const FASTQRecord *)
        ((const char *)read_field - offsetof(FASTQRecord, read));
    char ident[512];
    size_t i = 0;
    const char *c = fqr->id;
    if (*c == '@') c++;
    while (*c && *c != '\n' && i + 1 < sizeof(ident))
        ident[i++] = *c++;
    ident[i] = '\0';

    StubEntry key;
    key.ident = ident;
    key.mate = mate;
    return bsearch(&key, entries, n_entries, sizeof(*entries), entry_cmp);
}

static EasyAlignment *make_easy(StubEntry *e, size_t *len)
{
    if (e == NULL || e->n_cands == 0) {
        *len = 0;
        return NULL;
    }
    EasyAlignment *a = safe_calloc(e->n_cands, sizeof(*a));
    arena_push(a);
    for (int i = 0; i < e->n_cands; i++) {
        StubCand *sc = &e->cands[i];
        a[i].chained_hit = &sc->reg;
        a[i].read_s = sc->reg.qb;
        a[i].read_e = sc->reg.qe;
        a[i].score = sc->reg.score;
        a[i].offset = sc->pos;
        a[i].contig = contig_names[sc->chrom_idx];
        a[i].rev = sc->rev;
    }
    *len = (size_t)e->n_cands;
    return a;
}

EasyAlignmentPairs bwa_mem_mate_sw(bwaidx_t *ref, mem_opt_t *opts,
                                   char *read1, const size_t len1,
                                   char *read2, const size_t len2,
                                   const int score_delta)
{
    (void)ref; (void)opts; (void)len1; (void)len2; (void)score_delta;
    EasyAlignmentPairs r;
    r.a1 = make_easy(find_entry(read1, 0), &r.len1);
    r.a2 = make_easy(find_entry(read2, 1), &r.len2);
    return r;
}

void bwa_smith_waterman(bwaidx_t *ref, mem_opt_t *opts, char *seq,
                        const size_t len, mem_alnreg_t *aln,
                        SingleReadAlignment *res)
{
    (void)ref; (void)opts; (void)seq; (void)len;
    StubCand *sc = (StubCand *)aln;   /* reg is the first member */
    memset(res, 0, sizeof(*res));
    res->pos = sc->pos;
    res->chrom = contig_names[sc->chrom_idx];
    res->rev = sc->rev;
    res->edit_dist = sc->edit_dist;
    res->cigar = sc->cigar;
    res->n_cigar = sc->n_cigar;
    res->score = sc->reg.score;
    res->sub = sc->reg.sub;
    res->alt = 0;
    res->alt_sc = 0;
    res->mapq = 0;            /* recomputed by append_alignments */
    res->alt_mappings = NULL;
}

/* unused-by-align surface, provided for link completeness */
EasyAlignment *bwa_align(bwaidx_t *ref, mem_opt_t *opts, char *seq,
                         const size_t len)
{
    (void)ref; (void)opts; (void)seq; (void)len;
    return NULL;
}

Chain *bwa_chain(bwaidx_t *ref, mem_opt_t *opts, char *seq,
                 const size_t len)
{
    (void)ref; (void)opts; (void)seq; (void)len;
    return NULL;
}

void get_seq(bwaidx_t *ref, char *chrom, int64_t start, int64_t end,
             int rev, char *out)
{
    (void)ref; (void)chrom; (void)start; (void)end; (void)rev; (void)out;
}

void interpret_align(bwaidx_t *ref, mem_alnreg_t *caln, EasyAlignment *res)
{
    (void)ref; (void)caln; (void)res;
}

void interpret_chain(bwaidx_t *ref, mem_chain_t *chn, Chain *res)
{
    (void)ref; (void)chn; (void)res;
}

void interpret_single_read_alignment(bwaidx_t *ref, mem_aln_t *aln,
                                     SingleReadAlignment *res)
{
    (void)ref; (void)aln; (void)res;
}
