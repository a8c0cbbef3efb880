/* Driver for the reference align-core oracle.
 *
 * Provides the globals + chrom table that src/main.c provides in the
 * real binary (main.c:23-71), then runs the reference's own
 * write_sam_header + find_clouds_and_align over a special-format bucket
 * file, with candidates replayed through bwabridge_stub.c.
 *
 * Usage:
 *   align_oracle <replay_file> <special_fastq> <out_sam> <platform>
 *                <apply_opt 0|1>
 *
 * Single-threaded (num_threads_per_file = 1), per SURVEY §4's
 * determinism notes.  Contig names come from the replay file itself
 * (the same table both stacks use), so no .fai is needed.
 */
#include <assert.h>
#include <ctype.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "align.h"
#include "main.h"
#include "samrecord.h"
#include "techs.h"
#include "util.h"

/* ---- globals the reference core links against (main.c:23-31) ---- */
int num_threads_per_file = 1;
int num_threads_for_files = 1;
char *rg = "@RG\tID:rg1\tSM:sample1";
char *bx_index = "1";
char **pg_argv = NULL;
int pg_argc = 0;
int BC_LEN;
PlatformProfile *tech;

/* ---- chrom table (main.c:33-71 semantics incl. the linear-scan
 * prefix-match quirk of chrom_index) ---- */
#define MAX_CHROM_NAME_LEN 256
static struct { char chrom_name[MAX_CHROM_NAME_LEN]; } *chroms;

char *chrom_lookup(const chrom_t chrom)
{
    return chroms[chrom].chrom_name;
}

chrom_t chrom_index(const char *chrom)
{
    size_t len = 0;
    while (!isspace((unsigned char)chrom[len]) && chrom[len] != '\0')
        ++len;
    for (size_t i = 0; chroms[i].chrom_name[0] != '\0'; i++) {
        if (strncmp(chrom, chroms[i].chrom_name, len) == 0)
            return (chrom_t)i;
    }
    assert(0);
    return 0;
}

void read_fai(FILE *fai_file)
{
    (void)fai_file;
}

static void load_chroms_from_replay(const char *path)
{
    FILE *f = fopen(path, "r");
    if (!f) IOERROR(path);
    char tok[256];
    long n;
    assert(fscanf(f, "%255s %ld", tok, &n) == 2);
    chroms = safe_malloc((n + 1) * sizeof(*chroms));
    for (long i = 0; i < n; i++) {
        long len;
        assert(fscanf(f, "%255s %ld", chroms[i].chrom_name, &len) == 2);
    }
    chroms[n].chrom_name[0] = '\0';
    fclose(f);
}

int main(int argc, char **argv)
{
    if (argc != 8) {
        fprintf(stderr,
                "usage: %s <replay> <mode s|p> <in1> <in2|-> <out_sam>"
                " <platform> <apply_opt>\n", argv[0]);
        return 2;
    }
    pg_argv = argv;
    pg_argc = argc;

    const char *replay = argv[1];
    const char mode = argv[2][0];
    const char *in1 = argv[3];
    const char *in2 = argv[4];
    const char *out_path = argv[5];

    tech = get_platform_profile_by_name(argv[6]);
    if (!tech) {
        fprintf(stderr, "unknown platform %s\n", argv[6]);
        return 2;
    }
    BC_LEN = (int)tech->bc_len;
    const int apply_opt = atoi(argv[7]);

    load_chroms_from_replay(replay);
    bwa_init(replay);

    FILE *out = fopen(out_path, "w");
    if (!out) IOERROR(out_path);
    write_sam_header(out);

    if (mode == 's') {
        FILE *fqx = fopen(in1, "r");
        if (!fqx) IOERROR(in1);
        find_clouds_and_align(NULL, NULL, fqx, out, apply_opt, NULL, NULL);
        fclose(fqx);
    } else {
        /* standard bc-sorted paired FASTQs (main.c:373-381 semantics;
         * -2 omitted => interleaved single file) */
        FILE *fq1 = fopen(in1, "r");
        if (!fq1) IOERROR(in1);
        FILE *fq2 = strcmp(in2, "-") == 0 ? fq1 : fopen(in2, "r");
        if (!fq2) IOERROR(in2);
        find_clouds_and_align(fq1, fq2, NULL, out, apply_opt, NULL, NULL);
        if (fq2 != fq1) fclose(fq2);
        fclose(fq1);
    }

    fclose(out);
    return 0;
}
