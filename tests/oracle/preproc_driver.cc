// Minimal CLI shim around the reference preprocessor's EXTERNC entry
// points (cpp/count.h:19-24, cpp/correct.h:24-35), so byte-parity tests
// can run the REAL reference count/correct stages without the
// bwa-submodule-linked `ema` binary (the align core needs libbwa; the
// preprocessor is standalone C++11).
//
// Compiled at test time against /root/reference/cpp/*.o built out of
// tree (see tests/oracle/__init__.py); no reference source is copied
// into this repository.
//
// Usage:
//   preproc_oracle count   <wl|-> <out_prefix> <is_haplotag>   < inter.fq
//   preproc_oracle correct <wl|-> <out_dir> <do_h2> <do_bx> <nthreads>
//                          <nbuckets> <is_haplotag> <prefix.ema-ncnt>...
//                          < inter.fq
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#define EXTERNC extern "C"
EXTERNC void cppinit();
EXTERNC void count(const char *wl, const char *out_prefix,
                   const size_t max_map_size, const int is_haplotag);
EXTERNC void correct(const char *wl, const char **prefixes, const int n,
                     const char *out_dir, const char do_h2,
                     const size_t buffer_size, const char do_bx,
                     const int nthreads, const int nbuckets,
                     const int is_haplotag);

static const char *wl_arg(const char *a) {
    return strcmp(a, "-") == 0 ? NULL : a;
}

int main(int argc, char **argv) {
    if (argc < 2) return 2;
    cppinit();
    if (strcmp(argv[1], "count") == 0) {
        if (argc != 5) return 2;
        // 1 GB map limit + args as main.c:239 passes them
        count(wl_arg(argv[2]), argv[3], (size_t)1 << 30, atoi(argv[4]));
        return 0;
    }
    if (strcmp(argv[1], "correct") == 0) {
        if (argc < 10) return 2;
        std::vector<const char *> prefixes;
        for (int i = 9; i < argc; i++) prefixes.push_back(argv[i]);
        // 10 MB buffers as main.c:201 passes
        correct(wl_arg(argv[2]), prefixes.data(), (int)prefixes.size(),
                argv[3], (char)atoi(argv[4]), (size_t)10 << 20,
                (char)atoi(argv[5]), atoi(argv[6]), atoi(argv[7]),
                atoi(argv[8]));
        return 0;
    }
    return 2;
}
