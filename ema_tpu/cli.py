"""Command-line interface: count / preproc / align / index / help.

Mirrors the reference CLI (src/main.c:78-118) with one addition: an
``index`` mode that builds our FM-index from a FASTA (the reference
delegates this to `bwa index`).

    ema_tpu count   -w wl.txt -o prefix < interleaved.fq
    ema_tpu preproc -w wl.txt -o outdir [-n N] [-h] [-b] [-t T] prefix.ema-ncnt...
    ema_tpu index   -r ref.fa [-o ref.fa.emaidx.npz]
    ema_tpu align   -r ref.fa [-s bucket | -1 r1.fq [-2 r2.fq] | -x f1 f2...]
                    [-o out.sam] [-R RG] [-d] [-p platform] [-i idx] [-t T]
"""

from __future__ import annotations

import argparse
import os
import sys

from ema_tpu import __version__, config


def _index_path(ref: str) -> str:
    return ref + ".emaidx.npz"


def _load_or_build_index(ref: str):
    from ema_tpu.index import ReferenceIndex, build_index
    p = _index_path(ref)
    if os.path.exists(p):
        return ReferenceIndex.load(p)
    sys.stderr.write(f"ema_tpu: building index for {ref} "
                     f"(cache: {p})...\n")
    idx = build_index(ref)
    idx.save(p)
    return idx


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        sys.stderr.write(f"EMA-TPU version {__version__}\n"
                         "note: use 'ema_tpu help' for usage information.\n")
        return 0
    mode, rest = argv[0], argv[1:]

    if mode == "help":
        print(__doc__)
        return 0

    if mode == "count":
        ap = argparse.ArgumentParser(prog="ema_tpu count", add_help=False)
        ap.add_argument("-w", dest="wl")
        ap.add_argument("-o", dest="out", required=True)
        ap.add_argument("-p", dest="haplotag", action="store_true")
        a = ap.parse_args(rest)
        if not a.wl and not a.haplotag:
            sys.stderr.write("error: specify barcode whitelist with -w\n")
            return 1
        from ema_tpu.preproc.count import count
        stats = count(a.wl, a.out, sys.stdin.buffer, is_haplotag=a.haplotag)
        sys.stderr.write(f":: Reads with OK barcode: {stats['nice']} out of "
                         f"{stats['total']}\n:: Ignored {stats['ignored']} "
                         "reads\n")
        return 0

    if mode == "preproc":
        ap = argparse.ArgumentParser(prog="ema_tpu preproc", add_help=False)
        ap.add_argument("-w", dest="wl")
        ap.add_argument("-n", dest="nbuckets", type=int, default=500)
        ap.add_argument("-h", dest="h2", action="store_true")
        ap.add_argument("-o", dest="out", required=True)
        ap.add_argument("-b", dest="bx", action="store_true")
        ap.add_argument("-t", dest="threads", type=int, default=1)
        ap.add_argument("-p", dest="haplotag", action="store_true")
        ap.add_argument("inputs", nargs="*")
        a = ap.parse_args(rest)
        if not a.inputs:
            sys.stderr.write("warning: no input files specified; "
                             "nothing to do\n")
            return 0
        from ema_tpu.preproc.correct import correct
        stats = correct(a.wl, a.inputs, a.out, sys.stdin.buffer,
                        do_h2=a.h2, do_bx_format=a.bx,
                        n_buckets=a.nbuckets, is_haplotag=a.haplotag)
        sys.stderr.write(
            f":: Stats: no change: {stats['nochange']}\n"
            f"         no barcode: {stats['nobucket']}\n"
            f"       H1-corrected: {stats['h1']}\n"
            f"       H2-corrected: {stats['h2']}\n")
        return 0

    if mode == "index":
        ap = argparse.ArgumentParser(prog="ema_tpu index", add_help=False)
        ap.add_argument("-r", dest="ref", required=True)
        ap.add_argument("-o", dest="out")
        a = ap.parse_args(rest)
        from ema_tpu.index import build_index
        idx = build_index(a.ref)
        idx.save(a.out or _index_path(a.ref))
        return 0

    if mode == "align":
        ap = argparse.ArgumentParser(prog="ema_tpu align", add_help=False)
        ap.add_argument("-r", dest="ref", required=True)
        ap.add_argument("-1", dest="fq1")
        ap.add_argument("-2", dest="fq2")
        ap.add_argument("-s", dest="fqx")
        ap.add_argument("-x", dest="multi", action="store_true")
        ap.add_argument("-o", dest="out")
        ap.add_argument("-R", dest="rg")
        ap.add_argument("-d", dest="dens", action="store_true")
        ap.add_argument("-p", dest="platform", default="10x")
        ap.add_argument("-i", dest="bx_index", default="1")
        ap.add_argument("-t", dest="threads", type=int, default=1)
        ap.add_argument("inputs", nargs="*")
        a = ap.parse_args(rest)

        n_modes = int(a.multi) + int(a.fqx is not None) + \
            int(a.fq1 is not None or a.fq2 is not None)
        if n_modes != 1:
            sys.stderr.write(
                "error: must specify *exactly one* of -1/-2, -s or -x\n")
            return 1
        if a.fq1 is None and a.fq2 is not None:
            sys.stderr.write("error: cannot specify -2 without -1\n")
            return 1

        rg = a.rg.replace("\\t", "\t") if a.rg else "@RG\tID:rg1\tSM:sample1"
        if rg and (not rg.startswith("@RG\t") or "\tID:" not in rg):
            sys.stderr.write(f"error: malformed read group: '{rg}'\n")
            return 1
        try:
            profile = config.get_platform_profile(a.platform)
        except ValueError:
            sys.stderr.write(f"error: invalid platform name: '{a.platform}'\n")
            return 1

        from ema_tpu import io as io_mod
        from ema_tpu.core.pipeline import Aligner
        from ema_tpu.core.samout import write_sam_header
        from ema_tpu.utils.backend import ensure_backend

        ensure_backend()
        idx = _load_or_build_index(a.ref)
        cfg = config.RunConfig(platform=profile, read_group=rg,
                               bx_index=a.bx_index,
                               apply_density_opt=a.dens)
        aligner = Aligner(idx, cfg)
        out = open(a.out, "w") if a.out else sys.stdout
        cmd = "ema_tpu align " + " ".join(rest)
        out.write(write_sam_header(idx.names, idx.lengths, rg,
                                   __version__, cmd))

        is_hap = profile.name == "haplotag"
        if a.fqx:
            batches = [io_mod.read_special_fastq(
                a.fqx, is_hap, profile.bc_len or 16)]
        elif a.multi:
            batches = [io_mod.read_special_fastq(
                p, is_hap, profile.bc_len or 16) for p in a.inputs]
        else:
            batches = [io_mod.read_fastq_pair(a.fq1, a.fq2, profile.name)]

        for batch in batches:
            for line in aligner.align_batch_to_sam(batch):
                out.write(line)
        if a.out:
            out.close()
        return 0

    sys.stderr.write("error: unrecognized mode\n")
    return 1


if __name__ == "__main__":
    sys.exit(main())
