"""Multi-host orchestration pieces: bucket hashing, shard merge, manifest,
and a two-"host" sharded -x CLI run whose merged output equals the
single-host run (SURVEY.md §4: shard-merge == single-host result)."""

import os

import numpy as np
import pytest

from ema_tpu.parallel.distrib import (
    allreduce_counts, buckets_for_host, merge_sorted_shards, shard_path,
    sort_sam_lines)
from ema_tpu.utils.manifest import RunManifest


def test_buckets_partition():
    paths = [f"bin-{i:03d}" for i in range(17)]
    got = []
    for h in range(4):
        part = buckets_for_host(paths, h, 4)
        got.extend(part)
    assert sorted(got) == sorted(paths)
    assert len(set(got)) == len(paths)


def test_allreduce_counts_single_process():
    c = np.arange(10, dtype=np.int64)
    np.testing.assert_array_equal(allreduce_counts(c), c)


def test_shard_path():
    assert shard_path("/x/out.sam", 3, 8) == "/x/out.shard03of08.sam"


def _mk_line(name, chrom, pos):
    return (f"{name}\t0\t{chrom}\t{pos}\t60\t5M\t=\t{pos}\t0\tACGTA\tIIIII\n")


def test_sort_and_merge(tmp_path):
    chroms = ["chr1", "chr2"]
    rng = np.random.default_rng(0)
    lines = [_mk_line(f"r{i}", chroms[int(rng.integers(0, 2))],
                      int(rng.integers(1, 10000))) for i in range(200)]
    all_sorted = sort_sam_lines(lines, chroms)

    shard_files = []
    for k in range(3):
        part = sort_sam_lines(lines[k::3], chroms)
        p = tmp_path / f"s{k}.sam"
        p.write_text("@HD\tVN:1.3\n" + "".join(part))
        shard_files.append(str(p))
    out = str(tmp_path / "merged.sam")
    n = merge_sorted_shards(shard_files, out, chroms, header="@HD\tVN:1.3\n")
    assert n == 200
    body = [ln for ln in open(out) if not ln.startswith("@")]
    assert body == all_sorted


def test_manifest_roundtrip(tmp_path):
    mpath = str(tmp_path / "run.manifest")
    out = tmp_path / "b0.sam"
    out.write_text("x\n")
    m = RunManifest(mpath)
    assert not m.is_done("b0")
    m.mark_done("b0", str(out), 10, 1.5)
    assert m.is_done("b0")
    m2 = RunManifest(mpath)          # reload from disk
    assert m2.is_done("b0")
    os.unlink(out)                   # missing output -> not done
    assert not RunManifest(mpath).is_done("b0")


def test_x_mode_manifest_resume(tmp_path):
    """A rerun with a manifest skips completed buckets (restartability,
    SURVEY.md §5.3-5.4)."""
    import time

    from ema_tpu import cli
    from tests.simulate import rand_genome, simulate_pairs, to_str

    rng = np.random.default_rng(9)
    genome = rand_genome(rng, 50_000)
    gs = to_str(genome)
    fa = tmp_path / "ref.fa"
    fa.write_text(">c1\n" + "\n".join(
        gs[i:i + 70] for i in range(0, len(gs), 70)) + "\n")
    ids, bc_strs, bcs, s1, q1, s2, q2, _ = simulate_pairs(
        rng, gs, n_barcodes=4, frags_per_bc=(1, 2), pairs_per_frag=(3, 6),
        frag_len=8_000, read_len=70, err=0.002)
    buckets = []
    for b in range(2):
        p = tmp_path / f"ema-bin-{b:03d}"
        with open(p, "w") as f:
            for i in range(b, len(ids), 2):
                f.write(f"{bc_strs[i]} {ids[i]} {s1[i]} {q1[i]} "
                        f"{s2[i]} {q2[i]}\n")
        buckets.append(str(p))

    out = str(tmp_path / "out.sam")
    man = str(tmp_path / "run.jsonl")
    assert cli.main(["align", "-r", str(fa), "-x", "-o", out,
                     "--manifest", man] + buckets) == 0
    first = open(out).read()
    parts_dir = out + ".parts"
    part0 = os.path.join(parts_dir, "ema-bin-000.sam")
    mtimes = {p: os.path.getmtime(os.path.join(parts_dir, p))
              for p in os.listdir(parts_dir)}
    time.sleep(0.05)
    # rerun: all buckets recorded done -> parts untouched, output identical
    assert cli.main(["align", "-r", str(fa), "-x", "-o", out,
                     "--manifest", man] + buckets) == 0
    for p, t in mtimes.items():
        assert os.path.getmtime(os.path.join(parts_dir, p)) == t
    assert open(out).read() == first
    # losing a part forces exactly that bucket to realign
    os.unlink(part0)
    assert cli.main(["align", "-r", str(fa), "-x", "-o", out,
                     "--manifest", man] + buckets) == 0
    assert os.path.exists(part0)
    assert open(out).read() == first


def test_sharded_x_mode_equals_single(tmp_path):
    """Two-shard -x run merged == single-host -x run (record multiset)."""
    import sys

    from ema_tpu import cli
    from tests.simulate import rand_genome, simulate_pairs, to_str

    rng = np.random.default_rng(5)
    genome = rand_genome(rng, 60_000)
    gs = to_str(genome)
    fa = tmp_path / "ref.fa"
    fa.write_text(">c1\n" + "\n".join(
        gs[i:i + 70] for i in range(0, len(gs), 70)) + "\n")

    ids, bc_strs, bcs, s1, q1, s2, q2, truth = simulate_pairs(
        rng, gs, n_barcodes=6, frags_per_bc=(1, 2), pairs_per_frag=(4, 8),
        frag_len=10_000, read_len=80, err=0.003)
    # four bucket files in the special EMA-FASTQ format
    buckets = []
    by_bucket = {}
    for i in range(len(ids)):
        b = hash(bc_strs[i]) % 4
        by_bucket.setdefault(b, []).append(i)
    for b, idxs in sorted(by_bucket.items()):
        p = tmp_path / f"ema-bin-{b:03d}"
        with open(p, "w") as f:
            for i in idxs:
                f.write(f"{bc_strs[i]} {ids[i]} {s1[i]} {q1[i]} "
                        f"{s2[i]} {q2[i]}\n")
        buckets.append(str(p))

    def run(args):
        rc = cli.main(args)
        assert rc == 0

    single = str(tmp_path / "single.sam")
    run(["align", "-r", str(fa), "-x", "-o", single] + buckets)

    shards = []
    for s in range(2):
        out = str(tmp_path / f"shard{s}.sam")
        run(["align", "-r", str(fa), "-x", "-o", out,
             "--shard", str(s), "--nshards", "2", "--sort"] + buckets)
        shards.append(out)
    merged = str(tmp_path / "merged.sam")
    merge_sorted_shards(shards, merged, ["c1"])

    def body(p):
        # MI (cloud id) is an arbitrary sequential id: it depends on which
        # process saw the cloud first (like the reference's static
        # cloud_id++, align.c:19-23) — normalize it away
        import re
        return sorted(re.sub(r"\tMI:i:\d+", "\tMI:i:*", ln)
                      for ln in open(p) if not ln.startswith("@"))

    assert body(merged) == body(single)


def test_concurrent_buckets_equal_serial(tmp_path):
    """-x with -j 2 (thread pool over bucket files, the reference's
    one-OpenMP-thread-per-file analog, main.c:396-406) produces the same
    records as the serial run."""
    from ema_tpu import cli
    from tests.simulate import rand_genome, simulate_pairs, to_str

    rng = np.random.default_rng(15)
    genome = rand_genome(rng, 80_000)
    gs = to_str(genome)
    fa = tmp_path / "ref.fa"
    fa.write_text(">c1\n" + "\n".join(
        gs[i:i + 70] for i in range(0, len(gs), 70)) + "\n")

    ids, bc_strs, bcs, s1, q1, s2, q2, truth = simulate_pairs(
        rng, gs, n_barcodes=8, frags_per_bc=(1, 2), pairs_per_frag=(4, 8),
        frag_len=10_000, read_len=80, err=0.003)
    buckets = []
    by_bucket = {}
    for i in range(len(ids)):
        by_bucket.setdefault(hash(bc_strs[i]) % 4, []).append(i)
    for b, idxs in sorted(by_bucket.items()):
        p = tmp_path / f"ema-bin-{b:03d}"
        with open(p, "w") as f:
            for i in idxs:
                f.write(f"{bc_strs[i]} {ids[i]} {s1[i]} {q1[i]} "
                        f"{s2[i]} {q2[i]}\n")
        buckets.append(str(p))

    serial = str(tmp_path / "serial.sam")
    conc = str(tmp_path / "conc.sam")
    coal = str(tmp_path / "coal.sam")
    assert cli.main(["align", "-r", str(fa), "-x", "--no-coalesce",
                     "-j", "1", "-o", serial] + buckets) == 0
    assert cli.main(["align", "-r", str(fa), "-x", "--no-coalesce",
                     "-j", "2", "-o", conc] + buckets) == 0
    assert cli.main(["align", "-r", str(fa), "-x",
                     "-o", coal] + buckets) == 0

    def body(p):
        return sorted(ln for ln in open(p) if not ln.startswith("@"))

    bs, bc2, bl = body(serial), body(conc), body(coal)
    # per-bucket MI namespaces make all three byte-identical, including
    # MI ids, regardless of concurrency or coalescing
    assert bs == bc2 == bl and len(bs) > 0
    # MI ids must be unique per cloud even under concurrency: no two
    # different barcodes may share a cloud id
    seen = {}
    for p in (conc,):
        for ln in open(p):
            if ln.startswith("@"):
                continue
            tags = dict(t.split(":", 2)[::2] for t in
                        ln.rstrip("\n").split("\t")[11:])
            if "MI" in tags and "BX" in tags:
                mi, bx = tags["MI"], tags["BX"]
                assert seen.setdefault(mi, bx) == bx, (mi, bx)


@pytest.mark.parametrize("seed,n_jobs", [(21, 3), (22, 4), (23, 2)])
def test_concurrent_buckets_stress_randomized(tmp_path, seed, n_jobs):
    """Randomized bucket-size/thread-count stress for the -j path
    (VERDICT r3 #9): skewed bucket sizes — empty files, singleton
    buckets, one bucket holding most of the reads — across several
    thread counts must still emit exactly the serial records.  Extends
    test_concurrent_buckets_equal_serial beyond its single shape; the
    reference's analog is one-OpenMP-thread-per-file (main.c:396-406)."""
    from ema_tpu import cli
    from tests.simulate import rand_genome, simulate_pairs, to_str

    rng = np.random.default_rng(seed)
    genome = rand_genome(rng, 60_000)
    gs = to_str(genome)
    fa = tmp_path / "ref.fa"
    fa.write_text(">c1\n" + "\n".join(
        gs[i:i + 70] for i in range(0, len(gs), 70)) + "\n")

    ids, bc_strs, bcs, s1, q1, s2, q2, truth = simulate_pairs(
        rng, gs, n_barcodes=10, frags_per_bc=(1, 2),
        pairs_per_frag=(3, 6), frag_len=9_000, read_len=80, err=0.003)

    # skewed routing: ~60% of barcodes into bucket 0, the rest spread
    # thin; plus one intentionally empty bucket file
    n_buckets = int(rng.integers(3, 7))
    route = {}
    for b in set(bc_strs):
        route[b] = 0 if rng.random() < 0.6 \
            else int(rng.integers(1, n_buckets))
    buckets = []
    for bkt in range(n_buckets + 1):          # +1 = guaranteed-empty file
        p = tmp_path / f"ema-bin-{bkt:03d}"
        with open(p, "w") as f:
            for i in range(len(ids)):
                if route[bc_strs[i]] == bkt:
                    f.write(f"{bc_strs[i]} {ids[i]} {s1[i]} {q1[i]} "
                            f"{s2[i]} {q2[i]}\n")
        buckets.append(str(p))

    serial = str(tmp_path / "serial.sam")
    conc = str(tmp_path / "conc.sam")
    assert cli.main(["align", "-r", str(fa), "-x", "--no-coalesce",
                     "-j", "1", "-o", serial] + buckets) == 0
    assert cli.main(["align", "-r", str(fa), "-x", "--no-coalesce",
                     "-j", str(n_jobs), "-o", conc] + buckets) == 0

    def body(p):
        return sorted(ln for ln in open(p) if not ln.startswith("@"))

    bs, bc2 = body(serial), body(conc)
    assert bs == bc2 and len(bs) > 0


def test_mi_shift_fits_int32():
    """MI namespace bases must fit SAM's int32 'i' tag for any bucket
    count (the width adapts: 500 buckets -> 2^22 each, 1000 -> 2^21)."""
    for n in (1, 2, 500, 512, 513, 1000, 4096):
        shift = max(31 - max(n - 1, 1).bit_length(), 10)
        assert (n - 1) << shift <= 2**31 - 1, (n, shift)
        if n > 1:
            assert (1 << shift) >= 2**10       # still a usable namespace
