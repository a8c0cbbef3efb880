"""Edge-case robustness: empty/tiny inputs, N-heavy reads, gzip input."""

import gzip

import numpy as np
import pytest

from ema_tpu import cli, config, io as io_mod
from ema_tpu.core.pipeline import Aligner, ReadBatch
from ema_tpu.index import build_index
from tests.simulate import rand_genome, to_str


@pytest.fixture(scope="module")
def idx():
    rng = np.random.default_rng(2)
    return build_index({"c1": rand_genome(rng, 40_000)})


def test_empty_batch(idx):
    al = Aligner(idx, config.RunConfig(batch_size=64))
    batch = ReadBatch.from_pairs([], [], [], [], [], [])
    assert al.align_batch_to_sam(batch) == []


def test_all_n_pair_unmapped(idx):
    al = Aligner(idx, config.RunConfig(batch_size=64))
    batch = ReadBatch.from_pairs(
        ["x"], [5], ["N" * 60], ["I" * 60], ["N" * 60], ["I" * 60])
    # wholly unalignable pair emits nothing (the reference's
    # append_alignments yields no records for it)
    assert al.align_batch_to_sam(batch) == []


def test_single_pair(idx):
    gs = to_str(idx.text)
    al = Aligner(idx, config.RunConfig(batch_size=64))
    from tests.simulate import revcomp_str
    r1 = gs[1000:1080]
    r2 = revcomp_str(gs[1200:1280])
    batch = ReadBatch.from_pairs(
        ["p"], [9], [r1], ["I" * 80], [r2], ["I" * 80])
    lines = al.align_batch_to_sam(batch)
    assert len(lines) == 2
    assert "\t1001\t" in lines[0] or "\t1001\t" in lines[1]


def test_empty_bucket_file(idx, tmp_path):
    p = tmp_path / "ema-bin-000"
    p.write_text("")
    batch = io_mod.read_special_fastq(str(p))
    assert len(batch.ids) == 0
    al = Aligner(idx, config.RunConfig(batch_size=64))
    assert al.align_batch_to_sam(batch) == []


def test_gzip_special_input(idx, tmp_path):
    gs = to_str(idx.text)
    from tests.simulate import revcomp_str
    bc = "ACGTACGTACGTACGT"
    line = (f"{bc} rd {gs[500:580]} {'I' * 80} "
            f"{revcomp_str(gs[700:780])} {'I' * 80}\n")
    p = tmp_path / "bin.gz"
    with gzip.open(p, "wt") as f:
        f.write(line)
    batch = io_mod.read_special_fastq(str(p))
    assert len(batch.ids) == 1
    al = Aligner(idx, config.RunConfig(batch_size=64))
    lines = al.align_batch_to_sam(batch)
    assert len(lines) == 2 and "BX:Z:" + bc in lines[0]


def test_mixed_read_lengths_batch(idx):
    """Variable-length reads in one batch map each to their true locus.

    Regression: the reverse-complement rows were built with np.putmask,
    whose values are indexed by flat position modulo len(values) — with
    partial masks (variable lengths) that scrambled reads across rows and
    produced confidently wrong alignments."""
    from tests.simulate import revcomp_str, parse_sam_line

    rng = np.random.default_rng(13)
    gs = to_str(idx.text)
    ids, bcs, s1, q1, s2, q2, want = [], [], [], [], [], [], []
    for i in range(60):
        L1 = int(rng.integers(40, 121))
        L2 = int(rng.integers(40, 121))
        p = int(rng.integers(0, len(gs) - 600))
        q = p + int(rng.integers(L1 + 20, 400))
        ids.append(f"v{i}")
        bcs.append(i // 10)
        s1.append(gs[p:p + L1])
        q1.append("I" * L1)
        s2.append(revcomp_str(gs[q:q + L2]))
        q2.append("I" * L2)
        want.append((p + 1, q + 1))
    al = Aligner(idx, config.RunConfig(batch_size=16))
    batch = ReadBatch.from_pairs(ids, bcs, s1, q1, s2, q2)
    lines = al.align_batch_to_sam(batch)
    assert len(lines) == 120
    for ln in lines:
        r = parse_sam_line(ln)
        assert not r["flag"] & 4
        i = int(r["qname"][1:])
        w = want[i][1] if r["flag"] & 128 else want[i][0]
        assert abs(r["pos"] - w) <= 5, (r["qname"], r["pos"], w)


def test_indel_reads_get_indel_cigars(idx):
    """Reads with planted indels take the C++ DP path and come out with
    I/D CIGARs at the true positions (the gapless shortcut must not
    swallow them)."""
    from tests.simulate import parse_sam_line, revcomp_str

    rng = np.random.default_rng(5)
    gs = to_str(idx.text)
    ids, bcs, s1, q1, s2, q2, want, kinds = [], [], [], [], [], [], [], []
    for i in range(45):
        p = int(rng.integers(0, len(gs) - 600))
        q = p + int(rng.integers(150, 400))
        r1 = gs[p:p + 100]
        kind = ["del", "ins", "none"][i % 3]
        if kind == "del":
            r1 = gs[p:p + 40] + gs[p + 42:p + 102]
        elif kind == "ins":
            r1 = gs[p:p + 40] + "AC" + gs[p + 40:p + 98]
        ids.append(f"i{i}")
        bcs.append(i // 9)
        s1.append(r1)
        q1.append("I" * len(r1))
        s2.append(revcomp_str(gs[q:q + 100]))
        q2.append("I" * 100)
        want.append((p + 1, q + 1))
        kinds.append(kind)
    al = Aligner(idx, config.RunConfig(batch_size=16))
    batch = ReadBatch.from_pairs(ids, bcs, s1, q1, s2, q2)
    lines = al.align_batch_to_sam(batch)
    cig_ok = 0
    for ln in lines:
        r = parse_sam_line(ln)
        assert not r["flag"] & 4
        i = int(r["qname"][1:])
        w = want[i][1] if r["flag"] & 128 else want[i][0]
        assert abs(r["pos"] - w) <= 3
        if not r["flag"] & 128:
            k = kinds[i]
            cig_ok += (("D" in r["cigar"]) if k == "del" else
                       ("I" in r["cigar"]) if k == "ins" else
                       (r["cigar"] == "100M"))
    assert cig_ok == 45


def test_wide_deletion_spanning_reads(idx):
    """Reads spanning 30-50bp deletions get full M-D-M CIGARs.

    Regression: the chain window's upper bound used diag_min instead of
    diag_max, truncating any deletion wider than the window pad (24bp)."""
    from tests.simulate import parse_sam_line, revcomp_str

    gs = to_str(idx.text)
    ids, s1, s2, want = [], [], [], {}
    for i, D in enumerate([30, 50]):
        p = 5_000 + i * 3_000
        ids.append(f"del{D}")
        s1.append(gs[p:p + 60] + gs[p + 60 + D:p + 60 + D + 90])
        s2.append(revcomp_str(gs[p + 400:p + 500]))
        want[f"del{D}"] = (p + 1, f"{D}D")
    al = Aligner(idx, config.RunConfig(batch_size=16))
    batch = ReadBatch.from_pairs(ids, [1, 2], s1, ["I" * 150] * 2,
                                 s2, ["I" * 100] * 2)
    got = {}
    for ln in al.align_batch_to_sam(batch):
        r = parse_sam_line(ln)
        if not r["flag"] & 128 and not r["flag"] & 4:
            got[r["qname"]] = (r["pos"], r["cigar"])
    for name, (pos, dop) in want.items():
        assert got[name][0] == pos, (name, got[name])
        assert dop in got[name][1], (name, got[name])


def test_pcr_duplicates_marked(idx):
    """Identical pairs in one barcode: all but one flagged 0x400
    (Lariat-definition dup key, align.c:574-585)."""
    from tests.simulate import parse_sam_line, revcomp_str

    gs = to_str(idx.text)
    r1 = gs[2000:2100]
    r2 = revcomp_str(gs[2200:2300])
    ids = [f"d{i}" for i in range(4)]
    al = Aligner(idx, config.RunConfig(batch_size=16))
    batch = ReadBatch.from_pairs(
        ids, [7] * 4, [r1] * 4, ["I" * 100] * 4, [r2] * 4, ["I" * 100] * 4)
    lines = al.align_batch_to_sam(batch)
    assert len(lines) == 8
    dup_flags = {}
    for ln in lines:
        r = parse_sam_line(ln)
        dup_flags.setdefault(r["qname"], True)
        dup_flags[r["qname"]] &= bool(r["flag"] & 1024)
    n_dup_pairs = sum(dup_flags.values())
    assert n_dup_pairs == 3, dup_flags        # one original, three dups


def test_contig_boundaries_and_overhangs():
    """Reads at contig starts/ends, overhanging a contig end (soft-clip),
    and a reverse-strand read 1 all land at their true loci."""
    from tests.simulate import parse_sam_line, revcomp_str

    rng = np.random.default_rng(6)
    c1, c2 = rand_genome(rng, 50_000), rand_genome(rng, 50_000)
    midx = build_index({"cA": c1, "cB": c2})
    g1, g2 = to_str(c1), to_str(c2)
    over = g2[-60:] + to_str(rng.integers(0, 4, 40))
    cases = [
        ("startB", g2[:100], "cB", 1, "100M"),
        ("endA", g1[-100:], "cA", 49901, "100M"),
        ("overB", over, "cB", 49941, "60M40S"),
        ("revread", revcomp_str(g1[10000:10100]), "cA", 10001, "100M"),
    ]
    ids = [c[0] for c in cases]
    s1 = [c[1] for c in cases]
    s2 = [revcomp_str(g1[20000 + i * 500:20100 + i * 500])
          for i in range(len(cases))]
    al = Aligner(midx, config.RunConfig(batch_size=16))
    batch = ReadBatch.from_pairs(ids, list(range(len(ids))), s1,
                                 ["I" * len(x) for x in s1],
                                 s2, ["I" * 100] * len(s2))
    got = {}
    for ln in al.align_batch_to_sam(batch):
        r = parse_sam_line(ln)
        if not r["flag"] & 128 and not r["flag"] & 4:
            got[r["qname"]] = (r["rname"], r["pos"], r["cigar"])
    for name, _, chrom, pos, cigar in cases:
        assert got[name] == (chrom, pos, cigar), (name, got.get(name))
    assert got["revread"][0] == "cA"


def test_inverted_repeat_strand_mapping():
    """A read inside an inverted repeat must get BOTH candidates: forward
    at the original copy and reverse at the mirrored position inside the
    inverted copy (exercises the both-strands FM coordinate mapping)."""
    from tests.simulate import revcomp_str

    rng = np.random.default_rng(42)
    g = rand_genome(rng, 60_000)
    seg = g[10_000:11_000]
    g[40_000:41_000] = (3 - seg)[::-1]
    midx = build_index({"cI": g})
    gs = to_str(g)
    r1 = gs[10_200:10_300]
    r2 = revcomp_str(gs[15_000:15_100])
    al = Aligner(midx, config.RunConfig(batch_size=16))
    batch = ReadBatch.from_pairs(["ir0"], [5], [r1], ["I" * 100],
                                 [r2], ["I" * 100])
    cs = al.generate_candidates(batch)
    got = {(int(cs.rev[k]), int(cs.pos_local[k]), int(cs.sw[k]))
           for k in np.nonzero(cs.owner == 0)[0]}
    # rc copy: revcomp(seg[200:300]) sits at seg-offset 700 of the
    # inverted copy -> text pos 40700 (1-based 40701)
    assert (0, 10_201, 100) in got, got
    assert (1, 40_701, 100) in got, got


def test_long_contig_names():
    """Very long contig names (draft-assembly scaffolds) must not overflow
    the native SAM formatter's buffer (regression: the per-record budget
    omitted chromosome-name lengths — confirmed heap corruption)."""
    from tests.simulate import parse_sam_line, revcomp_str

    rng = np.random.default_rng(4)
    name = "scaffold_" + "x" * 800
    g = rand_genome(rng, 30_000)
    midx = build_index({name: g})
    gs = to_str(g)
    al = Aligner(midx, config.RunConfig(batch_size=16))
    # ambiguity via a duplicated kb so an XA alt (third chrom-name copy
    # in the line) is emitted too
    batch = ReadBatch.from_pairs(
        ["ln0"] * 1, [2], [gs[1000:1080]], ["I" * 80],
        [revcomp_str(gs[1200:1280])], ["I" * 80])
    lines = al.align_batch_to_sam(batch)
    assert len(lines) == 2
    for ln in lines:
        r = parse_sam_line(ln)
        assert r["rname"] == name
        assert r["rnext"] in ("=", name)


def test_reads_shorter_than_seed(idx):
    al = Aligner(idx, config.RunConfig(batch_size=64))
    batch = ReadBatch.from_pairs(
        ["s"], [3], ["ACGTACGT"], ["I" * 8], ["TTTTAAAA"], ["I" * 8])
    # shorter than min_seed_len: no seeds, no crash, no output
    assert al.align_batch_to_sam(batch) == []
