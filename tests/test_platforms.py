"""Platform-mode CLI end-to-end: -1/-2 FASTQ input with per-platform
barcode extraction from read IDs (reference src/techs.c:5-69), plus the
haplotag special-bucket path and the BX tag formats."""

import numpy as np
import pytest

from ema_tpu import cli
from tests.simulate import (parse_sam_line, rand_genome, revcomp_str,
                            simulate_pairs, to_str)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("plat")
    rng = np.random.default_rng(11)
    genome = rand_genome(rng, 80_000)
    gs = to_str(genome)
    fa = tmp / "ref.fa"
    fa.write_text(">c1\n" + "\n".join(
        gs[i:i + 70] for i in range(0, len(gs), 70)) + "\n")
    ids, bc_strs, bcs, s1, q1, s2, q2, truth = simulate_pairs(
        rng, gs, n_barcodes=4, frags_per_bc=(1, 2), pairs_per_frag=(5, 9),
        frag_len=15_000, read_len=80, err=0.002)
    return tmp, fa, ids, bc_strs, s1, q1, s2, q2, truth


def _write_pair_fastqs(tmp, name, rids, s1, q1, s2, q2):
    f1, f2 = tmp / f"{name}_1.fq", tmp / f"{name}_2.fq"
    with open(f1, "w") as a, open(f2, "w") as b:
        for i in range(len(rids)):
            a.write(f"@{rids[i]}\n{s1[i]}\n+\n{q1[i]}\n")
            b.write(f"@{rids[i]}\n{s2[i]}\n+\n{q2[i]}\n")
    return str(f1), str(f2)


def _check_sam(path, truth_by_id, bc_of_id, want_bx_prefix):
    recs = [parse_sam_line(ln) for ln in open(path)
            if not ln.startswith("@")]
    assert recs, "no SAM records"
    ok = 0
    for r in recs:
        if r["flag"] & 4:
            continue
        t = truth_by_id[r["qname"]]
        want = t["pos2"] if r["flag"] & 128 else t["pos1"]
        if abs(r["pos"] - want) <= 5:
            ok += 1
        bx = r["tags"].get("BX", "")
        assert bx.startswith(want_bx_prefix(bc_of_id[r["qname"]])), bx
    assert ok / len(recs) > 0.9
    return recs


def test_align_pair_mode_10x(world):
    tmp, fa, ids, bc_strs, s1, q1, s2, q2, truth = world
    rids = [f"{ids[i]}:{bc_strs[i]}" for i in range(len(ids))]
    f1, f2 = _write_pair_fastqs(tmp, "tenx", rids, s1, q1, s2, q2)
    out = str(tmp / "tenx.sam")
    assert cli.main(["align", "-r", str(fa), "-1", f1, "-2", f2,
                     "-o", out, "-p", "10x"]) == 0
    tb = {ids[i]: truth[i] for i in range(len(ids))}
    bc = {ids[i]: bc_strs[i] for i in range(len(ids))}
    _check_sam(out, tb, bc, lambda b: b + "-1")


def test_align_pair_mode_tellseq(world):
    tmp, fa, ids, bc_strs, s1, q1, s2, q2, truth = world
    bc18 = [b + "AC" for b in bc_strs]       # tellseq: 18bp barcodes
    rids = [f"{ids[i]} BX:Z:{bc18[i]}" for i in range(len(ids))]
    f1, f2 = _write_pair_fastqs(tmp, "tell", rids, s1, q1, s2, q2)
    out = str(tmp / "tell.sam")
    assert cli.main(["align", "-r", str(fa), "-1", f1, "-2", f2,
                     "-o", out, "-p", "tellseq"]) == 0
    tb = {ids[i]: truth[i] for i in range(len(ids))}
    bc = {ids[i]: bc18[i] for i in range(len(ids))}
    _check_sam(out, tb, bc, lambda b: b + "-1")


def test_align_special_mode_haplotag(world):
    tmp, fa, ids, bc_strs, s1, q1, s2, q2, truth = world
    rng = np.random.default_rng(3)
    hts = {}
    for b in sorted(set(bc_strs)):
        a, c, bb, d = rng.integers(1, 97, 4)
        hts[b] = f"A{a:02d}C{c:02d}B{bb:02d}D{d:02d}"
    bucket = tmp / "hap-bin-000"
    with open(bucket, "w") as f:
        for i in range(len(ids)):
            f.write(f"{hts[bc_strs[i]]} {ids[i]} {s1[i]} {q1[i]} "
                    f"{s2[i]} {q2[i]}\n")
    out = str(tmp / "hap.sam")
    assert cli.main(["align", "-r", str(fa), "-s", str(bucket),
                     "-o", out, "-p", "haplotag"]) == 0
    tb = {ids[i]: truth[i] for i in range(len(ids))}
    bc = {ids[i]: hts[bc_strs[i]] for i in range(len(ids))}
    # haplotag BX is the raw code, no "-index" suffix (samrecord.c BX path)
    _check_sam(out, tb, bc, lambda b: b)


def test_align_nobc_mode(world):
    """--nobc: plain paired alignment, no linked-read tags (the in-house
    replacement for `bwa mem` on preproc's ema-nobc output)."""
    tmp, fa, ids, bc_strs, s1, q1, s2, q2, truth = world
    f1, f2 = _write_pair_fastqs(tmp, "nobc", ids, s1, q1, s2, q2)
    out = str(tmp / "nobc.sam")
    assert cli.main(["align", "-r", str(fa), "-1", f1, "-2", f2,
                     "-o", out, "--nobc"]) == 0
    tb = {ids[i]: truth[i] for i in range(len(ids))}
    recs = [parse_sam_line(ln) for ln in open(out)
            if not ln.startswith("@")]
    assert recs
    ok = 0
    for r in recs:
        assert "BX" not in r["tags"] and "MI" not in r["tags"] \
            and "XG" not in r["tags"], r["tags"]
        if r["flag"] & 4:
            continue
        assert "NM" in r["tags"]
        t = tb[r["qname"]]
        want = t["pos2"] if r["flag"] & 128 else t["pos1"]
        ok += abs(r["pos"] - want) <= 5
    assert ok / len(recs) > 0.9


def test_haplotag_preproc_chain(world, tmp_path):
    """count -p -> preproc -p -> align -p haplotag end-to-end (the
    reference's haplotag flow: BX:Z: header codes, no correction, no
    read-1 trim — correct.cc:291, 437-451, 543-551)."""
    tmp, fa, ids, bc_strs, s1, q1, s2, q2, truth = world
    rng = np.random.default_rng(8)
    hts = {}
    for b in sorted(set(bc_strs)):
        a, c, bb, d = rng.integers(1, 97, 4)
        hts[b] = f"A{a:02d}C{c:02d}B{bb:02d}D{d:02d}"
    inter = tmp_path / "hap.fq"
    with open(inter, "w") as f:
        for i in range(len(ids)):
            hdr = f"@{ids[i]} BX:Z:{hts[bc_strs[i]]}"
            f.write(f"{hdr}\n{s1[i]}\n+\n{q1[i]}\n")
            f.write(f"{hdr}\n{s2[i]}\n+\n{q2[i]}\n")

    import contextlib
    import io as io_std

    from ema_tpu.preproc.count import count
    from ema_tpu.preproc.correct import correct

    with open(inter, "rb") as f:
        st = count(None, str(tmp_path / "hc"), f, is_haplotag=True)
    assert st["nice"] == len(ids)
    with open(inter, "rb") as f:
        st = correct(None, [str(tmp_path / "hc.ema-ncnt")],
                     str(tmp_path / "hout"), f, n_buckets=2,
                     is_haplotag=True)
    # the reference's stale-length BX check (correct.cc:441-444) always
    # drops the FIRST haplotag pair; we replicate it for byte parity
    # (verified against the compiled reference in test_oracle_preproc)
    assert st["routed_pairs"] == len(ids) - 1
    assert st["dropped_pairs"] == 1
    assert st["nobucket"] == 0

    # buckets must not trim read 1 and must carry 12-char haplotag codes
    n_lines = 0
    tb = {ids[i]: truth[i] for i in range(len(ids))}
    for b in range(2):
        bucket = tmp_path / "hout" / f"ema-bin-{b:03d}"
        lines = [ln for ln in open(bucket).read().splitlines() if ln]
        n_lines += len(lines)
        for ln in lines[:3]:
            fields = ln.split(" ")
            assert len(fields[0]) == 12 and fields[0][0] == "A"
            assert len(fields[2]) == len(s1[0])      # untrimmed
        out = str(tmp_path / f"hap{b}.sam")
        assert cli.main(["align", "-r", str(fa), "-s", str(bucket),
                         "-o", out, "-p", "haplotag"]) == 0
        recs = [parse_sam_line(x) for x in open(out)
                if not x.startswith("@")]
        for r in recs[:20]:
            assert r["tags"].get("BX", "").startswith("A")
    assert n_lines == len(ids) - 1


def test_align_pair_mode_tru_many_clouds(world):
    """-p tru: integer read-ID barcodes, many_clouds weight normalization."""
    tmp, fa, ids, bc_strs, s1, q1, s2, q2, truth = world
    bc_num = {b: 1000 + i for i, b in enumerate(sorted(set(bc_strs)))}
    rids = [f"{bc_num[bc_strs[i]]}-{ids[i]}" for i in range(len(ids))]
    f1, f2 = _write_pair_fastqs(tmp, "tru", rids, s1, q1, s2, q2)
    out = str(tmp / "tru.sam")
    assert cli.main(["align", "-r", str(fa), "-1", f1, "-2", f2,
                     "-o", out, "-p", "tru"]) == 0
    recs = [parse_sam_line(ln) for ln in open(out)
            if not ln.startswith("@")]
    assert recs
    tb = {rids[i]: truth[i] for i in range(len(ids))}
    ok = 0
    for r in recs:
        if r["flag"] & 4:
            continue
        t = tb[r["qname"]]
        want = t["pos2"] if r["flag"] & 128 else t["pos1"]
        ok += abs(r["pos"] - want) <= 5
        assert "MI" in r["tags"]
    assert ok / len(recs) > 0.9


def test_xa_alt_emitted_for_ambiguous_read():
    """A read mapping equally to a duplicated segment gets XA + low mapq."""
    from ema_tpu.core.pipeline import Aligner, ReadBatch
    from ema_tpu.index import build_index
    from tests.simulate import rand_genome, revcomp_str, to_str

    rng = np.random.default_rng(17)
    g = rand_genome(rng, 40_000)
    g[30_000:31_000] = g[5_000:6_000]        # exact duplicated kb
    idx = build_index({"c1": g})
    gs = to_str(g)
    from ema_tpu import config as cfg_mod
    al = Aligner(idx, cfg_mod.RunConfig(batch_size=64))
    # read inside the duplicated segment; mate in unique flank, too far
    # for pairing to disambiguate (so both copies stay equally likely)
    r1 = gs[5_200:5_280]
    r2 = revcomp_str(gs[20_000:20_080])
    batch = ReadBatch.from_pairs(["amb"], [3], [r1], ["I" * 80],
                                 [r2], ["I" * 80])
    lines = al.align_batch_to_sam(batch)
    rec1 = [parse_sam_line(ln) for ln in lines
            if not int(parse_sam_line(ln)["flag"]) & 128]
    assert rec1
    r = rec1[0]
    assert r["mapq"] <= 3                     # ambiguous
    assert "XA" in r["tags"], r["tags"]
    alt_pos = int(r["tags"]["XA"].split(",")[1].lstrip("+-"))
    assert {r["pos"], alt_pos} == {5201, 30201}


def test_align_pair_mode_cpt(world):
    """-p cpt: numeric barcode after the last colon, many_clouds, 3.5kb
    cloud threshold (techs.c:57-69, 109-117)."""
    tmp, fa, ids, bc_strs, s1, q1, s2, q2, truth = world
    bc_num = {b: 500 + i for i, b in enumerate(sorted(set(bc_strs)))}
    rids = [f"{ids[i]}:BC{bc_num[bc_strs[i]]}" for i in range(len(ids))]
    f1, f2 = _write_pair_fastqs(tmp, "cpt", rids, s1, q1, s2, q2)
    out = str(tmp / "cpt.sam")
    assert cli.main(["align", "-r", str(fa), "-1", f1, "-2", f2,
                     "-o", out, "-p", "cpt"]) == 0
    recs = [parse_sam_line(ln) for ln in open(out)
            if not ln.startswith("@")]
    assert recs
    tb = {ids[i]: truth[i] for i in range(len(ids))}
    ok = 0
    for r in recs:
        if r["flag"] & 4:
            continue
        t = tb[r["qname"]]
        want = t["pos2"] if r["flag"] & 128 else t["pos1"]
        ok += abs(r["pos"] - want) <= 5
    assert ok / len(recs) > 0.9


def test_cli_count_preproc_stdin(world, tmp_path, monkeypatch):
    """count/preproc via cli.main with stdin plumbing (reference usage:
    `ema count ... < interleaved.fq`)."""
    import io as io_std

    tmp, fa, ids, bc_strs, s1, q1, s2, q2, truth = world
    wl = tmp_path / "wl.txt"
    wl.write_text("".join(b + "\n" for b in sorted(set(bc_strs))))
    fq = []
    for i in range(len(ids)):
        r1 = bc_strs[i] + "ACGTACG" + s1[i]
        fq.append(f"@{ids[i]}\n{r1}\n+\n{'I' * len(r1)}\n"
                  f"@{ids[i]}\n{s2[i]}\n+\n{'I' * len(s2[i])}\n")
    blob = "".join(fq).encode()

    class FakeStdin:
        buffer = io_std.BytesIO(blob)

    monkeypatch.setattr("sys.stdin", FakeStdin)
    assert cli.main(["count", "-w", str(wl),
                     "-o", str(tmp_path / "c")]) == 0
    assert (tmp_path / "c.ema-ncnt").exists()
    FakeStdin.buffer = io_std.BytesIO(blob)
    assert cli.main(["preproc", "-w", str(wl), "-o",
                     str(tmp_path / "bkt"), "-n", "2",
                     str(tmp_path / "c.ema-ncnt")]) == 0
    assert (tmp_path / "bkt" / "ema-bin-000").exists()
    assert cli.main(["preproc", "-o", str(tmp_path / "x")]) == 1  # no -w


def test_align_interleaved_single_file(world):
    tmp, fa, ids, bc_strs, s1, q1, s2, q2, truth = world
    rids = [f"{ids[i]}:{bc_strs[i]}" for i in range(len(ids))]
    inter = tmp / "inter.fq"
    with open(inter, "w") as f:
        for i in range(len(ids)):
            f.write(f"@{rids[i]}\n{s1[i]}\n+\n{q1[i]}\n")
            f.write(f"@{rids[i]}\n{s2[i]}\n+\n{q2[i]}\n")
    out = str(tmp / "inter.sam")
    assert cli.main(["align", "-r", str(fa), "-1", str(inter),
                     "-o", out, "-p", "10x"]) == 0
    tb = {ids[i]: truth[i] for i in range(len(ids))}
    bc = {ids[i]: bc_strs[i] for i in range(len(ids))}
    _check_sam(out, tb, bc, lambda b: b + "-1")


def test_align_pair_mode_dbs(world):
    """dbs: 20bp barcodes from the trailing :<bc> of the read ID
    (reference techs.c:18-29 extractor shared with 10x; profile
    techs.c:106-112)."""
    tmp, fa, ids, bc_strs, s1, q1, s2, q2, truth = world
    rng = np.random.default_rng(41)
    bases = "ACGT"
    bc20 = {b: "".join(bases[int(c)] for c in rng.integers(0, 4, 20))
            for b in set(bc_strs)}
    rids = [f"{ids[i]}:{bc20[bc_strs[i]]}" for i in range(len(ids))]
    f1, f2 = _write_pair_fastqs(tmp, "dbs", rids, s1, q1, s2, q2)
    out = str(tmp / "dbs.sam")
    assert cli.main(["align", "-r", str(fa), "-1", f1, "-2", f2,
                     "-o", out, "-p", "dbs"]) == 0
    tb = {ids[i]: truth[i] for i in range(len(ids))}
    bc = {ids[i]: bc20[bc_strs[i]] for i in range(len(ids))}
    _check_sam(out, tb, bc, lambda b: b + "-1")
