"""SMEM seeding property tests: the native bi-interval enumeration
(bwt_smem1 semantics, reference seeding via mem_align1_core at
bwabridge.c:236-237) vs a brute-force SMEM enumerator over the FM text
(both strands, exactly as the index stores it)."""

import numpy as np
import pytest

from ema_tpu import native
from ema_tpu.index import build_index
from tests.simulate import rand_genome, to_str


def brute_smems(text2: str, read: str, min_len: int):
    """All supermaximal exact matches of read in text2 with their counts."""
    L = len(read)
    out = {}
    for b in range(L):
        e = b
        while e < L and text2.find(read[b:e + 1]) >= 0:
            e += 1
        if e == b:
            continue
        # right-maximal by construction; left-maximal unless the extended
        # string also occurs
        if b > 0 and text2.find(read[b - 1:e]) >= 0:
            continue
        if e - b >= min_len:
            out[(b, e)] = _count_occ(text2, read[b:e])
    return out


def _count_occ(text2: str, s: str) -> int:
    n = start = 0
    while True:
        i = text2.find(s, start)
        if i < 0:
            return n
        n += 1
        start = i + 1


def _smem_call(idx, reads_codes, lens, min_len, **kw):
    return native.smem_seed_batch(
        idx.occ_blocks, idx.counts, idx.primary, idx.fm_n,
        reads_codes, lens, min_seed_len=min_len,
        split_len=kw.get("split_len", 10**6),
        split_width=kw.get("split_width", 10),
        max_mem_intv=kw.get("max_mem_intv", 0),
        max_seeds=64, n_threads=1)


BASES = "ACGT"


def _encode(read: str) -> np.ndarray:
    lut = {c: i for i, c in enumerate(BASES)}
    return np.array([lut.get(c, 4) for c in read], np.uint8)


@pytest.mark.parametrize("seed,glen", [(0, 2000), (1, 4000), (2, 1000)])
def test_smem_matches_bruteforce(seed, glen):
    rng = np.random.default_rng(seed)
    g = rand_genome(rng, glen)
    # make it repetitive: duplicate a chunk
    g[glen // 2:glen // 2 + 200] = g[100:300]
    gs = to_str(g)
    idx = build_index({"c": g})
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    text2 = gs + "".join(comp[c] for c in reversed(gs))

    reads = []
    for _ in range(25):
        ln = int(rng.integers(30, 90))
        p = int(rng.integers(0, glen - ln))
        r = list(gs[p:p + ln])
        for k in range(len(r)):        # ~5% mutations -> multiple SMEMs
            if rng.random() < 0.05:
                r[k] = BASES[int(rng.integers(0, 4))]
        reads.append("".join(r))
    reads.append("".join(BASES[int(rng.integers(0, 4))]
                         for _ in range(60)))     # mostly-random read

    min_len = 12
    L = max(len(r) for r in reads)
    codes = np.full((len(reads), L), 4, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = _encode(r)
        lens[i] = len(r)

    s_lo, s_hi, s_qb, s_len, n_seeds = _smem_call(idx, codes, lens, min_len)

    for i, r in enumerate(reads):
        want = brute_smems(text2, r, min_len)
        got = {}
        for t in range(int(n_seeds[i])):
            span = (int(s_qb[i, t]), int(s_qb[i, t]) + int(s_len[i, t]))
            got[span] = int(s_hi[i, t]) - int(s_lo[i, t])
        assert got == want, (i, r, sorted(got), sorted(want))


def test_smem_reseeding_splits_long_unique_mems():
    """Round 2 (BWA re-seeding) recovers sub-seeds inside a long MEM that
    spans a repeat copy: the full-length MEM is unique, but its middle
    matches many copies."""
    rng = np.random.default_rng(7)
    g = rand_genome(rng, 6000)
    unit = g[1000:1100].copy()
    for s in range(2000, 4000, 100):     # 20 extra copies of the unit
        g[s:s + 100] = unit
    idx = build_index({"c": g})
    gs = to_str(g)
    # read = unique flank + one unit copy + unique flank (from pos 950)
    read = gs[950:1150]
    codes = _encode(read)[None, :]
    lens = np.array([len(read)], np.int32)

    # without re-seeding: the whole read is one unique SMEM
    *_, n0 = _smem_call(idx, codes, lens, 19)
    s_lo, s_hi, s_qb, s_len, n1 = native.smem_seed_batch(
        idx.occ_blocks, idx.counts, idx.primary, idx.fm_n, codes, lens,
        min_seed_len=19, split_len=28, split_width=10, max_mem_intv=0,
        max_seeds=64, n_threads=1)
    assert int(n1[0]) > int(n0[0])
    widths = (s_hi[0, :n1[0]] - s_lo[0, :n1[0]])
    assert widths.max() >= 20            # a seed hitting all the copies

def test_pipeline_with_smem_seeding_matches_greedy():
    """End-to-end: the smem seeder drives the same pipeline and places
    reads identically to greedy on clean data."""
    import dataclasses

    from ema_tpu import config
    from ema_tpu.core.pipeline import Aligner, ReadBatch
    from tests.simulate import parse_sam_line, simulate_pairs

    rng = np.random.default_rng(23)
    g = rand_genome(rng, 120_000)
    idx = build_index({"c1": g})
    ids, bc_strs, bcs, s1, q1, s2, q2, truth = simulate_pairs(
        rng, to_str(g), n_barcodes=4)
    batch = ReadBatch.from_pairs(ids, bcs, s1, q1, s2, q2)
    outs = {}
    for mode in ("greedy", "smem"):
        params = dataclasses.replace(config.DEFAULT_ALIGNER_PARAMS,
                                     seeding=mode)
        al = Aligner(idx, config.RunConfig(batch_size=64, aligner=params))
        outs[mode] = {}
        for ln in al.align_batch_to_sam(batch):
            d = parse_sam_line(ln)
            outs[mode][(d["qname"], d["flag"] & 0xC0)] = (
                d["rname"], d["pos"], d["cigar"])
    assert outs["greedy"] == outs["smem"]
    assert len(outs["smem"]) >= 2 * len(ids) * 0.98


def test_smem_kmer_table_output_identical():
    """The round-3 k-mer jump table must not change seeding output:
    random reads (with Ns crossing the k-window) seeded with and without
    the table yield identical seed arrays, across several k."""
    rng = np.random.default_rng(31)
    g = rand_genome(rng, 60_000)
    # embed repeat copies so round 3 has sub-max_intv emissions to make
    idx = build_index({"c1": g})
    n, L = 64, 100
    text = to_str(g)
    reads = []
    for i in range(n):
        p = int(rng.integers(0, len(text) - L))
        r = list(text[p:p + L])
        for j in range(int(rng.integers(0, 4))):       # errors
            r[int(rng.integers(0, L))] = BASES[int(rng.integers(0, 4))]
        for j in range(int(rng.integers(0, 2))):       # Ns
            r[int(rng.integers(0, L))] = "N"
        reads.append("".join(r))
    codes = np.stack([_encode(r) for r in reads])
    lens = np.full(n, L, np.int32)

    def run(tab):
        return native.smem_seed_batch(
            idx.occ_blocks, idx.counts, idx.primary, idx.fm_n, codes,
            lens, min_seed_len=19, split_len=28, split_width=10,
            max_mem_intv=20, max_seeds=64, n_threads=1, kmer_tab=tab)

    base = run(None)
    for k in (4, 8, 10):
        tab = native.smem_kmer_table(idx.occ_blocks, idx.counts,
                                     idx.primary, idx.fm_n, k=k)
        got = run(tab)
        for a, b in zip(base, got):
            assert np.array_equal(a, b), f"k={k} changed seeding output"
    # table k > min_seed_len must be refused (falls back to no table)
    tab = native.smem_kmer_table(idx.occ_blocks, idx.counts, idx.primary,
                                 idx.fm_n, k=4)
    got = native.smem_seed_batch(
        idx.occ_blocks, idx.counts, idx.primary, idx.fm_n, codes, lens,
        min_seed_len=3, split_len=28, split_width=10, max_mem_intv=20,
        max_seeds=64, n_threads=1, kmer_tab=tab)


def test_interleaved_driver_identical_to_scalar(monkeypatch):
    """The interleaved W-lane SMEM driver (latency-hiding state machines,
    the default at genome-scale occ sizes) must be bit-identical to the
    scalar per-read loop on every plane, including reads with Ns,
    zero/short lengths, re-seeding (round 2), LAST rounds with and
    without the k-mer jump table, and the max_seeds cap."""
    rng = np.random.default_rng(123)
    genome = rand_genome(rng, 200_000)
    idx = build_index({"c": genome})
    text = to_str(genome)
    reads = []
    for _ in range(400):
        L = int(rng.integers(0, 140))
        if L and rng.random() < 0.7:           # planted read with errors
            p = int(rng.integers(0, max(len(text) - L, 1)))
            r = list(text[p:p + L])
            for _ in range(int(rng.integers(0, 4))):
                r[int(rng.integers(0, max(len(r), 1)))] = "N" \
                    if rng.random() < 0.3 else BASES[int(rng.integers(4))]
            reads.append("".join(r))
        else:                                   # random (incl. empty)
            reads.append("".join(
                rng.choice(list(BASES + "N"), size=L)))
    Lm = max((len(r) for r in reads), default=1) or 1
    codes = np.full((len(reads), Lm), 4, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = _encode(r)
        lens[i] = len(r)
    ktab = native.smem_kmer_table(idx.occ_blocks, idx.counts, idx.primary,
                                  idx.fm_n, k=8)
    for kw in (dict(max_mem_intv=0, kmer_tab=None),
               dict(max_mem_intv=20, kmer_tab=None),
               dict(max_mem_intv=20, kmer_tab=ktab),
               dict(max_mem_intv=20, kmer_tab=ktab, max_seeds=4)):
        outs = {}
        for mode in ("0", "1"):
            monkeypatch.setenv("EMA_TPU_SMEM_ILV", mode)
            outs[mode] = native.smem_seed_batch(
                idx.occ_blocks, idx.counts, idx.primary, idx.fm_n,
                codes, lens, min_seed_len=12, split_len=18,
                split_width=10, n_threads=1, **kw)
        for a, b in zip(outs["0"], outs["1"]):
            np.testing.assert_array_equal(a, b)
