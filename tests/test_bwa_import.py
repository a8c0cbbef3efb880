"""BWA index importer: .pac/.ann/.amb -> contigs -> identical align output.

No bwa binary exists in this environment (the reference's bwa submodule
is empty), so the fixtures are written by a test-local dumper that
follows bwa's bns_dump/bwa_dump_pac on-disk format exactly (bntseq.c):
  .ann  "l_pac n_seqs seed" + per-seq name/offset/len lines
  .amb  "l_pac n_seqs n_holes" + "offset len char" hole records
  .pac  2-bit codes, base i at byte i>>2 bits (~i&3)<<1, length trailer
The import contract verified here: codes round-trip exactly, hole runs
come back as 255 (N), and an end-to-end align over a --from-bwa-built
index is byte-identical to the FASTA-built one.
"""

from __future__ import annotations

import numpy as np
import pytest

from ema_tpu.index.build import parse_fasta
from ema_tpu.index.bwa_import import load_bwa_contigs


def dump_bwa_files(prefix, contigs):
    """Write .pac/.ann/.amb for {name: uint8 codes (0-3, 255=N)} the way
    bwa index does (bntseq.c bns_dump + bwa_dump_pac), randomizing hole
    bases in the pac like bwa (any value works: the importer overwrites
    holes with 255)."""
    names = list(contigs)
    arrs = [np.asarray(contigs[k], np.uint8) for k in names]
    lens = [a.shape[0] for a in arrs]
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    text = np.concatenate(arrs) if arrs else np.zeros(0, np.uint8)
    l_pac = text.shape[0]

    # holes: runs of non-ACGT, globally
    bad = text > 3
    d = np.diff(np.concatenate([[0], bad.view(np.int8), [0]]))
    starts = np.nonzero(d == 1)[0]
    ends = np.nonzero(d == -1)[0]

    with open(f"{prefix}.ann", "w") as f:
        f.write(f"{l_pac} {len(names)} 11\n")
        n_amb_per = []
        for i, name in enumerate(names):
            lo, hi = offs[i], offs[i] + lens[i]
            k = int(((starts >= lo) & (starts < hi)).sum())
            n_amb_per.append(k)
            f.write(f"0 {name} (null)\n")
            f.write(f"{offs[i]} {lens[i]} {k}\n")

    with open(f"{prefix}.amb", "w") as f:
        f.write(f"{l_pac} {len(names)} {len(starts)}\n")
        for s, e in zip(starts, ends):
            f.write(f"{s} {e - s} N\n")

    # pac: holes randomized (bwa uses lrand48; any filler is fine)
    rng = np.random.default_rng(3)
    t = text.copy()
    t[bad] = rng.integers(0, 4, int(bad.sum()), dtype=np.uint8)
    npad = (-l_pac) % 4
    tp = np.concatenate([t, np.zeros(npad, np.uint8)]).reshape(-1, 4)
    packed = ((tp[:, 0] << 6) | (tp[:, 1] << 4)
              | (tp[:, 2] << 2) | tp[:, 3]).astype(np.uint8)
    with open(f"{prefix}.pac", "wb") as f:
        f.write(packed.tobytes())
        if l_pac % 4 == 0:
            f.write(b"\x00")
        f.write(bytes([l_pac % 4]))


def test_roundtrip_with_holes(tmp_path):
    rng = np.random.default_rng(0)
    c1 = rng.integers(0, 4, 1000).astype(np.uint8)
    c1[100:130] = 255
    c1[997:1000] = 255
    c2 = rng.integers(0, 4, 501).astype(np.uint8)
    c2[0:7] = 255
    contigs = {"chrA": c1, "chrB": c2}
    dump_bwa_files(str(tmp_path / "ref.fa"), contigs)
    got = load_bwa_contigs(str(tmp_path / "ref.fa"))
    assert list(got) == ["chrA", "chrB"]
    for k in contigs:
        assert np.array_equal(got[k], contigs[k]), k


def test_align_identical_to_fasta_index(tmp_path):
    """--from-bwa index -> align gives the exact SAM of a FASTA index."""
    from tests.simulate import rand_genome, simulate_pairs, to_str
    from ema_tpu import config
    from ema_tpu.core.pipeline import Aligner, ReadBatch
    from ema_tpu.index import build_index

    rng = np.random.default_rng(5)
    genome = rand_genome(rng, 60_000)
    genome[5000:5040] = 255          # an N hole in the reference
    fa = tmp_path / "ref.fa"
    alpha = np.frombuffer(b"ACGTN", np.uint8)
    with open(fa, "wb") as f:
        f.write(b">chr1\n")
        f.write(alpha[np.minimum(genome, 4)].tobytes())
        f.write(b"\n")

    contigs_fa = parse_fasta(str(fa))
    dump_bwa_files(str(fa), contigs_fa)
    contigs_bwa = load_bwa_contigs(str(fa))
    assert list(contigs_bwa) == list(contigs_fa)
    for k in contigs_fa:
        assert np.array_equal(contigs_bwa[k], contigs_fa[k])

    idx_fa = build_index(contigs_fa)
    idx_bwa = build_index(contigs_bwa)

    ids, bc_strs, bcs, s1, q1, s2, q2, truth = simulate_pairs(
        rng, to_str(np.where(genome > 3, 0, genome)), n_barcodes=6,
        frags_per_bc=(2, 3), pairs_per_frag=(5, 10), frag_len=8_000,
        read_len=100, err=0.003)
    batch = ReadBatch.from_pairs(ids, bcs, s1, q1, s2, q2)
    sam_fa = Aligner(idx_fa, config.RunConfig()).align_batch_to_sam(batch)
    sam_bwa = Aligner(idx_bwa, config.RunConfig()).align_batch_to_sam(batch)
    assert sam_fa == sam_bwa


def dump_bwa_bwt_sa(prefix, text_randomized, sa_intv=32):
    """Write `.bwt` and `.sa` exactly as `bwa index` does (bwt.c:
    bwt_pac2bwt + bwt_bwtupdate_core + bwt_cal_sa + bwt_dump_bwt/sa,
    OCC_INTERVAL=128), from an independently computed suffix array.

    text_randomized: forward-strand uint8 codes 0..3 (holes already
    randomized, as they are inside a real .pac).
    """
    from ema_tpu import native

    text = np.asarray(text_randomized, np.uint8)
    n = text.shape[0]
    text2 = np.concatenate([text, (3 - text)[::-1]])
    n2 = text2.shape[0]
    sa = native.suffix_array(text2, 4)

    # full row space: row 0 = $ (value n2); primary = row of SA value 0
    full_sa = np.empty(n2 + 1, np.int64)
    full_sa[0] = n2
    full_sa[1:] = sa
    primary = int(np.nonzero(sa == 0)[0][0]) + 1

    # $-removed BWT chars (char of full row r != primary is text2[SA[r]-1])
    keep = np.ones(n2 + 1, bool)
    keep[primary] = False
    bwt = text2[(full_sa[keep] - 1) % n2].astype(np.uint8)

    l2 = np.zeros(5, np.uint64)
    l2[1:] = np.cumsum(np.bincount(text2, minlength=4)[:4]).astype(np.uint64)

    # interleaved buffer: per 128-base chunk, 4 x u64 counts-before +
    # 8 x u32 big-endian-base-order packed words; final 4 x u64 totals
    out = [np.uint64(primary).tobytes(), l2[1:].tobytes()]
    counts = np.zeros(4, np.uint64)
    onehot = np.zeros((n2, 4), np.int64)
    onehot[np.arange(n2), bwt] = 1
    cum = np.concatenate([np.zeros((1, 4), np.int64),
                          np.cumsum(onehot, axis=0)])
    for chunk in range(0, n2, 128):
        out.append(cum[chunk].astype(np.uint64).tobytes())
        seg = bwt[chunk:chunk + 128]
        words = np.zeros(8, np.uint32)
        for j, c in enumerate(seg):
            words[j >> 4] |= np.uint32(c) << np.uint32((15 - (j & 15)) * 2)
        nw = (seg.shape[0] + 15) // 16
        out.append(words[:nw].tobytes())
    out.append(cum[n2].astype(np.uint64).tobytes())
    with open(f"{prefix}.bwt", "wb") as f:
        f.write(b"".join(out))

    # .sa: rank-sampled SA, SA[0] skipped on disk
    n_sa = (n2 + sa_intv) // sa_intv
    samp = full_sa[np.arange(1, n_sa) * sa_intv].astype(np.uint64)
    with open(f"{prefix}.sa", "wb") as f:
        f.write(np.uint64(primary).tobytes())
        f.write(l2[1:].tobytes())
        f.write(np.uint64(sa_intv).tobytes())
        f.write(np.uint64(n2).tobytes())
        f.write(samp.tobytes())


@pytest.mark.parametrize("n,sa_intv", [(1000, 32), (1024, 8), (6400, 32)])
def test_bwt_sa_import_equals_built_index(tmp_path, n, sa_intv):
    """import_bwa_index's FM structures must EXACTLY equal build_index's
    over the same randomized text (n=1024 hits the seq_len%128==0 .bwt
    layout edge; sa_intv=8 a non-default sampling)."""
    from ema_tpu.index.build import build_index
    from ema_tpu.index.bwa_import import import_bwa_index

    rng = np.random.default_rng(n)
    codes = rng.integers(0, 4, n).astype(np.uint8)
    codes[50:70] = 255            # an N hole
    contigs = {"chr1": codes}
    idx_ref = build_index(contigs)       # randomizes holes with seed 11

    prefix = str(tmp_path / "ref.fa")
    dump_bwa_files(prefix, {"chr1": idx_ref.text})   # .pac/.ann/.amb
    # overwrite .amb with the true hole run (dump_bwa_files saw no 255s)
    with open(f"{prefix}.amb", "w") as f:
        f.write(f"{n} 1 1\n50 20 N\n")
    dump_bwa_bwt_sa(prefix, idx_ref.text, sa_intv=sa_intv)

    idx_imp = import_bwa_index(prefix)
    assert idx_imp.primary == idx_ref.primary
    assert np.array_equal(idx_imp.counts, idx_ref.counts)
    assert np.array_equal(idx_imp.occ_blocks, idx_ref.occ_blocks)
    assert idx_imp.sa_rate == idx_ref.sa_rate
    assert np.array_equal(idx_imp.sa_mark_words, idx_ref.sa_mark_words)
    assert np.array_equal(idx_imp.sa_mark_rank, idx_ref.sa_mark_rank)
    assert np.array_equal(idx_imp.sa_values, idx_ref.sa_values)
    assert idx_imp.fm_n == idx_ref.fm_n
    assert np.array_equal(idx_imp.text, idx_ref.text)
    assert np.array_equal(idx_imp.n_mask_intervals,
                          np.array([[50, 70]]))


def test_bwt_import_align_identical(tmp_path):
    """Aligning over a .bwt/.sa-imported index gives the exact SAM of the
    FASTA-built index on the same randomized text."""
    from tests.simulate import rand_genome, simulate_pairs, to_str
    from ema_tpu import config
    from ema_tpu.core.pipeline import Aligner, ReadBatch
    from ema_tpu.index import build_index
    from ema_tpu.index.bwa_import import import_bwa_index

    rng = np.random.default_rng(9)
    genome = rand_genome(rng, 60_000)
    genome[5000:5040] = 255
    idx_fa = build_index({"chr1": genome})

    prefix = str(tmp_path / "ref.fa")
    dump_bwa_files(prefix, {"chr1": idx_fa.text})
    with open(f"{prefix}.amb", "w") as f:
        f.write(f"{genome.shape[0]} 1 1\n5000 40 N\n")
    dump_bwa_bwt_sa(prefix, idx_fa.text)
    idx_imp = import_bwa_index(prefix)

    ids, bc_strs, bcs, s1, q1, s2, q2, truth = simulate_pairs(
        rng, to_str(np.where(genome > 3, 0, genome)), n_barcodes=6,
        frags_per_bc=(2, 3), pairs_per_frag=(5, 10), frag_len=8_000,
        read_len=100, err=0.003)
    batch = ReadBatch.from_pairs(ids, bcs, s1, q1, s2, q2)
    sam_fa = Aligner(idx_fa, config.RunConfig()).align_batch_to_sam(batch)
    sam_imp = Aligner(idx_imp, config.RunConfig()).align_batch_to_sam(batch)
    assert sam_fa == sam_imp
