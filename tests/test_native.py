"""Tests for the native C++ library: SA-IS and banded alignment traceback."""

import numpy as np
import pytest

from ema_tpu import native


def brute_suffix_array(text):
    n = len(text)
    t = list(text)
    return np.array(sorted(range(n), key=lambda i: t[i:]), dtype=np.int64)


class TestSAIS:
    @pytest.mark.parametrize("seed,n", [(0, 1), (1, 2), (2, 10), (3, 100), (4, 1000)])
    def test_matches_bruteforce(self, seed, n):
        rng = np.random.default_rng(seed)
        text = rng.integers(0, 4, size=n).astype(np.uint8)
        sa = native.suffix_array(text, 5)
        expect = brute_suffix_array(text.tolist())
        np.testing.assert_array_equal(sa, expect)

    def test_repetitive(self):
        text = np.array(([0, 1] * 50) + [2] * 30 + ([3, 3, 0] * 20), dtype=np.uint8)
        sa = native.suffix_array(text, 5)
        expect = brute_suffix_array(text.tolist())
        np.testing.assert_array_equal(sa, expect)

    def test_large_random(self):
        rng = np.random.default_rng(7)
        text = rng.integers(0, 4, size=200_000).astype(np.uint8)
        sa = native.suffix_array(text, 5)
        # spot-check sortedness on a sample of adjacent pairs
        idx = rng.integers(0, len(text) - 1, size=500)
        for i in idx:
            a, b = int(sa[i]), int(sa[i + 1])
            sl = 50
            assert text[a:a + sl].tobytes() <= text[b:b + sl].tobytes()


def encode(s):
    lut = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 4}
    return np.array([lut[c] for c in s], dtype=np.uint8)


def run_one(read, ref, **kw):
    r = encode(read)[None, :]
    f = encode(ref)[None, :]
    out = native.align_batch(r, np.array([len(read)]), f, np.array([len(ref)]), **kw)
    return {k: v[0] for k, v in out.items()}


def cigar_str(cigars, n):
    ops = "MIDSS"
    return "".join(f"{int(c) >> 4}{ops[int(c) & 0xf]}" for c in cigars[:n])


class TestAlign:
    def test_exact_match(self):
        out = run_one("ACGTACGTAC", "TTACGTACGTACTT")
        assert out["score"] == 10
        assert out["pos"] == 2
        assert out["qb"] == 0 and out["qe"] == 10
        assert out["nm"] == 0
        assert cigar_str(out["cigars"], out["n_cigar"]) == "10M"

    def test_mismatch(self):
        out = run_one("ACGTACGTAC", "TTACGTCCGTACTT")
        # one mismatch: 9*1 - 4 = 5 beats clipping around it
        assert out["score"] == 5
        assert out["nm"] == 1
        assert cigar_str(out["cigars"], out["n_cigar"]) == "10M"

    def test_insertion_in_read(self):
        #        read has an extra G vs the reference
        out = run_one("ACGTAGGGTACCCC", "TTACGTAGGTACCCCTT")
        assert "I" in cigar_str(out["cigars"], out["n_cigar"])
        assert out["nm"] == 1

    def test_deletion_in_read(self):
        out = run_one("ACGTAGTACCCC", "TTACGTAGGGTACCCCTT")
        s = cigar_str(out["cigars"], out["n_cigar"])
        assert "D" in s
        assert out["nm"] == 2

    def test_clip_preference_keeps_cheap_tail(self):
        # a single mismatch 2 bases from the end: keeping the tail costs
        # -4+2 = -2 vs clipping 3 bases costs -5 -> keep the tail (BWA
        # pen_clip rule)
        read = "ACGTACGTACGTAGTT"  # last 3: mismatch G->A? construct below
        ref_m = "ACGTACGTACGTACTTZZ".replace("Z", "A")
        out = run_one(read, ref_m)
        s = cigar_str(out["cigars"], out["n_cigar"])
        assert s == "16M"
        assert out["nm"] == 1

    def test_clip_applied_for_expensive_tail(self):
        # 6 trailing read bases completely absent from ref: clip them
        read = "ACGTACGTACGT" + "CCCCCC"
        ref = "TTACGTACGTACGTTT"
        out = run_one(read, ref)
        s = cigar_str(out["cigars"], out["n_cigar"])
        assert s.endswith("S")
        assert out["qe"] == 12
        # score: 12 matches - 5 clip penalty = 7
        assert out["score"] == 7

    def test_left_clip(self):
        read = "GGGGGG" + "ACGTACGTACGT"
        ref = "TTACGTACGTACGTTT"
        out = run_one(read, ref)
        s = cigar_str(out["cigars"], out["n_cigar"])
        assert s.startswith("6S")
        assert out["qb"] == 6
        assert out["pos"] == 2

    def test_batch(self):
        reads = ["ACGTACGTAC", "TTTTGGGG"]
        refs = ["AAACGTACGTACAA", "CCTTTTGGGGCC"]
        m = max(len(r) for r in reads)
        n = max(len(r) for r in refs)
        ra = np.zeros((2, m), dtype=np.uint8)
        fa = np.zeros((2, n), dtype=np.uint8)
        for i, (rd, rf) in enumerate(zip(reads, refs)):
            ra[i, :len(rd)] = encode(rd)
            fa[i, :len(rf)] = encode(rf)
        out = native.align_batch(
            ra, np.array([len(r) for r in reads]),
            fa, np.array([len(r) for r in refs]))
        assert out["score"][0] == 10
        assert out["score"][1] == 8
        assert out["pos"][1] == 2


class TestTracebackBatch:
    def test_matches_align_batch_on_windows(self):
        """traceback_batch (gapless shortcut + DP off the packed text)
        must equal align_batch run on the materialized windows — same
        score/pos/qb/qe/NM/CIGAR, including indel and out-of-text
        sentinel cases."""
        rng = np.random.default_rng(77)
        n = 5000
        text = rng.integers(0, 4, n).astype(np.uint8)
        R, L = 40, 90
        oriented = rng.integers(0, 5, (R, L)).astype(np.uint8)
        olens = rng.integers(50, L + 1, R).astype(np.int32)
        B = 160
        rows = rng.integers(0, R, B).astype(np.int64)
        win_lo = rng.integers(-40, n - 60, B).astype(np.int64)
        win_len = rng.integers(80, 200, B).astype(np.int32)
        # plant exact and indel-bearing alignments for half the cases
        for c in range(0, B, 2):
            r = int(rows[c])
            rl = int(olens[r])
            off = int(rng.integers(0, 30))
            seq = oriented[r, :rl].copy()
            if c % 4 == 0 and rl > 40:          # plant a deletion
                seq = np.concatenate([seq[:20], seq[25:]])
            for j, v in enumerate(seq):
                col = int(win_lo[c]) + off + j
                if 0 <= col < n and v < 4:
                    text[col] = v

        # score with the native banded scorer to get sw fields
        sw = native.sw_banded_native(oriented, olens, text, rows,
                                     win_lo, win_len, 128)
        sw["ref_end"] = sw["ref_end"].astype(np.int32)

        got = native.traceback_batch(oriented, olens, rows, text,
                                     win_lo, win_len, sw)

        # reference: the contract traceback_batch replaced — gapless
        # shortcut against the SAME sw fields, DP (align_batch) on the
        # materialized windows for the rest
        W = int(win_len.max())
        cols = win_lo[:, None] + np.arange(W)[None, :]
        wins = np.where((cols < 0) | (cols >= n), 5,
                        text[np.clip(cols, 0, n - 1)]).astype(np.uint8)
        qb, qe, ref_end = sw["qb"], sw["qe"], sw["ref_end"]
        span = qe - qb
        start = ref_end - span
        rl = olens[rows]
        want = native.align_batch(oriented[rows], rl, wins, win_len,
                                  max_cigar=24)
        for b in range(B):
            ok = span[b] > 0 and start[b] >= 0 \
                and ref_end[b] <= win_len[b]
            if not ok:
                continue
            rb = oriented[rows[b], qb[b]:qe[b]].astype(np.int64)
            cb = wins[b, start[b]:ref_end[b]].astype(np.int64)
            n_n = int((rb >= 4).sum())
            mism = int(((rb < 4) & (rb != cb)).sum())
            hyp = (span[b] - mism - n_n) - 4 * mism - n_n \
                - 5 * (int(qb[b] > 0) + int(qe[b] < rl[b]))
            if hyp == sw["score"][b]:       # gapless path
                want["score"][b] = sw["score"][b]
                want["pos"][b] = start[b]
                want["qb"][b] = qb[b]
                want["qe"][b] = qe[b]
                want["nm"][b] = mism + n_n
                cig = []
                if qb[b] > 0:
                    cig.append((int(qb[b]) << 4) | 4)
                cig.append((int(span[b]) << 4) | 0)
                if qe[b] < rl[b]:
                    cig.append((int(rl[b] - qe[b]) << 4) | 4)
                want["cigars"][b] = 0
                want["cigars"][b, :len(cig)] = cig
                want["n_cigar"][b] = len(cig)
        for k in ("score", "pos", "qb", "qe", "nm", "n_cigar"):
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)
        np.testing.assert_array_equal(got["cigars"], want["cigars"])


class TestUmapOrderSim:
    """The flat-array _Hashtable simulation must replay the REAL
    std::unordered_map's iteration order for every key stream (the sim is
    the default path and determines .ema-ncnt byte parity + bucket order,
    count.cc:160-170 / correct.cc:407-412)."""

    # Sizes straddle several _Prime_rehash_policy growth boundaries
    # (13, 29, 59, 127, 257, 541, 1109, 2357, ...).
    @pytest.mark.parametrize("seed,n,keyspace", [
        (0, 1, 10), (1, 12, 8), (2, 13, 1 << 32), (3, 14, 64),
        (4, 58, 40), (5, 60, 1 << 32), (6, 126, 100), (7, 128, 1 << 32),
        (8, 540, 300), (9, 542, 1 << 32), (10, 1110, 700),
        (11, 2360, 1500), (12, 10_000, 4000), (13, 10_000, 1 << 32),
    ])
    def test_sim_matches_real_map(self, seed, n, keyspace):
        rng = np.random.default_rng(seed)
        keys = rng.integers(0, keyspace, size=n, dtype=np.uint32)
        got = native.umap_order_u32(keys, sim=True)
        want = native.umap_order_u32(keys, sim=False)
        np.testing.assert_array_equal(got, want)

    def test_modular_collisions(self):
        # Keys congruent mod small primes collide into the same bucket
        # through std::hash<uint32_t> (identity) % bucket_count.
        for prime in (13, 29, 59, 127):
            keys = (np.arange(5 * prime, dtype=np.uint32) * prime) % (1 << 20)
            keys = np.concatenate([keys, keys[::2]])   # duplicates
            got = native.umap_order_u32(keys, sim=True)
            want = native.umap_order_u32(keys, sim=False)
            np.testing.assert_array_equal(got, want)

    def test_distinct_fast_path(self):
        rng = np.random.default_rng(99)
        keys = rng.permutation(np.arange(3000, dtype=np.uint32))
        got = native.umap_order_u32(keys, sim=True, distinct=True)
        want = native.umap_order_u32(keys, sim=False)
        np.testing.assert_array_equal(got, want)

    def test_empty(self):
        keys = np.empty(0, np.uint32)
        assert native.umap_order_u32(keys, sim=True).shape == (0,)
