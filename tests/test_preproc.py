"""Preproc tests: count/correct stages, on-disk format layouts, H1/H2."""

import io
import struct

import numpy as np
import pytest

from ema_tpu.preproc import count as count_mod
from ema_tpu.preproc import correct as correct_mod


def make_fastq(pairs):
    """pairs: list of (name, r1, q1, r2, q2) -> interleaved FASTQ bytes."""
    out = []
    for name, r1, q1, r2, q2 in pairs:
        out.append(f"@{name}\n{r1}\n+\n{q1}\n@{name}\n{r2}\n+\n{q2}\n")
    return io.BytesIO("".join(out).encode())


BCS = ["ACGTACGTACGTACGT", "TTTTGGGGCCCCAAAA", "GAGAGAGATCTCTCTC"]
TAIL = "TGCATGCA" * 16


def wl_file(tmp_path):
    p = tmp_path / "wl.txt"
    p.write_text("".join(b + "\n" for b in BCS))
    return str(p)


def pairs_with_bc(bc, n, qual="I"):
    out = []
    for i in range(n):
        r1 = bc + "ACCGGTT" + TAIL[:60]
        q1 = qual * len(r1)
        r2 = TAIL[:80]
        q2 = qual * len(r2)
        out.append((f"r{bc[:4]}{i}", r1, q1, r2, q2))
    return out


class TestCount:
    def test_counts_and_formats(self, tmp_path):
        wl = wl_file(tmp_path)
        pairs = pairs_with_bc(BCS[0], 5) + pairs_with_bc(BCS[1], 3)
        stats = count_mod.count(wl, str(tmp_path / "out"), make_fastq(pairs))
        assert stats["nice"] == 8 and stats["total"] == 8

        bcs, cnts = count_mod.read_ncnt(str(tmp_path / "out.ema-ncnt"))
        got = dict(zip(bcs.tolist(), cnts.tolist()))
        wl_arr = count_mod.load_whitelist_preproc(wl)
        enc = {b: int(count_mod.encode_bc_preproc(
            count_mod.HASH_DNA[np.frombuffer(b.encode(), np.uint8)][None, :])[0])
            for b in BCS}
        assert got[enc[BCS[0]]] == 5
        assert got[enc[BCS[1]]] == 3
        assert enc[BCS[2]] not in got

        blocks = list(count_mod.read_fcnt_blocks(str(tmp_path / "out.ema-fcnt")))
        total = sum(int(c.sum()) for _, c in blocks)
        assert total == 8
        # fused key layout: byte = base*34 + qual(capped)
        keys = blocks[0][0]
        q = ord("I") - 33
        base0 = count_mod.HASH_DNA_N[ord(BCS[0][0])]
        assert any((k[0] == base0 * 34 + min(33, q)) for k in keys)

    def test_low_quality_ignored(self, tmp_path):
        wl = wl_file(tmp_path)
        bad = [(f"x", BCS[0] + TAIL[:60], " " * 76, TAIL[:80], "I" * 80)]
        stats = count_mod.count(wl, str(tmp_path / "o2"), make_fastq(bad))
        assert stats["ignored"] == 1 and stats["total"] == 0

    def test_ncnt_binary_layout(self, tmp_path):
        # i64 n, then n x {u32 bc, i64 count} little-endian (SURVEY §2.5)
        wl = wl_file(tmp_path)
        count_mod.count(wl, str(tmp_path / "o3"),
                        make_fastq(pairs_with_bc(BCS[0], 2)))
        raw = (tmp_path / "o3.ema-ncnt").read_bytes()
        n = struct.unpack("<q", raw[:8])[0]
        assert n == 1
        bc, cnt = struct.unpack("<Iq", raw[8:8 + 12])
        assert cnt == 2


class TestCorrect:
    def _run(self, tmp_path, pairs, do_h2=False, n_buckets=3):
        wl = wl_file(tmp_path)
        count_mod.count(wl, str(tmp_path / "c"), make_fastq(pairs))
        stats = correct_mod.correct(
            wl, [str(tmp_path / "c.ema-ncnt")], str(tmp_path / "buckets"),
            make_fastq(pairs), do_h2=do_h2, n_buckets=n_buckets)
        return stats

    def test_exact_nochange(self, tmp_path):
        pairs = pairs_with_bc(BCS[0], 6)
        stats = self._run(tmp_path, pairs)
        assert stats["nochange"] == 6
        assert stats["h1"] == 0 and stats["nobucket"] == 0
        assert stats["routed_pairs"] == 6

    def test_h1_correction(self, tmp_path):
        # one read with a single barcode error -> H1-corrected
        good = pairs_with_bc(BCS[0], 6)
        mut = BCS[0][:5] + ("A" if BCS[0][5] != "A" else "C") + BCS[0][6:]
        bad = [("rbad", mut + "ACCGGTT" + TAIL[:60], "I" * 83,
                TAIL[:80], "I" * 80)]
        stats = self._run(tmp_path, good + bad)
        assert stats["h1"] == 1
        assert stats["nochange"] == 6

    def test_h2_correction(self, tmp_path):
        # two errors: H2 path requires the mutated bc to still be an exact
        # whitelist hit... (reference only H2-refines exact hits).  Craft:
        # a whitelist where the observed bc IS in the whitelist but a much
        # more frequent bc is 2 away — H2 should NOT fire unless posterior
        # wins; with equal priors it keeps NOCHANGE.
        pairs = pairs_with_bc(BCS[0], 10)
        stats = self._run(tmp_path, pairs, do_h2=True)
        assert stats["nochange"] == 10

    def test_h2_fires_on_low_quality_exact_hit(self, tmp_path):
        # observed bc A is an exact whitelist hit, but a Hamming-2 neighbor
        # B has a vastly higher prior AND the read's two differing barcode
        # bases are low quality -> posterior share of B clears 0.975 and
        # the key is H2-corrected to B (correct.cc:107-132, weight
        # phred(max(3, q-1)))
        A = list(BCS[0])
        A[3] = "C" if A[3] != "C" else "G"
        A[7] = "C" if A[7] != "C" else "G"
        A = "".join(A)                        # 2 subs from BCS[0]
        wl = tmp_path / "wl2.txt"
        wl.write_text("".join(b + "\n" for b in BCS + [A]))

        anchor = pairs_with_bc(BCS[0], 400)   # makes BCS[0]'s prior dominate
        q1 = list("I" * 83)
        q1[3] = q1[7] = "$"                   # low quality at the two subs
        rare = [("rh2", A + "ACCGGTT" + TAIL[:60], "".join(q1),
                 TAIL[:80], "I" * 80)]
        pairs = anchor + rare
        count_mod.count(str(wl), str(tmp_path / "c2"), make_fastq(pairs))
        stats = correct_mod.correct(
            str(wl), [str(tmp_path / "c2.ema-ncnt")],
            str(tmp_path / "buckets2"), make_fastq(pairs), do_h2=True,
            n_buckets=2)
        assert stats["h2"] == 1, stats
        assert stats["nochange"] == 400
        # the corrected pair carries BCS[0] in its bucket line
        joined = b"".join(
            (tmp_path / "buckets2" / f"ema-bin-{i:03d}").read_bytes()
            for i in range(2)).decode()
        h2_lines = [ln for ln in joined.splitlines() if " @rh2 " in ln]
        assert len(h2_lines) == 1 and h2_lines[0].startswith(BCS[0])

    def test_bucket_files_roundtrip(self, tmp_path):
        pairs = pairs_with_bc(BCS[0], 4) + pairs_with_bc(BCS[1], 4)
        self._run(tmp_path, pairs, n_buckets=2)
        texts = []
        for i in range(2):
            p = tmp_path / "buckets" / f"ema-bin-{i:03d}"
            texts.append(p.read_bytes().decode())
        joined = "".join(texts)
        # special format line: bc id r1trim q1trim r2 q2 (6 fields)
        lines = [l for l in joined.splitlines() if l]
        assert len(lines) == 8
        for l in lines:
            f = l.split(" ")
            assert len(f) == 6
            assert f[0] in (BCS[0], BCS[1])
            # read1 trimmed by 16+7
            assert len(f[2]) == 83 - 23
        # barcodes land in different buckets (load balancing)
        assert texts[0] and texts[1]

    def test_nobc_untracked_barcode(self, tmp_path):
        pairs = pairs_with_bc("AAAACCCCGGGGTTTT", 3)  # not whitelisted
        stats = self._run(tmp_path, pairs)
        assert stats["nobucket"] == 3
        nobc = (tmp_path / "buckets" / "ema-nobc").read_bytes().decode()
        recs = nobc.splitlines()
        # interleaved FASTQ: 8 lines per pair
        assert len(recs) == 3 * 8
        # header keeps the '@' (the reference copies the raw name line)
        assert recs[0].startswith("@r")


class TestNativeCorrectParity:
    def test_native_matches_numpy_corrector(self, monkeypatch):
        """The native hash-probe H1/H2 scans must reproduce the numpy
        corrector's outputs (same enumeration order, argmax-first best,
        acceptance decisions) on a stress mix of exact/H1/H2/N keys."""
        import numpy as np

        from ema_tpu.preproc.correct import Corrector
        from ema_tpu.preproc.count import encode_bc_preproc

        rng = np.random.default_rng(5)
        wl_codes = rng.integers(0, 4, (3000, 16)).astype(np.uint8)
        wl_codes[0] = 1     # avoid the all-A invalid code
        wl = np.unique(encode_bc_preproc(wl_codes))
        priors = (rng.integers(0, 50, wl.shape[0]) + 1.0) / 1000.0

        K = 4000
        pick = rng.integers(0, wl_codes.shape[0], K)
        codes = wl_codes[pick].astype(np.int64)
        # mutate: thirds exact / H1 / H2, sprinkle Ns
        codes[1000:2000, 3] = rng.integers(0, 4, 1000)
        codes[2000:3000, 5] = rng.integers(0, 4, 1000)
        codes[2000:3000, 11] = rng.integers(0, 4, 1000)
        codes[3000:3500, 7] = 4         # one N
        codes[3500:3600, 2] = 4
        codes[3500:3600, 9] = 4         # two Ns -> nobucket
        # all-A barcodes (bc encodes to 0, the native hash's empty-slot
        # sentinel): must be a whitelist MISS eligible for H1 correction
        # on both paths, not a bogus exact hit (ADVICE r3, medium)
        codes[3600:3650] = 0
        quals = rng.integers(0, 34, (K, 16)).astype(np.int64)
        keys = codes * 34 + quals

        def run(use_native):
            if not use_native:
                monkeypatch.setenv("EMA_TPU_NO_NATIVE_CORRECT", "1")
            else:
                monkeypatch.delenv("EMA_TPU_NO_NATIVE_CORRECT",
                                   raising=False)
            c = Corrector(wl, priors, do_h2=True)
            assert (c._hash is not None) == use_native
            return c.correct_block(keys, np.ones(K, np.int64))

        bc_np, ty_np = run(False)
        bc_nat, ty_nat = run(True)
        np.testing.assert_array_equal(ty_nat, ty_np)
        np.testing.assert_array_equal(bc_nat, bc_np)
