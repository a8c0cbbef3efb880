"""Byte-parity of our preprocessor vs the COMPILED reference preprocessor.

The reference cpp/ stage compiles standalone (no bwa needed); these tests
run both stacks on identical synthetic interleaved FASTQ + whitelist and
assert byte-identical on-disk artifacts:

  .ema-ncnt / .ema-fcnt          (count stage)
  ema-bin-NNN / ema-nobc / -b    (correct stage, H1-only and H2 modes)

ncnt emission and bucket assignment follow an unordered_map iteration
order in the reference (count.cc:160-170, correct.cc:407-412); our
implementation replays the same insertion sequence through libstdc++
(native.umap_order_u32), so equality here is exact, not canonicalized.
"""

from __future__ import annotations

import io
import random

import pytest

from ema_tpu.preproc import correct as correct_mod
from ema_tpu.preproc import count as count_mod
from tests import oracle

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(),
    reason="reference tree not available")

BASES = "ACGT"


def _rand_bc(rng):
    return "".join(rng.choice(BASES) for _ in range(16))


def _qual(rng, n, lo=35, hi=73):
    return "".join(chr(rng.randrange(lo, hi)) for _ in range(n))


def make_dataset(seed=0, n_wl=300, n_pairs=600):
    """Whitelist + interleaved FASTQ exercising every correction path:
    exact hits, H1/H2 errors, Ns, low quals, short reads, qual>QUAL_BASE
    caps, and non-whitelist barcodes."""
    rng = random.Random(seed)
    wl = []
    seen = set()
    while len(wl) < n_wl:
        bc = _rand_bc(rng)
        if bc not in seen and set(bc) != {"A"}:
            seen.add(bc)
            wl.append(bc)

    lines = []
    for i in range(n_pairs):
        kind = rng.randrange(10)
        bc = rng.choice(wl)
        if kind == 0:          # H1 error
            p = rng.randrange(16)
            bc = bc[:p] + rng.choice(BASES.replace(bc[p], "")) + bc[p + 1:]
        elif kind == 1:        # H2 error (still often an exact/whitelist hit)
            for _ in range(2):
                p = rng.randrange(16)
                bc = bc[:p] + rng.choice(BASES) + bc[p + 1:]
        elif kind == 2:        # one N in the barcode
            p = rng.randrange(16)
            bc = bc[:p] + "N" + bc[p + 1:]
        elif kind == 3:        # two Ns -> nobucket
            bc = "NN" + bc[2:]
        elif kind == 4:        # random barcode, likely off-whitelist
            bc = _rand_bc(rng)
        tail = "".join(rng.choice(BASES) for _ in range(84))
        r1 = bc + tail
        q1 = _qual(rng, len(r1))
        if kind == 5:          # a sub-'!' barcode qual -> pair ignored
            q1 = chr(31) + q1[1:]
        if kind == 6:          # very high quals -> QUAL_BASE capping
            q1 = chr(74) * 16 + q1[16:]
        if kind == 7:          # short read 1 -> skipped
            r1 = r1[:20]
            q1 = q1[:20]
        r2 = "".join(rng.choice(BASES) for _ in range(100))
        q2 = _qual(rng, len(r2))
        # occasional name whitespace to exercise truncation
        extra = " extra:stuff" if rng.random() < 0.3 else ""
        lines += [f"@pair{i}:{rng.randrange(10**6)}{extra}", r1, "+", q1,
                  f"@pair{i}:mate{extra}", r2, "+", q2]
    fq = ("\n".join(lines) + "\n").encode()
    return wl, fq


def write_wl(tmp_path, wl):
    p = tmp_path / "wl.txt"
    p.write_text("\n".join(wl) + "\n")
    return p


def _assert_tree_equal(dir_a, dir_b):
    names_a = sorted(p.name for p in dir_a.iterdir())
    names_b = sorted(p.name for p in dir_b.iterdir())
    assert names_a == names_b
    for name in names_a:
        a = (dir_a / name).read_bytes()
        b = (dir_b / name).read_bytes()
        assert a == b, (
            f"{name} differs: {len(a)} vs {len(b)} bytes; "
            f"first diff at {next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), min(len(a), len(b)))}")


class TestCountParity:
    def test_count_byte_identical(self, tmp_path):
        wl, fq = make_dataset()
        wl_path = write_wl(tmp_path, wl)
        ours = tmp_path / "ours"
        ref = tmp_path / "ref"
        count_mod.count(str(wl_path), str(ours), io.BytesIO(fq))
        oracle.run_preproc_oracle(["count", wl_path, ref, 0], fq)
        assert (ours.with_suffix(".ema-ncnt").read_bytes()
                == ref.with_suffix(".ema-ncnt").read_bytes())
        assert (ours.with_suffix(".ema-fcnt").read_bytes()
                == ref.with_suffix(".ema-fcnt").read_bytes())


class TestCorrectParity:
    @pytest.mark.parametrize("do_h2,do_bx", [(False, False), (True, False),
                                             (True, True)])
    def test_correct_byte_identical(self, tmp_path, do_h2, do_bx):
        wl, fq = make_dataset(seed=1)
        wl_path = write_wl(tmp_path, wl)
        cnt = tmp_path / "cnt"
        count_mod.count(str(wl_path), str(cnt), io.BytesIO(fq))

        ours = tmp_path / "ours"
        ref = tmp_path / "ref"
        ref.mkdir()
        correct_mod.correct(str(wl_path), [str(cnt) + ".ema-ncnt"],
                            str(ours), io.BytesIO(fq), do_h2=do_h2,
                            do_bx_format=do_bx, n_buckets=5)
        oracle.run_preproc_oracle(
            ["correct", wl_path, ref, int(do_h2), int(do_bx), 1, 5, 0,
             str(cnt) + ".ema-ncnt"], fq)
        _assert_tree_equal(ours, ref)

    def test_correct_from_reference_count(self, tmp_path):
        """Cross-feed: reference count output consumed by our correct must
        equal the reference correct end-to-end (format interop both ways)."""
        wl, fq = make_dataset(seed=2)
        wl_path = write_wl(tmp_path, wl)
        cnt = tmp_path / "refcnt"
        oracle.run_preproc_oracle(["count", wl_path, cnt, 0], fq)

        ours = tmp_path / "ours"
        ref = tmp_path / "ref"
        ref.mkdir()
        correct_mod.correct(str(wl_path), [str(cnt) + ".ema-ncnt"],
                            str(ours), io.BytesIO(fq), do_h2=True,
                            n_buckets=3)
        oracle.run_preproc_oracle(
            ["correct", wl_path, ref, 1, 0, 1, 3, 0,
             str(cnt) + ".ema-ncnt"], fq)
        _assert_tree_equal(ours, ref)


def make_haplotag_dataset(seed=3, n_pairs=120):
    rng = random.Random(seed)
    lines = []
    for i in range(n_pairs):
        kind = rng.randrange(8)
        code = "A%02dC%02dB%02dD%02d" % tuple(
            rng.randrange(1, 97) for _ in range(4))
        if kind == 0:         # field out of the 1..96 space
            code = "A00" + code[3:]
        tag = f" BX:Z:{code}"
        if kind == 1:         # no BX tag at all
            tag = ""
        if kind == 2:         # BX before any whitespace -> not found
            name = f"@BX:Z:{code}_pair{i}"
        else:
            name = f"@pair{i}{tag}"
        r1 = "".join(rng.choice(BASES) for _ in range(80))
        if kind == 3:
            r1 = r1[:16]      # too short
        q1 = _qual(rng, len(r1))
        r2 = "".join(rng.choice(BASES) for _ in range(80))
        q2 = _qual(rng, len(r2))
        lines += [name, r1, "+", q1, f"@pair{i}:m", r2, "+", q2]
    return ("\n".join(lines) + "\n").encode()


@pytest.mark.slow
class TestHaplotagParity:
    """Haplotag parity builds the full 96^4 code map on both sides —
    several GB and tens of seconds; marked slow."""

    def test_haplotag_count_and_correct(self, tmp_path):
        fq = make_haplotag_dataset()
        cnt_ours = tmp_path / "ours_cnt"
        cnt_ref = tmp_path / "ref_cnt"
        count_mod.count("-", str(cnt_ours), io.BytesIO(fq),
                        is_haplotag=True)
        oracle.run_preproc_oracle(["count", "-", cnt_ref, 1], fq)
        assert (cnt_ours.with_suffix(".ema-ncnt").read_bytes()
                == cnt_ref.with_suffix(".ema-ncnt").read_bytes())

        ours = tmp_path / "ours"
        ref = tmp_path / "ref"
        ref.mkdir()
        correct_mod.correct("-", [str(cnt_ours) + ".ema-ncnt"], str(ours),
                            io.BytesIO(fq), is_haplotag=True, n_buckets=4)
        oracle.run_preproc_oracle(
            ["correct", "-", ref, 0, 0, 1, 4, 1,
             str(cnt_ref) + ".ema-ncnt"], fq)
        _assert_tree_equal(ours, ref)
