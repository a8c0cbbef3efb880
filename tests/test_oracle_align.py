"""Record-level concordance vs the reference's OWN compiled align core.

The reference EM/selection/SAM stack (align.c, samdict.c, samrecord.c)
is compiled against a candidate-replay bwabridge stub
(tests/oracle/bwabridge_stub.c) and fed the exact candidates our
pipeline generated.  Both stacks then run their full cloud sweep + EM +
selection + duplicate marking + SAM emission on identical inputs, and
the outputs are diffed record-by-record (order-insensitive,
MI-as-bijection) — the measured concordance the north-star metric in
BASELINE.md asks for (run with -t1, no -d, per SURVEY §4).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import oracle

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(),
    reason="reference tree not available")


def _world(seed=1234, n_barcodes=8, repeat_copies=0):
    from tests.simulate import rand_genome, simulate_pairs, to_str

    rng = np.random.default_rng(seed)
    g1 = rand_genome(rng, 120_000)
    g2 = rand_genome(rng, 60_000)
    g2[10_000:14_000] = g1[20_000:24_000]      # duplicated segment
    if repeat_copies:
        # heavy repeat family -> collision clouds, low-gamma ties, XA alts
        unit = g1[40_000:41_500].copy()
        for k in range(repeat_copies):
            at = 45_000 + k * 1_600
            g1[at:at + 1_500] = unit
    contigs = {"cA": g1, "cB": g2}
    gs = to_str(np.concatenate([g1, g2]))

    ids, bc_strs, bcs, s1, q1, s2, q2, truth = simulate_pairs(
        rng, gs, n_barcodes=n_barcodes, frags_per_bc=(2, 3),
        pairs_per_frag=(14, 22), frag_len=20_000, read_len=90, err=0.004)
    # an unalignable mate + an N-containing read (unmapped-record paths)
    ids.append("nn0")
    bcs.append(bcs[0])
    bc_strs.append(bc_strs[0])
    s1.append(gs[500:590])
    q1.append("I" * 90)
    s2.append("N" * 90)
    q2.append("I" * 90)
    return contigs, ids, bc_strs, bcs, s1, q1, s2, q2


def _run_concordance(tmp_path, apply_opt=False, platform="10x",
                     repeat_copies=0, seed=1234, n_barcodes=8,
                     device_em=None, bc_override=None):
    from ema_tpu import config
    from ema_tpu.core.pipeline import Aligner, ReadBatch
    from ema_tpu.index import build_index
    from ema_tpu.utils import samdiff
    from ema_tpu.utils.replay import ReplayWriter

    contigs, ids, bc_strs, bcs, s1, q1, s2, q2 = _world(
        seed=seed, n_barcodes=n_barcodes, repeat_copies=repeat_copies)
    if bc_override is not None:
        bc_strs, bcs = bc_override(bc_strs)

    # special-format bucket file consumed by the reference oracle
    # (bc id read1 qual1 read2 qual2; preproc writes ids with '@')
    bucket = tmp_path / "bucket"
    with open(bucket, "w") as f:
        for i in range(len(ids)):
            f.write(f"{bc_strs[i]} @{ids[i]} {s1[i]} {q1[i]} "
                    f"{s2[i]} {q2[i]}\n")

    idx = build_index(contigs)
    plat = config.get_platform_profile(platform)
    cfg = config.RunConfig(batch_size=512, seed=7, platform=plat,
                           apply_density_opt=apply_opt,
                           device_em=device_em)
    aligner = Aligner(idx, cfg)
    writer = ReplayWriter(str(tmp_path / "replay"),
                          idx.names, [int(x) for x in idx.lengths])
    aligner.replay_sink = writer.add
    batch = ReadBatch.from_pairs(ids, bcs, s1, q1, s2, q2)
    lines = aligner.align_batch_to_sam(batch)
    writer.close()

    ours = tmp_path / "ours.sam"
    ours.write_text("".join(l if l.endswith("\n") else l + "\n"
                            for l in lines))

    ref = tmp_path / "ref.sam"
    oracle.run_align_oracle(tmp_path / "replay", bucket, ref,
                            platform=platform, apply_opt=apply_opt)
    st = samdiff.diff_sams(str(ours), str(ref))
    return st


class TestAlignConcordance:
    def test_em_selection_sam_concordance(self, tmp_path):
        st = _run_concordance(tmp_path)
        print(st.summary())
        assert st.shared > 400
        # every record one side emits, the other must too
        assert st.only_a == 0 and st.only_b == 0, st.mismatches[:10]
        assert st.concordance() >= 0.999, "\n".join(
            [st.summary()] + st.mismatches)
        # secondary metrics: gammas, MI structure, mapq
        assert st.xg_close / st.shared >= 0.999, st.summary()
        assert st.mi_consistent / st.shared >= 0.999, st.summary()
        assert st.bx_match == st.shared
        assert st.mapq_match / st.shared >= 0.95, st.summary()
        assert st.mapq_close / st.shared >= 0.999, st.summary()
        # full-record parity: mate fields, SEQ/QUAL, XA alts
        assert st.mate_match == st.shared, st.mismatches[:10]
        assert st.seq_match == st.shared, st.mismatches[:10]
        assert st.xa_match / st.shared >= 0.999, st.mismatches[:10]

    def test_repeat_heavy_collisions_and_alts(self, tmp_path):
        """Collision (bad) clouds, low-gamma ties, XA alts: the hard half
        of samdict/split-adjacent selection semantics."""
        st = _run_concordance(tmp_path, repeat_copies=20, seed=77)
        print(st.summary())
        assert st.shared > 400
        assert st.only_a == 0 and st.only_b == 0, st.mismatches[:10]
        assert st.concordance() >= 0.999, "\n".join(
            [st.summary()] + st.mismatches)
        assert st.xg_close / st.shared >= 0.995, st.summary()
        assert st.xa_match / st.shared >= 0.995, st.mismatches[:10]
        assert st.mapq_match / st.shared >= 0.95, st.summary()

    def test_device_em_path(self, tmp_path):
        """The device (em_jax) EM path must match the reference exactly
        too — same 100% bar as the host path."""
        st = _run_concordance(tmp_path, device_em=True, seed=21)
        print(st.summary())
        assert st.shared > 400
        assert st.only_a == 0 and st.only_b == 0, st.mismatches[:10]
        assert st.concordance() >= 0.999, "\n".join(
            [st.summary()] + st.mismatches)
        assert st.xg_close / st.shared >= 0.999, st.summary()
        assert st.mapq_match / st.shared >= 0.95, st.summary()

    def test_haplotag_platform(self, tmp_path):
        """haplotag -s path: 12-char packed codes, haplotag BX emission
        (no '-1' suffix), dist_thresh 50k (techs.c:71-127)."""
        import numpy as np

        from ema_tpu.utils.barcodes import encode_bc_haplotag

        rng = np.random.default_rng(3)
        codes = {}

        def override(bc_strs):
            out = []
            for b in dict.fromkeys(bc_strs):
                a, c, bb, d = rng.integers(1, 97, 4)
                codes[b] = f"A{a:02d}C{c:02d}B{bb:02d}D{d:02d}"
            strs = [codes[b] for b in bc_strs]
            return strs, [encode_bc_haplotag(s) for s in strs]

        st = _run_concordance(tmp_path, platform="haplotag", seed=13,
                              bc_override=override)
        print(st.summary())
        assert st.shared > 400
        assert st.only_a == 0 and st.only_b == 0, st.mismatches[:10]
        assert st.concordance() >= 0.999, "\n".join(
            [st.summary()] + st.mismatches)
        assert st.bx_match == st.shared, st.mismatches[:10]
        assert st.xg_close / st.shared >= 0.999, st.summary()

    def test_many_clouds_platform(self, tmp_path):
        """tru profile through the reference's -1/-2 standard-FASTQ path:
        many_clouds weight normalization (align.c:469-480) and numeric
        read-id barcodes (techs.c:57-60).  (-s is out of contract for
        BC_LEN=0 platforms: the reference smashes its own 1-byte bc_str.)
        """
        from ema_tpu import config
        from ema_tpu.core.pipeline import Aligner, ReadBatch
        from ema_tpu.index import build_index
        from ema_tpu.utils import samdiff
        from ema_tpu.utils.replay import ReplayWriter

        contigs, ids, bc_strs, bcs, s1, q1, s2, q2 = _world(seed=5)
        # numeric tru barcodes; pairs already grouped by barcode
        bc_num = {b: 1000 + i for i, b in enumerate(dict.fromkeys(bc_strs))}
        rids = [f"{bc_num[bc_strs[i]]}-{ids[i]}" for i in range(len(ids))]
        nbcs = [bc_num[bc_strs[i]] for i in range(len(ids))]
        fq1 = tmp_path / "r1.fq"
        fq2 = tmp_path / "r2.fq"
        with open(fq1, "w") as f1, open(fq2, "w") as f2:
            for i in range(len(ids)):
                f1.write(f"@{rids[i]}\n{s1[i]}\n+\n{q1[i]}\n")
                f2.write(f"@{rids[i]}\n{s2[i]}\n+\n{q2[i]}\n")

        idx = build_index(contigs)
        cfg = config.RunConfig(batch_size=512, seed=7,
                               platform=config.get_platform_profile("tru"))
        aligner = Aligner(idx, cfg)
        writer = ReplayWriter(str(tmp_path / "replay"),
                              idx.names, [int(x) for x in idx.lengths])
        aligner.replay_sink = writer.add
        batch = ReadBatch.from_pairs(rids, nbcs, s1, q1, s2, q2)
        lines = aligner.align_batch_to_sam(batch)
        writer.close()
        ours = tmp_path / "ours.sam"
        ours.write_text("".join(l if l.endswith("\n") else l + "\n"
                                for l in lines))
        ref = tmp_path / "ref.sam"
        oracle.run_align_oracle_paired(tmp_path / "replay", fq1, fq2, ref,
                                       platform="tru")
        st = samdiff.diff_sams(str(ours), str(ref))
        print(st.summary())
        assert st.shared > 400
        assert st.only_a == 0 and st.only_b == 0, st.mismatches[:10]
        assert st.concordance() >= 0.999, "\n".join(
            [st.summary()] + st.mismatches)
        assert st.xg_close / st.shared >= 0.999, st.summary()

    def test_density_opt_quality_parity(self, tmp_path):
        """-d on both stacks (reference annealer is time-seeded,
        split.c:54-59, so this is the tolerance-based comparison SURVEY
        prescribes): records outside bad clouds must stay identical, and
        the seeded annealer's final picks must score at least as well as
        the reference's under one shared evaluator of the split.c
        objective (tools/measure_density_opt.py)."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "measure_density_opt",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
                "tools", "measure_density_opt.py"))
        mdo = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mdo)

        from ema_tpu import config
        from ema_tpu.utils import samdiff

        st = _run_concordance(tmp_path, apply_opt=True, repeat_copies=20,
                              seed=77)
        assert st.only_a == 0 and st.only_b == 0, st.mismatches[:10]

        ours = samdiff._parse(str(tmp_path / "ours.sam"))
        ref = samdiff._parse(str(tmp_path / "ref.sam"))
        shared = set(ours) & set(ref)
        assert len(shared) > 400

        det = det_ok = 0
        for k in shared:
            a, b = ours[k], ref[k]
            if int(a["tags"].get("XF", "0")) == 0 \
                    and int(b["tags"].get("XF", "0")) == 0:
                det += 1
                det_ok += int(
                    (a["rname"], a["pos"], a["cigar"])
                    == (b["rname"], b["pos"], b["cigar"]))
        assert det > 100
        assert det_ok == det, f"{det_ok}/{det} deterministic records match"

        def for_energy(recs):
            return {k: dict(chrom=r["rname"], pos=r["pos"],
                            unmapped=int(bool(r["flag"] & 0x4)),
                            cigar=r["cigar"],
                            nm=int(r["tags"].get("NM", "0")),
                            bx=r["tags"].get("BX", ""),
                            mi=int(r["tags"].get("MI", "-1")),
                            xf=int(r["tags"].get("XF", "0")))
                    for k, r in recs.items()}

        err = config.get_platform_profile("10x").error_rate
        e_o = sum(e for e, _ in mdo._cloud_energies(
            for_energy(ours), err).values())
        e_r = sum(e for e, _ in mdo._cloud_energies(
            for_energy(ref), err).values())
        # seeded SA must not be meaningfully worse than the reference's
        assert e_o >= e_r - 0.02 * abs(e_r) - 1.0, (e_o, e_r)

    def test_tellseq_dual_format_paired(self, tmp_path):
        """tellseq through the reference's -1/-2 reader: 18 bp barcodes
        via BOTH id formats the reference supports (techs.c:32-55) — the
        longranger ' BX:Z:<bc>' suffix branch and the trailing ':<bc>'
        branch — mixed in one run."""
        import numpy as np

        from ema_tpu import config
        from ema_tpu.core.pipeline import Aligner, ReadBatch
        from ema_tpu.utils import samdiff
        from ema_tpu.utils.barcodes import encode_bc_default
        from ema_tpu.utils.replay import ReplayWriter
        from ema_tpu.index import build_index

        contigs, ids, bc_strs, bcs, s1, q1, s2, q2 = _world(seed=31)
        rng = np.random.default_rng(9)
        bases = np.array(list("ACGT"))
        bc18 = {b: "".join(rng.choice(bases, 18))
                for b in dict.fromkeys(bc_strs)}
        heads, decorated, nbcs = [], [], []
        for i, bc in enumerate(bc_strs):
            s = bc18[bc]
            # alternate formats PER BARCODE so groups stay contiguous
            if list(bc18).index(bc) % 2 == 0:
                heads.append(f"t{i}")
                decorated.append(f"t{i} BX:Z:{s}")
            else:
                heads.append(f"t{i}")
                decorated.append(f"t{i}:{s}")
            nbcs.append(encode_bc_default(s))

        fq1 = tmp_path / "r1.fq"
        fq2 = tmp_path / "r2.fq"
        with open(fq1, "w") as f1, open(fq2, "w") as f2:
            for i in range(len(ids)):
                f1.write(f"@{decorated[i]}\n{s1[i]}\n+\n{q1[i]}\n")
                f2.write(f"@{decorated[i]}\n{s2[i]}\n+\n{q2[i]}\n")

        idx = build_index(contigs)
        cfg = config.RunConfig(
            batch_size=512, seed=7,
            platform=config.get_platform_profile("tellseq"))
        aligner = Aligner(idx, cfg)
        writer = ReplayWriter(str(tmp_path / "replay"),
                              idx.names, [int(x) for x in idx.lengths])
        aligner.replay_sink = writer.add
        batch = ReadBatch.from_pairs(heads, nbcs, s1, q1, s2, q2)
        lines = aligner.align_batch_to_sam(batch)
        writer.close()
        ours = tmp_path / "ours.sam"
        ours.write_text("".join(l if l.endswith("\n") else l + "\n"
                                for l in lines))
        ref = tmp_path / "ref.sam"
        oracle.run_align_oracle_paired(tmp_path / "replay", fq1, fq2, ref,
                                       platform="tellseq")
        st = samdiff.diff_sams(str(ours), str(ref))
        print(st.summary())
        assert st.shared > 400
        assert st.only_a == 0 and st.only_b == 0, st.mismatches[:10]
        assert st.concordance() >= 0.999, "\n".join(
            [st.summary()] + st.mismatches)
        assert st.bx_match == st.shared, st.mismatches[:10]

    def test_dbs_paired(self, tmp_path):
        """dbs: 20 bp barcodes from the trailing ':<bc>' of the read id
        (techs.c:18-29 extract_bc_10x semantics at BC_LEN 20) through the
        reference's -1/-2 reader."""
        import numpy as np

        from ema_tpu import config
        from ema_tpu.core.pipeline import Aligner, ReadBatch
        from ema_tpu.utils import samdiff
        from ema_tpu.utils.barcodes import encode_bc_default
        from ema_tpu.utils.replay import ReplayWriter
        from ema_tpu.index import build_index

        contigs, ids, bc_strs, bcs, s1, q1, s2, q2 = _world(seed=41)
        rng = np.random.default_rng(17)
        bases = np.array(list("ACGT"))
        bc20 = {b: "".join(rng.choice(bases, 20))
                for b in dict.fromkeys(bc_strs)}
        heads = [f"d{i}" for i in range(len(ids))]
        nbcs = [encode_bc_default(bc20[b]) for b in bc_strs]

        fq1 = tmp_path / "r1.fq"
        fq2 = tmp_path / "r2.fq"
        with open(fq1, "w") as f1, open(fq2, "w") as f2:
            for i in range(len(ids)):
                rid = f"{heads[i]}:{bc20[bc_strs[i]]}"
                f1.write(f"@{rid}\n{s1[i]}\n+\n{q1[i]}\n")
                f2.write(f"@{rid}\n{s2[i]}\n+\n{q2[i]}\n")

        idx = build_index(contigs)
        cfg = config.RunConfig(batch_size=512, seed=7,
                               platform=config.get_platform_profile("dbs"))
        aligner = Aligner(idx, cfg)
        writer = ReplayWriter(str(tmp_path / "replay"),
                              idx.names, [int(x) for x in idx.lengths])
        aligner.replay_sink = writer.add
        batch = ReadBatch.from_pairs(heads, nbcs, s1, q1, s2, q2)
        lines = aligner.align_batch_to_sam(batch)
        writer.close()
        ours = tmp_path / "ours.sam"
        ours.write_text("".join(l if l.endswith("\n") else l + "\n"
                                for l in lines))
        ref = tmp_path / "ref.sam"
        oracle.run_align_oracle_paired(tmp_path / "replay", fq1, fq2, ref,
                                       platform="dbs")
        st = samdiff.diff_sams(str(ours), str(ref))
        print(st.summary())
        assert st.shared > 400
        assert st.only_a == 0 and st.only_b == 0, st.mismatches[:10]
        assert st.concordance() >= 0.999, "\n".join(
            [st.summary()] + st.mismatches)
        assert st.bx_match == st.shared, st.mismatches[:10]
