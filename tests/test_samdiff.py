"""SAM concordance diff harness (reference comparator, SURVEY.md §4)."""

import os

import numpy as np
import pytest

from ema_tpu import config
from ema_tpu.core.pipeline import Aligner, ReadBatch
from ema_tpu.index import build_index
from ema_tpu.utils.samdiff import diff_sams
from tests.simulate import rand_genome, simulate_pairs, to_str


@pytest.fixture(scope="module")
def sam_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("samdiff")
    rng = np.random.default_rng(3)
    genome = rand_genome(rng, 80_000)
    idx = build_index({"c1": genome})
    ids, bc_strs, bcs, s1, q1, s2, q2, _ = simulate_pairs(
        rng, to_str(genome), n_barcodes=4)
    batch = ReadBatch.from_pairs(ids, bcs, s1, q1, s2, q2)
    lines = Aligner(idx, config.RunConfig(batch_size=64)).align_batch_to_sam(
        batch)
    a = d / "a.sam"
    a.write_text("".join(lines))
    # b: same records shuffled, MI ids bijectively renamed (order noise a
    # reference run with threads would produce)
    shuf = list(lines)
    rng.shuffle(shuf)
    ren = []
    for ln in shuf:
        ren.append(ln.replace("\tMI:i:", "\tMI:i:9"))
    b = d / "b.sam"
    b.write_text("".join(ren))
    return str(a), str(b), lines, str(d)


def test_self_diff_full_concordance(sam_pair):
    a, b, lines, d = sam_pair
    st = diff_sams(a, b)
    assert st.shared == st.n_a == st.n_b > 0
    assert st.concordance() == 1.0
    assert st.mapq_match == st.shared
    assert st.bx_match == st.shared
    assert st.mi_consistent == st.shared      # bijective rename is OK


def test_diff_detects_divergence(sam_pair):
    a, b, lines, d = sam_pair
    # perturb: move one record, change one mapq, break one MI bijection
    import re
    mod = list(lines)
    f = mod[0].split("\t")
    f[3] = str(int(f[3]) + 1000)
    mod[0] = "\t".join(f)
    f = mod[1].split("\t")
    f[4] = str((int(f[4]) + 13) % 60)
    mod[1] = "\t".join(f)
    mod[2] = re.sub(r"\tMI:i:\d+", "\tMI:i:0", mod[2])
    mod[3] = re.sub(r"\tMI:i:\d+", "\tMI:i:1", mod[3])
    c = os.path.join(d, "c.sam")
    with open(c, "w") as fh:
        fh.write("".join(mod))
    st = diff_sams(a, c)
    assert st.pos_match == st.shared - 1
    assert st.mapq_match <= st.shared - 1
    assert st.concordance() < 1.0
    assert any("pos" in m for m in st.mismatches)


def test_cli_fail_under(sam_pair, capsys):
    a, b, lines, d = sam_pair
    from ema_tpu import cli
    assert cli.main(["samdiff", a, b, "--fail-under", "99.9"]) == 0
    out = capsys.readouterr().out
    assert "concordance" in out


REF_SAM = os.environ.get("EMA_REFERENCE_SAM")
REF_OURS = os.environ.get("EMA_TPU_SAM")


@pytest.mark.skipif(
    not (REF_SAM and REF_OURS and os.path.exists(REF_SAM)
         and os.path.exists(REF_OURS)),
    reason="reference EMA SAM not available (set EMA_REFERENCE_SAM + "
           "EMA_TPU_SAM to captured outputs; reference must run with -t1, "
           "no -d — SURVEY.md §4)")
def test_reference_concordance():
    st = diff_sams(REF_OURS, REF_SAM, pos_tol=0)
    print(st.summary())
    assert 100.0 * st.concordance() >= 99.0
