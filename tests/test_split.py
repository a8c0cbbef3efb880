"""Density optimizer (-d) tests: the SA resolver keeps the multimapped
candidate in the dense read cluster (reference src/split.c objective)."""

import numpy as np

from ema_tpu import config
from ema_tpu.core import groups
from ema_tpu.core.records import empty_records


def _bad_cloud_group():
    """10 proper pairs clustered at ~1-2kb plus one double-mapped mate
    whose duplicate appearance in the same cloud marks it bad."""
    rows = []   # (pair, mate, pos, rev, score)
    for p in range(10):
        rows.append((p, 0, 1000 + p * 60, 0, -1.0))
        rows.append((p, 1, 1260 + p * 60, 1, -1.0))
    # pair 5 mate 0 multimaps: in-cluster and 40kb away (same cloud sweep)
    rows.append((5, 0, 1200, 0, -1.0))
    rows.append((5, 0, 40_000, 0, -1.0))
    recs = empty_records(len(rows))
    idents = []
    for i, (p, mate, pos, rev, score) in enumerate(rows):
        recs["pair"][i] = p
        recs["mate"][i] = mate
        recs["chrom"][i] = 0
        recs["pos"][i] = pos
        recs["rev"][i] = rev
        recs["score"][i] = score
        recs["bc"][i] = 7
        idents.append(f"r{p}")
    return recs, np.array(idents, dtype=object)


def test_split_prefers_dense_bin():
    recs, idents = _bad_cloud_group()
    profile = config.get_platform_profile("10x")
    res = groups.process_barcode_group(
        recs, idents, profile, apply_opt=True,
        rng=np.random.default_rng(0), n_pairs_in_group=10)
    R, RI = res.records, res.idents
    mm = np.nonzero((R["pair"] == 5) & (R["mate"] == 0))[0]
    assert mm.shape[0] == 3            # 1200, 1300 (orig), 40_000
    active = R["active"][mm]
    # the far candidate is deactivated; in-cluster ones stay
    far = R["pos"][mm] == 40_000
    assert not active[far].any()
    assert active[~far].sum() >= 1
    # the cloud is marked bad on the emitted record (XF tag source)
    emitted = [a for a, b in res.emit_pairs] + \
              [b for a, b in res.emit_pairs if b >= 0]
    assert res.cloud_bad[emitted].any()


def test_split_deterministic_with_seed():
    profile = config.get_platform_profile("10x")
    outs = []
    for _ in range(2):
        recs, idents = _bad_cloud_group()
        res = groups.process_barcode_group(
            recs, idents, profile, apply_opt=True,
            rng=np.random.default_rng(42), n_pairs_in_group=10)
        outs.append(res.records["active"].copy())
    np.testing.assert_array_equal(outs[0], outs[1])
