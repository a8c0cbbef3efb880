"""sweep_groups_batch must produce exactly what per-group sweep_group
produces: same entries, candidate placement, chain components, gamma
init and weights (bitwise), with collision groups routed through the
exact per-group loop path."""

import numpy as np

from ema_tpu import config
from ema_tpu.core import groups
from ema_tpu.core.records import empty_records


def _rand_world(rng, n_grp, with_collisions):
    rows = []
    idents = []
    pair_id = 0
    for g in range(n_grp):
        bc = 100 + g
        n_pairs = int(rng.integers(1, 40))
        base = int(rng.integers(0, 5_000_000))
        for _ in range(n_pairs):
            pp = pair_id
            pair_id += 1
            for mate in (0, 1):
                for _c in range(int(rng.integers(1, 4))):
                    rows.append((bc, pp, mate, int(rng.integers(0, 2)),
                                 base + int(rng.integers(0, 200_000)),
                                 int(rng.integers(0, 2)),
                                 -float(rng.random() * 10)))
                    idents.append(f"r{pp}")
        if with_collisions and rng.random() < 0.3:
            # a same-read candidate 5 bp away lands in the same cloud ->
            # collision -> the group must take the loop path
            bcx, ppx, matex, chx, posx, revx, scx = rows[-1]
            rows.append((bcx, ppx, matex, chx, posx + 5, revx, scx - 0.1))
            idents.append(f"r{ppx}")
    recs = empty_records(len(rows))
    for i, (bc, pp, mate, ch, pos, rev, sc) in enumerate(rows):
        recs["bc"][i] = bc
        recs["pair"][i] = pp
        recs["mate"][i] = mate
        recs["chrom"][i] = ch
        recs["pos"][i] = pos
        recs["rev"][i] = rev
        recs["score"][i] = sc
    idents = np.array(idents, dtype=object)
    o = np.argsort(recs["bc"], kind="stable")
    return recs[o], idents[o]


def _canon_partition(comp):
    seen = {}
    return [seen.setdefault(int(v), len(seen)) for v in comp]


def _pad(x, C, fill=0):
    out = np.full((x.shape[0], C), fill, x.dtype)
    out[:, :x.shape[1]] = x
    return out


def _assert_states_equal(a, b, k):
    assert a.n == b.n and a.n_entries == b.n_entries \
        and a.n_clouds == b.n_clouds, k
    assert np.array_equal(a.order, b.order), (k, "order")
    assert np.array_equal(a.R, b.R), (k, "R")
    assert np.array_equal(a.RI, b.RI), (k, "RI")
    C = max(a.cmask.shape[1], b.cmask.shape[1])
    m = _pad(a.cmask, C)
    assert np.array_equal(m, _pad(b.cmask, C)), (k, "cmask")
    assert np.array_equal(np.where(m, _pad(a.cand_rec, C), 0),
                          np.where(m, _pad(b.cand_rec, C), 0)), (k, "rec")
    assert np.array_equal(np.where(m, _pad(a.cand_cloud, C), 0),
                          np.where(m, _pad(b.cand_cloud, C), 0)), (k, "cl")
    assert np.array_equal(a.mate_entry, b.mate_entry), (k, "mate")
    assert _canon_partition(a.comp) == _canon_partition(b.comp), (k, "comp")
    assert np.array_equal(np.where(m, _pad(a.gammas, C), 0.0),
                          np.where(m, _pad(b.gammas, C), 0.0)), (k, "gam")
    assert np.array_equal(a.weights, b.weights), (k, "w")
    assert list(a.cloud_bad) == list(b.cloud_bad), (k, "bad")
    assert a.needs_em == b.needs_em, (k, "em")


def test_batched_sweep_matches_per_group():
    for trial in range(6):
        rng = np.random.default_rng(trial)
        for pname in ("10x", "tru"):
            profile = config.get_platform_profile(pname)
            recs, idents = _rand_world(rng, int(rng.integers(1, 25)),
                                       trial % 2 == 1)
            bcs = recs["bc"]
            starts = np.concatenate(
                [[0], np.nonzero(np.diff(bcs))[0] + 1, [len(bcs)]])
            b_states = groups.sweep_groups_batch(
                recs, idents, starts, profile,
                rng=np.random.default_rng(1))
            g_states = [groups.sweep_group(
                recs[s:e], idents[s:e].astype(str), profile,
                rng=np.random.default_rng(1))
                for s, e in zip(starts[:-1], starts[1:])]
            assert len(b_states) == len(g_states)
            for k, (a, b) in enumerate(zip(b_states, g_states)):
                _assert_states_equal(a, b, (trial, pname, k))


def test_batched_sweep_empty():
    recs = empty_records(0)
    idents = np.array([], dtype=object)
    assert groups.sweep_groups_batch(
        recs, idents, np.array([0, 0]),
        config.get_platform_profile("10x")) == []


def test_deep_entry_does_not_widen_other_groups():
    """One dispersed-repeat read with hundreds of single-cloud candidates
    must not widen other groups' padded arrays (RSS / EM routing): the
    deep group falls back to the loop path, the rest keep their own
    candidate depth."""
    profile = config.get_platform_profile("10x")
    rows = []
    idents = []
    # group A: normal, 2 candidates deep
    for p in range(3):
        for mate in (0, 1):
            for c in range(2):
                rows.append((100, p, mate, 0, 1000 + p * 50 + c * 200_000))
                idents.append(f"a{p}")
    # group B: one read with DEEP_SWEEP_C+40 dispersed candidates
    # (each its own cloud -> no collision)
    deep_n = groups.DEEP_SWEEP_C + 40
    for c in range(deep_n):
        rows.append((200, 50, 0, 0, 1_000_000 + c * 200_000))
        idents.append("deep")
    rows.append((200, 50, 1, 0, 1_000_200))
    idents.append("deep")
    recs = empty_records(len(rows))
    for i, (bc, pp, mate, ch, pos) in enumerate(rows):
        recs["bc"][i] = bc
        recs["pair"][i] = pp
        recs["mate"][i] = mate
        recs["chrom"][i] = ch
        recs["pos"][i] = pos
        recs["score"][i] = -1.0
    idents = np.array(idents, dtype=object)
    o = np.argsort(recs["bc"], kind="stable")
    recs, idents = recs[o], idents[o]
    starts = np.concatenate(
        [[0], np.nonzero(np.diff(recs["bc"]))[0] + 1, [len(recs)]])
    states = groups.sweep_groups_batch(recs, idents, starts, profile)
    assert len(states) == 2
    # group A keeps its own narrow padding
    assert states[0].cmask.shape[1] == 2
    # group B (loop path) has the deep entry, MAX_CANDIDATES-capped
    assert states[1].cmask.shape[1] == min(deep_n, config.MAX_CANDIDATES)
    # both agree with the per-group reference path
    for st, (s, e) in zip(states, zip(starts[:-1], starts[1:])):
        ref = groups.sweep_group(recs[s:e], idents[s:e].astype(str),
                                 profile)
        _assert_states_equal(st, ref, "deep")


def test_finish_groups_batch_matches_per_group():
    """finish_groups_batch must reproduce finish_group exactly: same
    emit pairs/order, gammas, cloud ids, alts, mates, dup marks."""
    import copy

    for trial in range(6):
        rng = np.random.default_rng(100 + trial)
        recs, idents = _rand_world(rng, int(rng.integers(2, 20)),
                                   trial % 2 == 1)
        bcs = recs["bc"]
        starts = np.concatenate(
            [[0], np.nonzero(np.diff(bcs))[0] + 1, [len(bcs)]])
        profile = config.get_platform_profile("10x" if trial % 3 else "tru")
        sts_a = groups.sweep_groups_batch(recs.copy(), idents, starts,
                                          profile,
                                          rng=np.random.default_rng(1))
        sts_b = groups.sweep_groups_batch(recs.copy(), idents, starts,
                                          profile,
                                          rng=np.random.default_rng(1))
        # run EM on both (same path) so gammas are post-EM
        groups.run_em_host_batch(sts_a)
        groups.run_em_host_batch(sts_b)
        # randomly deactivate some records identically (SA analog)
        for st_a, st_b in zip(sts_a, sts_b):
            kill = np.random.default_rng(5).random(st_a.n) < 0.05
            st_a.R["active"][kill] = False
            st_b.R["active"][kill] = False
        bases = [1000 * k for k in range(len(sts_a))]
        got = groups.finish_groups_batch(sts_a, bases)
        want = [groups.finish_group(st, b) for st, b in zip(sts_b, bases)]
        assert len(got) == len(want)
        for k, (a, b) in enumerate(zip(got, want)):
            assert a.emit_pairs == b.emit_pairs, (trial, k, "pairs")
            np.testing.assert_array_equal(a.gamma, b.gamma,
                                          err_msg=f"{k} gamma")
            np.testing.assert_array_equal(a.cloud_id, b.cloud_id,
                                          err_msg=f"{k} cloud")
            np.testing.assert_array_equal(a.cloud_bad, b.cloud_bad,
                                          err_msg=f"{k} bad")
            np.testing.assert_array_equal(a.alt_idx, b.alt_idx,
                                          err_msg=f"{k} alt")
            np.testing.assert_array_equal(a.selected_mate,
                                          b.selected_mate,
                                          err_msg=f"{k} mate")
            np.testing.assert_array_equal(a.records["duplicate"],
                                          b.records["duplicate"],
                                          err_msg=f"{k} dup")
            assert a.n_clouds == b.n_clouds
