"""Contig-sharded index == single index (same SAM output, modulo MI)."""

import re

import numpy as np
import pytest

from ema_tpu import config
from ema_tpu.core.pipeline import Aligner, ReadBatch, ShardedAligner
from ema_tpu.index import build_index, build_index_sharded
from tests.simulate import rand_genome, simulate_pairs, to_str


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(21)
    contigs = {f"c{i}": rand_genome(rng, 30_000 + 5_000 * i)
               for i in range(4)}
    genome_str = to_str(np.concatenate(list(contigs.values())))
    ids, bc_strs, bcs, s1, q1, s2, q2, truth = simulate_pairs(
        rng, genome_str, n_barcodes=5, frags_per_bc=(1, 3),
        pairs_per_frag=(6, 12), frag_len=12_000, read_len=80, err=0.003)
    batch = ReadBatch.from_pairs(ids, bcs, s1, q1, s2, q2)
    return contigs, batch


def _norm(lines):
    return sorted(re.sub(r"\tMI:i:\d+", "\tMI:i:*", ln) for ln in lines)


def test_sharded_equals_single(world):
    contigs, batch = world
    single = build_index(dict(contigs))
    # force 3 shards: contigs are 30/35/40/45 kbp
    shv = build_index_sharded(dict(contigs), max_shard_bases=70_000)
    assert shv.n_shards >= 2
    assert shv.names == single.names
    np.testing.assert_array_equal(shv.lengths, single.lengths)

    cfg = config.RunConfig(batch_size=256)
    a = Aligner(single, cfg).align_batch_to_sam(batch)
    b = ShardedAligner(shv, cfg).align_batch_to_sam(batch)
    assert len(b) == len(a)
    assert _norm(b) == _norm(a)


def test_sharded_save_load(world, tmp_path):
    contigs, batch = world
    shv = build_index_sharded(dict(contigs), max_shard_bases=70_000)
    shv.save(str(tmp_path / "idx.d"))
    from ema_tpu.index import ShardedIndex
    back = ShardedIndex.load(str(tmp_path / "idx.d"))
    assert back.n_shards == shv.n_shards
    assert back.names == shv.names
    assert back.contig_base == shv.contig_base


def test_oversized_contig_rejected():
    with pytest.raises(ValueError):
        build_index_sharded({"big": np.zeros(1000, np.uint8)},
                            max_shard_bases=500)


def test_build_and_save_sharded_parallel(tmp_path):
    """Parallel per-shard builds produce byte-identical artifacts to the
    serial in-memory path."""
    import numpy as np

    from ema_tpu.index import (ShardedIndex, build_and_save_sharded,
                               build_index_sharded)

    rng = np.random.default_rng(8)
    contigs = {f"c{i}": rng.integers(0, 4, 40_000).astype(np.uint8)
               for i in range(4)}
    serial = build_index_sharded(contigs, max_shard_bases=70_000)
    out = build_and_save_sharded(contigs, str(tmp_path / "idx.d"),
                                 max_shard_bases=70_000, n_workers=2)
    assert out.n_shards == serial.n_shards > 1
    reloaded = ShardedIndex.load(str(tmp_path / "idx.d"))
    for a, b in zip(serial.shards, reloaded.shards):
        assert a.names == b.names
        np.testing.assert_array_equal(a.occ_blocks, b.occ_blocks)
        np.testing.assert_array_equal(a.sa_values, b.sa_values)
        np.testing.assert_array_equal(a.text, b.text)
        assert a.primary == b.primary
