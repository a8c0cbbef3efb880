"""Pallas SW kernel == scan SW kernel (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ema_tpu.ops.sw import sw_score_batch
from ema_tpu.ops.sw_pallas import sw_score_batch_pallas


@pytest.mark.parametrize("seed,B,m,W", [(0, 16, 24, 48), (1, 8, 33, 80)])
def test_pallas_equals_scan(seed, B, m, W):
    rng = np.random.default_rng(seed)
    reads = rng.integers(0, 4, (B, m)).astype(np.int32)
    reads[rng.random((B, m)) < 0.05] = 4
    rl = rng.integers(m // 2, m + 1, B).astype(np.int32)
    refs = rng.integers(0, 4, (B, W)).astype(np.int32)
    wl = rng.integers(10, W + 1, B).astype(np.int32)
    for i in range(0, B, 2):                 # plant real alignments
        L = int(rl[i])
        s = int(rng.integers(0, W - L)) if W > L else 0
        refs[i, s:s + L] = reads[i, :L]

    a = sw_score_batch(jnp.asarray(reads), jnp.asarray(rl),
                       jnp.asarray(refs), jnp.asarray(wl))
    b = sw_score_batch_pallas(jnp.asarray(reads), jnp.asarray(rl),
                              jnp.asarray(refs), jnp.asarray(wl),
                              interpret=True)
    for k in ("score", "qb", "qe", "ref_end"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_pallas_zero_and_empty_rows():
    B, m, W = 8, 16, 32
    reads = np.full((B, m), 4, np.int32)       # all N
    rl = np.full(B, m, np.int32)
    rl[0] = 0                                   # zero-length read
    refs = np.zeros((B, W), np.int32)
    wl = np.full(B, W, np.int32)
    wl[1] = 0                                   # zero-length window
    out = sw_score_batch_pallas(jnp.asarray(reads), jnp.asarray(rl),
                                jnp.asarray(refs), jnp.asarray(wl),
                                interpret=True)
    ref = sw_score_batch(jnp.asarray(reads), jnp.asarray(rl),
                         jnp.asarray(refs), jnp.asarray(wl))
    for k in ("score", "qb", "qe", "ref_end"):
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))


class TestPackedScan:
    def test_packed_and_unpacked_scan_match_xla(self):
        """The packed (A<<17|k<<8|s0) one-scan path must equal the XLA
        banded kernel bit-for-bit; m >= 256 falls back to the two-array
        scan, also asserted (the static `packed` gate in _banded_kernel)."""
        import numpy as np
        import jax.numpy as jnp

        from ema_tpu.ops import sw as sw_scan
        from ema_tpu.ops.sw_pallas import sw_score_banded_pallas

        rng = np.random.default_rng(17)
        for m, W, tile in ((100, 128, 8), (300, 128, 8)):  # packed / fallback
            B, n = 8, m + W + 20
            reads = rng.integers(0, 5, (B, m)).astype(np.int32)
            rlens = rng.integers(m - 20, m + 1, B).astype(np.int32)
            refs = rng.integers(0, 4, (B, n)).astype(np.int32)
            nlens = rng.integers(m, n + 1, B).astype(np.int32)
            for b in range(0, B, 2):        # planted hits incl. a gap
                L = int(rlens[b])
                seg = np.concatenate([reads[b, :40], reads[b, 43:L]])
                refs[b, 5:5 + seg.shape[0]] = seg % 4
            want = {k: np.asarray(v) for k, v in sw_scan.sw_score_banded(
                jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(refs),
                jnp.asarray(nlens), W).items()}
            got = {k: np.asarray(v) for k, v in sw_score_banded_pallas(
                jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(refs),
                jnp.asarray(nlens), W, interpret=True,
                tile_b=tile).items()}
            for k in ("score", "qb", "qe", "ref_end"):
                np.testing.assert_array_equal(got[k], want[k],
                                              err_msg=f"m={m} {k}")
