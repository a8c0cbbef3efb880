"""SW-kernel microbenchmark at pipeline shapes.

Compares the four scorers (anti-diagonal scan / anti-diagonal Pallas /
banded scan / banded Pallas) on the attached device.  Time is measured
to full host readback (block_until_ready returns early through the axon
tunnel).  Run ONE at a time; the tunnel admits a single client.

    PYTHONPATH=. python tools/bench_sw.py [cpu]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    os.environ["EMA_TPU_PLATFORM"] = "cpu"

from ema_tpu.utils.backend import ensure_backend

ensure_backend()

import jax
import jax.numpy as jnp

from ema_tpu.ops import sw
from ema_tpu.ops import sw_pallas


def make_case(rng, B, m, n, W):
    reads = rng.integers(0, 4, (B, m)).astype(np.int32)
    refs = rng.integers(0, 4, (B, n)).astype(np.int32)
    rlens = np.full(B, m, np.int32)
    nlens = np.full(B, n, np.int32)
    off = rng.integers(0, min(W - 8, n - m), B)
    for b in range(B):
        o = int(off[b])
        refs[b, o:o + m] = reads[b]
        for _ in range(3):
            p = rng.integers(0, m)
            refs[b, o + p] = (refs[b, o + p] + 1) % 4
    return (jnp.asarray(reads), jnp.asarray(rlens),
            jnp.asarray(refs), jnp.asarray(nlens))


def timed(fn, args, iters=5):
    out = fn(args)                       # compile + warm
    base = {k: np.asarray(v) for k, v in out.items()}
    t0 = time.time()
    for _ in range(iters):
        out = fn(args)
        _ = np.asarray(out["score"])     # force readback
    dt = (time.time() - t0) / iters
    return dt, base


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    shapes = [(16384, 100, 192, 128)]
    for B, m, n, W in shapes:
        args = make_case(rng, B, m, n, W)
        cells = B * m * n
        bcells = B * m * W
        results = {}
        variants = [
            ("scan", lambda a: sw.sw_score_batch(*a)),
            ("banded-scan", lambda a: sw.sw_score_banded(*a, W)),
        ]
        if dev.platform != "cpu":
            variants += [
                ("pallas", lambda a: sw_pallas.sw_score_batch_pallas(*a)),
                ("banded-pallas",
                 lambda a: sw_pallas.sw_score_banded_pallas(*a, W)),
                ("banded-pallas-t128",
                 lambda a: sw_pallas.sw_score_banded_pallas(
                     *a, W, tile_b=128)),
                ("banded-pallas-t512",
                 lambda a: sw_pallas.sw_score_banded_pallas(
                     *a, W, tile_b=512)),
                ("banded-pallas-t1024",
                 lambda a: sw_pallas.sw_score_banded_pallas(
                     *a, W, tile_b=1024)),
            ]
        for name, fn in variants:
            try:
                t0c = time.time()
                dt, out = timed(fn, args)
                warm = time.time() - t0c - 5 * dt
                c = bcells if "banded" in name else cells
                results[name] = out
                print(f"B={B} m={m} n={n} W={W} {name:14s} "
                      f"{dt*1e3:8.2f} ms  {c/dt/1e9:7.2f} Gcell/s "
                      f"({cells/dt/1e9:.2f} full-window Gc/s, "
                      f"warm {warm:.1f}s)", flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}",
                      flush=True)
        # cross-check equality between available variants
        names = list(results)
        for a in names[1:]:
            for k in ("score", "qb", "qe", "ref_end"):
                if not np.array_equal(results[names[0]][k], results[a][k]):
                    bad = np.nonzero(
                        results[names[0]][k] != results[a][k])[0][:5]
                    print(f"  MISMATCH {names[0]} vs {a} on {k} at {bad}")
                    break
            else:
                print(f"  {names[0]} == {a}")


if __name__ == "__main__":
    main()
