"""SW-kernel microbenchmark + speed-of-light artifact at pipeline shapes.

Compares the scorers (anti-diagonal scan / anti-diagonal Pallas / banded
scan / banded Pallas) on the attached device, measures the device's
achievable int32 VPU throughput with a pure-ALU Pallas probe, and writes
a roofline artifact (BENCH_SW_r04.json):

  - per-variant ms and Gcell/s (banded cells = B*m*W)
  - measured VPU int32 ops/s (probe kernel, serial-chain ILP=8)
  - static ops/cell count for the banded kernel -> % of roofline
  - band padding waste: mean per-candidate logical corridor wl vs the
    128-rounded physical band W, sampled from real pipeline chaining

Time is measured to full host readback (block_until_ready returns early
through the axon tunnel).  Run ONE at a time; the tunnel admits a single
client.

    PYTHONPATH=. python tools/bench_sw.py [cpu] [--json OUT.json]
"""

from __future__ import annotations

import json
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

# Static int32-VPU op count per banded DP cell for _banded_kernel's
# packed-scan path at W=128 (one lane-row = one cell).  Counted from the
# kernel body, one unit per elementwise op/select/compare/roll on a
# [B, W] block (rolls on m_pad/n_pad lanes scaled by lane ratio):
#   read_col extract+reduce ~8, ref_row 1, valid 5, sub 6, fresh 2,
#   Hd/Sd 4, f_open/f_ext 6, F 1, SF 6, H0/S0 3, A 2, AK pack 4,
#   P init 2, log2(128)*3=21 scan, E 3, H 1, SH 5, masks 2, end_adj 2,
#   cand 2, best updates 4, read/ref rolls 3.
BANDED_OPS_PER_CELL = 93


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


def vpu_peak_probe(iters=3):
    """Measured int32 VPU throughput: a Pallas kernel running K rounds of
    8 independent 3-op dependency chains (xor/add/max) on a [256, 128]
    VMEM block.  8-way ILP covers the VPU's multiple ALUs; the xor of the
    loop index defeats constant folding.  Returns achieved int32 ops/s.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, K, CHAINS = 256, 128, 4096, 8
    OPS = B * L * K * CHAINS * 3

    def kern(x_ref, o_ref):
        accs = [x_ref[:] + j for j in range(CHAINS)]

        def body(i, accs):
            return tuple(jnp.maximum(a ^ i, a + j)
                         for j, a in enumerate(accs))

        accs = jax.lax.fori_loop(1, K + 1, body, tuple(accs))
        tot = accs[0]
        for a in accs[1:]:
            tot = tot ^ a
        o_ref[:] = tot

    x = jnp.arange(B * L, dtype=jnp.int32).reshape(B, L)
    fn = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32))
    fn = jax.jit(fn)
    _ = np.asarray(fn(x))                # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        _ = np.asarray(fn(x))
        best = min(best, time.time() - t0)
    return OPS / best


def sample_pipeline_wl(n_pairs=2000):
    """Sample the per-candidate logical corridor width (wl) distribution
    from real pipeline chaining on a simulated world, by intercepting the
    scorer dispatch (chain-derived wl only; mate-rescue full-window calls
    excluded).  Returns (mean_wl, p95_wl, n_samples)."""
    from tests.simulate import rand_genome, simulate_pairs, to_str
    from ema_tpu import config
    from ema_tpu.core.pipeline import Aligner, ReadBatch
    from ema_tpu.index import build_index

    rng = np.random.default_rng(7)
    genome = rand_genome(rng, 400_000)
    idx = build_index({"chr1": genome})
    ids, bc_strs, bcs, s1, q1, s2, q2, truth = simulate_pairs(
        rng, to_str(genome), n_barcodes=max(n_pairs // 60, 1),
        frags_per_bc=(2, 4), pairs_per_frag=(15, 25), frag_len=30_000,
        read_len=100, err=0.003)
    samples = []
    from ema_tpu.ops import chaining
    orig = chaining.chain_hits

    def spy(*a, **kw):
        cands = orig(*a, **kw)
        if len(samples) < 64:
            samples.append(np.asarray(cands.wl).copy())
        return cands

    chaining.chain_hits = spy
    try:
        aligner = Aligner(idx, config.RunConfig())
        batch = ReadBatch.from_pairs(ids, bcs, s1, q1, s2, q2)
        aligner.align_batch_to_sam(batch)
    finally:
        chaining.chain_hits = orig
    if not samples:
        return None
    allwl = np.concatenate(samples)
    allwl = allwl[allwl > 0]
    return (float(allwl.mean()), float(np.percentile(allwl, 95)),
            int(allwl.size))


def main():
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    dev = jax.devices()[0]
    platform = dev.platform
    print(f"device: {platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    B_env = int(os.environ.get("EMA_TPU_BENCH_SW_B", "16384"))
    shapes = [(B_env, 100, 192, 128)]
    artifact = {
        "what": "SW kernel microbench + speed-of-light roofline",
        "platform": platform,
        "device_kind": str(getattr(dev, "device_kind", "?")),
        "variants": {},
    }
    for B, m, n, W in shapes:
        args = make_case(rng, B, m, n, W)
        cells = B * m * n
        bcells = B * m * W
        results = {}
        variants = [
            ("scan", lambda a: sw.sw_score_batch(*a)),
            ("banded-scan", lambda a: sw.sw_score_banded(*a, W)),
        ]
        if platform != "cpu":
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
                artifact["variants"][name] = {
                    "ms": round(dt * 1e3, 2),
                    "gcells_per_s": round(c / dt / 1e9, 3),
                    "full_window_gcells_per_s": round(cells / dt / 1e9, 3),
                }
                print(f"B={B} m={m} n={n} W={W} {name:14s} "
                      f"{dt*1e3:8.2f} ms  {c/dt/1e9:7.2f} Gcell/s "
                      f"({cells/dt/1e9:.2f} full-window Gc/s, "
                      f"warm {warm:.1f}s)", flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}",
                      flush=True)
        # cross-check equality between available variants
        names = list(results)
        mismatches = []
        for a in names[1:]:
            for k in ("score", "qb", "qe", "ref_end"):
                if not np.array_equal(results[names[0]][k], results[a][k]):
                    bad = np.nonzero(
                        results[names[0]][k] != results[a][k])[0][:5]
                    print(f"  MISMATCH {names[0]} vs {a} on {k} at {bad}")
                    mismatches.append([names[0], a, k])
                    break
            else:
                print(f"  {names[0]} == {a}")
        artifact["bit_exact_across_variants"] = not mismatches
        if mismatches:
            artifact["mismatches"] = mismatches

        # --- roofline: measured VPU peak vs banded kernel ops/cell ---
        try:
            t0 = time.time()
            vpu = vpu_peak_probe()
            print(f"VPU int32 probe: {vpu/1e12:.3f} Tops/s "
                  f"(probe wall {time.time()-t0:.1f}s)", flush=True)
            artifact["vpu_int32_tops_measured"] = round(vpu / 1e12, 4)
            best_banded = max(
                (v["gcells_per_s"]
                 for k, v in artifact["variants"].items() if "banded" in k),
                default=None)
            if best_banded:
                ach_ops = best_banded * 1e9 * BANDED_OPS_PER_CELL
                artifact["banded_ops_per_cell_static"] = BANDED_OPS_PER_CELL
                artifact["banded_roofline_pct"] = round(
                    100.0 * ach_ops / vpu, 1)
                print(f"banded kernel: {best_banded:.2f} Gcell/s x "
                      f"{BANDED_OPS_PER_CELL} ops/cell = "
                      f"{ach_ops/1e12:.3f} Tops/s = "
                      f"{100*ach_ops/vpu:.1f}% of measured VPU peak",
                      flush=True)
        except Exception as e:
            print(f"VPU probe FAILED {type(e).__name__}: {e}", flush=True)

        # --- band padding waste vs the true logical corridor ---
        try:
            t0 = time.time()
            wlstat = sample_pipeline_wl()
            if wlstat:
                mean_wl, p95_wl, n_wl = wlstat
                artifact["pipeline_wl_mean"] = round(mean_wl, 1)
                artifact["pipeline_wl_p95"] = round(p95_wl, 1)
                artifact["pipeline_wl_samples"] = n_wl
                artifact["band_padding_waste_factor"] = round(
                    W / mean_wl, 2)
                print(f"pipeline wl: mean {mean_wl:.1f} p95 {p95_wl:.1f} "
                      f"over {n_wl} candidates -> padding waste "
                      f"{W/mean_wl:.2f}x at W={W} "
                      f"(sampled in {time.time()-t0:.1f}s)", flush=True)
        except Exception as e:
            print(f"wl sampling FAILED {type(e).__name__}: {e}",
                  flush=True)

    if out_json:
        with open(out_json, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {out_json}", flush=True)


if __name__ == "__main__":
    main()
