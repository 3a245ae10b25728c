"""Memory-bandwidth roofline vs the kernel chain (VERDICT r6 #5).

The 8->32 scaling pair has sat below 0.8 since round 1 with a
*plausible* but unmeasured explanation: one socket, one DRAM bus —
resources a real 4N-executor cluster scales with executor count. This
tool measures it:

  1. ROOFLINE — aggregate numpy.copyto bandwidth (pure streaming
     read+write, no compute) at 1 / 8 / 32 concurrent processes.
     copyto has no Python loop, no Spark, no cache reuse (buffers are
     8x LLC); its 8->32 efficiency is the HOST's memory ceiling: if a
     pure copy cannot scale 8->32, nothing memory-resident can.
  2. KERNEL CHAIN — the same decode -> marching -> stitch -> post
     C-kernel chain the headline job runs, as bare per-process loops
     (no Spark, no Arrow, no scheduler: compute + memory only) at the
     same 1 / 8 / 32 levels.

Verdict rule: if the kernel chain's 8->32 efficiency is within 10
points of the copyto ceiling (or above it), the chain is AT the
host's memory roofline and the scaling caveat is measured, not
asserted. If the chain sits well below the copy ceiling, the gap is
schedulable work (sync, allocator, scheduling), not the bus.

Traffic accounting for GB/s: copyto moves (read + write + RFO) = 3x
the buffer per pass (write-allocate hardware; the conventional STREAM
"copy" convention is 2x — both numbers are printed). The kernel chain
prints tiles/sec, its measured per-tile traffic is not separately
instrumented — the comparison metric is the EFFICIENCY ratio, which
needs no traffic model.

Writes BENCH/ROOFLINE.md + BENCH/roofline.json. Run alone (no Spark
concurrently) — host contention corrupts the numbers.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVELS = [1, 8, 32]
COPY_MB = int(os.environ.get("ROOFLINE_COPY_MB", "256"))
COPY_REPS = int(os.environ.get("ROOFLINE_COPY_REPS", "8"))
CHAIN_TILES = int(os.environ.get("ROOFLINE_CHAIN_TILES", "96"))
TILE_SIZE = int(os.environ.get("ROOFLINE_TILE_SIZE", "201"))
REPEATS = int(os.environ.get("ROOFLINE_REPEATS", "3"))


def _copy_worker(barrier, out_q, mb, reps):
    import numpy as np

    n = mb * 1024 * 1024 // 8
    src = np.arange(n, dtype=np.float64)  # touch: pages resident
    dst = np.empty_like(src)
    np.copyto(dst, src)  # warm
    barrier.wait()
    t0 = time.perf_counter()
    for _ in range(reps):
        np.copyto(dst, src)
    dt = time.perf_counter() - t0
    out_q.put((dt, mb * reps))


def _chain_worker(barrier, out_q, n_tiles, size, wid):
    import numpy as np

    from hgt2osm2_spark.kernels import codecs, marching, postprocess, stitch
    from hgt2osm2_spark.sources.synthetic import heightfield

    # the BENCH tile distribution (same heightfield generator as the
    # headline job), pre-encoded so DECODE is inside the measured loop;
    # tiles vary by worker id so 32 procs don't all walk identical
    # cache-friendly data
    payloads = [
        codecs.encode(heightfield(wid * 7 + j, size, 42), "hgt")
        for j in range(2)
    ]

    def one(payload):
        grid = codecs.decode(payload, "hgt", size, size).astype(np.float64)
        seg = marching.extract_segments(grid, 20.0, -0.5)
        polys = stitch.stitch_tile(seg)
        pls = [pl for lvl_pls in polys.values() for pl in lvl_pls]
        if pls:
            xs = np.concatenate([np.asarray([p[0] for p in pl]) for pl in pls])
            ys = np.concatenate([np.asarray([p[1] for p in pl]) for pl in pls])
            off = np.zeros(len(pls) + 1, dtype=np.int64)
            np.cumsum([len(pl) for pl in pls], out=off[1:])
            postprocess.run_polylines_batch(
                xs, ys, off, 3, 0.0005, 1.0 / size, 0.04)
        return len(seg)

    for p in payloads:
        one(p)  # warm (C kernels built, caches primed)
    barrier.wait()
    t0 = time.perf_counter()
    done = 0
    while done < n_tiles:
        one(payloads[done % len(payloads)])
        done += 1
    dt = time.perf_counter() - t0
    out_q.put((dt, done))


def run_level(target, procs: int, *args) -> tuple[float, float]:
    """best-of-REPEATS (wall, work_total) across all procs."""
    best = None
    for _ in range(REPEATS):
        barrier = mp.Barrier(procs + 1)
        q = mp.Queue()
        ps = [mp.Process(target=target, args=(barrier, q, *args, )
                         if target is _copy_worker
                         else (barrier, q, *args, i))
              for i in range(procs)]
        for p in ps:
            p.start()
        barrier.wait()
        t0 = time.perf_counter()
        results = [q.get() for _ in ps]
        for p in ps:
            p.join()
        wall = max(r[0] for r in results)
        work = sum(r[1] for r in results)
        if best is None or work / wall > best[1] / best[0]:
            best = (wall, work)
    return best


def main():
    out = {"levels": {}, "copy_mb": COPY_MB, "tile_size": TILE_SIZE}
    for procs in LEVELS:
        wall, mb = run_level(_copy_worker, procs, COPY_MB, COPY_REPS)
        gbs2 = mb / 1024.0 * 2 / wall  # STREAM convention (r+w)
        gbs3 = mb / 1024.0 * 3 / wall  # with write-allocate RFO
        out["levels"][procs] = {"copy_wall_s": round(wall, 3),
                                "copy_gbs_stream": round(gbs2, 2),
                                "copy_gbs_rfo": round(gbs3, 2)}
        print(f"copyto  x{procs:>2}: {gbs2:8.2f} GB/s (stream) "
              f"{gbs3:8.2f} GB/s (rfo)")
    for procs in LEVELS:
        wall, tiles = run_level(_chain_worker, procs, CHAIN_TILES, TILE_SIZE)
        tps = tiles / wall
        out["levels"][procs]["chain_tiles_per_s"] = round(tps, 1)
        print(f"kernel  x{procs:>2}: {tps:8.1f} tiles/s")

    def eff(metric, a, b):
        va = out["levels"][a][metric]
        vb = out["levels"][b][metric]
        return (vb / va) / (b / a)

    copy_eff = eff("copy_gbs_stream", 8, 32)
    chain_eff = eff("chain_tiles_per_s", 8, 32)
    out["eff_8_32"] = {"copy": round(copy_eff, 3), "chain": round(chain_eff, 3)}
    out["eff_1_8"] = {
        "copy": round(eff("copy_gbs_stream", 1, 8), 3),
        "chain": round(eff("chain_tiles_per_s", 1, 8), 3),
    }
    at_roofline = chain_eff >= copy_eff - 0.10
    out["verdict"] = (
        "chain 8->32 efficiency is at/above the pure-copy memory ceiling "
        "- the caveat is measured" if at_roofline else
        "chain sits below the copy ceiling - gap is schedulable work")
    print(json.dumps(out["eff_8_32"]), "->", out["verdict"])

    bench_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "roofline.json"), "w") as f:
        json.dump(out, f, indent=1)
    lines = [
        "# Memory roofline vs kernel chain (VERDICT r6 #5)",
        "",
        "Pure `numpy.copyto` aggregate bandwidth (no compute, no Spark)",
        "vs the bare decode->marching->stitch->post kernel chain, both at",
        "1/8/32 concurrent processes on this host. The copy ceiling is",
        "what ANY memory-resident workload can scale to; the comparison",
        "metric is 8->32 efficiency (no traffic model needed).",
        "",
        "| procs | copyto GB/s (stream) | copyto GB/s (+RFO) | chain tiles/s |",
        "|---|---|---|---|",
    ]
    for procs in LEVELS:
        lv = out["levels"][procs]
        lines.append(f"| {procs} | {lv['copy_gbs_stream']} | "
                     f"{lv['copy_gbs_rfo']} | {lv['chain_tiles_per_s']} |")
    lines += [
        "",
        f"8->32 efficiency: copyto {copy_eff:.3f}, chain {chain_eff:.3f}.",
        f"1->8 efficiency: copyto {out['eff_1_8']['copy']:.3f}, "
        f"chain {out['eff_1_8']['chain']:.3f}.",
        "",
        f"**Verdict: {out['verdict']}.**",
    ]
    with open(os.path.join(bench_dir, "ROOFLINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote BENCH/ROOFLINE.md + BENCH/roofline.json")


if __name__ == "__main__":
    main()
