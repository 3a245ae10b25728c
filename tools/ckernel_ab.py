"""C-kernel on/off A/B on the headline job (VERDICT r5 #8).

Runs bench.py's headline tile-encode + PIP stage twice in fresh
subprocesses — C fast paths ON (default) and OFF (HGT2OSM2_NO_CKERNEL=1,
the pure-Python fallback that is also the golden oracle) — and records
both into BENCH/ckernel_ab.json, which tools/scaling_bench.py folds into
BENCH/BASELINE.md as the fallback's recorded price tag.

Usage: python tools/ckernel_ab.py  (~3-4 min; nothing else concurrent)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TILES = int(os.environ.get("BENCH_TILES", "2048"))
TILE_SIZE = int(os.environ.get("BENCH_TILE_SIZE", "201"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def run_once(no_ckernel: bool) -> dict:
    env = dict(os.environ)
    env.update(
        BENCH_HEADLINE_ONLY="1",
        BENCH_TILES=str(TILES),
        BENCH_TILE_SIZE=str(TILE_SIZE),
        SPARK_GRAFT_CPUS=str(CORES),
    )
    if no_ckernel:
        env["HGT2OSM2_NO_CKERNEL"] = "1"
    else:
        env.pop("HGT2OSM2_NO_CKERNEL", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
        raise SystemExit(
            f"bench child failed (rc={out.returncode}, "
            f"no_ckernel={no_ckernel})")
    rec = json.loads(lines[-1])
    return {
        "sec": rec["queries"]["tile_encode_pip"],
        "images_per_sec": rec["value"],
    }


def main() -> None:
    on = run_once(no_ckernel=False)
    print("C ON :", json.dumps(on))
    off = run_once(no_ckernel=True)
    print("C OFF:", json.dumps(off))
    rec = {
        "metric": "ckernel_on_off_ab",
        "tiles": TILES,
        "tile_size": TILE_SIZE,
        "cores": CORES,
        "on": on,
        "off": off,
        "slowdown": round(on["images_per_sec"] / max(off["images_per_sec"], 1e-9), 2),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ckernel_ab.json"), "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))
    print("wrote BENCH/ckernel_ab.json (fold into BASELINE.md via scaling_bench)")


if __name__ == "__main__":
    main()
