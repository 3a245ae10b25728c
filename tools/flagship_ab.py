"""Back-to-back flagship A/B between two pinned commit states.

VERDICT r7 "What's wrong #1": the flagship driver record moved
695.7 -> 589.3 img/s (r6 -> r7) but the session band on unchanged code
was 554-718, so the delta could be host phase rather than code. The
repo's own protocol (BENCH/ARROW_SWEEP.md) is: never believe a delta
that wasn't measured back-to-back, interleaved, in one session.

This driver alternates headline-only bench runs between two read-only
worktrees (default .ab/r6 = cfb668e, .ab/r7 = e360815), so every pair
of samples sees the same host phase. Each subprocess run performs a
warmup + BENCH_REPEATS timed headline passes; we keep ALL samples.

Usage:  python tools/flagship_ab.py [pairs]   (default 3 pairs)
Writes: BENCH/flagship_ab_r8.json
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATES = {
    "r6": os.path.join(REPO, ".ab", "r6"),
    "r7": os.path.join(REPO, ".ab", "r7"),
}


def run_once(state: str) -> dict:
    env = dict(os.environ)
    env["BENCH_HEADLINE_ONLY"] = "1"
    env["BENCH_REPEATS"] = env.get("BENCH_REPEATS", "2")
    cwd = STATES[state]
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    try:
        rec = json.loads(line)
    except json.JSONDecodeError:
        rec = {"error": line[-500:], "stderr": proc.stderr[-500:]}
    spread = []
    try:
        with open(os.path.join(cwd, "BENCH", "SPREAD_last.json")) as f:
            spread = json.load(f)["spread"]["tile_encode_pip"]
    except (OSError, KeyError, json.JSONDecodeError):
        pass
    return {
        "state": state,
        "value": rec.get("value"),
        "headline_sec": rec.get("queries", {}).get("tile_encode_pip"),
        "samples_sec": spread,
        "wall": round(time.time() - t0, 1),
    }


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs = []
    for i in range(pairs):
        for state in ("r7", "r6"):  # r7 first: bias any warm-cache edge to r6
            rec = run_once(state)
            runs.append(rec)
            print(json.dumps(rec), flush=True)
    out = {"pairs": pairs, "runs": runs}
    for state in ("r6", "r7"):
        best = [r["headline_sec"] for r in runs if r["state"] == state and r["headline_sec"]]
        allsamp = [s for r in runs if r["state"] == state for s in r.get("samples_sec", [])]
        if best:
            out[state] = {
                "best_per_run_sec": best,
                "median_best_sec": round(statistics.median(best), 3),
                "all_samples_sec": allsamp,
                "median_sample_sec": round(statistics.median(allsamp), 3) if allsamp else None,
            }
    with open(os.path.join(REPO, "BENCH", "flagship_ab_r8.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}))


if __name__ == "__main__":
    main()
