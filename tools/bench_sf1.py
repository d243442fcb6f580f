#!/usr/bin/env python
"""Record BENCH_SF1.json: the top-N-by-sf0.1-cost headline entries
re-timed at the 10x scale replica (tools/scale_data.py output) on the
identical local[32]/16g/32-partition harness.

PLAN_COSTS_SF1 shows the BYTE trend at 10x; this records the WALL-TIME
trend next to it (r7 verdict item 5).  sf0_1_sec comes from the
committed full-sweep map (BENCH_FULL.json) so the ratio compares
in-sweep numbers on both sides; sf1_sec comes from ONE fresh
``bench.py --only`` process pointed at the sf1 directory (its complete
per-query map is read from the BENCH_FULL_partial.json sidecar, same
as bench_diff's recheck).

Run:  python tools/bench_sf1.py [N] [sf1_dir]
      (defaults: N=30, /tmp/spark_graft_scale/sf1)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    sf1_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scale/sf1"
    full = json.load(open(os.path.join(_REPO, "BENCH_FULL.json")))
    base = full["queries"]
    names = [q for q, _ in sorted(base.items(), key=lambda kv: -kv[1])[:n]]
    print(f"top-{n} by sf0.1 in-sweep cost: {names}")

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf1_dir)
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py"), "--only",
         ",".join(names)],
        capture_output=True, text=True, cwd=_REPO, env=env,
    )
    summary = None
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith('{"metric"'):
            summary = json.loads(line)
            break
    if summary is None:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-2000:] + "\n")
        raise SystemExit("no summary line from the sf1 bench run")
    # the sidecar path is null when bench.py could not write it (e.g.
    # read-only checkout); fall back to the (top-10-truncated) stdout
    # map rather than crashing after the sf1 run already paid its time
    sidecar_full = None
    if summary.get("full_map"):
        sidecar_full = json.load(open(summary["full_map"]))
        sf1_map = sidecar_full["queries"]
    else:
        sys.stderr.write("warning: no sidecar map — falling back to the "
                         "truncated stdout map; some entries may be "
                         "missing\n")
        sf1_map = summary.get("queries", {})

    queries = {}
    for q in names:
        s0, s1 = base[q], sf1_map.get(q)
        if s1 is None:
            continue
        queries[q] = {
            "sf0_1_sec": s0,
            "sf1_sec": s1,
            "ratio": round(s1 / s0, 2) if s0 else None,
        }
    out = {
        "metric": "sf1_headline_wall",
        "sf1_dir": sf1_dir,
        "n_queries": len(queries),
        "total_sf1_sec": round(sum(v["sf1_sec"] for v in queries.values()), 3),
        "total_sf0_1_sec": round(
            sum(v["sf0_1_sec"] for v in queries.values()), 3),
        "harness": ("local[32], 16g JVM, 32 shuffle partitions (identical "
                    "to the sf0.1 sweep -- 10x data, same hardware)"),
        "selection": (f"top-{n} entries by sf0.1 in-sweep cost "
                      "(BENCH_FULL.json, committed sweep)"),
        "repeats": summary.get("repeats"),
        "overhead_components": summary.get("overhead_components"),
        "queries": queries,
    }
    if not queries:
        raise SystemExit(
            "no requested query produced an sf1 timing — refusing to "
            "write an empty BENCH_SF1.json")
    # self-certification (r10 verdict item 4): the inner bench.py run
    # measured its own calibration probes; a reading taken outside the
    # admission window lands in the rejected sidecar, never the
    # committed artifact.
    out["calibration_admission"] = (
        sidecar_full.get("calibration_admission")
        if sidecar_full
        else {"admitted": bool(summary.get("calibration_admitted"))}
    )
    if not summary.get("calibration_admitted"):
        rej = os.path.join(_REPO, "BENCH_SF1_rejected.json")
        with open(rej, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
        reasons = (out["calibration_admission"] or {}).get("reasons")
        sys.stderr.write(
            f"CALIBRATION REFUSAL: {reasons} — sf1 timings written to "
            f"{rej}, committed BENCH_SF1.json untouched; re-run in a "
            "quieter window\n"
        )
        raise SystemExit(2)
    path = os.path.join(_REPO, "BENCH_SF1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    # a 0.0 sf0.1 baseline yields ratio None — drop those from the
    # ratio stats (and guard the total division) instead of raising
    # TypeError after the expensive sf1 run already completed
    ratios = sorted(
        v["ratio"] for v in queries.values() if v["ratio"] is not None
    )
    t0 = out["total_sf0_1_sec"]
    wall = f"{out['total_sf1_sec'] / t0:.1f}x" if t0 else "n/a (0s baseline)"
    rat = (f"median ratio {ratios[len(ratios) // 2]:.2f}x, "
           f"max {ratios[-1]:.2f}x" if ratios else "no finite ratios")
    print(f"wrote {path}: subset {t0} s at sf0.1 -> "
          f"{out['total_sf1_sec']} s at sf1 "
          f"({wall} wall for 10x data); {rat}")


if __name__ == "__main__":
    main()
