#!/usr/bin/env python
"""Measure TODAY's host band on the r6-era control set -> one line.

Instrument #2 of the sweep-flag triage protocol (NOTES_r9/r10): five
queries untouched since r6 whose r7 AND r8 driver times agree to
within 0.04 s.  Re-measuring them solo (fresh ``bench.py --only``
process, min-of-5) against the pinned r8-driver baselines yields the
host's CURRENT inflation band on sub-second entries; a flagged query
whose solo ratio sits inside this band is measurement floor, not a
plan regression.

The baselines are pinned HERE (not re-read from a mutable artifact)
because their whole value is that they never move: they are the
r8-driver sweep readings the r9/r10 triages normalized against, so
bands stay comparable round over round.

Run:  python tools/control_band.py
Exit: always 0; the band is a reading, not a gate.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: r8 driver sweep readings (BENCH_FULL.json at commit 7195abe) — the
#: favorable-window baseline every triage since r9 has used.
CONTROLS = {
    "ab_sprt_daily": 0.29,
    "char_entropy": 0.20,
    "chunk_dedup": 0.32,
    "cdc_merge_upsert": 0.33,
    "context_length_plan": 0.19,
}

#: Second baseline column (r10 verdict item 6): the same five queries
#: re-pinned from a CERTIFIED-IDLE r11 min-of-5 solo run taken under
#: the calibration admission gate (cpu 0.0304 / jvm 0.1057 — both well
#: inside CALIB_ADMIT_MAX), so the band gets a modern idle floor with
#: finer resolution than the permanently-favorable r8 driver moment.
#: The r8 column is KEPT for round-over-round continuity.
CONTROLS_R11_IDLE = {
    "ab_sprt_daily": 0.328,
    "char_entropy": 0.349,
    "chunk_dedup": 0.474,
    "cdc_merge_upsert": 0.373,
    "context_length_plan": 0.217,
}


def measure() -> dict[str, float]:
    env = dict(os.environ, SPARK_GRAFT_BENCH_REPEATS="5")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(_REPO, "bench.py"),
            "--only",
            ",".join(CONTROLS),
        ],
        capture_output=True,
        text=True,
        cwd=_REPO,
        env=env,
    )
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith('{"metric"'):
            summary = json.loads(line)
            sidecar = summary.get("full_map")
            if sidecar:
                with open(os.path.join(_REPO, sidecar)) as f:
                    full = json.load(f)
                return {
                    "queries": full["queries"],
                    "calib": {
                        k: v
                        for k, v in full["overhead_components"].items()
                        if "calib" in k
                    },
                }
    raise SystemExit(
        f"bench.py produced no summary line\n{r.stdout[-1500:]}"
        f"\n{r.stderr[-1500:]}"
    )


def _band(got: dict, baselines: dict) -> dict:
    ratios = {}
    for name, base in baselines.items():
        t = got["queries"].get(name)
        if t is not None:
            ratios[name] = round(t / base, 2)
    vals = sorted(ratios.values())
    return {
        "min": vals[0],
        "median": vals[len(vals) // 2],
        "max": vals[-1],
        "per_query": ratios,
    }


def main() -> None:
    got = measure()
    band = {
        "metric": "control_band",
        "vs_r8_driver": _band(got, CONTROLS),
        "vs_r11_idle_solo": _band(got, CONTROLS_R11_IDLE),
        "solo_sec": {n: got["queries"].get(n) for n in CONTROLS},
        "calibration": got["calib"],
        "baselines": {
            "r8_driver": "r8 driver sweep (commit 7195abe)",
            "r11_idle_solo": (
                "r11 certified-idle min-of-5 solo (calib cpu 0.0304 / "
                "jvm 0.1057, admission-gated)"
            ),
        },
    }
    print(json.dumps(band))


if __name__ == "__main__":
    main()
