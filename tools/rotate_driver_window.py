#!/usr/bin/env python
"""Regenerate DRIVER_VERIFIED in plans/queries.py from the driver's
CORRECTNESS_r*.json files.

The driver hashes only the first 50 entries of ``queries()`` per
round; ``_rotated_names`` floats never-driver-verified queries to the
front. This tool unions every green row across all CORRECTNESS files
into the DRIVER_VERIFIED frozenset so the next round's window lands on
queries without a hard signal yet. LATEST ROUND WINS per query: a red
row in a newer round evicts an older green (a regression must rotate
BACK INTO the window until it is green again), and red rows are never
added.

Run at round start (after the driver drops CORRECTNESS_r{N}.json):

    python tools/rotate_driver_window.py        # rewrite in place
    python tools/rotate_driver_window.py --dry  # report only

DRIVER_PRIORITY (re-queues for changed implementations) remains a
hand-maintained judgment call — this tool only handles the mechanical
union.  Names currently listed in DRIVER_PRIORITY are NEVER added to
DRIVER_VERIFIED by this tool: a listed name means the implementation
changed after its last green row, so that stale green must not mark
since-changed code as verified (clear the name from DRIVER_PRIORITY
once a NEW driver round has re-greened it, then re-run this tool).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES_PY = os.path.join(
    REPO, "terraform_aws_lambda_kinesis_to_s3_spark", "plans", "queries.py"
)


def latest_rows(repo: str = REPO) -> dict[str, bool]:
    """Per-query latest verdict across all CORRECTNESS_r*.json files.

    Latest round wins: iterate rounds in order; a newer red evicts an
    older green so the regression rotates back into the window.
    """
    latest: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        data = json.load(open(path))
        for name, row in data.items():
            if isinstance(row, dict):
                checks = [v for v in row.values() if isinstance(v, bool)]
                ok = bool(checks) and all(checks)
            else:
                ok = bool(row)
            latest[name] = ok
    return latest


def green_rows(repo: str = REPO) -> set[str]:
    return {n for n, ok in latest_rows(repo).items() if ok}


def priority_names(src: str) -> set[str]:
    """Names currently listed in DRIVER_PRIORITY — implementations that
    changed after their last green row, so a stale green must not mark
    them verified.  Comment lines are stripped BEFORE extracting the
    quoted tokens: a word quoted inside an explanatory comment (e.g. a
    NOTES citation) must not be swallowed as a priority name — if it
    ever collided with a real query name, that query's greens would be
    silently subtracted from DRIVER_VERIFIED forever."""
    m = re.search(
        r"DRIVER_PRIORITY: tuple\[str, \.\.\.\] = \((.*?)\n\)",
        src,
        re.DOTALL,
    )
    if not m:
        return set()
    code = "\n".join(
        line.split("#", 1)[0] for line in m.group(1).splitlines()
    )
    return set(re.findall(r'"([^"]+)"', code))


def registry_hashes() -> dict[str, str]:
    """Per-entry source fingerprint: sha256 over the registry
    function's source plus its oracle SQL (16 hex chars).  Recorded to
    DRIVER_HASHES.json at rotation time; tools/verify_contract.
    check_stale_greens compares the live registry against the
    recording so a function that changed while its name sits in
    DRIVER_VERIFIED (and not in DRIVER_PRIORITY) FAILS the round
    close — the r9 corpus_curation stale green, automated (r9 verdict
    item 4).  Limitation: helpers the function CALLS are not hashed —
    a kernel-only change (the r9 multimodal case) still needs the
    manual DRIVER_PRIORITY judgment call; this catches the
    query-function and oracle-SQL edits, which is where every
    historical stale green actually originated."""
    import hashlib
    import inspect

    sys.path.insert(0, REPO)
    from terraform_aws_lambda_kinesis_to_s3_spark.plans.queries import (
        REGISTRY,
    )

    out = {}
    for name, (fn, sql) in REGISTRY.items():
        src = inspect.getsource(fn)
        out[name] = hashlib.sha256(
            (src + "\x00" + (sql or "")).encode()
        ).hexdigest()[:16]
    return out


def write_hashes() -> str:
    path = os.path.join(REPO, "DRIVER_HASHES.json")
    with open(path, "w") as f:
        json.dump(registry_hashes(), f, indent=0, sort_keys=True)
        f.write("\n")
    return path


def main() -> None:
    dry = "--dry" in sys.argv
    latest = latest_rows()
    verified = {n for n, ok in latest.items() if ok}
    red = {n for n, ok in latest.items() if not ok}
    src = open(QUERIES_PY).read()
    requeued = priority_names(src) & verified
    if requeued:
        print(f"SKIPPING {len(requeued)} DRIVER_PRIORITY re-queues whose "
              f"green rows predate their code change: {sorted(requeued)}")
        verified -= requeued
    m = re.search(
        r"DRIVER_VERIFIED: frozenset\[str\] = frozenset\(\s*\{(.*?)\}\s*\)",
        src,
        re.DOTALL,
    )
    if not m:
        raise SystemExit("DRIVER_VERIFIED block not found")
    current = set(re.findall(r'"([^"]+)"', m.group(1)))
    added = sorted(verified - current)
    # Latest round wins: a listed name whose NEWEST row is red is
    # automatically evicted so it rotates back into the driver window.
    evicted = sorted(current & red)
    # Names absent from every CORRECTNESS file stay — removal there is
    # a manual call (e.g. a round whose artifacts were pruned).
    unknown = sorted(current - verified - red)
    print(f"green rows across CORRECTNESS files: {len(verified)}")
    print(f"currently listed: {len(current)}; new green: {len(added)}")
    if evicted:
        print(f"EVICTING {len(evicted)} regressed names "
              f"(red in their latest round): {evicted[:10]}")
    if unknown:
        print(f"note: {len(unknown)} listed names appear in no "
              f"CORRECTNESS file (kept — removal is a manual call): "
              f"{unknown[:10]}")
    if not added and not evicted:
        if not dry:
            print(f"nothing to change; refreshed {write_hashes()}")
        else:
            print("nothing to change")
        return
    merged = sorted((current | verified) - red)
    body = "\n".join(f'        "{n}",' for n in merged)
    new_block = (
        "DRIVER_VERIFIED: frozenset[str] = frozenset(\n    {\n"
        + body
        + "\n    }\n)"
    )
    out = src[: m.start()] + new_block + src[m.end() :]
    if dry:
        print("dry run — would add:", added)
        if evicted:
            print("dry run — would evict:", evicted)
        return
    open(QUERIES_PY, "w").write(out)
    print(f"rewrote DRIVER_VERIFIED with {len(merged)} names "
          f"(+{len(added)}, -{len(evicted)})")
    print(f"recorded per-entry source hashes to {write_hashes()}")


if __name__ == "__main__":
    main()
