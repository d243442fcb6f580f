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
union.
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


def green_rows() -> set[str]:
    # latest round wins: iterate rounds in order; a newer red evicts
    # an older green so the regression rotates back into the window
    latest: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        data = json.load(open(path))
        for name, row in data.items():
            if isinstance(row, dict):
                checks = [v for v in row.values() if isinstance(v, bool)]
                ok = bool(checks) and all(checks)
            else:
                ok = bool(row)
            latest[name] = ok
    return {n for n, ok in latest.items() if ok}


def main() -> None:
    dry = "--dry" in sys.argv
    verified = green_rows()
    src = open(QUERIES_PY).read()
    m = re.search(
        r"DRIVER_VERIFIED: frozenset\[str\] = frozenset\(\s*\{(.*?)\}\s*\)",
        src,
        re.DOTALL,
    )
    if not m:
        raise SystemExit("DRIVER_VERIFIED block not found")
    current = set(re.findall(r'"([^"]+)"', m.group(1)))
    added = sorted(verified - current)
    removed = sorted(current - verified)  # should stay: never auto-remove
    print(f"green rows across CORRECTNESS files: {len(verified)}")
    print(f"currently listed: {len(current)}; new green: {len(added)}")
    if removed:
        print(f"note: {len(removed)} listed names have no green row "
              f"(kept — removal is a manual call): {removed[:10]}")
    if not added:
        print("nothing to add")
        return
    merged = sorted(current | verified)
    body = "\n".join(f'        "{n}",' for n in merged)
    new_block = (
        "DRIVER_VERIFIED: frozenset[str] = frozenset(\n    {\n"
        + body
        + "\n    }\n)"
    )
    out = src[: m.start()] + new_block + src[m.end() :]
    if dry:
        print("dry run — would add:", added)
        return
    open(QUERIES_PY, "w").write(out)
    print(f"rewrote DRIVER_VERIFIED with {len(merged)} names (+{len(added)})")


if __name__ == "__main__":
    main()
