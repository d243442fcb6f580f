#!/usr/bin/env python
"""Pre-commit guard closing the PASS-line race (r11 verdict item 8).

The round-close gate records ``ROUND CLOSE: PASS ... HEAD <sha>`` in the
newest NOTES_r*.md; ``verify_contract.check_round_close_head`` flags any
registry-touching commit that lands AFTER that sha — but only when it is
next RUN, which historically was the *next round's* start (twice now a
post-PASS registry commit sat unflagged for a whole verdict cycle).

This guard moves the check to commit time: installed as
``.git/hooks/pre-commit`` (idempotently, by tools/round_close.py every
time the gate runs), it REFUSES a commit that stages changes to
``plans/queries.py`` while the newest NOTES file records a PASS line —
unless the SAME commit also stages that NOTES file (the sanctioned way
to land a post-PASS fix: mark the PASS superseded in the commit that
invalidates it, as r11's `ffe25e8` did by hand).

Exit 0 = allow, 1 = refuse.  ``git commit --no-verify`` remains the
documented escape hatch for tooling that knowingly supersedes a PASS.
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys

QPATH = "terraform_aws_lambda_kinesis_to_s3_spark/plans/queries.py"
PASS_RE = re.compile(r"ROUND CLOSE: PASS[^\n]*?HEAD ([0-9a-f]{7,40})")


def _newest_notes(repo: str) -> "str | None":
    notes = sorted(
        glob.glob(os.path.join(repo, "NOTES_r*.md")),
        key=lambda p: int(re.search(r"NOTES_r(\d+)", p).group(1)),
    )
    return notes[-1] if notes else None


def guard(repo: str) -> list[str]:
    """Return problem strings for the STAGED commit (empty = allow)."""
    r = subprocess.run(
        ["git", "diff", "--cached", "--name-only"],
        capture_output=True,
        text=True,
        cwd=repo,
    )
    if r.returncode != 0:
        # not a git repo / no index — nothing to guard
        return []
    staged = set(r.stdout.split())
    if QPATH not in staged:
        return []
    notes = _newest_notes(repo)
    if notes is None:
        return []
    m = PASS_RE.search(open(notes).read())
    if not m:
        return []  # round in progress — no PASS line to invalidate
    notes_rel = os.path.relpath(notes, repo)
    if notes_rel in staged:
        # the commit supersedes the PASS line itself — sanctioned path
        return []
    return [
        f"this commit touches {QPATH} but {notes_rel} records a "
        f"ROUND CLOSE PASS at HEAD {m.group(1)} — the commit would "
        "silently invalidate it.  Either stage an update to "
        f"{notes_rel} marking the PASS superseded in the SAME commit, "
        "re-run tools/round_close.py afterwards and record the fresh "
        "line, or (tooling only) git commit --no-verify."
    ]


HOOK_BODY = """#!/bin/sh
# installed by tools/round_close.py — see tools/precommit_guard.py
exec python "$(git rev-parse --show-toplevel)/tools/precommit_guard.py"
"""


def install_hook(repo: str) -> bool:
    """Idempotently install the pre-commit hook; True if (re)written.
    Never clobbers a user hook that is not ours."""
    hook_dir = os.path.join(repo, ".git", "hooks")
    if not os.path.isdir(hook_dir):
        return False
    path = os.path.join(hook_dir, "pre-commit")
    if os.path.exists(path):
        with open(path) as f:
            current = f.read()
        if current == HOOK_BODY:
            return False
        if "precommit_guard" not in current:
            return False  # somebody else's hook — leave it alone
    with open(path, "w") as f:
        f.write(HOOK_BODY)
    os.chmod(path, 0o755)
    return True


def main() -> int:
    repo = subprocess.run(
        ["git", "rev-parse", "--show-toplevel"],
        capture_output=True,
        text=True,
    ).stdout.strip() or os.getcwd()
    problems = guard(repo)
    for p in problems:
        sys.stderr.write(f"PRE-COMMIT REFUSED: {p}\n")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
