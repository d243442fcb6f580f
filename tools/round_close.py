#!/usr/bin/env python
"""Round-close gate: ONE command that proves the round may end.

The r4 and r5 rounds both closed RED because registry entries were
inserted AFTER the final full-suite run — real implementations with no
tests, no bench entries, no COVERAGE/EXPLAINS rows and stale prose
counts.  The builder's individual machine-checks all existed and all
fired; what was missing was the habit of running them, in order, after
the LAST change.  This tool is that habit (r5 verdict item 10):

    python tools/round_close.py            # full gate (~20 min)
    python tools/round_close.py --fast     # skip the pytest suite

Order (each step must pass before the next runs):
  1. registry bookkeeping  — prose counts, EXPLAINS coverage, bench
     coverage (HEADLINE ∪ EXCLUDED == REGISTRY), every entry has
     oracle SQL or a documented reason
  2. parser fuzz smoke     — seed-pinned, time-budgeted run of
     tools/fuzz_parsers.py (r10 verdict item 2: the ad-hoc harness
     found a real crash the 1266-test suite missed; no parser change
     lands without it)
  3. partition invariance  — the layout-blindness audit
     (tools/partition_invariance.py) over the round's CHANGED subset:
     DRIVER_PRIORITY re-queues plus every entry whose closure hash
     drifted from the rotation recording (r10 verdict item 5 — the
     audit is the strongest portability receipt the repo has; a
     budgeted O(changed) subset keeps it affordable per close)
  4. pytest tests/ -q      — the full suite, collected fresh
  5. summary               — ONE "ROUND CLOSE: PASS/FAIL" line to
     stdout, ready to paste into NOTES_r{N}.md

If step 1 fails there is no point paying for step 2; if anything
fails, the round is NOT closed — fix and re-run.  A registry change
after a PASS line invalidates it by definition: re-run the tool.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bookkeeping() -> list[str]:
    import bench
    from terraform_aws_lambda_kinesis_to_s3_spark.plans.queries import REGISTRY
    from tools.verify_contract import (
        check_explains_count,
        check_prose_counts,
        check_round_close_head,
        check_stale_greens,
    )

    problems = (
        check_prose_counts()
        + check_explains_count()
        + check_round_close_head()
        + check_stale_greens()
    )
    # a PASS line records HEAD; uncommitted registry changes would make
    # that recording a lie before it is even written
    r = subprocess.run(
        [
            "git",
            "status",
            "--porcelain",
            "--",
            "terraform_aws_lambda_kinesis_to_s3_spark/plans/queries.py",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    if r.stdout.strip():
        problems.append(
            "uncommitted changes to plans/queries.py — commit the final "
            "registry state BEFORE closing the round (the PASS line "
            "records HEAD)"
        )

    headline, excluded = set(bench.HEADLINE), set(bench.EXCLUDED)
    if len(bench.HEADLINE) != len(headline):
        problems.append("duplicate bench HEADLINE entry")
    if headline & excluded:
        problems.append(f"bench HEADLINE ∩ EXCLUDED: {sorted(headline & excluded)}")
    uncovered = sorted(set(REGISTRY) - headline - excluded)
    strays = sorted((headline | excluded) - set(REGISTRY))
    if uncovered:
        problems.append(f"registry queries not benched/excluded: {uncovered}")
    if strays:
        problems.append(f"bench names not in registry: {strays}")
    if not all(bench.EXCLUDED.values()):
        problems.append("bench EXCLUDED entry without a reason")

    oracle_less = sorted(n for n, (_, sql) in REGISTRY.items() if sql is None)
    if oracle_less:
        problems.append(
            f"registry entries without oracle SQL: {oracle_less} — write "
            "the oracle or document why it is impossible"
        )
    return problems


# Seed-pinned fuzz smoke (r10 verdict item 2): two fixed seeds at a
# fixed wall budget each, so every round close replays the same
# deterministic mutation streams PLUS fresh coverage as the budget's
# trial count drifts with host speed.  Seeds 1 and 42: seed 1 is the
# stream that found the r10 mvhd/mdhd v1-guard crash at ~1.0M trials.
FUZZ_SEEDS: tuple[int, ...] = (1, 42)
FUZZ_BUDGET_S: float = 30.0


def fuzz_smoke(budget: float = FUZZ_BUDGET_S,
               seeds: tuple[int, ...] = FUZZ_SEEDS) -> list[str]:
    """Run the parser fuzz harness once per pinned seed; return
    problem strings (empty = pass).  Each run's summary line (with
    its trial count, for NOTES) is echoed to stdout."""
    problems = []
    for seed in seeds:
        r = subprocess.run(
            [sys.executable, os.path.join("tools", "fuzz_parsers.py"),
             str(budget), str(seed)],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        out = (r.stdout + r.stderr).strip()
        for line in out.splitlines():
            print(f"  {line}")
        if r.returncode != 0:
            problems.append(
                f"parser fuzz contract violation (seed {seed}) — "
                "see output above for the reproducing trial"
            )
    return problems


def invariance_subset(
    recorded: "dict[str, str] | None" = None,
    live: "dict[str, str] | None" = None,
    priority: "set[str] | None" = None,
) -> list[str]:
    """The round's CHANGED registry subset for the partition-invariance
    audit: every entry whose closure hash drifted from the rotation
    recording (including registry-new names, absent from the
    recording) plus the explicit DRIVER_PRIORITY re-queues.  All
    parameters injectable for tests; the live call reads repo state."""
    import json

    if recorded is None:
        path = os.path.join(REPO, "DRIVER_HASHES.json")
        recorded = json.load(open(path)) if os.path.exists(path) else {}
    if live is None:
        from tools.rotate_driver_window import registry_hashes

        live = registry_hashes()
    if priority is None:
        from terraform_aws_lambda_kinesis_to_s3_spark.plans import (
            queries as Q,
        )

        priority = set(Q.DRIVER_PRIORITY)
    changed = {n for n in live if recorded.get(n) != live[n]}
    return sorted(changed | priority)


def main() -> int:
    fast = "--fast" in sys.argv
    t0 = time.time()

    # r11 verdict item 8: running the gate (re)installs the pre-commit
    # guard so a registry-touching commit staged AFTER this round's PASS
    # line is refused at commit time, not discovered at next round start
    from tools.precommit_guard import install_hook

    if install_hook(REPO):
        print("installed .git/hooks/pre-commit (PASS-line race guard)")

    print("== step 1: registry bookkeeping ==")
    problems = bookkeeping()
    for p in problems:
        print(f"  FAIL: {p}")
    if problems:
        print(f"\nROUND CLOSE: FAIL (bookkeeping, {len(problems)} problems)")
        return 1
    print("  ok")

    if not fast:
        print(f"== step 2: parser fuzz smoke ({FUZZ_BUDGET_S:.0f}s × "
              f"seeds {FUZZ_SEEDS}) ==")
        fuzz_problems = fuzz_smoke()
        for p in fuzz_problems:
            print(f"  FAIL: {p}")
        if fuzz_problems:
            print("\nROUND CLOSE: FAIL (parser fuzz)")
            return 1
    else:
        print("== step 2: fuzz smoke SKIPPED (--fast) ==")

    if not fast:
        subset = invariance_subset()
        if subset:
            print(f"== step 3: partition invariance over {len(subset)} "
                  f"changed entries ==")
            print(f"  subset: {subset}")
            r = subprocess.run(
                [sys.executable,
                 os.path.join("tools", "partition_invariance.py"),
                 "/root/testdata/sf0.01", "--only", ",".join(subset),
                 "--exact"],
                cwd=REPO,
            )
            if r.returncode != 0:
                print("\nROUND CLOSE: FAIL (partition invariance)")
                return 1
        else:
            print("== step 3: partition invariance SKIPPED — no entry "
                  "changed since rotation ==")
    else:
        print("== step 3: partition invariance SKIPPED (--fast) ==")

    if not fast:
        print("== step 4: pytest tests/ -q (full suite) ==")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=line"],
            cwd=REPO,
        )
        if r.returncode != 0:
            print("\nROUND CLOSE: FAIL (pytest)")
            return 1
    else:
        print("== step 4: SKIPPED (--fast) — not a valid round close ==")

    from terraform_aws_lambda_kinesis_to_s3_spark.plans.queries import REGISTRY

    dt = int(time.time() - t0)
    tag = "PASS" if not fast else "PASS-FAST (suite skipped; rerun without --fast)"
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
        cwd=REPO,
    ).stdout.strip()
    # the HEAD sha makes the PASS line verifiable: verify_contract.
    # check_round_close_head fails if any later commit touches
    # plans/queries.py (paste this line into NOTES_r{N}.md verbatim)
    print(
        f"\nROUND CLOSE: {tag} — registry {len(REGISTRY)}, "
        f"bookkeeping clean, {dt}s, HEAD {head}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
