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


PKG = "terraform_aws_lambda_kinesis_to_s3_spark"
PKG_DIR = os.path.join(REPO, PKG)


def _pkg_module_files() -> dict[str, str]:
    """Dotted module name -> file path for every .py in the package."""
    out: dict[str, str] = {}
    for root, _dirs, files in os.walk(PKG_DIR):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, REPO)[: -len(".py")]
            dotted = rel.replace(os.sep, ".")
            if dotted.endswith(".__init__"):
                dotted = dotted[: -len(".__init__")]
            out[dotted] = path
    return out


def _imports_of(tree, modules: "dict[str, str]") -> set[str]:
    """Package modules referenced by any import statement in *tree*
    (module-level AND function-local imports — the registry's video
    helpers import operators.multimodal inside the function body)."""
    import ast

    found: set[str] = set()

    def resolve(dotted: str) -> None:
        # `from pkg.operators import dedup` names the SUBMODULE; plain
        # `from pkg.operators.dedup import foo` names an object in it.
        # Walk the dotted prefix chain and keep every real module.
        parts = dotted.split(".")
        for i in range(len(parts), 0, -1):
            cand = ".".join(parts[:i])
            if cand in modules:
                found.add(cand)
                return

    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG):
                    resolve(a.name)
        elif isinstance(node, ast.ImportFrom):
            mod = node.module or ""
            if mod.startswith(PKG):
                resolve(mod)
                for a in node.names:
                    resolve(mod + "." + a.name)
    return found


def _module_graph() -> "tuple[dict[str, str], dict[str, set[str]]]":
    """(content hash per module, TRANSITIVE package-import closure per
    module).  A kernel module that itself imports another package
    module (e.g. an operator built on sketches) propagates: a change
    anywhere in the closure trips every dependent registry entry."""
    import ast
    import hashlib

    modules = _pkg_module_files()
    hashes: dict[str, str] = {}
    direct: dict[str, set[str]] = {}
    for dotted, path in modules.items():
        blob = open(path, "rb").read()
        hashes[dotted] = hashlib.sha256(blob).hexdigest()[:16]
        direct[dotted] = _imports_of(ast.parse(blob), modules)
    closure: dict[str, set[str]] = {m: set(s) for m, s in direct.items()}
    changed = True
    while changed:
        changed = False
        for m, deps in closure.items():
            ext = set()
            for d in deps:
                ext |= closure.get(d, set())
            if not ext <= deps:
                deps |= ext
                changed = True
    return hashes, closure


def _queries_name_map(src: str) -> "tuple[dict[str, str], dict[str, str]]":
    """Static maps over plans/queries.py top level:
    (name -> source segment for defs/constants,
     imported alias -> package module dotted name)."""
    import ast

    tree = ast.parse(src)
    modules = _pkg_module_files()
    segments: dict[str, str] = {}
    aliases: dict[str, str] = {}
    # Top-level nodes all start at column 0 — slice by line numbers
    # directly (ast.get_source_segment re-splits the 20k-line file per
    # call, which took ~80 s over 766 segments).
    lines = src.splitlines(keepends=True)

    def seg_src(node) -> str:
        return "".join(lines[node.lineno - 1 : node.end_lineno])

    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            segments[node.name] = seg_src(node)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = (
                node.targets if isinstance(node, ast.Assign) else [node.target]
            )
            seg = seg_src(node)
            for t in targets:
                if isinstance(t, ast.Name):
                    segments[t.id] = seg
        elif isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG):
                    aliases[a.asname or a.name.split(".")[-1]] = a.name
        elif isinstance(node, ast.ImportFrom):
            mod = node.module or ""
            if not mod.startswith(PKG):
                continue
            for a in node.names:
                sub = mod + "." + a.name
                aliases[a.asname or a.name] = sub if sub in modules else mod
    return segments, aliases


def registry_hashes() -> dict[str, str]:
    """Per-entry source fingerprint over the entry's FULL helper
    closure (16 hex chars): sha256 of the registry function's source,
    its oracle SQL, every same-module helper def/constant it
    (transitively) references, and a content hash of every package
    module reachable from its imports (transitively through the
    module import graph).  Recorded to DRIVER_HASHES.json at rotation
    time; tools/verify_contract.check_stale_greens compares the live
    registry against the recording so code that changed while its
    name sits in DRIVER_VERIFIED (and not in DRIVER_PRIORITY) FAILS
    the round close.  r10 verdict item 1 closed the kernel blind
    spot: the r10 mvhd/mdhd v1-guard fix touched only
    operators/multimodal.py — the old function-only hash missed it;
    this closure hash trips every video entry.  Name resolution is a
    static over-approximation (any referenced name matching a
    top-level def/constant/import pulls it in) — false sensitivity
    costs one cheap re-queue, missed sensitivity costs a stale
    green."""
    import ast
    import hashlib
    import inspect
    import textwrap

    sys.path.insert(0, REPO)
    from terraform_aws_lambda_kinesis_to_s3_spark.plans.queries import (
        REGISTRY,
    )

    q_src = open(QUERIES_PY).read()
    segments, aliases = _queries_name_map(q_src)
    mod_hashes, mod_closure = _module_graph()
    modules = _pkg_module_files()

    # Each top-level segment is parsed ONCE; per-entry closure is then
    # a cheap traversal over the memoized (names, modules) reference
    # sets — 309 entries share most helpers.
    _refs_cache: dict[str, tuple[set[str], set[str]]] = {}

    def refs_of(src: str) -> "tuple[set[str], set[str]]":
        cached = _refs_cache.get(src)
        if cached is not None:
            return cached
        tree = ast.parse(textwrap.dedent(src))
        mods = _imports_of(tree, modules)
        names: set[str] = set()
        for node in ast.walk(tree):
            if not isinstance(node, ast.Name):
                continue  # attribute roots arrive as the inner ast.Name
            n = node.id
            if n in aliases:
                mods.add(aliases[n])
            elif n in segments:
                names.add(n)
        _refs_cache[src] = (names, mods)
        return names, mods

    def closure_of(fn_src: str) -> "tuple[list[str], set[str]]":
        """(sorted helper-source names, package modules) reachable
        from *fn_src* through same-module names and imports."""
        helper_names: set[str] = set()
        mods: set[str] = set()
        names, m0 = refs_of(fn_src)
        mods |= m0
        stack = list(names)
        while stack:
            n = stack.pop()
            if n in helper_names:
                continue
            helper_names.add(n)
            nn, nm = refs_of(segments[n])
            mods |= nm
            stack.extend(nn - helper_names)
        expanded = set(mods)
        for m in mods:
            expanded |= mod_closure.get(m, set())
        return sorted(helper_names), expanded

    out = {}
    for name, (fn, sql) in REGISTRY.items():
        src = inspect.getsource(fn)
        helpers, mods = closure_of(src)
        payload = "\x00".join(
            [src, sql or ""]
            + [segments[h] for h in helpers]
            + [f"{m}={mod_hashes[m]}" for m in sorted(mods)]
        )
        out[name] = hashlib.sha256(payload.encode()).hexdigest()[:16]
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
