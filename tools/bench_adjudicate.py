#!/usr/bin/env python
"""Adjudicate bench movers: spread-aware diff of BENCH_DETAIL vs a prior round.

Host contention moves identical code ±20-30% between sessions (BASELINE.md),
so a raw round-over-round ratio is not evidence of a regression. This tool
mechanizes the adjudication the round-7/8 reviews did by hand:

1. compare the working-tree ``BENCH_DETAIL.json`` against the version at a
   prior git ref (default: the last driver round boundary);
2. classify each query's move — ``within_spread`` when the delta is covered
   by either round's recorded max−min spread (plus a ratio guard band),
   otherwise a *mover*;
3. for each mover, run the astdeps definition-closure proof
   (``is_affected``) between the two refs: a mover whose entire reachable
   definition closure — its function, oracle SQL, and every in-package def
   it transitively uses — is AST-identical is classified ``environmental``
   (the code PROVABLY cannot have caused the move); anything the proof
   cannot clear is ``code-changed`` — the only class that demands a human
   look. (Module-level diffing would over-flag: a sibling query's edit in
   the same file is invisible to this query's closure.)

Usage::

    python tools/bench_adjudicate.py                # vs last round boundary
    python tools/bench_adjudicate.py --ref df37142  # vs explicit commit
    python tools/bench_adjudicate.py --threshold 1.3

Prints a JSON summary; exits 1 only if a code-changed mover exists.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args], capture_output=True, text=True, check=True
    ).stdout


def last_round_boundary() -> str:
    for line in _git("log", "--format=%H %s").splitlines():
        sha, _, subject = line.partition(" ")
        if re.match(r"round \d+: verdict/advice/correctness/bench", subject):
            return sha
    raise SystemExit("no driver round-boundary commit found; pass --ref")


def query_modules() -> dict[str, str]:
    """query name -> repo-relative defining module path."""
    from hbase_observer_es_spark.registry import _MODULES

    out: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        rel = os.path.relpath(mod.__file__, REPO)
        for name in getattr(mod, "QUERIES", {}):
            out[name] = rel
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=None, help="git ref of the baseline BENCH_DETAIL")
    ap.add_argument(
        "--threshold", type=float, default=1.25,
        help="ratio guard band: moves inside [1/t, t] never flag even with tiny spreads",
    )
    args = ap.parse_args()
    ref = args.ref or last_round_boundary()

    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
        cur = json.load(f)
    try:
        base = json.loads(_git("show", f"{ref}:BENCH_DETAIL.json"))
    except subprocess.CalledProcessError:
        raise SystemExit(f"no BENCH_DETAIL.json at {ref}")

    from hbase_observer_es_spark.astdeps import DepGraph, is_affected

    modules = query_modules()

    # current package sources + the resolver (same construction as
    # tools/rotate_priority.py::proven_unaffected)
    pkg = "hbase_observer_es_spark"
    sources: dict[str, str] = {}
    for root, _, fnames in os.walk(os.path.join(REPO, pkg)):
        for f in fnames:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                with open(p) as fh:
                    sources[os.path.relpath(p, REPO)] = fh.read()

    def resolve(parts):
        if not parts or parts[0] != pkg:
            return None
        base = os.path.join(REPO, *parts)
        for cand in (base + ".py", os.path.join(base, "__init__.py")):
            if os.path.isfile(cand):
                return os.path.relpath(cand, REPO)
        return None

    graph = DepGraph(sources, resolve)
    old_cache: dict[str, str | None] = {}

    def old_src(rel: str) -> str | None:
        if rel not in old_cache:
            try:
                old_cache[rel] = _git("show", f"{ref}:{rel}")
            except subprocess.CalledProcessError:
                old_cache[rel] = None  # file didn't exist at ref
        return old_cache[rel]

    olds = {rel: old_src(rel) for rel in sources}
    view_cache: dict = {}

    t_cur, sp_cur = cur["queries"], cur.get("spread", {})
    t_old, sp_old = base["queries"], base.get("spread", {})

    new_queries = sorted(set(t_cur) - set(t_old))
    removed = sorted(set(t_old) - set(t_cur))
    within, movers = [], {}
    for name in sorted(set(t_cur) & set(t_old)):
        a, b = t_old[name], t_cur[name]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        spread = max(sp_old.get(name, 0.0), sp_cur.get(name, 0.0))
        if (1 / args.threshold) <= ratio <= args.threshold or abs(b - a) <= spread:
            within.append(name)
            continue
        rel = modules.get(name)
        # "environmental" requires the closure PROOF (every reachable def
        # AST-identical at the ref); any uncertainty stays code-changed
        affected = (
            is_affected(graph, rel, name, olds, old_view_cache=view_cache)
            if rel
            else True
        )
        movers[name] = {
            "old_s": a, "new_s": b, "ratio": round(ratio, 2),
            "spread": round(spread, 3), "module": rel,
            "verdict": "code-changed" if affected else "environmental",
        }

    summary = {
        "baseline_ref": ref,
        "compared": len(within) + len(movers),
        "within_spread": len(within),
        "new_queries": new_queries,
        "removed_queries": removed,
        "movers": movers,
        "code_changed_movers": sorted(
            n for n, m in movers.items() if m["verdict"] == "code-changed"
        ),
    }
    print(json.dumps(summary, indent=1, sort_keys=True))
    return 1 if summary["code_changed_movers"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
