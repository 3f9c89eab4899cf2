"""The rotation policy (rotation.derive_order) drives which registry rows the
external driver re-verifies each round — these tests pin its three-tier
invariant so a future edit can't silently deprioritize stale rows."""

from __future__ import annotations

from hbase_observer_es_spark.rotation import derive_order

NAMES = ["q_a", "q_b", "q_c", "q_d", "q_e", "q_f"]


def test_three_tier_invariant():
    order = derive_order(
        NAMES,
        # q_c never checked; q_a green r2 but edited r4; q_e green r1 edited r3;
        # q_b green r3 untouched; q_d green r1 untouched; q_f green r5 edited r5
        last_green={"q_a": 2, "q_b": 3, "q_c": None, "q_d": 1, "q_e": 1, "q_f": 5},
        file_edit_round={"q_a": 4, "q_e": 3, "q_d": 1, "q_f": 5},
    )
    # tier 0: never-checked; tier 1: edited-after-green, oldest green first;
    # tier 2: oldest green first. Edit in the SAME round as the green check
    # (q_f) is not "edited since" — the check already saw that state.
    assert order == ["q_c", "q_e", "q_a", "q_d", "q_b", "q_f"]


def test_edited_functions_outrank_file_neighbors_in_tier1():
    # q_a and q_b share a file edited r4 after both went green r3; q_a's own
    # definition changed, q_b is a neighbor — q_a must verify first even
    # though registration order says otherwise.
    order = derive_order(
        ["q_b", "q_a"],
        last_green={"q_a": 3, "q_b": 3},
        file_edit_round={"q_a": 4, "q_b": 4},
        edited_functions={"q_a"},
    )
    assert order == ["q_a", "q_b"]


def test_ties_keep_registration_order():
    order = derive_order(
        ["q_z", "q_y", "q_x"],
        last_green={"q_z": 1, "q_y": 1, "q_x": 1},
        file_edit_round={},
    )
    assert order == ["q_z", "q_y", "q_x"]


def test_missing_maps_mean_never_checked_and_never_edited():
    order = derive_order(NAMES, last_green={}, file_edit_round={})
    assert order == NAMES  # all tier 0, registration order


def test_every_name_survives_exactly_once():
    order = derive_order(
        NAMES,
        last_green={n: (i % 3) + 1 for i, n in enumerate(NAMES)},
        file_edit_round={n: 2 for n in NAMES},
    )
    assert sorted(order) == sorted(NAMES)


def test_import_staleness_is_weakest_tier1_sub():
    # q_a: file edited r4 after green r3 (direct); q_b: only an imported
    # helper edited r4 after green r2 (transitive); q_c: green r1, nothing
    # edited. Direct file edits outrank import staleness even with a newer
    # green; import staleness still outranks the untouched tier.
    order = derive_order(
        ["q_b", "q_a", "q_c"],
        last_green={"q_a": 3, "q_b": 2, "q_c": 1},
        file_edit_round={"q_a": 4},
        import_edit_round={"q_b": 4},
    )
    assert order == ["q_a", "q_b", "q_c"]


def test_import_edit_in_green_round_is_not_stale():
    # helper edited in the SAME round the query went green — the check saw it
    order = derive_order(
        ["q_a", "q_b"],
        last_green={"q_a": 3, "q_b": 1},
        file_edit_round={},
        import_edit_round={"q_a": 3},
    )
    assert order == ["q_b", "q_a"]  # both tier 2, oldest green first


def test_module_closure_follows_relative_and_symbol_imports():
    """The tool-side import-closure walk must see all three in-package import
    styles: `from ..io import table` (relative symbol), `from ..sources.
    filestream import ...` (relative dotted), and `from .stateful import ...`
    (sibling) — checked against the real tree, so a refactor that breaks the
    AST walk (and would silently stop marking importers stale) fails here."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from rotate_priority import module_closure

    c = module_closure(repo, "hbase_observer_es_spark/streaming/scrub.py")
    assert "hbase_observer_es_spark/streaming/scrub.py" in c  # itself
    assert "hbase_observer_es_spark/io.py" in c  # relative symbol import
    assert "hbase_observer_es_spark/sources/filestream.py" in c  # dotted
    assert "hbase_observer_es_spark/streaming/stateful.py" in c  # sibling
    # transitive: stateful -> sinks.keyed_parquet
    assert "hbase_observer_es_spark/sinks/keyed_parquet.py" in c
    # never escapes the package
    assert all(p.startswith("hbase_observer_es_spark/") for p in c)


def test_proven_unaffected_joins_age_band():
    # all four green r2, edits r3: q_a file-edited affected, q_b file-edited
    # but PROVEN unaffected, q_c import-edited affected, q_d import-edited
    # proven unaffected; q_e untouched green r1.
    order = derive_order(
        ["q_a", "q_b", "q_c", "q_d", "q_e"],
        last_green={"q_a": 2, "q_b": 2, "q_c": 2, "q_d": 2, "q_e": 1},
        file_edit_round={"q_a": 3, "q_b": 3},
        import_edit_round={"q_c": 3, "q_d": 3},
        unaffected={"q_b", "q_d"},
    )
    # round-9 policy: affected rows first (file before import); the
    # proven-unaffected rows join the age-ordered band — so the OLDER
    # untouched green (q_e, r1) outranks both r2 proven rows, and on the r2
    # tie file-proven precedes import-proven.
    assert order == ["q_a", "q_c", "q_e", "q_b", "q_d"]


def test_age_band_prevents_proven_rows_starving_old_greens():
    """The round-8→9 starvation fix: dozens of recently-green
    proven-unchanged rows must NOT outrank an old untouched green — the
    driver window is a prefix, so band order IS evidence retirement order."""
    names = [f"q_p{i}" for i in range(5)] + ["q_old"]
    order = derive_order(
        names,
        # proven rows green r7, file edited r8 but AST-proven unchanged;
        # q_old green r5, untouched since
        last_green={**{f"q_p{i}": 7 for i in range(5)}, "q_old": 5},
        file_edit_round={f"q_p{i}": 8 for i in range(5)},
        unaffected={f"q_p{i}" for i in range(5)},
    )
    assert order[0] == "q_old"
    # and a possibly-affected edit still outranks everything in the band
    order2 = derive_order(
        ["q_aff", "q_old"],
        last_green={"q_aff": 7, "q_old": 5},
        file_edit_round={"q_aff": 8},
        unaffected=set(),
    )
    assert order2 == ["q_aff", "q_old"]


def test_unaffected_never_overrides_own_fn_edit():
    # a hand-declared own-fn edit outranks any proof claiming otherwise
    order = derive_order(
        ["q_b", "q_a"],
        last_green={"q_a": 3, "q_b": 3},
        file_edit_round={"q_a": 4, "q_b": 4},
        edited_functions={"q_a"},
        unaffected={"q_a", "q_b"},
    )
    assert order == ["q_a", "q_b"]



def test_rotate_priority_end_to_end_invariants():
    """Run the real tool on the real repo: every registered query appears
    exactly once, tier comments are monotonically ordered, never-checked rows
    (if any) lead, and the output round-trips as Python source."""
    import ast as ast_mod
    import os
    import re
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "rotate_priority.py")],
        capture_output=True,
        text=True,
        cwd=repo,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    body = out.stdout
    names = re.findall(r'"(q_\w+|s_\w+)",', body)
    from hbase_observer_es_spark.registry import all_queries

    assert sorted(names) == sorted(all_queries())
    assert len(names) == len(set(names))
    tiers = [
        float(m.group(1))
        for m in re.finditer(r"# tier (\d+\.\d+):", body)
    ]
    assert tiers == sorted(tiers)
    # the emitted tuple parses as Python
    ast_mod.parse(body)



def test_rotate_priority_no_ast_fallback():
    """--no-ast (file-granularity fallback) still emits a complete, parseable
    schedule — the escape hatch if the proof machinery ever misbehaves."""
    import ast as ast_mod
    import os
    import re
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "rotate_priority.py"), "--no-ast"],
        capture_output=True, text=True, cwd=repo, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    names = re.findall(r'"(q_\w+|s_\w+)",', out.stdout)
    from hbase_observer_es_spark.registry import all_queries

    assert sorted(names) == sorted(all_queries())
    assert "PROVEN" not in out.stdout  # no proof tiers in fallback mode
    ast_mod.parse(out.stdout)


def test_imports_of_unparseable_module_fails_loud(tmp_path):
    """Round-8 ADVICE: an unparseable module must not silently contribute an
    empty import closure (its dependents would dodge import-staleness while
    the astdeps proof layer independently treats the file as affected — the
    two layers disagreeing on the conservative direction). The tool raises."""
    import os
    import sys

    import pytest

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from rotate_priority import _imports_of

    pkg = tmp_path / "hbase_observer_es_spark"
    pkg.mkdir()
    (pkg / "broken.py").write_text("def broken(:\n")
    with pytest.raises(SyntaxError, match="broken.py"):
        _imports_of(str(tmp_path), "hbase_observer_es_spark/broken.py")


def test_bench_adjudicate_runs_and_classifies(tmp_path):
    """The bench-mover adjudicator must run against the last round boundary
    and emit the contract keys; every mover's verdict must be one of the two
    classes, and 'environmental' may only appear with the closure proof
    machinery available (the tool exits nonzero only on code-changed
    movers)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "bench_adjudicate.py")],
        capture_output=True, text=True,
    )
    d = json.loads(r.stdout)
    for key in ("baseline_ref", "compared", "within_spread", "movers",
                "code_changed_movers", "new_queries"):
        assert key in d, key
    assert d["compared"] >= d["within_spread"] >= 0
    for name, m in d["movers"].items():
        assert m["verdict"] in ("environmental", "code-changed"), (name, m)
    assert (r.returncode == 1) == bool(d["code_changed_movers"])


def test_plan_diff_classifies_posture_changes():
    """tools/plan_diff.py diff_plans: regression-class facts flag, neutral
    improvements don't, streaming state-topology changes always flag."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from plan_diff import diff_plans

    base = {
        "plans": {
            "q_a": {"exchanges": 1, "python_eval": False, "rdd_scan": False,
                    "broadcast_joins": 1, "sortmerge_joins": 0,
                    "scans": [{"columns": ["x", "y"]}]},
            "q_b": {"exchanges": 3, "python_eval": False},
        },
        "streaming_plans": {
            "s_x": {"mode": "true-stream", "state_store_saves": 1,
                    "stream_stream_joins": 0, "exchanges": 1},
        },
    }
    cur = {
        "plans": {
            # q_a: broadcast degraded to SMJ + wider scan + python eval = bad
            "q_a": {"exchanges": 2, "python_eval": True, "rdd_scan": False,
                    "broadcast_joins": 0, "sortmerge_joins": 1,
                    "scans": [{"columns": ["x", "y", "z"]}]},
            # q_b: FEWER exchanges = neutral improvement, must not flag
            "q_b": {"exchanges": 2, "python_eval": False},
        },
        "streaming_plans": {
            # state topology change = checkpoint-breaking, always flags
            "s_x": {"mode": "true-stream", "state_store_saves": 2,
                    "stream_stream_joins": 0, "exchanges": 1},
        },
    }
    d = diff_plans(base, cur)
    assert d["regressions"] == ["q_a", "s_x"]
    assert set(d["changed"]["q_a"]["regression"]) == {
        "exchanges_up", "python_eval_appeared",
        "broadcast_degraded_to_sortmerge", "scan_width_grew",
    }
    assert d["changed"]["q_b"]["regression"] == []
    assert d["changed"]["s_x"]["regression"] == ["state_store_saves_changed"]
    # identical docs diff clean
    clean = diff_plans(cur, cur)
    assert clean["changed"] == {} and clean["regressions"] == []
