"""astdeps: definition-level staleness proofs for the rotation policy.

No Spark — pure AST analysis over synthetic in-memory modules."""

from __future__ import annotations

from hbase_observer_es_spark.astdeps import (
    MODULE_RESIDUAL,
    DepGraph,
    changed_defs,
    is_affected,
    parse_defs,
    query_roots,
)

PKG = "pkg"


def _resolve_factory(sources: dict[str, str]):
    def resolve(parts: list[str]):
        if not parts or parts[0] != PKG:
            return None
        base = "/".join(parts)
        for rel in (base + ".py", base + "/__init__.py"):  # module, then package
            if rel in sources:
                return rel
        return None

    return resolve


def _graph(sources: dict[str, str]) -> DepGraph:
    return DepGraph(sources, _resolve_factory(sources))


# -- parse/diff ---------------------------------------------------------------


def test_parse_defs_docstrings_and_residual():
    src = '"""module doc."""\nX = 1\n\ndef f(a):\n    "fn doc"\n    return a + X\n\nprint("side effect")\n'
    defs = parse_defs(src)
    assert set(defs) == {"X", "f", MODULE_RESIDUAL}
    # docstring-only change is invisible
    other = src.replace("module doc", "MODULE DOC v2").replace("fn doc", "different")
    assert changed_defs(src, other) == set()


def test_changed_defs_flags_semantic_edits_only():
    old = "X = 1\n\ndef f():\n    return X\n\ndef g():\n    return 2\n"
    # reformat f (no change), edit g's body, add h, change X
    new = "X = 2\n\ndef f():\n    return X\n\ndef g():\n    return 3\n\ndef h():\n    return 4\n"
    assert changed_defs(old, new) == {"X", "g", "h"}
    # removal counts as a change
    assert "g" in changed_defs(new, "X = 2\n\ndef f():\n    return X\n")


def test_changed_defs_unparseable_is_none():
    assert changed_defs("def broken(:", "def f():\n    pass\n") is None
    assert changed_defs(None, "def f():\n    pass\n") is None


def test_module_residual_change_detected():
    old = "def f():\n    return 1\n"
    new = "def f():\n    return 1\n\nif True:\n    Y = 2\n"
    assert MODULE_RESIDUAL in changed_defs(old, new)


# -- query roots --------------------------------------------------------------

MOD_WITH_REGISTRY = """
def q_one(spark, sf):
    return spark

SQL_ONE = "SELECT 1"

QUERIES = {"q_one": q_one}
ORACLES = {"q_one": SQL_ONE}
"""


def test_query_roots_covers_fn_and_sql():
    assert query_roots(MOD_WITH_REGISTRY, "q_one") == {("QUERIES", "q_one"), ("ORACLES", "SQL_ONE")}
    assert query_roots(MOD_WITH_REGISTRY, "q_missing") is None


def test_query_roots_computed_entry_is_none():
    src = 'QUERIES = {"q_x": make_query("x")}\n'
    assert query_roots(src, "q_x") is None


# -- closure ------------------------------------------------------------------


def test_closure_same_module_recursion():
    sources = {
        f"{PKG}/a.py": "K = 3\n\ndef helper(x):\n    return x * K\n\ndef q(s):\n    return helper(s)\n\ndef unrelated():\n    return 9\n"
    }
    reached, opaque = _graph(sources).closure(f"{PKG}/a.py", {"q"})
    names = {n for _, n in reached}
    assert not opaque
    assert names == {"q", "helper", "K", MODULE_RESIDUAL}
    assert "unrelated" not in names


def test_closure_cross_module_from_import():
    sources = {
        f"{PKG}/io.py": "def table(s):\n    return s\n\ndef other():\n    return 0\n",
        f"{PKG}/a.py": f"from {PKG}.io import table\n\ndef q(s):\n    return table(s)\n",
    }
    reached, opaque = _graph(sources).closure(f"{PKG}/a.py", {"q"})
    assert not opaque
    assert (f"{PKG}/io.py", "table") in reached
    assert (f"{PKG}/io.py", "other") not in reached


def test_closure_module_alias_attribute_is_precise():
    sources = {
        f"{PKG}/h.py": "def used():\n    return 1\n\ndef unused():\n    return 2\n",
        f"{PKG}/a.py": f"from {PKG} import h\n\ndef q(s):\n    return h.used()\n",
    }
    reached, opaque = _graph(sources).closure(f"{PKG}/a.py", {"q"})
    assert not opaque
    assert (f"{PKG}/h.py", "used") in reached
    assert (f"{PKG}/h.py", "unused") not in reached


def test_closure_bare_module_use_is_whole_module():
    sources = {
        f"{PKG}/h.py": "def a():\n    return 1\n\ndef b():\n    return 2\n",
        f"{PKG}/a.py": f"from {PKG} import h\n\ndef q(s):\n    return s(h)\n",
    }
    reached, _ = _graph(sources).closure(f"{PKG}/a.py", {"q"})
    assert {(f"{PKG}/h.py", "a"), (f"{PKG}/h.py", "b")} <= reached


def test_closure_follows_reexport_chain():
    sources = {
        f"{PKG}/base.py": "def real():\n    return 1\n",
        f"{PKG}/facade.py": f"from {PKG}.base import real\n",
        f"{PKG}/a.py": f"from {PKG}.facade import real\n\ndef q(s):\n    return real()\n",
    }
    reached, opaque = _graph(sources).closure(f"{PKG}/a.py", {"q"})
    assert not opaque
    assert (f"{PKG}/base.py", "real") in reached


def test_dynamic_and_star_imports_are_opaque():
    dyn = {f"{PKG}/a.py": "def q(s):\n    return getattr(s, 'x')\n"}
    assert _graph(dyn).closure(f"{PKG}/a.py", {"q"}).opaque
    star = {
        f"{PKG}/h.py": "def x():\n    return 1\n",
        f"{PKG}/a.py": f"from {PKG}.h import *\n\ndef q(s):\n    return x()\n",
    }
    assert _graph(star).closure(f"{PKG}/a.py", {"q"}).opaque


# -- is_affected --------------------------------------------------------------

HELPER_OLD = "def table(s):\n    return s\n"
MOD_OLD = (
    f"from {PKG}.io import table\n\n"
    "def q_one(spark, sf):\n    return table(spark)\n\n"
    'SQL_ONE = "SELECT 1"\n\n'
    'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
)


def test_additive_edit_is_unaffected():
    """A new function appended to the module does not affect q_one."""
    sources = {
        f"{PKG}/io.py": HELPER_OLD,
        f"{PKG}/a.py": MOD_OLD + "\ndef q_two(spark, sf):\n    return spark\n",
    }
    old = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": MOD_OLD}
    assert not is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)


def test_reachable_helper_edit_is_affected():
    sources = {
        f"{PKG}/io.py": "def table(s):\n    return s.cache()\n",
        f"{PKG}/a.py": MOD_OLD,
    }
    old = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": MOD_OLD}
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)


def test_unreachable_helper_edit_is_unaffected():
    sources = {
        f"{PKG}/io.py": HELPER_OLD + "\ndef new_helper():\n    return 7\n",
        f"{PKG}/a.py": MOD_OLD,
    }
    old = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": MOD_OLD}
    assert not is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)


def test_oracle_sql_edit_is_affected():
    """The driver consumes the SQL constant too — editing it alone affects."""
    sources = {
        f"{PKG}/io.py": HELPER_OLD,
        f"{PKG}/a.py": MOD_OLD.replace('"SELECT 1"', '"SELECT 2"'),
    }
    old = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": MOD_OLD}
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)


def test_missing_old_source_is_affected():
    sources = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": MOD_OLD}
    old = {f"{PKG}/a.py": MOD_OLD}  # io.py has no recorded old source
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)


def test_docstring_only_edit_is_unaffected():
    with_doc = MOD_OLD.replace(
        "def q_one(spark, sf):\n    return table(spark)",
        'def q_one(spark, sf):\n    "v2 of the doc"\n    return table(spark)',
    )
    sources = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": with_doc}
    old = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": MOD_OLD}
    assert not is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)


def test_registry_entry_rebinding_is_affected():
    """Rebinding "q_one" to a different (old, unchanged) function must flag —
    the def-level diff alone can't see it."""
    rebind_old = (
        "def q_one(spark, sf):\n    return spark.a\n\n"
        "def q_alt(spark, sf):\n    return spark.b\n\n"
        'SQL_ONE = "SELECT 1"\n\n'
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
    )
    rebind_new = rebind_old.replace('{"q_one": q_one}', '{"q_one": q_alt}')
    sources = {f"{PKG}/a.py": rebind_new}
    old = {f"{PKG}/a.py": rebind_old}
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)


def test_import_alias_rebinding_is_affected():
    """Re-pointing an import alias at a different, individually-unchanged
    helper changes which code runs — the alias-binding guard must flag it."""
    helper = "def fast(s):\n    return s\n\ndef safe(s):\n    return s.strip()\n"
    old_mod = (
        f"from {PKG}.io import fast as table\n\n"
        "def q_one(spark, sf):\n    return table(spark)\n\n"
        'SQL_ONE = "SELECT 1"\n\n'
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
    )
    new_mod = old_mod.replace("import fast as table", "import safe as table")
    sources = {f"{PKG}/io.py": helper, f"{PKG}/a.py": new_mod}
    old = {f"{PKG}/io.py": helper, f"{PKG}/a.py": old_mod}
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)
    # and the unchanged binding stays unaffected
    assert not is_affected(_graph({f"{PKG}/io.py": helper, f"{PKG}/a.py": old_mod}),
                           f"{PKG}/a.py", "q_one", old)


def test_residual_callee_change_is_affected():
    """A function invoked only from module-level residual code (import-time
    side effects) is part of the closure — changing it must flag."""
    old_mod = (
        "CACHE = {}\n\n"
        "def _fill():\n    CACHE['k'] = 1\n\n"
        "_fill()\n\n"
        "def q_one(spark, sf):\n    return CACHE\n\n"
        'SQL_ONE = "SELECT 1"\n\n'
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
    )
    new_mod = old_mod.replace("CACHE['k'] = 1", "CACHE['k'] = 2")
    sources = {f"{PKG}/a.py": new_mod}
    old = {f"{PKG}/a.py": old_mod}
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)


def test_init_relative_import_resolves_to_own_package():
    """`from . import helper` inside pkg/sub/__init__.py must resolve to
    pkg/sub/helper.py, not pkg/helper.py (the current-package rule differs
    between a package's __init__ and a plain module)."""
    from hbase_observer_es_spark.astdeps import ModuleView

    sources = {
        f"{PKG}/sub/helper.py": "def h():\n    return 1\n",
        f"{PKG}/helper.py": "def h():\n    return 2\n",
        f"{PKG}/sub/__init__.py": "from . import helper\n",
    }
    view = ModuleView.parse(
        f"{PKG}/sub/__init__.py",
        sources[f"{PKG}/sub/__init__.py"],
        _resolve_factory(sources),
    )
    assert view.imports["helper"] == (f"{PKG}/sub/helper.py", None)



# -- randomized adversarial pairs --------------------------------------------


def _mk_module(helpers: int, queries: int, wire: list[tuple[int, int]]) -> str:
    """Synthetic module: `helpers` chained helper fns, `queries` query fns,
    `wire` = (query_idx, helper_idx) call edges."""
    out = ["K = 10\n"]
    for h in range(helpers):
        callee = f" + h{h-1}(x)" if h else ""
        out.append(f"def h{h}(x):\n    return x * {h + 1} + K{callee}\n")
    for q in range(queries):
        calls = " + ".join(
            f"h{h}(1)" for qq, h in wire if qq == q
        ) or "0"
        out.append(f"def q_{q}(spark, sf):\n    return {calls}\n")
        out.append(f'SQL_{q} = "SELECT {q}"\n')
    qd = ", ".join(f'"q_{q}": q_{q}' for q in range(queries))
    od = ", ".join(f'"q_{q}": SQL_{q}' for q in range(queries))
    out.append("QUERIES = {" + qd + "}\n")
    out.append("ORACLES = {" + od + "}\n")
    return "\n".join(out)


def test_randomized_edit_matrix():
    """For a deterministic matrix of synthetic modules: editing helper h must
    affect exactly the queries whose call chain reaches h (chains run h ->
    h-1 -> ... -> 0, so reaching h' means wired to any h >= h'), and adding a
    brand-new helper affects nobody."""
    helpers, queries = 4, 3
    wire = [(0, 0), (1, 2), (2, 3)]  # q_0->h0, q_1->h2, q_2->h3
    old_src = _mk_module(helpers, queries, wire)
    for edited_h in range(helpers):
        new_src = old_src.replace(
            f"def h{edited_h}(x):\n    return x * {edited_h + 1}",
            f"def h{edited_h}(x):\n    return x * {edited_h + 100}",
        )
        assert new_src != old_src
        sources = {f"{PKG}/m.py": new_src}
        old = {f"{PKG}/m.py": old_src}
        g = _graph(sources)
        for q in range(queries):
            # q reaches edited_h iff its wired helper index >= edited_h
            # (helper chain h_n calls h_{n-1}); q_0->h0 reaches only h0, etc.
            wired = dict(wire)[q]
            expect = wired >= edited_h
            got = is_affected(g, f"{PKG}/m.py", f"q_{q}", old)
            assert got == expect, (edited_h, q, got, expect)
    # additive: append a new helper nobody calls
    sources = {f"{PKG}/m.py": old_src + "\ndef h_new(x):\n    return x\n"}
    g = _graph(sources)
    for q in range(queries):
        assert not is_affected(g, f"{PKG}/m.py", f"q_{q}", {f"{PKG}/m.py": old_src})


def test_shared_constant_edit_affects_all():
    """Every helper chain reads K — editing it affects every query."""
    old_src = _mk_module(2, 2, [(0, 0), (1, 1)])
    new_src = old_src.replace("K = 10", "K = 11")
    g = _graph({f"{PKG}/m.py": new_src})
    for q in range(2):
        assert is_affected(g, f"{PKG}/m.py", f"q_{q}", {f"{PKG}/m.py": old_src})



def test_function_local_import_is_tracked():
    """`def q(): from pkg.io import helper` — the nested import is a real
    dependency; editing helper must affect q (the repo's dsum pattern)."""
    old_helper = "def dsum(c):\n    return c\n"
    mod = (
        "def q_one(spark, sf):\n"
        f"    from {PKG}.io import dsum\n"
        "    return dsum(spark)\n\n"
        'SQL_ONE = "SELECT 1"\n\n'
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
    )
    new_helper = "def dsum(c):\n    return c * 2\n"
    sources = {f"{PKG}/io.py": new_helper, f"{PKG}/a.py": mod}
    old = {f"{PKG}/io.py": old_helper, f"{PKG}/a.py": mod}
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)
    # unchanged helper: unaffected
    same = {f"{PKG}/io.py": old_helper, f"{PKG}/a.py": mod}
    assert not is_affected(_graph(same), f"{PKG}/a.py", "q_one", old)


def test_conflicting_local_import_aliases_go_opaque():
    """Two defs binding the same alias to DIFFERENT in-package targets: no
    single module-wide binding is right, so the module goes opaque and every
    query in it stays affected."""
    sources = {
        f"{PKG}/x.py": "def f():\n    return 1\n",
        f"{PKG}/y.py": "def f():\n    return 2\n",
        f"{PKG}/a.py": (
            f"def q1(s):\n    from {PKG}.x import f\n    return f()\n\n"
            f"def q2(s):\n    from {PKG}.y import f\n    return f()\n"
        ),
    }
    g = _graph(sources)
    assert g.closure(f"{PKG}/a.py", {"q1"}).opaque



def test_external_import_rebinding_is_affected():
    """`import pandas as pd` -> `import polars as pd`: the def body is
    unchanged but the external origin moved — the ext-binding guard flags."""
    old_mod = (
        "import pandas as pd\n\n"
        "def q_one(spark, sf):\n    return pd.DataFrame\n\n"
        'SQL_ONE = "SELECT 1"\n\n'
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
    )
    new_mod = old_mod.replace("import pandas as pd", "import polars as pd")
    sources = {f"{PKG}/a.py": new_mod}
    old = {f"{PKG}/a.py": old_mod}
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)
    # same origin: unaffected
    assert not is_affected(_graph({f"{PKG}/a.py": old_mod}), f"{PKG}/a.py", "q_one", old)


def test_ancestor_init_residual_in_closure():
    """Importing pkg/sub/x.py executes pkg/__init__.py and pkg/sub/__init__.py
    — a side-effecting statement added to either affects importing queries."""
    old_init = ""
    mod = (
        f"from {PKG}.sub.x import helper\n\n"
        "def q_one(spark, sf):\n    return helper()\n\n"
        'SQL_ONE = "SELECT 1"\n\n'
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
    )
    helper_src = "def helper():\n    return 1\n"
    base = {
        f"{PKG}/__init__.py": old_init,
        f"{PKG}/sub/__init__.py": old_init,
        f"{PKG}/sub/x.py": helper_src,
        f"{PKG}/a.py": mod,
    }
    new = dict(base)
    new[f"{PKG}/sub/__init__.py"] = "print('side effect at import')\n"
    assert is_affected(_graph(new), f"{PKG}/a.py", "q_one", base)
    assert not is_affected(_graph(dict(base)), f"{PKG}/a.py", "q_one", base)



def test_attribute_only_use_of_from_imported_def_is_tracked():
    """`from pkg.h import Codec` used ONLY as `Codec.SEP` (attribute base,
    never a bare name): the def itself is the dependency and must be walked."""
    old_h = "class Codec:\n    SEP = ','\n"
    mod = (
        f"from {PKG}.h import Codec\n\n"
        "def q_one(spark, sf):\n    return Codec.SEP\n\n"
        'SQL_ONE = "SELECT 1"\n\n'
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
    )
    new_h = old_h.replace("','", "';'")
    sources = {f"{PKG}/h.py": new_h, f"{PKG}/a.py": mod}
    old = {f"{PKG}/h.py": old_h, f"{PKG}/a.py": mod}
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)
    same = {f"{PKG}/h.py": old_h, f"{PKG}/a.py": mod}
    assert not is_affected(_graph(same), f"{PKG}/a.py", "q_one", old)


def test_package_attr_chain_tracks_submodule():
    """`from pkg import sub` + `sub.filestream.stage(...)`: the package
    attribute resolves to the submodule FILE — whole-module dependence, so a
    change in filestream.py flags and an untouched one still proves clean."""
    fs_old = "def stage(x):\n    return x\n"
    mod = (
        f"from {PKG} import sub\n\n"
        "def q_one(spark, sf):\n    return sub.filestream.stage(spark)\n\n"
        'SQL_ONE = "SELECT 1"\n\n'
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
    )
    base = {
        f"{PKG}/sub/__init__.py": "",
        f"{PKG}/sub/filestream.py": fs_old,
        f"{PKG}/a.py": mod,
    }
    changed = dict(base)
    changed[f"{PKG}/sub/filestream.py"] = "def stage(x):\n    return x.cache()\n"
    assert is_affected(_graph(changed), f"{PKG}/a.py", "q_one", base)
    assert not is_affected(_graph(dict(base)), f"{PKG}/a.py", "q_one", base)


def test_lost_import_chain_goes_opaque():
    """`import pkg.io`-style dotted access where the top package cannot be
    resolved (no __init__): the chain is lost — opaque, never a silent
    builtin fallthrough."""
    sources2 = {
        f"{PKG}/io.py": "def table(x):\n    return x\n",
        f"{PKG}/a.py": (
            f"import {PKG}.io\n\n"
            "def q_one(spark, sf):\n"
            f"    return {PKG}.io.table(spark)\n"
        ),
    }
    assert _graph(sources2).closure(f"{PKG}/a.py", {"q_one"}).opaque


def test_cyclic_unresolved_reexport_terminates():
    """a.py re-exports x from b.py and vice versa with x defined nowhere —
    the walk must terminate (visited-set guard) and flag, not hang."""
    sources = {
        f"{PKG}/a.py": (
            f"from {PKG}.b import x\n\n"
            "def q_one(spark, sf):\n    return x\n"
        ),
        f"{PKG}/b.py": f"from {PKG}.a import x\n",
    }
    c = _graph(sources).closure(f"{PKG}/a.py", {"q_one"})
    assert c is not None  # terminated


def test_same_module_attr_base_def_is_tracked():
    """DEC used only as DEC.format(...) (the repo's functions.py pattern):
    the same-module def is walked even with no bare-name use."""
    old_mod = (
        'DEC = "decimal(18,{scale})"\n\n'
        "def q_one(spark, sf):\n    return DEC.format(scale=4)\n\n"
        'SQL_ONE = "SELECT 1"\n\n'
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
    )
    new_mod = old_mod.replace("decimal(18,{scale})", "decimal(20,{scale})")
    assert is_affected(
        _graph({f"{PKG}/a.py": new_mod}), f"{PKG}/a.py", "q_one",
        {f"{PKG}/a.py": old_mod},
    )
    assert not is_affected(
        _graph({f"{PKG}/a.py": old_mod}), f"{PKG}/a.py", "q_one",
        {f"{PKG}/a.py": old_mod},
    )


def test_residual_bound_attr_stays_provable():
    """`A, B = 1, 2` lands in residual; `m.A` access must neither go opaque
    (precision) nor miss a change to the tuple assign (soundness)."""
    m_old = "A, B = 1, 2\n"
    mod = (
        f"from {PKG} import m\n\n"
        "def q_one(spark, sf):\n    return m.A\n\n"
        'SQL_ONE = "SELECT 1"\n\n'
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
    )
    base = {f"{PKG}/m.py": m_old, f"{PKG}/a.py": mod}
    g = _graph(dict(base))
    assert not g.closure(f"{PKG}/a.py", {"q_one"}).opaque
    assert not is_affected(g, f"{PKG}/a.py", "q_one", base)
    changed = {f"{PKG}/m.py": "A, B = 9, 2\n", f"{PKG}/a.py": mod}
    assert is_affected(_graph(changed), f"{PKG}/a.py", "q_one", base)



def test_unused_inpackage_import_add_is_affected():
    """Adding `from pkg import hooks` (alias never referenced) changes what
    executes at import time — the import_targets comparison must flag it."""
    hooks = "print('registration side effect')\n"
    new_mod = f"from {PKG} import hooks\n" + MOD_OLD
    sources = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/hooks.py": hooks,
               f"{PKG}/a.py": new_mod}
    old = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/hooks.py": hooks,
           f"{PKG}/a.py": MOD_OLD}
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)


def test_external_star_import_is_opaque():
    """`from math import *`: the bound names are unknowable even for external
    modules — changing the star source must never be provable-clean."""
    src = {f"{PKG}/a.py": "from math import *\n\ndef q(s):\n    return sqrt(s)\n"}
    assert _graph(src).closure(f"{PKG}/a.py", {"q"}).opaque


def test_aliased_importlib_is_opaque():
    """`import importlib as il` / `from importlib import import_module`:
    dynamic loading under a non-literal name."""
    a = {f"{PKG}/a.py": "import importlib as il\n\ndef q(s):\n    return il.import_module(s)\n"}
    assert _graph(a).closure(f"{PKG}/a.py", {"q"}).opaque
    b = {f"{PKG}/a.py": "from importlib import import_module\n\ndef q(s):\n    return import_module(s)\n"}
    assert _graph(b).closure(f"{PKG}/a.py", {"q"}).opaque


def test_deep_chain_resolves_into_nested_submodule():
    """sub.nested.mod.f(): the chain walks package → package → module → def,
    so editing f flags and an untouched tree stays provable."""
    mod_src = "def f():\n    return 1\n\ndef g():\n    return 2\n"
    a = (
        f"from {PKG} import sub\n\n"
        "def q_one(spark, sf):\n    return sub.nested.mod.f()\n\n"
        'SQL_ONE = "SELECT 1"\n\n'
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
    )
    base = {
        f"{PKG}/sub/__init__.py": "",
        f"{PKG}/sub/nested/__init__.py": "",
        f"{PKG}/sub/nested/mod.py": mod_src,
        f"{PKG}/a.py": a,
    }
    g = _graph(dict(base))
    c = g.closure(f"{PKG}/a.py", {"q_one"})
    assert not c.opaque
    assert (f"{PKG}/sub/nested/mod.py", "f") in c.reached
    assert (f"{PKG}/sub/nested/mod.py", "g") not in c.reached
    changed = dict(base)
    changed[f"{PKG}/sub/nested/mod.py"] = mod_src.replace("return 1", "return 9")
    assert is_affected(_graph(changed), f"{PKG}/a.py", "q_one", base)
    assert not is_affected(_graph(dict(base)), f"{PKG}/a.py", "q_one", base)


def test_registry_role_swap_is_affected():
    """Swapping the QUERIES callable and the ORACLES SQL entry keeps the same
    NAME set but changes what the driver runs — roles must compare."""
    swapped = MOD_OLD.replace(
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}',
        'QUERIES = {"q_one": SQL_ONE}\nORACLES = {"q_one": q_one}',
    )
    sources = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": swapped}
    old = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": MOD_OLD}
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)


def test_dict_spread_registry_entry_is_affected():
    """A **spread in QUERIES can override the explicit entry at runtime —
    unresolvable statically, so never provable."""
    spread = MOD_OLD.replace(
        'QUERIES = {"q_one": q_one}',
        'EXTRA = {}\nQUERIES = {"q_one": q_one, **EXTRA}',
    )
    sources = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": spread}
    old = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": spread}
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)



def test_chain_through_residual_module_sees_ext_rebinding():
    """m.pd.DataFrame where m has residual statements AND `import pandas as
    pd`: changing m to `import polars as pd` must flag even though the hop
    would otherwise stop at the residual-bound rule."""
    m_old = "import pandas as pd\nprint('residual')\n"
    a = (
        f"from {PKG} import m\n\n"
        "def q_one(spark, sf):\n    return m.pd.DataFrame\n\n"
        'SQL_ONE = "SELECT 1"\n\n'
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
    )
    base = {f"{PKG}/m.py": m_old, f"{PKG}/a.py": a}
    changed = {f"{PKG}/m.py": m_old.replace("pandas", "polars"), f"{PKG}/a.py": a}
    assert is_affected(_graph(changed), f"{PKG}/a.py", "q_one", base)
    assert not is_affected(_graph(dict(base)), f"{PKG}/a.py", "q_one", base)


def test_chain_value_reexported_module_is_whole_module():
    """spark.run(m.helper_mod): the chain's VALUE is a re-exported module
    object — whole-module dependence, same as the bare-name rule."""
    helper = "def f():\n    return 1\n"
    m = f"from {PKG} import helper_mod\n"
    a = (
        f"from {PKG} import m\n\n"
        "def q_one(spark, sf):\n    return spark.run(m.helper_mod)\n\n"
        'SQL_ONE = "SELECT 1"\n\n'
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
    )
    base = {f"{PKG}/helper_mod.py": helper, f"{PKG}/m.py": m, f"{PKG}/a.py": a}
    changed = dict(base)
    changed[f"{PKG}/helper_mod.py"] = helper.replace("return 1", "return 2")
    assert is_affected(_graph(changed), f"{PKG}/a.py", "q_one", base)
    assert not is_affected(_graph(dict(base)), f"{PKG}/a.py", "q_one", base)


def test_getattr_first_over_same_named_submodule():
    """`from pkg.sub import thing` where sub/__init__ DEFINES thing and
    sub/thing.py also exists: Python binds the __init__ def — editing it
    must flag (and the submodule interpretation must not shadow it)."""
    init = "THRESH = 5\n\ndef thing(x):\n    return x + THRESH\n"
    a = (
        f"from {PKG}.sub import thing\n\n"
        "def q_one(spark, sf):\n    return thing(spark)\n\n"
        'SQL_ONE = "SELECT 1"\n\n'
        'QUERIES = {"q_one": q_one}\nORACLES = {"q_one": SQL_ONE}\n'
    )
    base = {
        f"{PKG}/sub/__init__.py": init,
        f"{PKG}/sub/thing.py": "def unrelated():\n    return 0\n",
        f"{PKG}/a.py": a,
    }
    changed = dict(base)
    changed[f"{PKG}/sub/__init__.py"] = init.replace("THRESH = 5", "THRESH = 9")
    assert is_affected(_graph(changed), f"{PKG}/a.py", "q_one", base)
    assert not is_affected(_graph(dict(base)), f"{PKG}/a.py", "q_one", base)


def test_old_source_star_import_in_reachable_module_is_affected():
    """Round-8 ADVICE repro: the OLD source of a reachable helper had a star
    import (removed since), every reached def is AST-identical — the old
    surface is unboundable, so the query must NOT be proven unaffected.
    Pre-fix, only the used_aliases loop checked not_provable, and the helper
    module appears there under the IMPORTING module's key, so old-side
    opacity in the helper slipped through."""
    old_helper = HELPER_OLD + "from evil import *\n"
    sources = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": MOD_OLD}
    old = {f"{PKG}/io.py": old_helper, f"{PKG}/a.py": MOD_OLD}
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)


def test_old_source_star_import_in_defining_module_is_affected():
    """Same hole, defining-module variant: old a.py carried the star import."""
    old_mod = f"from evil import *\n" + MOD_OLD
    sources = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": MOD_OLD}
    old = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": old_mod}
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)


def test_new_source_star_import_is_affected_symmetrically():
    """The symmetric direction (star import ADDED since green) was already
    caught by the closure's opaque flag; pin it at the is_affected surface so
    both directions are covered by the same contract."""
    new_helper = HELPER_OLD + "from evil import *\n"
    sources = {f"{PKG}/io.py": new_helper, f"{PKG}/a.py": MOD_OLD}
    old = {f"{PKG}/io.py": HELPER_OLD, f"{PKG}/a.py": MOD_OLD}
    assert is_affected(_graph(sources), f"{PKG}/a.py", "q_one", old)
