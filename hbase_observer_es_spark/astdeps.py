"""Definition-level staleness analysis for the verification-rotation policy.

rotation.py's edited-since-green tier is file-granular: ANY edit to a query's
defining module (or a module in its import closure) marks the query stale. That
is safely conservative but wasteful — most cross-round edits in this repo are
ADDITIVE (a new query function appended to an existing module), and the bounded
driver window (~50 rows/round) then burns slots re-checking queries whose
executable surface is bit-identical to the last green check.

This module makes the distinction provable instead of guessed: from the
CURRENT source, compute the set of top-level definitions a query actually
reaches — its function, the oracle-SQL constant, and every in-package def
transitively referenced — then compare exactly those definitions' ASTs against
the source as of the query's last green check. If none changed, the edit was
additive FOR THIS QUERY and it demotes to a lower sub-tier (still ahead of
queries with no pending edit at all; rotation.py holds the ordering contract).

Conservatism rules (every uncertainty resolves to "affected"):

* unparseable old/new source, missing old blob (file added/renamed)  → affected;
* dynamic constructs anywhere in a reachable def (``getattr``/``eval``/
  ``exec``/``__import__``/``globals``/``vars``/``importlib``) or a star
  import in a reachable module → affected;
* a module alias used as a bare value (whole-module dependence) → depends on
  every definition in that module;
* a re-pointed binding — a QUERIES/ORACLES entry or an import alias in any
  reachable module now resolving to a different (individually unchanged)
  target → affected (the def-level diff can't see it; the binding comparison
  in ``is_affected`` does);
* module-level residual statements (anything executed at import that is not a
  def/class/import/named assignment) are compared as one unit per module;
* QUERIES/ORACLES registry entries that are not plain ``{"name": NAME}``
  references → roots unknown → affected.

Docstrings (module, class, function) are stripped before comparison: this
repo's docstrings carry provenance/scale notes and are edited freely; a
docstring-only change cannot move values.

AST comparison, not text: formatting and comments don't count; any semantic
token does (``ast.dump`` of the docstring-stripped definition).
"""

from __future__ import annotations

import ast
from dataclasses import dataclass, field

MODULE_RESIDUAL = "<module>"
_DYNAMIC_NAMES = {
    "getattr", "setattr", "delattr", "eval", "exec", "__import__",
    "globals", "vars", "locals", "importlib",
}


def _strip_docstrings(tree: ast.AST) -> ast.AST:
    for node in ast.walk(tree):
        if isinstance(
            node, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                node.body = body[1:]
    return tree


def _defs_from_tree(tree: ast.AST) -> dict[str, str]:
    """Classification over an already-parsed, docstring-stripped tree —
    shared by parse_defs and ModuleView.parse so each source parses once."""
    out: dict[str, list[str]] = {}
    residual: list[str] = []

    def add(name: str, node: ast.AST) -> None:
        out.setdefault(name, []).append(ast.dump(node))

    for node in tree.body:  # type: ignore[union-attr]
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            add(node.name, node)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            continue
        elif isinstance(node, ast.Assign) and all(
            isinstance(t, ast.Name) for t in node.targets
        ):
            for t in node.targets:
                add(t.id, node)  # type: ignore[union-attr]
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            add(node.target.id, node)
        else:
            residual.append(ast.dump(node))
    defs = {name: "\n".join(dumps) for name, dumps in out.items()}
    defs[MODULE_RESIDUAL] = "\n".join(residual)
    return defs


def parse_defs(src: str) -> dict[str, str] | None:
    """Top-level name → normalized AST dump of its definition(s); the
    ``MODULE_RESIDUAL`` key holds every other top-level statement (import
    statements excluded here — import TARGET changes surface through the
    resolved definitions, import RE-BINDINGS through is_affected's
    alias-binding guard, and import ADD/REMOVE through its import_targets
    comparison). None if the source does not parse."""
    try:
        tree = _strip_docstrings(ast.parse(src))
    except SyntaxError:
        return None
    return _defs_from_tree(tree)


def changed_defs(old_src: str | None, new_src: str) -> set[str] | None:
    """Names whose definition differs between old and new source: changed,
    added-in-new, removed-from-old, plus ``MODULE_RESIDUAL`` when module-level
    executable statements moved. None = cannot prove anything (unparseable or
    no old source) — the caller must treat every name as changed."""
    new = parse_defs(new_src)
    old = parse_defs(old_src) if old_src is not None else None
    if new is None or old is None:
        return None
    changed = {n for n, d in new.items() if old.get(n) != d}
    changed |= {n for n in old if n not in new}
    return changed


def query_roots(src: str, qname: str) -> set[tuple[str, str]] | None:
    """The top-level names a registered query hangs from, as (registry role,
    name) pairs — the ``QUERIES`` callable and the ``ORACLES`` SQL constant
    (the driver consumes BOTH, and the ROLE matters: swapping them is a real
    rebinding the guard must see). None when an entry exists in a form this
    static scan can't resolve — including a ``**spread`` in the dict, whose
    runtime override of an explicit entry is invisible to AST inspection."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    roots: set[tuple[str, str]] = set()
    found = 0
    for node in tree.body:
        if not (
            isinstance(node, ast.Assign)
            and len(node.targets) == 1
            and isinstance(node.targets[0], ast.Name)
            and node.targets[0].id in ("QUERIES", "ORACLES")
            and isinstance(node.value, ast.Dict)
        ):
            continue
        registry = node.targets[0].id
        if any(k is None for k in node.value.keys):  # **spread present
            return None
        for k, v in zip(node.value.keys, node.value.values):
            if isinstance(k, ast.Constant) and k.value == qname:
                found += 1
                if isinstance(v, ast.Name):
                    roots.add((registry, v.id))
                else:
                    return None  # computed entry — not statically resolvable
    return roots if found else None


@dataclass
class ModuleView:
    """Static view of one module: top-level defs, resolved in-package imports,
    and the names each top-level def references."""

    rel: str
    defs: dict[str, str]
    # local name → (module rel path, remote name | None).  None = the alias IS
    # the module object (``from ..operators import pii``).
    imports: dict[str, tuple[str, str | None]] = field(default_factory=dict)
    # local name → dotted EXTERNAL origin ("pandas", "pyspark.sql.functions:col")
    # — compared binding-for-binding in is_affected so `import polars as pd`
    # replacing `import pandas as pd` can't hide behind an unchanged def body.
    ext_imports: dict[str, str] = field(default_factory=dict)
    # EVERY in-package module file this module's import statements load —
    # independent of alias binding (``import a.b`` binds `a` but EXECUTES
    # a/b.py): the import-time residual surface.
    import_targets: set[str] = field(default_factory=set)
    # True when NO proof can be made from this module's static view: star
    # imports (any source), conflicting alias bindings, unresolvable top
    # packages, aliased dynamic importers, classification drift. One flag,
    # one meaning: every query whose closure touches this module is affected.
    not_provable: bool = False
    _tree: ast.AST | None = None

    @classmethod
    def parse(
        cls, rel: str, src: str, resolve, defs_of=None
    ) -> "ModuleView | None":
        """``resolve(parts: list[str]) -> rel | None`` maps a dotted in-package
        module to its repo-relative path (None = external / not a module).
        ``defs_of(rel) -> set[str] | None`` (optional) returns another
        module's top-level names, enabling Python's getattr-first rule for
        ``from pkg import name``: a NAME defined in pkg/__init__ wins over a
        same-named submodule file. Without it the submodule interpretation is
        taken — fine for file-closure use (both files join import_targets),
        not for precise binding."""
        try:
            tree = _strip_docstrings(ast.parse(src))
        except SyntaxError:
            return None
        defs = _defs_from_tree(tree)
        view = cls(rel=rel, defs=defs, _tree=tree)
        pkg_parts = rel[: -len(".py")].split("/")
        is_pkg = pkg_parts[-1] == "__init__"
        if is_pkg:
            pkg_parts = pkg_parts[:-1]

        def bind(alias: str, target: tuple[str, str | None]) -> None:
            # a FUNCTION-LOCAL import (``def q(): from ..functions import
            # dsum``) binds only inside that def, but for closure purposes a
            # module-wide registration is a safe over-approximation — unless
            # the same alias already has ANOTHER meaning (a different import
            # target, an external binding, or a top-level def of the same
            # name), where no single binding is right: go opaque.
            if (
                (alias in view.imports and view.imports[alias] != target)
                or alias in view.ext_imports
                or alias in view.defs
            ):
                view.not_provable = True
            view.imports[alias] = target

        def bind_ext(alias: str, origin: str) -> None:
            if (
                (alias in view.ext_imports and view.ext_imports[alias] != origin)
                or alias in view.imports
                or alias in view.defs
            ):
                view.not_provable = True
            if origin.split(":")[0].split(".")[0] in _DYNAMIC_NAMES:
                # `import importlib as il` / `from importlib import
                # import_module`: dynamic loading under a non-literal name —
                # the literal-name detection in _refs_of can't see it
                view.not_provable = True
            view.ext_imports[alias] = origin

        # walk the WHOLE tree, not just tree.body: imports nested inside
        # function bodies (the repo's ``from ..functions import dsum`` pattern)
        # are real in-package dependencies the closure must see.
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for alias in node.names:
                    parts = alias.name.split(".")
                    target = resolve(parts)
                    if target is not None:
                        view.import_targets.add(target)
                        if alias.asname:
                            # `import a.b as x` binds x to the a.b module
                            bind(alias.asname, (target, None))
                        else:
                            # `import a.b` EXECUTES a/b.py (import_targets
                            # above) but BINDS the top-level package `a`
                            top = resolve(parts[:1])
                            if top is not None:
                                view.import_targets.add(top)
                                bind(parts[0], (top, None))
                            else:  # unresolvable top package: not exhaustive
                                view.not_provable = True
                    elif alias.asname:
                        bind_ext(alias.asname, alias.name)
                    else:
                        # external `import a.b` binds the TOP-LEVEL module `a`
                        # — origin is parts[0], so `import os` + `import
                        # os.path` agree instead of fake-conflicting
                        bind_ext(parts[0], parts[0])
            elif isinstance(node, ast.ImportFrom):
                if node.level:
                    # a package's "current package" (level=1) is its own
                    # directory; a plain module's is its parent — so __init__
                    # strips one level fewer
                    strip = node.level - 1 if is_pkg else node.level
                    base = pkg_parts[:-strip] if 0 < strip < len(pkg_parts) else (
                        pkg_parts if strip == 0 else []
                    )
                    mod = base + (node.module.split(".") if node.module else [])
                else:
                    mod = node.module.split(".") if node.module else []
                mod_rel = resolve(mod)
                if mod_rel is not None:
                    view.import_targets.add(mod_rel)
                for alias in node.names:
                    if alias.name == "*":
                        # ANY star import (external too): the bound names are
                        # unknowable here, so references to them are silently
                        # unresolvable — never provable
                        view.not_provable = True
                        continue
                    sub_rel = resolve(mod + [alias.name])
                    if sub_rel is not None:
                        # the submodule FILE may be executed either way —
                        # conservative for the import-time surface
                        view.import_targets.add(sub_rel)
                    # Python's getattr-first rule: a name DEFINED in the
                    # source module (pkg/__init__) wins over a same-named
                    # submodule file
                    target_defs = (
                        defs_of(mod_rel)
                        if (defs_of is not None and mod_rel is not None)
                        else None
                    )
                    if target_defs is not None and alias.name in target_defs:
                        bind(alias.asname or alias.name, (mod_rel, alias.name))
                    elif sub_rel is not None:  # imported a submodule
                        bind(alias.asname or alias.name, (sub_rel, None))
                    elif mod_rel is not None:  # imported a def from the module
                        bind(alias.asname or alias.name, (mod_rel, alias.name))
                    else:  # external from-import (relative-external impossible)
                        bind_ext(
                            alias.asname or alias.name,
                            ".".join(mod) + ":" + alias.name,
                        )
        if not view._classification_consistent():
            view.not_provable = True  # drift guard: never provable
        return view

    def _classification_consistent(self) -> bool:
        """parse_defs, _def_node and _residual_nodes restate the same
        top-level classification; if they ever drift (a new statement kind
        handled in one but not the others), a def could exist in ``defs``
        while ``_def_node`` finds nothing — its dependencies silently dropped.
        This cross-check turns that silent unsoundness into a loud one."""
        return all(
            name == MODULE_RESIDUAL or self._def_node(name)
            for name in self.defs
        )

    def submodule_of(self, name: str, resolve) -> str | None:
        """If THIS module is a package __init__ and ``name`` is a submodule
        file of that package, its repo-relative path — the binding the import
        system creates when anything imports ``pkg.name``."""
        if not self.rel.endswith("/__init__.py"):
            return None
        pkg_parts = self.rel[: -len("/__init__.py")].split("/")
        return resolve(pkg_parts + [name])

    def _def_node(self, name: str) -> list[ast.AST]:
        nodes = []
        for node in self._tree.body:  # type: ignore[union-attr]
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                if node.name == name:
                    nodes.append(node)
            elif isinstance(node, ast.Assign):
                if any(isinstance(t, ast.Name) and t.id == name for t in node.targets):
                    nodes.append(node)
            elif isinstance(node, ast.AnnAssign):
                if isinstance(node.target, ast.Name) and node.target.id == name:
                    nodes.append(node)
        return nodes

    def _residual_nodes(self) -> list[ast.AST]:
        """Top-level statements outside defs/imports/named assigns — they run
        at import time and may call anything (the MODULE_RESIDUAL surface)."""
        nodes = []
        for node in self._tree.body:  # type: ignore[union-attr]
            if isinstance(
                node,
                (
                    ast.FunctionDef,
                    ast.AsyncFunctionDef,
                    ast.ClassDef,
                    ast.Import,
                    ast.ImportFrom,
                ),
            ):
                continue
            if isinstance(node, ast.Assign) and all(
                isinstance(t, ast.Name) for t in node.targets
            ):
                continue
            if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
                continue
            nodes.append(node)
        return nodes

    @staticmethod
    def _refs_of(
        nodes: list[ast.AST],
    ) -> tuple[set[str], set[tuple[str, tuple[str, ...]]], bool]:
        """(bare names — attribute bases excluded, (base, full attr chain)
        pairs — ``a.b.c`` records ('a', ('b','c')), uses_dynamic) referenced
        by ``nodes``. The manual walk keeps ``mod.attr`` from ALSO counting
        ``mod`` as a bare use, so a module alias only ever accessed via
        attributes doesn't expand to whole-module dependence."""
        names: set[str] = set()
        attrs: set[tuple[str, tuple[str, ...]]] = set()
        dynamic = False
        stack: list[ast.AST] = list(nodes)
        while stack:
            sub = stack.pop()
            if isinstance(sub, ast.Attribute):
                # unroll the full chain: a.b.c → base 'a', chain ('b','c')
                chain: list[str] = []
                node: ast.AST = sub
                while isinstance(node, ast.Attribute):
                    chain.append(node.attr)
                    node = node.value
                if isinstance(node, ast.Name):
                    chain.reverse()
                    attrs.add((node.id, tuple(chain)))
                    if node.id in _DYNAMIC_NAMES:
                        dynamic = True
                    continue  # don't descend: base Name is NOT a bare use
                stack.append(node)  # chain rooted in a call/subscript: descend
                continue
            if isinstance(sub, ast.Name):
                names.add(sub.id)
                if sub.id in _DYNAMIC_NAMES:
                    dynamic = True
                continue
            stack.extend(ast.iter_child_nodes(sub))
        return names, attrs, dynamic

    def references(self, name: str) -> tuple[set[str], set[tuple[str, str]], bool]:
        """What the definition of ``name`` touches; for MODULE_RESIDUAL, what
        the module's import-time residual statements touch."""
        if name == MODULE_RESIDUAL:
            return self._refs_of(self._residual_nodes())
        return self._refs_of(self._def_node(name))


@dataclass
class Closure:
    """DepGraph.closure result: reachable (module rel, def name) pairs, the
    import aliases each module's reachable code uses, and whether the walk hit
    anything it can't see through (dynamic code, star imports, parse failure)."""

    reached: set[tuple[str, str]]
    used_aliases: dict[str, set[str]]
    opaque: bool

    def __iter__(self):  # (reached, opaque) unpacking convenience for tests
        return iter((self.reached, self.opaque))


class DepGraph:
    """Reachability over a set of parsed modules. ``sources`` maps repo-relative
    path → current source text."""

    def __init__(self, sources: dict[str, str], resolve):
        self._sources = sources
        self._resolve = resolve
        self._views: dict[str, ModuleView | None] = {}
        self._defs: dict[str, set[str] | None] = {}

    def view(self, rel: str) -> ModuleView | None:
        if rel not in self._views:
            src = self._sources.get(rel)
            self._views[rel] = (
                ModuleView.parse(rel, src, self._resolve, defs_of=self._defs_of)
                if src is not None
                else None
            )
        return self._views[rel]

    def _defs_of(self, rel: str) -> set[str] | None:
        """Top-level names of ``rel`` (parse_defs only — safe to call while
        another module's view is being constructed: no view recursion)."""
        if rel not in self._defs:
            src = self._sources.get(rel)
            d = parse_defs(src) if src is not None else None
            self._defs[rel] = set(d) - {MODULE_RESIDUAL} if d is not None else None
        return self._defs[rel]

    def closure(self, rel: str, roots: set[str]) -> "Closure":
        """All (module rel, def name) pairs reachable from ``roots`` in ``rel``,
        the import ALIASES each reachable module's code actually uses (so a
        rebound import is detectable even when both old and new targets are
        individually unchanged), and an ``opaque`` flag (dynamic construct /
        star import / unparseable module seen — the closure is then NOT
        exhaustive and the caller must be conservative). Every reachable module
        contributes its MODULE_RESIDUAL — including the residual statements'
        own callees, which execute at import time."""
        reached: set[tuple[str, str]] = set()
        used_aliases: dict[str, set[str]] = {}
        opaque = False
        work: list[tuple[str, str]] = [(rel, r) for r in roots]
        # cycle guard: every popped (module, name) is recorded here whether it
        # resolves or not — `reached` alone can't terminate a cyclic re-export
        # of a name that never resolves (a.py: from b import x / b.py: from a
        # import x): the miss path would ping-pong forever
        visited: set[tuple[str, str]] = set()
        seen_modules: set[str] = set()
        while work:
            cur_rel, name = work.pop()
            if (cur_rel, name) in visited:
                continue
            visited.add((cur_rel, name))
            v = self.view(cur_rel)
            if v is None:
                return Closure(reached, used_aliases, True)
            if cur_rel not in seen_modules:
                seen_modules.add(cur_rel)
                work.append((cur_rel, MODULE_RESIDUAL))
                # importing this module EXECUTES, at import time: every
                # ancestor __init__, and every in-package module its import
                # statements load (import_targets — independent of alias
                # binding; recursively, via the seen mechanism): their residual
                # statements are part of the surface even when no definition
                # in them is reached
                parts = cur_rel.split("/")[:-1]
                while parts:
                    init_rel = "/".join(parts) + "/__init__.py"
                    if init_rel in self._sources and init_rel not in seen_modules:
                        work.append((init_rel, MODULE_RESIDUAL))
                    parts = parts[:-1]
                for tgt_rel in v.import_targets:
                    if tgt_rel not in seen_modules:
                        work.append((tgt_rel, MODULE_RESIDUAL))
                if v.not_provable:
                    opaque = True
            if name != MODULE_RESIDUAL and name not in v.defs:
                if name in v.imports:  # re-export: follow the import chain
                    used_aliases.setdefault(cur_rel, set()).add(name)
                    tgt_rel, remote = v.imports[name]
                    if remote is not None:
                        work.append((tgt_rel, remote))
                    else:
                        tv = self.view(tgt_rel)
                        if tv is None:
                            return Closure(reached, used_aliases, True)
                        work.extend((tgt_rel, d) for d in tv.defs)
                elif name in v.ext_imports:
                    # re-exported EXTERNAL name: record so is_affected compares
                    # the origin old-vs-new (pandas → polars must flag)
                    used_aliases.setdefault(cur_rel, set()).add(name)
                elif name.startswith("__") and name.endswith("__"):
                    pass  # module metadata (__name__, __doc__): not a binding
                elif (sub := v.submodule_of(name, self._resolve)) is not None:
                    # attribute of a PACKAGE naming a submodule file — the
                    # import system binds it when pkg.name is imported
                    # anywhere: whole-module dependence
                    tv = self.view(sub)
                    if tv is None:
                        return Closure(reached, used_aliases, True)
                    work.extend((sub, d) for d in tv.defs)
                elif v.defs[MODULE_RESIDUAL]:
                    # the name can only be bound by module-level residual code
                    # (tuple assigns, conditionals) — that residual is always
                    # in `reached` and compared whole, so a binding change
                    # flags without going permanently opaque
                    pass
                else:
                    # nothing visible can bind this name (and no residual to
                    # carry it): the chain is lost — NOT exhaustive → opaque
                    opaque = True
                continue
            reached.add((cur_rel, name))
            names, attrs, dynamic = v.references(name)
            opaque |= dynamic
            for n in names:
                if n in v.defs:
                    work.append((cur_rel, n))
                elif n in v.ext_imports:
                    # external binding: nothing to walk, but the ORIGIN is
                    # compared old-vs-new in is_affected (pd may be polars now)
                    used_aliases.setdefault(cur_rel, set()).add(n)
                elif n in v.imports:
                    used_aliases.setdefault(cur_rel, set()).add(n)
                    tgt_rel, remote = v.imports[n]
                    if remote is not None:
                        work.append((tgt_rel, remote))
                    else:
                        # bare use of a module object (attribute accesses are
                        # excluded from `names` by references()): conservative
                        # whole-module dependence
                        tv = self.view(tgt_rel)
                        if tv is None:
                            return Closure(reached, used_aliases, True)
                        work.extend((tgt_rel, d) for d in tv.defs)
            for base, chain in attrs:
                if base in v.defs:
                    # SAME-MODULE def used only as an attribute base
                    # (DEC.format, SAMPLE_RATES.items): the def is the
                    # dependency even with no bare-name use
                    work.append((cur_rel, base))
                elif base in v.ext_imports:
                    used_aliases.setdefault(cur_rel, set()).add(base)
                elif base in v.imports:
                    used_aliases.setdefault(cur_rel, set()).add(base)
                    tgt_rel, remote = v.imports[base]
                    if remote is not None:
                        # attribute on a from-imported DEF (Codec.SEP): the
                        # def itself is the dependency — walk it even when the
                        # base is never used as a bare name
                        work.append((tgt_rel, remote))
                        continue
                    # module alias: resolve the chain STEPWISE through
                    # submodules (sub.filestream.stage → pkg/sub/filestream.py
                    # :: stage). A hop landing on a def ends the module walk
                    # (the tail is runtime attribute access on its value); a
                    # hop this walk can't place loses the chain → opaque.
                    cur_mod = tgt_rel
                    for i, hop in enumerate(chain):
                        # every module the chain passes through joins the
                        # surface (residual + import-time execution), even on
                        # early breaks (dunder / residual-bound hops)
                        work.append((cur_mod, MODULE_RESIDUAL))
                        mv = self.view(cur_mod)
                        if mv is None:
                            return Closure(reached, used_aliases, True)
                        if hop in mv.defs:
                            work.append((cur_mod, hop))
                            break
                        if hop in mv.ext_imports:
                            # external binding surfaced via the chain (m.pd):
                            # the origin must compare old-vs-new
                            used_aliases.setdefault(cur_mod, set()).add(hop)
                            break
                        if hop in mv.imports:  # re-export hop
                            used_aliases.setdefault(cur_mod, set()).add(hop)
                            t_rel, t_remote = mv.imports[hop]
                            if t_remote is not None:
                                work.append((t_rel, t_remote))
                                break
                            cur_mod = t_rel
                            if i == len(chain) - 1:
                                # chain VALUE is the re-exported module object:
                                # whole-module dependence (same rule as the
                                # submodule and bare-name paths)
                                tv2 = self.view(t_rel)
                                if tv2 is None:
                                    return Closure(reached, used_aliases, True)
                                work.extend((t_rel, d) for d in tv2.defs)
                            continue
                        sub = mv.submodule_of(hop, self._resolve)
                        if sub is not None:
                            cur_mod = sub
                            if i == len(chain) - 1:
                                # chain VALUE is the module object itself:
                                # whole-module dependence
                                sv = self.view(sub)
                                if sv is None:
                                    return Closure(reached, used_aliases, True)
                                work.extend((sub, d) for d in sv.defs)
                            continue
                        if hop.startswith("__") and hop.endswith("__"):
                            break  # module metadata
                        if mv.defs[MODULE_RESIDUAL]:
                            break  # residual-bound name: residual is compared
                        opaque = True
                        break
                    else:
                        # chain exhausted while still walking modules — the
                        # intermediate modules are all in `seen` via their
                        # residual items; nothing further to pin
                        pass
        return Closure(reached, used_aliases, opaque)


def is_affected(
    graph: DepGraph,
    rel: str,
    qname: str,
    old_sources: dict[str, str | None],
    old_view_cache: dict[tuple[str, str], "ModuleView | None"] | None = None,
) -> bool:
    """True unless PROVABLY unaffected: every definition reachable from the
    query's roots (Spark callable + oracle SQL) has an identical AST in
    ``old_sources`` (module rel → source at the query's last green check;
    missing key = module didn't exist then). ``old_view_cache`` (keyed by
    (rel, src)) amortizes old-source parses across the caller's many queries
    over shared helper modules."""
    src = graph._sources.get(rel)
    if src is None:
        return True
    roots = query_roots(src, qname)
    if roots is None:
        return True
    # Rebinding guard: the registry ENTRY is part of the surface — if the
    # QUERIES/ORACLES (role, name) pairs for qname differ from the old source
    # (the entry points at a different function, or the callable and SQL
    # swapped roles), the def-level comparison below would never see it.
    old_entry_src = old_sources.get(rel)
    if old_entry_src is None or query_roots(old_entry_src, qname) != roots:
        return True
    c = graph.closure(rel, {n for _role, n in roots})
    if c.opaque:
        return True

    _old_defs: dict[str, set[str] | None] = {}

    def old_defs_of(mod_rel: str) -> set[str] | None:
        if mod_rel not in _old_defs:
            s = old_sources.get(mod_rel)
            d = parse_defs(s) if s is not None else None
            _old_defs[mod_rel] = set(d) - {MODULE_RESIDUAL} if d is not None else None
        return _old_defs[mod_rel]

    def old_view_of(mod_rel: str, old_src: str) -> "ModuleView | None":
        # old bindings resolve with OLD defs (getattr-first against the old
        # tree), current repo layout — a renamed target simply mismatches
        if old_view_cache is None:
            return ModuleView.parse(
                mod_rel, old_src, graph._resolve, defs_of=old_defs_of
            )
        key = (mod_rel, old_src)
        if key not in old_view_cache:
            old_view_cache[key] = ModuleView.parse(
                mod_rel, old_src, graph._resolve, defs_of=old_defs_of
            )
        return old_view_cache[key]

    by_module: dict[str, set[str]] = {}
    for mod_rel, name in c.reached:
        by_module.setdefault(mod_rel, set()).add(name)
    for mod_rel, names in by_module.items():
        old_mod_src = old_sources.get(mod_rel)
        if old_mod_src is None:
            return True
        old_view = old_view_of(mod_rel, old_mod_src)
        new_view = graph.view(mod_rel)
        # Opacity is symmetric: a star import / dynamic construct in the OLD
        # source of a reachable module (removed since) means the old surface
        # cannot be bounded — even when every reached def is AST-identical.
        # The closure() walk only sees the NEW source's not_provable, so check
        # both sides here.
        if (
            old_view is None
            or new_view is None
            or old_view.not_provable
            or new_view.not_provable
        ):
            return True
        # def-level diff straight off the cached views (same data parse_defs
        # would produce — ModuleView.defs IS that output)
        changed = {
            n for n, d in new_view.defs.items() if old_view.defs.get(n) != d
        } | {n for n in old_view.defs if n not in new_view.defs}
        if changed & names:
            return True
        # Import-statement surface: adding/removing an IN-PACKAGE import to a
        # reachable module changes what executes at import time (side-effect
        # registration the def/residual diffs can't see) — compare the loaded-
        # file sets. External import churn is intentionally ignored: stdlib/
        # site-packages module init is assumed stable, and flagging it would
        # re-stale every query in a file whenever a new query's external
        # import lands.
        if old_view.import_targets != new_view.import_targets:
            return True
    # Import-binding guard: a reachable module may have re-pointed an alias at
    # a DIFFERENT (individually unchanged) target — invisible to the def-level
    # diff above, but it changes which code executes. Compare the resolved
    # binding of every alias the reachable code uses, old vs new. Old bindings
    # resolve against the CURRENT repo layout: a renamed target then simply
    # fails to match — conservative.
    for mod_rel, aliases in c.used_aliases.items():
        old_mod_src = old_sources.get(mod_rel)
        if old_mod_src is None:
            return True
        old_view = old_view_of(mod_rel, old_mod_src)
        new_view = graph.view(mod_rel)
        if old_view is None or new_view is None or old_view.not_provable:
            return True
        for alias in aliases:
            if old_view.imports.get(alias) != new_view.imports.get(alias):
                return True
            if old_view.ext_imports.get(alias) != new_view.ext_imports.get(alias):
                return True
    return False
