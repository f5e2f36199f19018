"""Repo dependency graph (ops/graph.py): anchored import parsing,
ownership tie-breaks, self-edge exclusion, degree zeros, PageRank vs a
pure-Python mirror of the pinned semantics (dangling redistribution,
mass conservation), repartition determinism, and DuckDB oracle parity
for the three registry keys."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fastmorph_spark import registry
from fastmorph_spark.ops.graph import (
    import_degree,
    import_edges,
    module_declarations,
    pagerank,
    parse_imports,
)
from tests.conftest import SF0001, assert_frames_match, register_views


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "repo string, content string")


TINY = [
    # a declares mod_a; imports b's module twice and c's once; the
    # indented and commented-out lines must NOT parse
    ("a", "# module mod_a\nimport mod_b\nimport mod_b\nimport mod_c\n"
          "    import mod_c  # vendored\n# import mod_c\n"),
    ("b", "# module mod_b\nimport mod_a\nimport mod_b\n"),   # self-import
    ("c", "# module mod_c\ndef f():\n    return 0\n"),        # no imports
]


def test_parse_anchored_lines_only(spark):
    got = {(r.repo, r.module) for r in parse_imports(_corpus(spark, TINY)).collect()}
    assert got == {("a", "mod_b"), ("a", "mod_c"), ("b", "mod_a"), ("b", "mod_b")}
    # (a, mod_b) occurs twice — multiset size is 5
    assert parse_imports(_corpus(spark, TINY)).count() == 5


def test_ownership_min_repo_tiebreak(spark):
    rows = TINY + [("z", "# module mod_a\n")]  # duplicate declaration
    own = {r.module: r.owner_repo
           for r in module_declarations(_corpus(spark, rows)).collect()}
    assert own == {"mod_a": "a", "mod_b": "b", "mod_c": "c"}


def test_import_edges_excludes_self(spark):
    got = {(r.src_repo, r.dst_repo): r.n_imports
           for r in import_edges(_corpus(spark, TINY)).collect()}
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "a"): 1}


def test_degree_zero_sides(spark):
    deg = {r.repo: (r.fan_in, r.fan_out, r.imports_in, r.imports_out)
           for r in import_degree(import_edges(_corpus(spark, TINY))).collect()}
    assert deg == {
        "a": (1, 2, 1, 3),
        "b": (1, 1, 2, 1),
        "c": (1, 0, 1, 0),  # c never imports: dangling, zeros on the out side
    }


def _py_pagerank(edges, iters=3, d=0.85):
    """Exhaustive mirror of the pinned semantics."""
    nodes = sorted({s for s, _t, _w in edges} | {t for _s, t, _w in edges})
    n = float(len(nodes))
    out_w = {}
    for s, _t, w in edges:
        out_w[s] = out_w.get(s, 0.0) + w
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dang = sum(p for v, p in pr.items() if v not in out_w)
        contrib = {v: 0.0 for v in nodes}
        for s, t, w in edges:
            contrib[t] += pr[s] * w / out_w[s]
        pr = {v: (1.0 - d) / n + d * (contrib[v] + dang / n) for v in nodes}
    return {v: round(p, 6) for v, p in pr.items()}


def test_pagerank_matches_python_mirror(spark):
    e = import_edges(_corpus(spark, TINY))
    got = {r.repo: r.pr for r in pagerank(e).collect()}
    want = _py_pagerank([("a", "b", 2), ("a", "c", 1), ("b", "a", 1)])
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6), v
    # dangling redistribution conserves mass
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)


def test_edges_repartition_deterministic(spark):
    c = _corpus(spark, TINY)
    a = sorted(map(tuple, import_edges(c).collect()))
    b = sorted(map(tuple, import_edges(c.repartition(7)).collect()))
    assert a == b


@pytest.mark.parametrize("key", ["import_edges", "import_degree", "repo_pagerank"])
def test_registry_oracle_parity(spark, key):
    con = duckdb.connect()
    register_views(con, SF0001)
    assert_frames_match(
        registry.queries()[key](spark, SF0001),
        con.execute(registry.oracle_sqls()[key]),
        float_rtol=1e-6,
    )


def test_fixture_exercises_self_edge_exclusion(spark):
    """d≡6 (mod 20) docs self-import (6d≡36 mod 40): repos 6 and 26 keep
    only their two distinct foreign targets — the exclusion is
    non-vacuous on the registry fixture."""
    deg = registry.queries()["import_degree"](spark, SF0001)
    two = {r.repo for r in deg.filter(F.col("fan_out") == 2).collect()}
    assert {"repo-6", "repo-26"} <= two


CHAIN = [
    # w -> x -> y -> seed, plus a 1-hop shortcut w -> seed and a cycle
    # seed -> w: min-hops labeling and cycle termination in one graph
    ("w", "# module mod_w\nimport mod_s\nimport mod_x\n"),
    ("x", "# module mod_x\nimport mod_y\n"),
    ("y", "# module mod_y\nimport mod_s\n"),
    ("s", "# module mod_s\nimport mod_w\n"),
]


def test_dependents_closure_min_hops_and_cycle(spark):
    from fastmorph_spark.ops.graph import dependents_closure

    e = import_edges(_corpus(spark, CHAIN))
    got = {(r.repo, r.hops)
           for r in dependents_closure(e, "s", hops=3).collect()}
    # w reaches s directly (hop 1, NOT via x->y at 3); y at 1; x at 2;
    # the s->w cycle edge must not re-admit s
    assert got == {("w", 1), ("y", 1), ("x", 2)}


def test_dependents_closure_out_direction(spark):
    from fastmorph_spark.ops.graph import dependents_closure

    e = import_edges(_corpus(spark, CHAIN))
    got = {(r.repo, r.hops)
           for r in dependents_closure(e, "x", hops=3, direction="out").collect()}
    # x imports y; y imports s; s imports w
    assert got == {("y", 1), ("s", 2), ("w", 3)}


def test_dependents_closure_bad_direction(spark):
    from fastmorph_spark.ops.graph import dependents_closure

    e = import_edges(_corpus(spark, CHAIN))
    with pytest.raises(ValueError):
        dependents_closure(e, "s", direction="sideways")


def test_dependents_closure_registry_parity(spark):
    con = duckdb.connect()
    register_views(con, SF0001)
    assert_frames_match(
        registry.queries()["dependents_closure"](spark, SF0001),
        con.execute(registry.oracle_sqls()["dependents_closure"]),
    )
