"""Repository-history semantics over the contract corpus (round 5).

The contract input (BASELINE.json input_hint) is a table of
``(repo, path, commit, lang, content)`` rows — i.e. file VERSIONS, not
files. Every production code-search engine (zoekt, Sourcegraph,
Google Code Search [PK-high via public zoekt design doc]) indexes ONE
version per file — the branch HEAD — so a corpus that carries history
must be resolved to latest-per-file before index build, and the history
itself is a queryable surface (how many versions, which files are
vendored copies of each other across repos).

All operators here are single-shuffle groupBys with map-side partial
aggregation (or pure scans) — no windows over the full corpus, no joins:

- ``latest_files``   — HEAD resolution: one row per (repo, path), the
  greatest (commit, lang, content) triple. Implemented as ``max`` of a
  struct, NOT ``row_number() OVER (PARTITION BY repo, path)``: struct-max
  is an ordinary aggregate (partial agg on the map side, one shuffle on
  the group key), while the window form sorts every group on the reduce
  side and disables partial aggregation. At 10^12 rows the struct-max
  plan moves one struct per (repo, path) per input partition across the
  wire; skew is bounded by versions-per-file, not files-per-repo.
- ``file_history``   — per-file version counts + latest commit.
- ``vendored_content`` — content sha256 present in >= min_repos distinct
  repos (vendored/copied files across repo boundaries). The per-sha repo
  list is capped (sorted, first ``repos_cap``) so a pathological sha
  (empty file in 10^6 repos) produces a bounded row, and joined to a
  string so the result schema stays flat.
- ``code_refs`` / ``ref_counts`` — cross-reference edges from the
  pinned ``# see A and B`` comment convention of the synthetic code
  corpus: the "find usages" surface (zoekt's ranked references tab).
  Pure Catalyst line split + regexp; one groupBy for the aggregate.

Determinism: ``latest_files``'s winner is the lexicographic max of
(commit, lang, content) — total order, no ties possible on distinct
rows; identical duplicate rows collapse to the same value. The DuckDB
oracles mirror with ``row_number() ... ORDER BY commit DESC, lang DESC,
content DESC`` which picks the same row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pinned cross-reference comment pattern (shared verbatim with the
# DuckDB oracle; same engine-identity argument as grep.DEF_PATTERN —
# byte classes only, no \s, no backtracking subtlety)
REF_PATTERN = r"^# see ([A-Za-z_][A-Za-z0-9_]*) and ([A-Za-z_][A-Za-z0-9_]*)$"

# cap on the per-sha repo list in vendored_content (bounded row size at
# any corpus scale; the FULL distinct-repo count is still reported)
REPOS_CAP = 20


def latest_files(corpus: DataFrame) -> DataFrame:
    """One row per (repo, path): the latest version by commit, i.e. the
    lexicographically greatest (commit, lang, content) struct. Partial
    aggregation absorbs all but one struct per group per input partition
    before the single shuffle on (repo, path)."""
    return (
        corpus.groupBy("repo", "path")
        .agg(F.max(F.struct("commit", "lang", "content")).alias("_v"))
        .select(
            "repo",
            "path",
            F.col("_v.commit").alias("commit"),
            F.col("_v.lang").alias("lang"),
            F.col("_v.content").alias("content"),
        )
        .orderBy("repo", "path")
    )


def file_history(corpus: DataFrame) -> DataFrame:
    """Per-file version ledger: (repo, path, n_versions,
    n_contents, latest_commit). One groupBy; count(DISTINCT content)
    plans as Spark's standard two-phase distinct aggregate (first phase
    keyed on (repo, path, content) — still partial-agg friendly)."""
    return (
        corpus.groupBy("repo", "path")
        .agg(
            F.count("*").cast("long").alias("n_versions"),
            F.countDistinct("content").cast("long").alias("n_contents"),
            F.max("commit").alias("latest_commit"),
        )
        .orderBy("repo", "path")
    )


def vendored_content(corpus: DataFrame, min_repos: int = 2,
                     repos_cap: int = REPOS_CAP) -> DataFrame:
    """Cross-repo duplicate (vendored) content: content sha256 carried
    by >= ``min_repos`` distinct repos. Returns (sha256, n_repos,
    repos) where repos is the sorted distinct repo list capped at
    ``repos_cap`` and comma-joined (bounded row width regardless of how
    many repos share the blob; n_repos is the uncapped count).

    One groupBy on the sha; collect_set is bounded by the cap only
    after sorting, so the cap is deterministic (first K repos by name).
    """
    sha = F.sha2(F.col("content"), 256).alias("sha256")
    return (
        corpus.select(sha, "repo")
        .groupBy("sha256")
        .agg(
            F.countDistinct("repo").cast("long").alias("n_repos"),
            F.array_join(
                F.slice(F.sort_array(F.collect_set("repo")), 1, repos_cap), ","
            ).alias("repos"),
        )
        .where(F.col("n_repos") >= min_repos)
        .orderBy("sha256")
    )


def code_refs(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Cross-reference edges (id_col, line_no, ref): identifiers named
    on ``# see A and B`` comment lines. Line split + regexp + one
    posexplode over the (at most 2) captured identifiers — pure
    Catalyst, pipelines over the scan with no shuffle before the
    caller's ORDER BY."""
    from fastmorph_spark.search.grep import split_lines

    lines = split_lines(docs, text_col=text_col, id_col=id_col)
    refs = lines.select(
        id_col,
        "line_no",
        F.explode(
            F.array(
                F.regexp_extract(F.col("line"), REF_PATTERN, 1),
                F.regexp_extract(F.col("line"), REF_PATTERN, 2),
            )
        ).alias("ref"),
    ).where(F.col("ref") != "")
    return refs.orderBy(id_col, "line_no", "ref")


def ref_counts(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """The "find usages" ranking: referenced identifiers by how many
    docs cite them. (ref, n_docs, n_refs), most-cited first. One
    groupBy on ref after the edge extraction; count(DISTINCT doc) is
    the two-phase distinct aggregate keyed on (ref, doc) first — no
    hot-reducer on a popular identifier."""
    edges = code_refs(docs, text_col=text_col, id_col=id_col)
    return (
        edges.groupBy("ref")
        .agg(
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_refs"),
        )
        .orderBy(F.desc("n_docs"), F.asc("ref"))
    )
