"""Repo dependency graph — import-edge extraction and PageRank over a
source-code corpus.

The code-search engines this graft models (zoekt/Sourcegraph class) rank
repositories partly by how much the rest of the universe depends on
them; the classic signal is PageRank over the repo-level import graph
(Google's original formulation, applied to code by e.g. Sourcegraph's
repo-priority and the CodeRank literature). This module derives that
graph purely from file CONTENT — import statements and module
declarations are parsed with anchored regexes — so it runs over the
contract corpus shape (repo, path, commit, lang, content) with no
external metadata.

Spark-first shape:

- parse: one `regexp_extract_all` + explode per file — JVM codegen, no
  Python; anchored ``(?m)^…$`` patterns ignore indented/vendored or
  commented-out import lines by construction.
- ownership: module -> owning repo from declaration lines, ONE distinct
  + min() tie-break (deterministic when a module name collides).
- edges: imports ⨝ ownership on module (the ownership dim is tiny
  relative to the corpus — broadcast below `BROADCAST_MODULES`), then a
  map-side-combined groupBy (src, dst) count. The corpus is touched
  once; no pairwise repo comparison exists anywhere.
- PageRank: Pregel-style iteration as DataFrame joins — contributions
  are a groupBy(dst) over edges co-partitioned with the rank frame on
  the repo key; the dangling-mass term and 1/n are 1-row aggregates
  crossJoin-broadcast into the update, so NOTHING is collected to the
  driver. Iterations are a fixed unrolled count (the plan stays
  bounded; at higher iteration counts callers should localCheckpoint
  the rank frame every few rounds to truncate lineage).

Scale notes (10^12 files / 10^6 repos): the parse is embarrassingly
parallel; the edge groupBy shuffles at REPO-PAIR cardinality (orders of
magnitude below file cardinality); each PageRank iteration is one
shuffle over |edges| plus one over |nodes| — the same envelope as the
dedup components loop (ops/dedup.py), which this intentionally mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastmorph_spark.constants import SCORE_DECIMALS

# top-level import statement / module declaration, anchored per line so
# indented (vendored) and commented-out lines never parse as edges
IMPORT_PATTERN = r"(?m)^import ([a-z0-9_]+)$"
DECL_PATTERN = r"(?m)^# module ([a-z0-9_]+)$"

# module-ownership dim-table broadcast gate: 10^6 modules x ~60 B is
# ~60 MB — inside the executor broadcast budget; beyond that the join
# falls back to a shuffle partitioned on module
BROADCAST_MODULES = 1_000_000

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 3


def parse_imports(corpus: DataFrame, pattern: str = IMPORT_PATTERN) -> DataFrame:
    """One row per top-level import statement: (repo, module)."""
    return corpus.select(
        "repo",
        F.explode(F.regexp_extract_all("content", F.lit(pattern), F.lit(1))).alias("module"),
    )


def module_declarations(corpus: DataFrame, pattern: str = DECL_PATTERN) -> DataFrame:
    """Module ownership (module, owner_repo) from declaration lines.

    A module declared in several repos (forks, renames) resolves to the
    lexicographically smallest repo — pinned so results are independent
    of partitioning."""
    return (
        corpus.select(
            F.explode(F.regexp_extract_all("content", F.lit(pattern), F.lit(1))).alias("module"),
            "repo",
        )
        .groupBy("module")
        .agg(F.min("repo").alias("owner_repo"))
    )


def import_edges(corpus: DataFrame) -> DataFrame:
    """Weighted repo dependency edges (src_repo, dst_repo, n_imports).

    n_imports counts import STATEMENTS (a repo importing a module from
    ten files depends on it more than from one). Self-edges (a repo
    importing its own modules) are excluded — they carry no cross-repo
    dependency signal and would self-inflate PageRank."""
    owners = module_declarations(corpus)
    owners = F.broadcast(owners)  # dim side; see BROADCAST_MODULES note
    return (
        parse_imports(corpus)
        .join(owners, "module")
        .filter(F.col("repo") != F.col("owner_repo"))
        .groupBy(
            F.col("repo").alias("src_repo"),
            F.col("owner_repo").alias("dst_repo"),
        )
        .agg(F.count("*").alias("n_imports"))
    )


def import_degree(edges: DataFrame) -> DataFrame:
    """Per-repo graph degree: (repo, fan_in, fan_out, imports_in,
    imports_out). fan_* counts distinct neighbor repos; imports_* sums
    statement weights. Repos appearing only as a source (or only as a
    target) get zeros on the other side."""
    outs = edges.groupBy(F.col("src_repo").alias("repo")).agg(
        F.count("*").alias("fan_out"), F.sum("n_imports").alias("imports_out")
    )
    ins = edges.groupBy(F.col("dst_repo").alias("repo")).agg(
        F.count("*").alias("fan_in"), F.sum("n_imports").alias("imports_in")
    )
    return (
        outs.join(ins, "repo", "full_outer")
        .select(
            "repo",
            F.coalesce("fan_in", F.lit(0)).alias("fan_in"),
            F.coalesce("fan_out", F.lit(0)).alias("fan_out"),
            F.coalesce("imports_in", F.lit(0)).alias("imports_in"),
            F.coalesce("imports_out", F.lit(0)).alias("imports_out"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = PAGERANK_ITERS,
    damping: float = PAGERANK_DAMPING,
) -> DataFrame:
    """Weighted PageRank over the repo graph: (repo, pr).

    Pinned semantics (mirrored exactly by the DuckDB oracle):
      pr_0      = 1/n for every node (nodes = src ∪ dst repos)
      pr_{t+1}  = (1-d)/n + d * (Σ_in pr_t(src) * w / out_w(src)
                                 + dangling_t / n)
    where out_w(src) = Σ outgoing weights and dangling_t = Σ pr_t over
    nodes with NO out-edges (their mass redistributes uniformly, so
    Σ pr stays 1 every iteration — the standard dangling-node fix).
    Fixed iteration count; pr is rounded to SCORE_DECIMALS at OUTPUT
    only (all iterations run at full double precision)."""
    nodes = (
        edges.select(F.col("src_repo").alias("repo"))
        .union(edges.select(F.col("dst_repo").alias("repo")))
        .distinct()
        .persist()
    )
    n_frame = nodes.agg(F.count("*").cast("double").alias("n"))
    out_w = edges.groupBy("src_repo").agg(
        F.sum("n_imports").cast("double").alias("out_w")
    )
    e = edges.join(out_w, "src_repo").persist()

    ranks = nodes.crossJoin(F.broadcast(n_frame)).select(
        "repo", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src_repo"] == ranks["repo"])
            .groupBy("dst_repo")
            .agg(F.sum(F.col("pr") * F.col("n_imports") / F.col("out_w")).alias("c"))
        )
        dangling = (
            ranks.join(out_w, ranks["repo"] == out_w["src_repo"], "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dang"))
        )
        ranks = (
            nodes.join(contrib, nodes["repo"] == contrib["dst_repo"], "left")
            .crossJoin(F.broadcast(n_frame))
            .crossJoin(F.broadcast(dangling))
            .select(
                "repo",
                (
                    (1.0 - damping) / F.col("n")
                    + damping
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dang") / F.col("n"))
                ).alias("pr"),
            )
            # materialize this round (|nodes| rows — tiny) AND truncate
            # lineage: rank appears under BOTH contrib and dangling, so
            # the unrolled logical plan doubles per round — persist alone
            # keeps execution cheap but Catalyst still re-analyzes the
            # doubling tree on every count; localCheckpoint pins each
            # round's plan at constant size (driver-side serial time per
            # superstep stays flat as iters grows)
            .localCheckpoint(eager=True)
        )
    nodes.unpersist()
    e.unpersist()
    return ranks.select("repo", F.round("pr", SCORE_DECIMALS).alias("pr"))


def dependents_closure(
    edges: DataFrame,
    seed: str,
    hops: int = 3,
    direction: str = "in",
) -> DataFrame:
    """Transitive closure from ``seed`` within ``hops`` import hops:
    (repo, hops) with the MINIMUM hop count per repo.

    ``direction="in"`` walks edges BACKWARDS (who imports seed,
    transitively) — the impact-analysis / "what breaks if this repo
    changes" navigation of code-search UIs; ``"out"`` walks forward
    (what seed transitively depends on). Pinned BFS layering (mirrored
    by the DuckDB oracle): layer 1 = direct neighbors minus the seed;
    layer h = neighbors of layer h-1 minus every earlier layer and the
    seed. Each round is one join + distinct + one anti-join against the
    accumulated frontier — the same bounded-round shape as the dedup
    components loop; cycles terminate because layers only shrink the
    candidate set."""
    if direction not in ("in", "out"):
        raise ValueError(f"direction must be 'in' or 'out', got {direction!r}")
    here, there = (("dst_repo", "src_repo") if direction == "in"
                   else ("src_repo", "dst_repo"))
    step = edges.select(F.col(here).alias("at"), F.col(there).alias("nxt")).persist()

    frontier = (
        step.filter(F.col("at") == seed)
        .select(F.col("nxt").alias("repo")).distinct()
        .filter(F.col("repo") != seed)
        .withColumn("hops", F.lit(1))
        .persist()
    )
    acc = frontier
    for h in range(2, hops + 1):
        frontier = (
            step.join(frontier.select(F.col("repo").alias("at")), "at")
            .select(F.col("nxt").alias("repo")).distinct()
            .filter(F.col("repo") != seed)
            .join(acc.select("repo"), "repo", "left_anti")
            .withColumn("hops", F.lit(h))
            .persist()
        )
        # materialize the layer: the next round joins the CACHED frontier
        # and the anti-join reads the cached accumulator, so rounds stay
        # O(|edges|) instead of re-deriving the whole chain
        if frontier.count() == 0:
            break
        acc = acc.unionByName(frontier).persist()
    step.unpersist()
    return acc
