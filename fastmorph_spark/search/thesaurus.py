"""Distributional thesaurus — "words similar to X" ranked by shared
collocate profiles [LIT: Rychlý & Kilgarriff 2007, "An efficient
algorithm for building a distributional thesaurus"; Grefenstette 1994].

A corpus portal's thesaurus tab is the canonical companion to the word
sketch: where `collocations` answers "what co-occurs with X", the
thesaurus answers "what behaves LIKE X" — terms whose windowed
co-occurrence profile overlaps X's. fastmorph's portal class exposes
frequency/collocation analyses over interned ids [PK-med]; this is the
same analysis family re-expressed as two DataFrame aggregations.

Semantics (pinned, mirrored TEXTUALLY by oracles_corpus.thesaurus_sql):

- the co-occurrence PROFILE of term t is ``n(t, c)`` = the number of
  (occurrence of t, occurrence of c) pairs in the same doc with
  ``1 <= |pos_c - pos_t| <= window`` and ``c != t`` — exactly the
  `collocations` pair definition (tested identical: the profile row set
  for a == target equals `_pair_counts(postings, target, window)`);
- ``mass(t)   = Σ_c n(t, c)`` (the profile's total pair mass);
- ``shared(s) = Σ_c min(n(target, c), n(s, c))`` over collocates c the
  two profiles share;
- ``sim(s)    = (2.0 * shared) / (mass_target + mass_s)`` — the
  generalized Dice coefficient over pair counts. Integer sums and
  ``min`` are exact; one final division, so Spark and DuckDB agree
  bit-for-bit before SCORE_DECIMALS rounding;
- candidates below ``min_shared`` shared pairs are dropped (the PMI
  min_count discipline: low-overlap similarity is noise);
- deterministic order/tie-break ``(sim DESC, term ASC)``; rank over the
  UNROUNDED sim, output rounded (the search_topk discipline).

Scale shape: `cooc_profiles` is ONE tokenize scan with a bounded explode
(each token yields at most `window` ordered pairs) + ONE map-side-
combinable groupBy on (a, b) — hot-pair skew is absorbed by partial
aggregation, the same argument as `ngram_freq`. Symmetrization re-keys
only the (vocab x vocab)-bounded pair-count table, which is orders of
magnitude smaller than the corpus. At 100 TB the profile table is an
INDEX-TIME artifact: materialize it once next to the dictionary (it is
`O(distinct pairs)`, not `O(corpus)`) and answer every thesaurus query
from it with a broadcast of one term's profile + one groupBy — the
query side never rescans the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.tokenize import tokenize_expr


def cooc_profiles(docs: DataFrame, window: int = 3,
                  text_col: str = "text") -> DataFrame:
    """Symmetric windowed co-occurrence counts ``(a, b, n)`` for ALL term
    pairs: n = number of occurrence pairs of a and b within `window`
    positions of each other (a != b; both orientations counted, so the
    row (a, b) equals `collocations`' pair count for target=a,
    neighbor=b).

    Plan: ordered pairs (i < j, j - i <= window, t[i] != t[j]) are
    generated doc-locally by a Catalyst higher-order expression (JVM
    codegen, no Python), exploded once, and counted with ONE partial-agg
    groupBy; the symmetrize union re-aggregates only the pair-count
    rows. `sequence(1, size - 1)` would DESCEND for 1-token docs (Spark
    sequence semantics), hence the size >= 2 guard."""
    w = int(window)
    pairs = F.expr(
        "CASE WHEN size(_t) >= 2 THEN "
        "flatten(transform(sequence(1, size(_t) - 1), i -> "
        "filter(transform(sequence(i + 1, least(i + {w}, size(_t))), j -> "
        "struct(element_at(_t, i) AS a, element_at(_t, j) AS b)), "
        "s -> s.a <> s.b))) "
        "ELSE array() END".format(w=w)
    )
    ordered = (
        docs.select(tokenize_expr(text_col).alias("_t"))
        .select(F.explode(pairs).alias("_p"))
        .select(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        ordered.select("a", "b", "n")
        .unionByName(ordered.select(F.col("b").alias("a"),
                                    F.col("a").alias("b"), "n"))
        .groupBy("a", "b")
        .agg(F.sum("n").alias("n"))
    )


def thesaurus(docs: DataFrame, target: str, window: int = 3,
              min_shared: int = 2, k: int = 20,
              profiles: DataFrame | None = None) -> DataFrame:
    """Top-k distributionally similar terms to `target`:
    ``(rank, term, shared, mass, sim)`` under the module pinning.

    Pass ``profiles=`` (a persisted `cooc_profiles` output) to skip the
    corpus scan — the at-scale serving shape. The target's own profile
    and mass are broadcast (one term's collocate list — small by the
    same argument as the collocation target gate)."""
    prof = profiles if profiles is not None else cooc_profiles(docs, window)
    mass = prof.groupBy("a").agg(F.sum("n").alias("mass"))
    tgt = prof.filter(F.col("a") == target) \
        .select("b", F.col("n").alias("_tn"))
    tmass = mass.filter(F.col("a") == target) \
        .select(F.col("mass").cast("double").alias("_tmass"))
    shared = (
        prof.filter(F.col("a") != target)
        .join(F.broadcast(tgt), "b")
        .groupBy("a")
        .agg(F.sum(F.least("n", "_tn")).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    scored = (
        shared.join(mass, "a")
        .crossJoin(F.broadcast(tmass))
        .withColumn(
            "sim",
            # pinned: (2.0 * shared) / (tmass + mass) — all float64,
            # mirrored textually in oracles_corpus.thesaurus_sql
            (F.lit(2.0) * F.col("shared"))
            / (F.col("_tmass") + F.col("mass").cast("double")),
        )
    )
    topk = scored.orderBy(F.desc("sim"), F.asc("a")).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("sim"), F.asc("a")))
    return topk.select(
        rank.cast("long").alias("rank"),
        F.col("a").alias("term"),
        F.col("shared").cast("long").alias("shared"),
        F.col("mass").cast("long").alias("mass"),
        F.round("sim", SCORE_DECIMALS).alias("sim"),
    )
