"""Benchmark decontamination — per-document n-gram overlap against an
eval/benchmark set.

The canonical training-data hygiene pass: before training on a corpus,
flag (and usually drop) documents whose n-gram shingles overlap a
held-out benchmark, so eval numbers measure generalization rather than
memorization. Published pipelines use long shingles (8-13 word n-grams)
so that rarity alone makes a hit meaningful; the default here is n=8.

Spark-first shape:

- corpus side: distinct word n-gram shingles per doc (the dedup
  `_shingles` kernel — same tokenizer expression twin, JVM codegen)
- benchmark side: ONE global distinct over the benchmark's shingles
- overlap: a single left-semi join corpus-shingles -> benchmark-shingles
  counted per doc, divided by the doc's shingle count

Scale notes: the benchmark set is tiny relative to the corpus (eval
suites are ~10^4-10^5 docs vs 10^9+ training docs), so the distinct
benchmark-shingle frame usually broadcasts — decided by AQE from the
frame's ACTUAL post-distinct byte size at runtime (r06; the old
row-count gate both ran an eager driver job and mis-proxied bytes for
long-doc benchmarks); oversized benchmarks fall back to a shuffle join
partitioned on shingle. Either way the corpus is touched ONCE and no
pairwise doc comparison exists — cost is one shingle explode + one
join, exactly the dedup envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.ops.dedup import _shingles

# retained for API compatibility; since r06 the default join strategy is
# decided by AQE from the distinct shingle frame's ACTUAL byte size at
# runtime (see benchmark_contamination), not from this row-count proxy
BROADCAST_DOCS = 10_000


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_docs: int = BROADCAST_DOCS,
    broadcast: bool | None = None,
) -> DataFrame:
    """Per-document contamination report against ``benchmark``.

    Returns (doc_id, n_shingles, n_contaminated, overlap_frac) for every
    corpus doc with at least ``min_hits`` shingles that also occur
    anywhere in the benchmark set; overlap_frac is the contaminated
    fraction of the doc's distinct shingles, rounded to SCORE_DECIMALS
    (hash-comparable against the DuckDB oracle). Docs shorter than n
    tokens have no shingles and never appear.

    ``broadcast`` (VERDICT r04 #9 / ADVICE r04 #1, closed r06): True
    force-broadcasts the distinct benchmark-shingle frame, False forces
    the shuffle join. Default None leaves the choice to AQE, which sees
    the distinct frame's ACTUAL byte size after its shuffle and converts
    the semi-join to a broadcast join iff it fits the executor broadcast
    budget — the old default ran an eager row-count job inside this
    otherwise-lazy builder and used benchmark DOCS as a proxy for
    broadcast BYTES, which a ≤10k-row benchmark of very long documents
    could blow past. No driver job, no proxy: the builder is now fully
    lazy by default and the decision is made from real bytes.
    ``broadcast_docs`` is retained for API compatibility and ignored
    unless you pass ``broadcast=`` yourself.

    A pipeline drops docs above a threshold (e.g. overlap_frac >= 0.1 or
    any hit at n=13) — the caller picks the policy; this operator
    reports the evidence."""
    doc_sh = _shingles(docs, n, text_col, id_col)
    bench_sh = _shingles(benchmark, n, text_col, id_col).select("shingle").distinct()
    if broadcast:
        bench_sh = F.broadcast(bench_sh)
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_shingles"))
    hits = (
        doc_sh.join(bench_sh, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_contaminated"))
        .filter(F.col("n_contaminated") >= min_hits)
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.round(F.col("n_contaminated") / F.col("n_shingles"), SCORE_DECIMALS).alias(
            "overlap_frac"
        ),
    )


def pipeline_drop_list(
    docs: DataFrame,
    benchmark: DataFrame,
    dedup_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    contam_n: int = 8,
    min_frac: float = 0.05,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope=None,
    span_tokens: int | None = None,
) -> DataFrame:
    """The COMPLETE hygiene decision a training pipeline consumes:
    (doc_id, reason) for every doc to drop — dedup drops (reason 'exact'
    / 'near', ops.dedup.drop_list semantics) unioned with benchmark
    contamination drops (reason 'contaminated': overlap_frac >=
    ``min_frac`` against ``benchmark``). Precedence exact > near >
    contaminated: a doc is listed once, under the strongest reason.
    When the benchmark docs are themselves inside ``docs`` (the verbatim
    eval-leak case), they self-contaminate at 1.0 and get dropped —
    exactly what decontamination is for.

    ``span_tokens`` (VERDICT r04 #7) additionally flags SUB-document
    duplication: docs that are non-canonical holders of >= 1 duplicated
    fixed-width token span (ops.dedup.span_drop_list) get reason
    'span_dup' — weakest precedence (a whole-doc or contamination verdict
    subsumes a span-level one). The span-granular evidence itself is
    span_drop_list's surface; here it rolls up to the doc decision.

    Scale shape: the dedup decision feeds the union AND the anti-join, so
    it is pinned when a ``scope`` owns the lifetime; with scope=None only
    drop_list's own internal pins exist (ADVICE r04: a second
    process-lifetime cache entry here was a leak) and the second read
    recomputes just the final union over those pinned intermediates —
    production callers pass a CacheScope. Contamination adds one shingle
    semi-join; no new shuffle shapes beyond the two composed operators."""
    from fastmorph_spark.ops.dedup import drop_list

    dd = drop_list(docs, dedup_n, num_hashes, bands, threshold,
                   text_col, id_col, scope=scope)
    if scope is not None:
        dd = scope.pin(dd)
    contam = (
        benchmark_contamination(docs, benchmark, n=contam_n,
                                text_col=text_col, id_col=id_col)
        .filter(F.col("overlap_frac") >= min_frac)
        .select("doc_id")
    )
    out = dd.unionByName(
        contam.join(dd.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.lit("contaminated").alias("reason"))
    )
    if span_tokens is not None:
        from fastmorph_spark.cache import pin
        from fastmorph_spark.ops.dedup import span_drop_list

        out = pin(out, scope) if scope is not None else out
        span_docs = span_drop_list(docs, span_tokens, text_col, id_col,
                                   scope=scope) \
            .select("doc_id").distinct()
        out = out.unionByName(
            span_docs.join(out.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", F.lit("span_dup").alias("reason"))
        )
    return out.orderBy("doc_id")
