"""Federated sharded search: BM25 top-k fanned out across a fleet of
doc-disjoint packed indexes, rank-identical to one global index.

At 10^12 files the inverted index is never one artifact — it is sharded
(per-language here, per-repo-range or per-time-slice in general) and a
query fans out to every shard. The classic correctness trap is SHARD-LOCAL
statistics: BM25 scores depend on corpus-wide df/n_docs/avgdl, so scoring
each shard with its own stats produces scores that are not comparable
across shards (the distributed-IDF problem; Lucene/Elasticsearch ship a
two-phase `dfs_query_then_fetch` mode for exactly this [PK-high: ES docs
describe query_then_fetch as the approximate default and dfs_ as the
global-stats variant]). This module is the exact two-phase protocol as
DataFrame operators:

1. **Stats fan-in** — each shard's 1-row stats frame is memoized on its
   Index; Σdl per shard is recovered as round(avgdl_i · n_i), exact while
   Σdl < 2^52 (holds at 10^12 docs × ~500 tokens — the nrt.py argument).
   avgdl_combined = ΣΣdl / Σn is then the same once-rounded float64 a
   single global build's F.avg would produce, so downstream float math is
   bit-identical, not merely close.
2. **Dictionary fan-in** — ONE Spark job unions every shard's pruned
   dictionary lookup (term ∈ query, ≤|q| rows per shard, shard-tagged)
   and collects once: driver traffic is bounded by S·|q| rows total, one
   round-trip regardless of shard count. df_combined(term) = Σ df_i.
3. **Scatter** — each shard runs the Block-Max WAND kernel over its own
   pruned packed blocks under the COMBINED (n, avgdl, df) via
   wand.wand_local_topk. Shards scan fully in parallel (their block
   frames are independent scans — no cross-shard shuffle anywhere); each
   returns ≤k·(its doc-shards) candidate rows, pre-pruned shard-locally.
   Block-max bounds stay exact under the per-shard avgdl-slack scaling
   (wand_local_topk computes impact_slack per shard from ITS pack-time
   avgdl). Per-shard tombstones are masked in-kernel as usual.
4. **Gather** — one global TakeOrderedAndProject over the union picks the
   top-k with the engine-wide (score DESC, doc_id ASC) tie-break.

Why the result is RANK-IDENTICAL to a single global index (the oracle the
registry key is checked against): every doc lives in exactly one shard
(caller contract — shards are doc_id-disjoint and covering for the corpus
being queried); a doc's score depends only on (tf, dl) — shard-local
facts identical to the global build's — and (df, n, avgdl), which steps
1–2 make identical; the per-doc accumulation over terms is the strict
sorted-term left fold in the kernel and the expression path alike
(wand.py's reduceat note), so the float64 sums agree bit-for-bit, and the
global gather applies the same total order.

Scale shape: driver round-trips are S stats rows (memoized) + one
S·|q|-row dictionary collect; executor work is per-shard pruned block
scans (term_bucket partition pruning + term pushdown, as search_wand);
the only data movement across shards is the ≤k-per-doc-shard candidate
union into the final top-k. A stale or rebuilding shard can simply be
swapped in the `shards` list — the fan-in recomputes global stats from
whatever fleet it is handed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.index.io import Index
from fastmorph_spark.tokenize import tokenize_py


def _fan_in_dictionaries(shards: Sequence[Index], qterms: list[str]) -> list[list]:
    """Step 2: one unioned, shard-tagged dictionary lookup — a single
    driver round-trip of ≤ S·|q| tiny rows, returned per-shard."""
    tagged = [
        ix.dictionary.filter(F.col("term").isin(qterms)).withColumn("_shard", F.lit(i))
        for i, ix in enumerate(shards)
    ]
    frame = tagged[0]
    for t in tagged[1:]:
        frame = frame.unionByName(t, allowMissingColumns=True)
    per: list[list] = [[] for _ in shards]
    for r in frame.collect():
        per[r["_shard"]].append(r)
    return per


def search_federated(
    shards: Sequence[Index],
    query_text: str,
    k: int = 10,
    round_score: bool = False,
    tokenizer: str = "ascii",
    prune: bool = True,
) -> DataFrame:
    """BM25 top-k over a doc-disjoint shard fleet, rank-identical to a
    single index over the union corpus — see module docstring. Returns
    (rank, doc_id, score). ``tokenizer`` must match the one the shards
    were built with (it folds the query text only)."""
    from fastmorph_spark.search.wand import wand_local_topk
    from fastmorph_spark.tokenize import tokenize_py_code, tokenize_py_uni

    shards = [ix for ix in shards if ix is not None]
    if not shards:
        raise ValueError("search_federated needs at least one shard")
    spark = shards[0].postings.sparkSession
    empty = spark.createDataFrame([], "rank long, doc_id long, score double")

    tok_py = {"uni": tokenize_py_uni, "code": tokenize_py_code}.get(tokenizer, tokenize_py)
    qterms = sorted(set(tok_py(query_text)))
    if not qterms:
        return empty

    # step 1: combined global stats (Σdl recovered exactly per shard)
    n_tot, sum_dl = 0, 0
    for ix in shards:
        srow = ix.stats_row()
        n_i = int(srow["n_docs"])
        n_tot += n_i
        sum_dl += int(round(float(srow["avgdl"] or 0.0) * n_i))
    if n_tot == 0:
        return empty
    avgdl_tot = sum_dl / n_tot
    if avgdl_tot <= 0:
        return empty

    # step 2: one-round-trip dictionary fan-in; df_combined = Σ shard df
    per_drows = _fan_in_dictionaries(shards, qterms)
    term_df: dict[str, int] = {}
    for drows in per_drows:
        for r in drows:
            term_df[r["term"]] = term_df.get(r["term"], 0) + int(r["df"])
    if not term_df:
        return empty

    # step 3: scatter — per-shard kernels under the combined stats
    parts = [
        wand_local_topk(ix, drows, k, n_docs=float(n_tot), avgdl=avgdl_tot,
                        term_df=term_df, prune=prune)
        for ix, drows in zip(shards, per_drows) if drows
    ]

    # step 4: gather — global top-k with the engine-wide tie-break
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    topk = cand.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    out = topk.select(rank.cast("long").alias("rank"), "doc_id", "score")
    if round_score:
        out = out.withColumn("score", F.round("score", SCORE_DECIMALS))
    return out
