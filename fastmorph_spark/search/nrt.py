"""Near-real-time (NRT) composed search: packed base index ∪ unindexed tail.

A long-lived fastmorph server ingests continuously but finalizes the packed
index at checkpoint cadence (streaming/incremental.py is the WRITE side of
that lifecycle). Between finalizes, freshly ingested documents exist only
as corpus rows — this module is the READ side: answer a BM25 query over
base ∪ tail RANK-IDENTICALLY to what a full single-index rebuild would
return (the Lucene NRT-reader contract [PK-high: Lucene
DirectoryReader.openIfChanged + in-memory segment; every serving engine
with a refresh interval has this seam]).

How exactness is achieved (the interesting part is the GLOBAL statistics —
scores depend on corpus-wide n_docs/avgdl/df, so base and tail cannot be
scored independently and merged naively):

1. The tail's contribution to the global stats is computed exactly with
   two tiny bounded driver jobs: per-query-term df (≤|q| rows) and the
   1-row (count, Σdl). dl is integral, so Σdl is an EXACT int64 on both
   sides; avgdl_combined = (Σdl_base + Σdl_tail)/n_total is then the same
   once-rounded float64 that F.avg / DuckDB AVG produce over the full
   corpus — scores come out bit-identical to the expression path, not
   merely close. Σdl_base is recovered from the index stats row as
   round(avgdl·n_docs), exact while Σdl < 2^52 (10^12 docs × ~500 tokens
   ≈ 5e14 — holds at the target scale).
2. The Block-Max WAND kernel runs over the base's packed blocks with the
   COMBINED (n_docs, avgdl, df) via wand.wand_local_topk; the pack-time
   block-max bounds stay exact under the avgdl-slack argument
   (wand.make_shard_kernel: bounds scale by max(1, avgdl_now/pack_avgdl),
   looser never unsafe). Tombstoned base docs are masked in-kernel.
3. The tail is scored corpus-side with the SAME combined stats through
   the bm25_score_col expression and the sorted-term-fold summation
   (search/bm25.py discipline), so per-doc float accumulation matches
   the kernel and the oracles bit-for-bit.
4. One global TakeOrderedAndProject over the union picks the top-k with
   the engine-wide (score DESC, doc_id ASC) tie-break.

Scale shape: the tail is the post-checkpoint ingest slice — SMALL by
construction (it shrinks to zero at every incremental finalize). Driver
round-trips are bounded by |query|+1 rows regardless of tail size; the
tail pays one corpus-path scoring pass over ITSELF only; the base never
re-tokenizes anything (pruned block scan + kernel, as search_wand).

Caller contract: base and tail must be doc_id-DISJOINT (the tail is
everything ingested after the index's checkpoint). A doc present in both
would be scored twice and could occupy two top-k slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.index.io import Index
from fastmorph_spark.search.bm25 import bm25_score_col, corpus_stats, sum_term_scores
from fastmorph_spark.tokenize import tokenize_py


def search_nrt(
    index: Index,
    tail_docs: DataFrame,
    query_text: str,
    k: int = 10,
    round_score: bool = False,
    tokenizer: str = "ascii",
    scope=None,
    prune: bool = True,
) -> DataFrame:
    """BM25 top-k over (packed base index) ∪ (unindexed tail corpus),
    rank-identical to a single index over base ∪ tail — see module
    docstring. Returns (rank, doc_id, score). ``tokenizer`` must match
    the one the base index was built with; it folds both the query text
    and the tail tokenization."""
    from fastmorph_spark.search.wand import dictionary_rows, wand_local_topk
    from fastmorph_spark.tokenize import tokenize_py_code, tokenize_py_uni

    spark = index.postings.sparkSession
    empty = spark.createDataFrame([], "rank long, doc_id long, score double")
    tok_py = {"uni": tokenize_py_uni, "code": tokenize_py_code}.get(tokenizer, tokenize_py)
    qterms = sorted(set(tok_py(query_text)))
    if not qterms:
        return empty

    # --- tail-side exact stats: two bounded driver jobs (≤|q| rows + 1).
    # matched feeds BOTH the df agg and the scoring join — pin it so the
    # tail tokenizes once (the bm25_scores persist discipline; scope owns
    # the block, else the caller does).
    from fastmorph_spark.cache import pin

    tail_tf, tail_doc_lens, _ = corpus_stats(tail_docs, tokenizer=tokenizer)
    matched = pin(tail_tf.filter(F.col("term").isin(qterms)), scope)
    df_tail = {
        r["term"]: int(r["df"])
        for r in matched.groupBy("term").agg(F.count("*").alias("df")).collect()
    }
    trow = tail_doc_lens.agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    n_tail, sum_dl_tail = int(trow["n"]), int(trow["s"] or 0)

    # --- combined global stats (module docstring step 1)
    srow = index.stats_row()
    n_base = int(srow["n_docs"])
    avgdl_base = float(srow["avgdl"] or 0.0)
    sum_dl_base = int(round(avgdl_base * n_base))
    n_tot = n_base + n_tail
    if n_tot == 0:
        return empty
    avgdl_tot = (sum_dl_base + sum_dl_tail) / n_tot

    # --- base side: WAND kernel under combined stats (step 2)
    drows = dictionary_rows(index, qterms)
    term_df = {r["term"]: int(r["df"]) + df_tail.get(r["term"], 0) for r in drows}
    base_local = None
    if drows and avgdl_tot > 0:
        base_local = wand_local_topk(index, drows, k, n_docs=float(n_tot),
                                     avgdl=avgdl_tot, term_df=term_df,
                                     prune=prune)

    # --- tail side: expression scoring under the SAME combined stats
    # (step 3). df covers tail-only terms too (df_base = 0 for them).
    df_all = dict(df_tail)
    for t, d in term_df.items():
        df_all[t] = d
    tail_scores = None
    if df_all and n_tail > 0:
        df_frame = spark.createDataFrame(
            sorted(df_all.items()), "term string, df long"
        )
        scored = matched.join(F.broadcast(df_frame), "term").withColumn(
            "term_score",
            bm25_score_col(F.col("tf"), F.col("df"), F.lit(n_tot),
                           F.col("dl"), F.lit(float(avgdl_tot))),
        )
        tail_scores = sum_term_scores(scored)

    # --- global top-k over the union (step 4)
    if base_local is None and tail_scores is None:
        return empty
    cand = (base_local if tail_scores is None
            else tail_scores if base_local is None
            else base_local.unionByName(tail_scores))
    topk = cand.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    out = topk.select(rank.cast("long").alias("rank"), "doc_id", "score")
    if round_score:
        out = out.withColumn("score", F.round("score", SCORE_DECIMALS))
    return out
