"""M3 — W3: the Block-Max WAND query kernel over the packed index.

Catalyst cannot express score-threshold pruning (SURVEY.md §4), so this
is the engine's one custom physical operator: a numpy kernel applied per
doc_shard via grouped applyInPandas.

Distributed shape (document-partitioned search):
  1. dictionary lookup for the query terms (J1; tiny, collected once);
  2. packed-block scan pruned THREE ways before any Python runs —
     term_bucket partition pruning (file skip), `term` predicate pushdown
     (row-group skip), column pruning (`positions` never read for BM25);
  3. per-shard kernel: every term's blocks for a doc range are in the
     same group, so pruning + exact scoring complete locally;
  4. global top-k = TakeOrderedAndProject over shard-local top-k rows.

Kernel algorithm (exact; block-granular pruning [LIT: Broder et al. WAND
CIKM'03; Ding & Suel Block-Max WAND SIGIR'11], vectorized variant):
  - Split the shard's doc-id space at every block boundary -> segments;
    within a segment each term contributes at most one block, so
    UB(seg) = Σ_t block_max(t, block covering seg) bounds every doc in it.
  - Process segments in DESCENDING UB order, keeping a running top-k
    heap θ; stop at the first segment with UB < θ - 1e-9 (every later
    segment is smaller — nothing below can enter the top-k; the 1e-9
    margin absorbs float addition-order slack so exactness is never at
    the mercy of a last bit).
  - A processed segment decodes only the overlapping slices of its
    blocks (gaps+tfs+dls; never positions) and scores them vectorized.
The per-segment work is numpy; the Python loop is over SEGMENTS
(#blocks·|q| at worst), not postings or docs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from fastmorph_spark.constants import BM25_B, BM25_K1, N_TERM_BUCKETS, SCORE_DECIMALS
from fastmorph_spark.index.io import Index
from fastmorph_spark.index.varbyte import vb_decode
from fastmorph_spark.tokenize import tokenize_py

TOPK_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("score", DoubleType()),
])


def _score_np(tf: np.ndarray, dl: np.ndarray, idf: float, avgdl: float) -> np.ndarray:
    # pinned parenthesization idf * (impact) — see bm25_score_col docstring
    tf = tf.astype(np.float64)
    return idf * (tf * (BM25_K1 + 1.0) / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl.astype(np.float64) / avgdl)))


def _topk_merge(cand_docs: np.ndarray, cand_scores: np.ndarray, k: int,
                heap_docs: np.ndarray, heap_scores: np.ndarray):
    """Merge candidates into the running top-k (score DESC, doc_id ASC)."""
    docs = np.concatenate((heap_docs, cand_docs))
    scores = np.concatenate((heap_scores, cand_scores))
    order = np.lexsort((docs, -scores))[:k]
    return docs[order], scores[order]


def make_shard_kernel(term_meta: dict[str, tuple[float, float]],
                      n_docs: float, avgdl: float, k: int, prune: bool = True,
                      impact_slack: float = 1.0,
                      exclude: "np.ndarray | None" = None):
    """term_meta: term -> (idf, max_score). Returns the applyInPandas fn.

    ``exclude``: sorted int64 doc_ids to mask at block-decode time — the
    live tombstone set (index/tombstones.py), passed as an sc.broadcast
    HANDLE (resolved executor-side; a raw array is accepted for tests).
    Deleted docs never reach scoring or the top-k heap; block upper
    bounds only get looser, so WAND pruning stays exact. Stats
    (n_docs/avgdl/idf) are the PRE-DELETE values until purge — Lucene
    delete semantics. Masking must stay INSIDE the kernel: filtering
    after the shard top-k would under-fill shards whose top-k slots held
    tombstoned docs (see tombstones.tombstone_broadcast).

    ``impact_slack`` >= 1 loosens the block upper bounds by that factor:
    stored block_max_impact values were computed with the PACK-time avgdl,
    and impact is monotonically increasing in avgdl with
    impact(avgdl_now) <= impact(avgdl_pack) * avgdl_now/avgdl_pack
    (denominator bound: denom(avgdl_now) >= denom(avgdl_pack) *
    avgdl_pack/avgdl_now termwise). An incrementally-extended index whose
    avgdl GREW since packing therefore stays EXACT under WAND by scaling
    bounds with slack = max(1, avgdl_now/min_pack_avgdl) — pruning gets
    slightly weaker, never unsafe (streaming/incremental.py)."""

    terms = sorted(term_meta)
    t_index = {t: i for i, t in enumerate(terms)}

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        from fastmorph_spark.index.tombstones import resolve_exclude

        excl = resolve_exclude(exclude)
        if pdf.empty:
            return pd.DataFrame({"doc_id": [], "score": []}).astype({"doc_id": "int64", "score": "float64"})
        # --- gather per-term block metadata (numpy, no decode yet)
        t_ids = pdf["term"].map(t_index).to_numpy(dtype=np.int64)
        firsts = pdf["first_doc"].to_numpy(dtype=np.int64)
        maxes = pdf["max_doc"].to_numpy(dtype=np.int64)
        idf_arr = np.array([term_meta[t][0] for t in terms], dtype=np.float64)
        # block max SCORE = idf(term) * stored idf-free block max impact
        # (x impact_slack when the index grew past its pack-time avgdl)
        bmax = impact_slack * idf_arr[t_ids] * pdf["block_max_impact"].to_numpy(dtype=np.float64)
        gaps_col = pdf["doc_gaps"].to_numpy()
        tfs_col = pdf["tfs"].to_numpy()
        dls_col = pdf["dls"].to_numpy()

        # --- segments: cut doc space at every block boundary
        bounds = np.unique(np.concatenate((firsts, maxes + 1)))
        seg_lo, seg_hi = bounds[:-1], bounds[1:]  # [lo, hi)
        n_seg = seg_lo.size
        # per (term, segment) covering block -> UB per segment
        ub = np.zeros(n_seg, dtype=np.float64)
        cover = np.full((len(terms), n_seg), -1, dtype=np.int64)
        for ti in range(len(terms)):
            rows = np.flatnonzero(t_ids == ti)
            if rows.size == 0:
                continue
            order = np.argsort(firsts[rows], kind="stable")
            rows = rows[order]
            # which block covers each segment start (blocks disjoint, sorted)
            j = np.searchsorted(firsts[rows], seg_lo, side="right") - 1
            valid = (j >= 0) & (seg_lo <= maxes[rows][np.clip(j, 0, None)])
            idx = rows[np.clip(j, 0, None)]
            cover[ti, valid] = idx[valid]
            ub[valid] += bmax[idx[valid]]

        # --- process segments in descending UB with a running top-k
        seg_order = np.argsort(-ub, kind="stable")
        heap_docs = np.empty(0, dtype=np.int64)
        heap_scores = np.empty(0, dtype=np.float64)
        theta = -np.inf
        decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}

        for s in seg_order:
            if prune and heap_docs.size >= k and ub[s] < theta - 1e-9:
                break  # all remaining segments have smaller UB
            lo, hi = seg_lo[s], seg_hi[s]
            cd: list[np.ndarray] = []
            cs: list[np.ndarray] = []
            for ti in range(len(terms)):
                b = cover[ti, s]
                if b < 0:
                    continue
                if b not in decoded:
                    d = np.cumsum(vb_decode(gaps_col[b]).astype(np.int64))
                    sc = _score_np(
                        vb_decode(tfs_col[b]), vb_decode(dls_col[b]),
                        term_meta[terms[ti]][0], avgdl,
                    )
                    if excl is not None:
                        keep = ~np.isin(d, excl)
                        d, sc = d[keep], sc[keep]
                    decoded[b] = (d, sc)
                d, sc = decoded[b]
                a, z = np.searchsorted(d, lo), np.searchsorted(d, hi)
                if z > a:
                    cd.append(d[a:z])
                    cs.append(sc[a:z])
            if not cd:
                continue
            docs = np.concatenate(cd)
            scores = np.concatenate(cs)
            if len(cd) > 1:
                # Sum contributions per doc IN TERM-SORTED ORDER as a strict
                # LEFT FOLD: cd entries are appended in sorted-term order and
                # the stable sort keeps that order within each doc, so the
                # float accumulation matches sum_term_scores and the Python
                # oracle bit-for-bit. (np.add.reduceat is NOT a left fold —
                # its association order differs; verified empirically.)
                order = np.argsort(docs, kind="stable")
                docs, scores = docs[order], scores[order]
                new_grp = np.concatenate(([True], np.diff(docs) > 0))
                cut = np.flatnonzero(new_grp)
                grp = np.cumsum(new_grp) - 1
                pos = np.arange(docs.size) - cut[grp]
                totals = np.zeros(cut.size, dtype=np.float64)
                for j in range(int(pos.max()) + 1):
                    m = pos == j
                    totals[grp[m]] += scores[m]
                docs = docs[cut]
                scores = totals
            heap_docs, heap_scores = _topk_merge(docs, scores, k, heap_docs, heap_scores)
            if heap_docs.size >= k:
                theta = heap_scores[-1]

        return pd.DataFrame({"doc_id": heap_docs, "score": heap_scores})

    return kernel


def search_wand(
    index: Index,
    query_text: str,
    k: int = 10,
    round_score: bool = False,
    prune: bool = True,
    tokenizer: str = "ascii",
) -> DataFrame:
    """BM25 top-k over the packed index via the Block-Max WAND kernel.
    Rank-identical to the expression/indexed/oracle paths (tested).
    ``tokenizer`` must match the one the index was built with — it only
    affects how the QUERY text folds into terms (the kernel itself is
    tokenizer-agnostic); "uni" folds a Cyrillic/any-script query."""
    from fastmorph_spark.tokenize import tokenize_py_code, tokenize_py_uni

    tok_py = {"uni": tokenize_py_uni, "code": tokenize_py_code}.get(tokenizer, tokenize_py)
    qterms = sorted(set(tok_py(query_text)))
    return search_wand_terms(index, qterms, k=k, round_score=round_score,
                             prune=prune)


def dictionary_rows(index: Index, qterms: list[str]) -> list:
    """J1: tiny dictionary lookup for the query terms, collected once
    (driver-side, ≤|q| rows) — shared by search_wand_terms and the NRT
    composition (search/nrt.py), which also needs the base-side dfs to
    combine with the unindexed tail's."""
    return index.dictionary.filter(F.col("term").isin(qterms)).collect()


def wand_local_topk(
    index: Index,
    drows: list,
    k: int,
    *,
    n_docs: float,
    avgdl: float,
    term_df: dict[str, int],
    prune: bool = True,
) -> DataFrame:
    """Shard-local top-k (doc_id, score) rows from the packed blocks under
    CALLER-SUPPLIED global BM25 stats — the scoring core of
    search_wand_terms (which passes the index's own stats row) and of the
    NRT composition (search/nrt.py, which passes base∪tail-COMBINED
    (n_docs, avgdl, df) so the kernel scores base docs exactly as a full
    single-index rebuild would). ``term_df`` maps term -> df in the
    query-scope universe; ``drows`` are dictionary_rows(index, qterms).

    Exactness when the query-time avgdl differs from the pack-time one is
    the impact_slack argument (make_shard_kernel): bounds scale by
    max(1, avgdl/min_pack_avgdl) — looser, never unsafe. An avgdl BELOW
    the pack-time one only shrinks true impacts, so slack stays 1."""
    srow = index.stats_row()
    # incremental index: stats carry the smallest avgdl any live block was
    # packed with; scale all impact-derived bounds so pruning stays exact
    # (see make_shard_kernel docstring). Batch-built index: slack == 1.
    min_pack_avgdl = float(srow.get("min_pack_avgdl") or srow["avgdl"])
    impact_slack = max(1.0, avgdl / min_pack_avgdl)
    term_meta = {
        r["term"]: (
            float(np.log(1.0 + (n_docs - term_df[r["term"]] + 0.5)
                         / (term_df[r["term"]] + 0.5))),
            float(r["max_score"]) * impact_slack,
        )
        for r in drows
    }
    # term_bucket rides along in the dictionary (denormalized at build) so
    # block-scan pruning needs no extra driver round-trip
    if "term_bucket" in index.dictionary.columns:
        buckets = sorted({int(r["term_bucket"]) for r in drows})
    else:
        buckets = _term_buckets(list(term_meta))

    # J2: pruned block scan — partition (term_bucket) + predicate (term) +
    # column pruning (no positions column read)
    blocks = index.postings.filter(
        F.col("term_bucket").isin(buckets)
        & F.col("term").isin(list(term_meta))
    ).select("doc_shard", "term", "first_doc", "max_doc", "block_max_impact",
             "doc_gaps", "tfs", "dls")

    from fastmorph_spark.index.tombstones import tombstone_broadcast

    kernel = make_shard_kernel(term_meta, n_docs, avgdl, k, prune=prune,
                               impact_slack=impact_slack,
                               exclude=tombstone_broadcast(index))
    return blocks.groupBy("doc_shard").applyInPandas(
        lambda key, pdf: kernel(pdf), TOPK_SCHEMA
    )


def search_wand_terms(
    index: Index,
    qterms: list[str],
    k: int = 10,
    round_score: bool = False,
    prune: bool = True,
) -> DataFrame:
    """search_wand for an already-tokenized (deduplicated, sorted) term
    list — the entry the more-like-this packed twin uses, where the query
    terms come from the source doc's TF-IDF profile, not from text."""
    spark = index.postings.sparkSession
    empty = spark.createDataFrame([], "rank long, doc_id long, score double")
    if not qterms:
        return empty

    drows = dictionary_rows(index, qterms)
    if not drows:
        return empty
    srow = index.stats_row()
    n_docs, avgdl = float(srow["n_docs"]), float(srow["avgdl"])
    term_df = {r["term"]: int(r["df"]) for r in drows}
    local = wand_local_topk(index, drows, k, n_docs=n_docs, avgdl=avgdl,
                            term_df=term_df, prune=prune)
    topk = local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    out = topk.select(rank.cast("long").alias("rank"), "doc_id", "score")
    if round_score:
        out = out.withColumn("score", F.round("score", SCORE_DECIMALS))
    return out


def _term_buckets(terms: list[str]) -> list[int]:
    """xxhash64-based term_bucket values for partition pruning — must match
    the Spark expression pmod(xxhash64(term), N_TERM_BUCKETS) used at pack
    time, so we compute it WITH Spark (foldable, instant)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    row = spark.range(1).select(*[
        F.pmod(F.xxhash64(F.lit(t)), F.lit(N_TERM_BUCKETS)).cast("int").alias(f"b{i}")
        for i, t in enumerate(terms)
    ]).collect()[0]
    return sorted({row[f"b{i}"] for i in range(len(terms))})
