"""M2 — physical index build: salted repartition-by-term + block packing.

North-star mandates (BASELINE.json): "partition-local posting-list build,
and a salted repartition-by-term external merge that explicitly handles
hot-term skew at 10^12-file scale" + "sorted, delta+varbyte-compressed".

Design (see constants.DOC_SHARD_SIZE): the salt is the DOC-ID RANGE SHARD.
- Build: groupBy(term, doc_shard).applyInPandas — Spark's sort-based
  shuffle IS the external merge (spills natively); a hot term with
  df ~= 10^12 lands on 10^12/DOC_SHARD_SIZE reducers, not one.
- Merge: because every block stores its first doc_id raw (self-contained
  gap lists) and shards are contiguous ranges, the final per-term posting
  list is the shard-ordered concatenation of sub-lists — the hot-term
  merge costs zero decode work, unlike hash-salting which needs a k-way
  re-merge.
- Query: all of a doc range's postings (every term) share a doc_shard, so
  Block-Max WAND runs complete and independent per shard and the global
  answer is a k-merge of shard-local top-k (document-partitioned search).

Block schema (one row per block, SURVEY.md §1.3 postings_packed):
  term, doc_shard, block_seq, n_docs, first_doc, max_doc,
  block_max_score, doc_gaps(bin), tfs(bin), dls(bin), positions(bin),
  term_bucket

`dls` (per-posting doc lengths, varbyte) makes blocks self-contained for
exact BM25 at query time — no doc_lens join inside the WAND kernel. It is
the exactness-preserving analog of the quantized impact scores real
engines precompute; ~1 byte/posting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from fastmorph_spark.constants import (
    BLOCK_SIZE,
    BM25_B,
    BM25_K1,
    DOC_SHARD_SIZE,
    N_TERM_BUCKETS,
)
from fastmorph_spark.index.varbyte import encode_positions, vb_encode

PACKED_SCHEMA = StructType([
    StructField("term", StringType()),
    StructField("doc_shard", IntegerType()),
    StructField("block_seq", IntegerType()),
    StructField("n_docs", IntegerType()),
    StructField("first_doc", LongType()),
    StructField("max_doc", LongType()),
    StructField("block_max_score", DoubleType()),
    StructField("doc_gaps", BinaryType()),
    StructField("tfs", BinaryType()),
    StructField("dls", BinaryType()),
    StructField("positions", BinaryType()),
])


def _bm25_np(tf: np.ndarray, df: float, n_docs: float, dl: np.ndarray, avgdl: float) -> np.ndarray:
    """Float64 twin of search.bm25.bm25_score_col (same op order)."""
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    tf = tf.astype(np.float64)
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl.astype(np.float64) / avgdl)
    return idf * tf * (BM25_K1 + 1.0) / denom


def _make_pack_fn(block_size: int):
    def _pack_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        """One (term, doc_shard) group -> block rows. Bounded memory: a
        group holds at most doc_shard_size docs regardless of term hotness."""
        term, doc_shard = key
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        df_t = float(pdf["df"].iloc[0])
        n_docs = float(pdf["n_docs"].iloc[0])
        avgdl = float(pdf["avgdl"].iloc[0])
        positions = pdf["positions"].to_numpy()
        scores = _bm25_np(tfs, df_t, n_docs, dls, avgdl)

        rows = []
        for seq, lo in enumerate(range(0, doc_ids.size, block_size)):
            hi = min(lo + block_size, doc_ids.size)
            d = doc_ids[lo:hi]
            rows.append({
                "term": term,
                "doc_shard": int(doc_shard),
                "block_seq": seq,
                "n_docs": int(hi - lo),
                "first_doc": int(d[0]),
                "max_doc": int(d[-1]),
                "block_max_score": float(scores[lo:hi].max()),
                "doc_gaps": vb_encode(np.concatenate((d[:1], np.diff(d))).astype(np.uint64)),
                "tfs": vb_encode(tfs[lo:hi].astype(np.uint64)),
                "dls": vb_encode(dls[lo:hi].astype(np.uint64)),
                "positions": encode_positions([np.asarray(p, dtype=np.uint64) for p in positions[lo:hi]]),
            })
        return pd.DataFrame(rows, columns=[f.name for f in PACKED_SCHEMA.fields])

    return _pack_group


def pack_postings(
    postings: DataFrame,
    doc_lens: DataFrame,
    dictionary: DataFrame,
    stats: DataFrame,
    doc_shard_size: int = DOC_SHARD_SIZE,
    block_size: int = BLOCK_SIZE,
) -> DataFrame:
    """Logical postings -> packed blocks.

    Plan at scale: postings⋈doc_lens is the only big join (both keyed on
    doc_id); dictionary df and the 1-row stats broadcast; then ONE shuffle
    on (term, doc_shard) — the salted repartition — into the Arrow packer.
    """
    enriched = (
        postings
        .join(doc_lens, "doc_id")
        .join(F.broadcast(dictionary.select("term", "df")), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("doc_shard", (F.col("doc_id") / F.lit(doc_shard_size)).cast("int"))
    )
    packed = enriched.groupBy("term", "doc_shard").applyInPandas(
        _make_pack_fn(block_size), PACKED_SCHEMA
    )
    return packed.withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)).cast("int")
    )


def dictionary_with_max_score(dictionary: DataFrame, packed: DataFrame) -> DataFrame:
    """Attach WAND upper bounds: max_score(term) = max over blocks.
    Free: derived from block metadata, no extra corpus pass."""
    ub = packed.groupBy("term").agg(F.max("block_max_score").alias("max_score"))
    return dictionary.join(ub, "term", "left").select(
        "term", "df", "cf", F.coalesce("max_score", F.lit(0.0)).alias("max_score")
    )
