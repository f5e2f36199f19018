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
  block_max_impact, doc_gaps(bin), tfs(bin), dls(bin), positions(bin),
  term_bucket

`dls` (per-posting doc lengths, varbyte) makes blocks self-contained for
exact BM25 at query time — no doc_lens join inside the WAND kernel. It is
the exactness-preserving analog of the quantized impact scores real
engines precompute; ~1 byte/posting.

`block_max_impact` is the IDF-FREE part of BM25:
    impact(tf, dl) = tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    score(t, d)    = idf(t) * impact(tf, dl)
Since idf is constant per term, max(score) = idf * max(impact) — so the
packer needs only the 1-row global stats broadcast and NO dictionary
join (a full postings⋈dictionary shuffle at 10^12 scale would dominate
the build). The WAND kernel multiplies by idf from the (tiny, per-query)
dictionary lookup.
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
    N_PACK_BUCKETS,
    N_TERM_BUCKETS,
    PACK_SLICES,
)
from fastmorph_spark.index.varbyte import vb_encode_with_lengths

PACKED_SCHEMA = StructType([
    StructField("term", StringType()),
    StructField("doc_shard", IntegerType()),
    StructField("block_seq", IntegerType()),
    StructField("n_docs", IntegerType()),
    StructField("first_doc", LongType()),
    StructField("max_doc", LongType()),
    StructField("block_max_impact", DoubleType()),
    StructField("block_cf", LongType()),
    StructField("doc_gaps", BinaryType()),
    StructField("tfs", BinaryType()),
    StructField("dls", BinaryType()),
    StructField("positions", BinaryType()),
])


def _impact_np(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    """IDF-free BM25 impact; idf * impact reproduces bm25_score_col's
    float64 result only if multiplied BEFORE anything else — the kernel
    does idf*(tf*(k1+1)) first, see wand._score_np for the exact op order."""
    tf = tf.astype(np.float64)
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl.astype(np.float64) / avgdl)
    return tf * (BM25_K1 + 1.0) / denom


def _make_pack_fn(block_size: int, avgdl: float):
    def _pack_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        """One (pack_bucket[, pack_slice], doc_shard) group -> block rows
        for MANY terms.

        Fully vectorized: ONE varbyte encoding of the whole group per
        payload (gaps/tfs/dls/positions) with per-value byte lengths, then
        pure byte-slicing per block. The only Python loop is over BLOCKS
        (|postings|/block_size), doing O(1) slicing each — per-posting
        Python work was the build bottleneck (measured ~45s/200k docs,
        flat across cores).
        """
        doc_shard = key[-1]
        pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        terms = pdf["term"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        vb_in = "positions_vb" in pdf.columns
        if vb_in:
            pos_col = pdf["positions_vb"].to_numpy()
            tfs = pdf["tf"].to_numpy(dtype=np.int64)
        else:
            pos_col = pdf["positions"].to_numpy()
            # tf == len(positions) by construction (A1 invariant)
            tfs = np.fromiter((len(p) for p in pos_col), dtype=np.int64, count=pos_col.size)
        impacts = _impact_np(tfs, dls, avgdl)
        n = doc_ids.size

        # --- block boundaries: term-run starts + every block_size-th row
        run_start = np.concatenate(([True], terms[1:] != terms[:-1]))
        run_start_idx = np.flatnonzero(run_start)
        # index of each row within its term run
        run_id = np.cumsum(run_start) - 1
        idx_in_run = np.arange(n) - run_start_idx[run_id]
        block_start = run_start | (idx_in_run % block_size == 0)
        bs = np.flatnonzero(block_start)                  # block start rows
        be = np.concatenate((bs[1:], [n]))                # block end rows
        # block_seq within its term run
        first_block_of_run = np.concatenate(([True], run_id[bs[1:]] != run_id[bs[:-1]]))
        fb_idx = np.flatnonzero(first_block_of_run)
        blk_run = np.cumsum(first_block_of_run) - 1
        block_seq = np.arange(bs.size) - fb_idx[blk_run]
        block_max = np.maximum.reduceat(impacts, bs)
        # per-block collection frequency: with df (=n_docs) this makes the
        # dictionary derivable from block METADATA alone — no logical-
        # postings pass at finalize
        block_cf = np.add.reduceat(tfs, bs)

        # --- doc gaps: delta with raw first value per block
        gaps = doc_ids.astype(np.uint64).copy()
        gaps[1:] = (doc_ids[1:] - doc_ids[:-1]).astype(np.uint64)
        gaps[bs] = doc_ids[bs].astype(np.uint64)

        # --- positions: per-posting delta+varbyte bytes. The upstream
        # kernel already emits exactly this when positions_vb=True (each
        # posting's encoding is self-contained: first value raw), so the
        # pack side just CONCATENATES byte slices; the legacy array input
        # is encoded here with identical semantics.
        if vb_in:
            p_mem = b"".join(pos_col)
            p_post_nb = np.fromiter((len(x) for x in pos_col), dtype=np.int64, count=n)
            p_post_off = np.concatenate(([0], np.cumsum(p_post_nb)))
        else:
            flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in pos_col]) \
                if n else np.empty(0, dtype=np.int64)
            doc_pos_start = np.concatenate(([0], np.cumsum(tfs)[:-1]))
            pdelta = flat.astype(np.uint64).copy()
            if flat.size:
                pdelta[1:] = (flat[1:] - flat[:-1]).astype(np.uint64)
                pdelta[doc_pos_start] = flat[doc_pos_start].astype(np.uint64)
            p_bytes, p_nb = vb_encode_with_lengths(pdelta)
            p_mem = p_bytes.tobytes()
            p_off = np.concatenate(([0], np.cumsum(p_nb)))
            # per-posting byte offsets from per-VALUE offsets
            pos_end = doc_pos_start + tfs
            p_post_off = np.concatenate((p_off[doc_pos_start], [p_off[-1]])) if n else np.zeros(1, dtype=np.int64)

        # --- group-level varbyte encodings + byte offsets
        g_bytes, g_nb = vb_encode_with_lengths(gaps)
        t_bytes, t_nb = vb_encode_with_lengths(tfs.astype(np.uint64))
        d_bytes, d_nb = vb_encode_with_lengths(dls.astype(np.uint64))
        g_off = np.concatenate(([0], np.cumsum(g_nb)))
        t_off = np.concatenate(([0], np.cumsum(t_nb)))
        d_off = np.concatenate(([0], np.cumsum(d_nb)))

        g_mem, t_mem, d_mem = (x.tobytes() for x in (g_bytes, t_bytes, d_bytes))
        rows = []
        for i in range(bs.size):
            lo, hi = int(bs[i]), int(be[i])
            rows.append((
                terms[lo],
                int(doc_shard),
                int(block_seq[i]),
                hi - lo,
                int(doc_ids[lo]),
                int(doc_ids[hi - 1]),
                float(block_max[i]),
                int(block_cf[i]),
                g_mem[g_off[lo]:g_off[hi]],
                t_mem[t_off[lo]:t_off[hi]],
                d_mem[d_off[lo]:d_off[hi]],
                p_mem[p_post_off[lo]:p_post_off[hi]],
            ))
        return pd.DataFrame(rows, columns=[f.name for f in PACKED_SCHEMA.fields])

    return _pack_group


def pack_postings(
    postings: DataFrame,
    doc_lens: DataFrame | None,
    stats: DataFrame,
    doc_shard_size: int = DOC_SHARD_SIZE,
    block_size: int = BLOCK_SIZE,
    n_partitions: int | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """Logical postings -> packed blocks.

    Plan at scale: postings⋈doc_lens (both keyed on doc_id) is the ONLY
    join — pass doc_lens=None if postings already carry a `dl` column
    (the resumable build materializes it once); the 1-row stats broadcast;
    then ONE shuffle on (term, doc_shard) — the salted repartition — into
    the Arrow packer. No dictionary join: block maxima are idf-free.
    """
    # avgdl rides into the kernel via closure (ONE tiny driver-side job),
    # not as a crossJoin column repeated on every posting row — 8 bytes x
    # 10^10 rows of redundant shuffle traffic otherwise. Callers that
    # already collected the stats row pass avgdl= to skip even that job.
    if avgdl is None:
        avgdl = float(stats.select("avgdl").collect()[0]["avgdl"])
    # postings from build_postings carry dl already (free in the worker) —
    # join doc_lens only for inputs that lack it
    enriched = (
        postings if (doc_lens is None or "dl" in postings.columns)
        else postings.join(doc_lens, "doc_id")
    )
    pos_cols = (["tf", "positions_vb"] if "positions_vb" in enriched.columns
                else ["positions"])
    enriched = (
        enriched
        .select(
            "term", "doc_id", "dl", *pos_cols,
            (F.col("doc_id") / F.lit(doc_shard_size)).cast("int").alias("doc_shard"),
            F.pmod(F.xxhash64("term"), F.lit(N_PACK_BUCKETS)).cast("int").alias("pack_bucket"),
        )
    )
    # ONE exchange: hash-partition on (pack_bucket, pack_slice), where
    # pack_slice = xxhash64(doc_shard) % PACK_SLICES sub-divides each
    # bucket. HashPartitioning(bucket, slice) satisfies applyInPandas'
    # ClusteredDistribution(bucket, slice, shard) (subset of the grouping
    # keys), so Catalyst inserts NO second shuffle. Why the slice: a Zipf
    # corpus makes some buckets several times heavier than average — with
    # one partition per bucket the hot bucket is the last-wave straggler
    # that caps scaling; slicing by doc_shard hash splits every bucket's
    # weight PACK_SLICES ways (the doc-shard salt again, one level up).
    # And because pack_bucket == term_bucket (same xxhash64(term) % 64,
    # N_PACK_BUCKETS == N_TERM_BUCKETS), each pack task still holds ~one
    # bucket, so the downstream partitionBy(term_bucket) write fans out to
    # ~one directory per task with no repartition. Net: the full packed
    # payload crosses the wire once, not twice, with bounded skew.
    assert N_PACK_BUCKETS == N_TERM_BUCKETS
    enriched = enriched.withColumn(
        "pack_slice", F.pmod(F.xxhash64("doc_shard"), F.lit(PACK_SLICES)).cast("int")
    )
    # width default = one task per (bucket, slice): right for the WRITE
    # path (each task owns ~one term_bucket dir). In-memory callers (the
    # build+query-in-one-shot bench/driver queries) pass a smaller
    # n_partitions — 512 near-empty Arrow tasks are pure scheduling
    # overhead on a fixture-sized corpus; hash partitioning keeps groups
    # intact at ANY width.
    enriched = enriched.repartition(
        n_partitions or N_PACK_BUCKETS * PACK_SLICES, "pack_bucket", "pack_slice"
    )
    packed = enriched.groupBy("pack_bucket", "pack_slice", "doc_shard").applyInPandas(
        _make_pack_fn(block_size, avgdl), PACKED_SCHEMA
    )
    return packed.withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)).cast("int")
    )


def dictionary_from_packed(packed: DataFrame, stats: DataFrame) -> DataFrame:
    """The FULL dictionary (term, df, cf, max_score, max_impact,
    term_bucket) from packed block METADATA alone: blocks partition each
    term's postings exactly, so df = Σ n_docs and cf = Σ block_cf are
    exact — no logical-postings pass, no second tokenization. The groupBy
    runs over |blocks| rows (~|postings|/block_size)."""
    agg = packed.groupBy("term").agg(
        F.sum("n_docs").cast("long").alias("df"),
        F.sum("block_cf").cast("long").alias("cf"),
        F.max("block_max_impact").alias("max_impact"),
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    return (
        agg.crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "term", "df", "cf",
            (idf * F.col("max_impact")).alias("max_score"),
            "max_impact",
            F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)).cast("int").alias("term_bucket"),
        )
    )


def dictionary_with_max_score(dictionary: DataFrame, packed: DataFrame, stats: DataFrame) -> DataFrame:
    """Attach WAND upper bounds: max_score(term) = idf(term) * max impact
    over blocks. Free: derived from block metadata, no extra corpus pass."""
    ub = packed.groupBy("term").agg(F.max("block_max_impact").alias("max_impact"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    return (
        dictionary.join(ub, "term", "left")
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "term", "df", "cf",
            (idf * F.coalesce("max_impact", F.lit(0.0))).alias("max_score"),
            F.coalesce("max_impact", F.lit(0.0)).alias("max_impact"),
            # denormalized partition key: the query path learns which
            # term_bucket files to prune from the SAME dictionary lookup
            # (saves a driver round-trip per query)
            F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)).cast("int").alias("term_bucket"),
        )
    )
