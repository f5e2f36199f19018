"""Trigram index for SUBSTRING and REGEX search over source code
(round 5 code-search wave).

Token inverted indexes answer token-boundary queries; a code-search
engine must also answer `grep`-shaped SUBSTRING queries ('Response('
crosses an identifier/punctuation boundary, so no tokenizer ever emits
it) and regular expressions. The public design for that at scale is the
trigram index — Google Code Search and zoekt both index every 3-byte
window of the content and answer a query by intersecting the posting
lists of the query's trigrams, then verifying candidates exactly
[LIT: R. Cox, "Regular Expression Matching with a Trigram Index"
(swtch.com/~rsc/regexp/regexp4.html); zoekt design doc].

Spark-first shape:

- extraction is a pure-Catalyst higher-order function (sequence ->
  transform(substring) -> array_distinct -> explode): WholeStageCodegen
  over the corpus scan, zero Python, one shuffle (the distinct) to the
  posting form;
- the FOLDED index (lowercased text) serves both case modes: if raw
  text contains q then folded text contains lower(q), so folded-trigram
  candidates are a superset of case-sensitive matches and the exact
  verify restores case sensitivity — one index, not two (zoekt reaches
  the same one-index answer from the other direction, by expanding
  query trigrams over case at query time);
- the at-rest layout mirrors the token index discipline: varbyte
  doc-gap blobs per (trigram, doc_shard), hash-partitioned by
  ``tg_bucket`` so a query's dictionary-known trigrams prune to
  |trigrams| buckets of N_TRIGRAM_BUCKETS (PartitionFilters) with the
  trigram equality pushed into the parquet scan (PushedFilters). The
  doc_shard split bounds the hottest trigram's blob ('def' occurs in
  essentially every source file — one row per 2^20 docs, never one
  unbounded row), the same skew-by-construction argument as
  index/pack.py's doc-shard salt.

Scale check at 10^12 files: posting build is scan -> explode ->
groupBy((bucket, trigram, shard)) — one shuffle whose key space is
~50k trigrams x shards, hot keys split by shard; queries touch only
the chosen trigrams' buckets and decode |chosen| x |shards| blobs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastmorph_spark.constants import DOC_SHARD_SIZE
from fastmorph_spark.index.varbyte import decode_doc_gaps, encode_doc_gaps

N_TRIGRAM_BUCKETS = 64  # hash(trigram) % N file-layout partitions (zoekt
#                         shards by repo; partition-per-trigram-hash is the
#                         columnar-scan analog that lets Catalyst prune)

_BLOB_SCHEMA = "tg_bucket int, trigram string, doc_shard long, n_docs long, doc_gaps binary"


def trigram_expr(col: F.Column) -> F.Column:
    """All distinct 3-char windows of ``col``, lowercase-folded — pure
    Catalyst (sequence/transform/substring are codegen'd; no UDF). Texts
    shorter than 3 chars have no trigrams (empty array, not an error)."""
    t = F.lower(F.coalesce(col, F.lit("")))
    grams = F.transform(
        F.sequence(F.lit(1), F.length(t) - F.lit(2)),
        lambda i: t.substr(i, F.lit(3)),
    )
    # sequence(1, n) with n < 1 would step BACKWARD (Spark infers step -1),
    # so gate on length explicitly rather than trusting the bounds
    return F.when(F.length(t) >= 3, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def trigrams_py(q: str) -> list[str]:
    """Python twin of trigram_expr for the (short) query string: distinct
    folded 3-grams in first-occurrence order."""
    f = q.lower()
    seen: dict[str, None] = {}
    for i in range(len(f) - 2):
        seen.setdefault(f[i : i + 3], None)
    return list(seen)


@dataclass
class TrigramIndex:
    """postings: (tg_bucket, trigram, doc_id) distinct rows — the flat
    correctness form. blobs: (tg_bucket, trigram, doc_shard, n_docs,
    doc_gaps) varbyte doc-gap rows — the at-rest form (None until
    pack_trigrams). dictionary: (trigram, tg_bucket, df) — drives
    rarest-first trigram selection at query time, and carrying the
    bucket here makes that selection ONE |q|-row lookup (df AND
    partition list in the same collect)."""

    postings: DataFrame
    dictionary: DataFrame
    blobs: DataFrame | None = None


def tg_bucket_col(trigram_col: str = "trigram") -> F.Column:
    return F.pmod(F.xxhash64(trigram_col), F.lit(N_TRIGRAM_BUCKETS)).cast("int")


def build_trigram_index(
    corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> TrigramIndex:
    """Flat trigram postings + df dictionary from one corpus scan.

    explode(array_distinct) already emits each (doc, trigram) once, so
    the groupBy below is a pure re-key (no distinct needed); df is an
    exact document frequency because of the same per-doc dedup."""
    flat = corpus.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(trigram_expr(F.col(text_col))).alias("trigram"),
    )
    postings = flat.select(
        tg_bucket_col().alias("tg_bucket"), "trigram", "doc_id"
    )
    dictionary = flat.groupBy("trigram").agg(
        F.count("*").cast("long").alias("df")
    ).select("trigram", tg_bucket_col().alias("tg_bucket"), "df")
    return TrigramIndex(postings=postings, dictionary=dictionary)


def pack_trigrams(idx: TrigramIndex, doc_shard_size: int = DOC_SHARD_SIZE) -> TrigramIndex:
    """Add the at-rest varbyte form: per (trigram, doc_shard) sorted
    doc-gap blobs. ONE exchange (the applyInPandas grouping); the numpy
    kernel loops over GROUPS, not doc ids (encode_doc_gaps is
    vectorized), the doc-shard split caps any group at doc_shard_size."""

    def encode(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(pdf["doc_id"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {
                "tg_bucket": [key[0]],
                "trigram": [key[1]],
                "doc_shard": [key[2]],
                "n_docs": [len(ids)],
                "doc_gaps": [encode_doc_gaps(ids)],
            }
        )

    with_shard = idx.postings.withColumn(
        "doc_shard", (F.col("doc_id") / F.lit(doc_shard_size)).cast("long")
    )
    blobs = with_shard.groupBy("tg_bucket", "trigram", "doc_shard").applyInPandas(
        encode, _BLOB_SCHEMA
    )
    return TrigramIndex(postings=idx.postings, dictionary=idx.dictionary, blobs=blobs)


def decode_blob_docs(blobs: DataFrame) -> DataFrame:
    """blobs -> flat (trigram, doc_id): Arrow-batched decode, loop over
    BLOBS only (decode_doc_gaps is numpy over the byte array)."""

    def decode(batches):
        for pdf in batches:
            outs = []
            for trig, buf in zip(pdf["trigram"], pdf["doc_gaps"]):
                ids = decode_doc_gaps(bytes(buf))
                outs.append(pd.DataFrame({"trigram": trig, "doc_id": ids}))
            yield pd.concat(outs) if outs else pd.DataFrame(
                {"trigram": pd.Series(dtype=str), "doc_id": pd.Series(dtype=np.int64)}
            )

    return blobs.mapInPandas(decode, "trigram string, doc_id long")


def write_trigram_index(idx: TrigramIndex, path: str) -> None:
    """At-rest layout: blobs partitioned by tg_bucket (partition pruning
    unit) + the dictionary beside them. Requires pack_trigrams first —
    the flat form is an in-session convenience, the packed form is the
    only thing worth 100 TB of disk."""
    if idx.blobs is None:
        raise ValueError("pack_trigrams(idx) before write_trigram_index")
    idx.blobs.write.mode("overwrite").partitionBy("tg_bucket").parquet(
        f"{path}/trigrams"
    )
    idx.dictionary.write.mode("overwrite").parquet(f"{path}/tg_dictionary")


def read_trigram_index(spark: SparkSession, path: str) -> TrigramIndex:
    """Read back the at-rest form. The flat postings view decodes the
    WHOLE blob scan — it exists for tests/parity; query paths must
    filter ``blobs`` first (search/substring._candidate_doc_ids does:
    tg_bucket PartitionFilters + trigram PushedFilters reach parquet
    because the filter sits BELOW the Arrow decode)."""
    blobs = spark.read.parquet(f"{path}/trigrams")
    dictionary = spark.read.parquet(f"{path}/tg_dictionary")
    postings = decode_blob_docs(blobs).select(
        tg_bucket_col().alias("tg_bucket"), "trigram", "doc_id"
    )
    return TrigramIndex(postings=postings, dictionary=dictionary, blobs=blobs)
