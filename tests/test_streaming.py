"""§2.9 — incremental (streaming) indexing: AvailableNow ingest + exactly-
once re-drain + finalize produces a search-identical index."""

from __future__ import annotations

import pytest

from fastmorph_spark.index.io import read_index
from fastmorph_spark.search.wand import search_wand
from fastmorph_spark.sources import read_documents
from fastmorph_spark.streaming import finalize_from_logical, stream_ingest
from tests.conftest import SF0001
from tests.oracle_bm25 import OracleIndex, load_documents


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    src = str(base / "src")
    out = str(base / "idx")
    ckpt = str(base / "ckpt")
    docs = read_documents(spark, SF0001).select("doc_id", "text", "lang")
    # arrival in 3 chunks (distinct files)
    for i in range(3):
        docs.filter((docs.doc_id % 3) == i).coalesce(1).write.mode("append").parquet(src)
    q = stream_ingest(spark, src, out, ckpt)
    q.awaitTermination(120)
    return src, out, ckpt


def test_ingest_complete_and_exactly_once(spark, streamed):
    src, out, ckpt = streamed
    p = spark.read.parquet(f"{out}/postings_logical_stream")
    n_first = p.count()
    assert p.select("doc_id").distinct().count() == 500
    assert p.select("stream_batch").distinct().count() >= 1
    # re-drain with the same checkpoint: no new data -> no duplicates
    q = stream_ingest(spark, src, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(f"{out}/postings_logical_stream").count() == n_first


def test_finalized_stream_index_rank_identical(spark, streamed):
    _, out, _ = streamed
    finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    idx = read_index(spark, out)
    oracle = OracleIndex(load_documents(SF0001))
    for q in ["fast hash join", "dup", "the"]:
        got = [r["doc_id"] for r in search_wand(idx, q, k=10).collect()]
        assert got == [d for d, _ in oracle.topk(q, 10)], q


def test_finalize_idempotent(spark, streamed):
    _, out, _ = streamed
    finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    a = sorted(
        (r["term"], r["doc_shard"], r["block_seq"], bytes(r["doc_gaps"]).hex())
        for r in spark.read.parquet(f"{out}/postings").collect()
    )
    finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    b = sorted(
        (r["term"], r["doc_shard"], r["block_seq"], bytes(r["doc_gaps"]).hex())
        for r in spark.read.parquet(f"{out}/postings").collect()
    )
    assert a == b


def test_streaming_dedup_exact_across_microbatches(spark, tmp_path_factory):
    """dropDuplicates state spans micro-batches: a doc first seen in file
    1 is dropped when byte-identical content arrives in file 2 (per-batch
    dedup would pass it through). maxFilesPerTrigger=1 forces one file
    per micro-batch."""
    from fastmorph_spark.streaming.dedup import streaming_dedup_exact

    base = tmp_path_factory.mktemp("sdedup")
    src, out, ckpt = str(base / "src"), str(base / "out"), str(base / "ckpt")
    schema = "doc_id long, text string"
    b1 = [(1, "alpha beta gamma"), (2, "delta epsilon zeta")]
    b2 = [(3, "alpha beta gamma"),        # dup of doc 1, OTHER batch
          (4, "delta epsilon zeta"),      # dup of doc 2
          (5, "eta theta iota")]          # fresh
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    deduped = streaming_dedup_exact(stream)
    q = deduped.writeStream.format("parquet").option("path", out) \
        .option("checkpointLocation", ckpt) \
        .trigger(availableNow=True).outputMode("append").start()
    q.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    kept_texts = sorted(r["text"] for r in rows)
    assert kept_texts == ["alpha beta gamma", "delta epsilon zeta", "eta theta iota"]
    # first-seen semantics: 3/4 lost to 1/2 (files arrive in write order)
    assert {r["doc_id"] for r in rows} == {1, 2, 5}


def test_streaming_quality_gate(spark, tmp_path_factory):
    """The gate equals the batch quality_score filter (shared expression)."""
    from pyspark.sql import functions as F

    from fastmorph_spark.ops.text import quality_score
    from fastmorph_spark.streaming.dedup import streaming_quality_gate
    from tests.conftest import SF0001

    docs = read_documents(spark, SF0001).select("doc_id", "text")
    want = {
        r["doc_id"]
        for r in quality_score(docs).filter(F.col("quality") >= 0.5).collect()
    }
    got = {r["doc_id"] for r in streaming_quality_gate(docs, 0.5).collect()}
    assert got == want and 0 < len(got) < docs.count()
