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
