"""ANN LSH path: multi-probe recall, materialized bucket layout with
partition pruning, and the banded near-dup candidate generation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastmorph_spark.ops.similarity import (
    bucketed_topk,
    cosine_neardup_pairs,
    cosine_topk,
    lsh_bucketed_topk,
    lsh_recall_at_k,
    query_buckets,
    write_bucketed_embeddings,
)

SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF001}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qv():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF001}/embeddings.parquet", columns=["vec_id", "embedding"])
    row = dict(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))
    return [float(x) for x in row[0]]


def test_query_buckets_multiprobe(qv):
    probes = query_buckets(qv, n_planes=6, probe_hamming=1)
    assert len(probes) == 7  # base + 6 single-bit flips
    base = query_buckets(qv, 6, 0)[0]
    assert all(bin(p ^ base).count("1") <= 1 for p in probes)
    assert query_buckets(qv, 6, 2) == sorted(set(query_buckets(qv, 6, 2)))
    assert len(query_buckets(qv, 6, 2)) == 1 + 6 + 15


def test_lsh_topk_subset_of_probed_buckets(spark, emb, qv):
    """Every LSH hit must come from a probed bucket, and its self-recall
    must include vec 0 (the query vector itself lives in the base bucket)."""
    got = lsh_bucketed_topk(emb, qv, k=10, n_planes=6, probe_hamming=1).collect()
    assert len(got) == 10
    assert got[0]["vec_id"] == 0  # self-match tops the list


def test_recall_reported_and_sane(spark, emb, qv):
    row = lsh_recall_at_k(emb, qv, k=10, n_planes=6, probe_hamming=1).collect()[0]
    assert row["k"] == 10
    assert 0 <= row["n_hits"] <= 10
    assert row["recall"] == round(row["n_hits"] / 10.0, 6)
    # multi-probe must not LOSE recall vs single-bucket
    row0 = lsh_recall_at_k(emb, qv, k=10, n_planes=6, probe_hamming=0).collect()[0]
    assert row["n_hits"] >= row0["n_hits"]


def test_bucket_layout_partition_pruned(spark, emb, qv, tmp_path):
    """The materialized layout must let a probe read ONLY its buckets'
    files (partition pruning — the 10^11-vector story)."""
    out = str(tmp_path / "buckets")
    write_bucketed_embeddings(emb, out, n_planes=6)
    probes = query_buckets(qv, 6, 1)
    pruned = spark.read.parquet(out).filter(F.col("bucket").isin(probes))
    files = pruned.select(F.input_file_name()).distinct().collect()
    import re

    buckets_touched = {int(re.search(r"bucket=(\d+)", r[0]).group(1)) for r in files}
    assert buckets_touched <= set(probes)
    all_files = spark.read.parquet(out).select(F.input_file_name()).distinct().count()
    assert len(files) < all_files
    # and the probed top-k equals the in-memory LSH top-k
    got = bucketed_topk(spark, out, qv, k=10, n_planes=6, probe_hamming=1).collect()
    want = lsh_bucketed_topk(emb, qv, k=10, n_planes=6, probe_hamming=1).collect()
    assert [(r["vec_id"], r["cos"]) for r in got] == [(r["vec_id"], r["cos"]) for r in want]


def test_banded_neardup_no_cartesian_and_subset_of_exact(spark, emb):
    pairs = cosine_neardup_pairs(emb, threshold=0.45, bands=6, planes_per_band=2)
    assert "CartesianProduct" not in pairs._jdf.queryExecution().executedPlan().toString()
    got = {(r["vec_a"], r["vec_b"]) for r in pairs.collect()}
    # exact all-pairs reference
    e = emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("v"))
    from fastmorph_spark.ops.similarity import _dot, _norm

    l, r = e.alias("l"), e.alias("r")
    cos = _dot(F.col("l.v"), F.col("r.v")) / (_norm(F.col("l.v")) * _norm(F.col("r.v")))
    exact = {
        (x["a"], x["b"])
        for x in l.join(r, F.col("l.vid") < F.col("r.vid"))
        .select(F.col("l.vid").alias("a"), F.col("r.vid").alias("b"), cos.alias("c"))
        .filter(F.col("c") >= 0.45)
        .collect()
    }
    assert got <= exact
    # banded recall at r=2, L=6 and cos>=0.45 is ~0.96 expected; demand most
    assert len(got) >= int(0.7 * len(exact))
