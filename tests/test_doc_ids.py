"""with_doc_ids: deterministic dense rank over (repo, path, commit),
identical under any partitioning, with NO global single-reducer window."""

from __future__ import annotations

from pyspark.sql import functions as F

from fastmorph_spark.sources import with_doc_ids


def _corpus(spark, n=500, n_repos=37):
    return spark.range(n).select(
        F.concat(F.lit("repo-"), (F.col("id") % n_repos).cast("string")).alias("repo"),
        F.concat(F.lit("src/f"), F.col("id").cast("string"), F.lit(".py")).alias("path"),
        F.sha2(F.col("id").cast("string"), 256).substr(1, 12).alias("commit"),
        F.lit("py").alias("lang"),
        F.concat(F.lit("content "), F.col("id").cast("string")).alias("content"),
    )


def test_ids_are_global_sorted_rank(spark):
    df = _corpus(spark, 300)
    got = with_doc_ids(df).select("repo", "path", "commit", "doc_id").collect()
    keys = sorted((r["repo"], r["path"], r["commit"]) for r in got)
    want = {k: i for i, k in enumerate(keys)}
    assert all(want[(r["repo"], r["path"], r["commit"])] == r["doc_id"] for r in got)
    ids = sorted(r["doc_id"] for r in got)
    assert ids == list(range(300))  # dense, 0-based


def test_ids_identical_under_any_partitioning(spark):
    df = _corpus(spark, 400)
    ref = {
        (r["repo"], r["path"]): r["doc_id"]
        for r in with_doc_ids(df.coalesce(1)).collect()
    }
    for parts in (3, 17):
        got = {
            (r["repo"], r["path"]): r["doc_id"]
            for r in with_doc_ids(df.repartition(parts)).collect()
        }
        assert got == ref


def test_no_global_unpartitioned_window(spark):
    """The plan must not contain a window over a single global partition
    (the 10^12-row single-reducer sort)."""
    plan = with_doc_ids(_corpus(spark, 50))._jdf.queryExecution().optimizedPlan().toString()
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        # every window spec must carry a partition column before the sort
        # spec entries; the per-repo rank has `repo#...`; the offsets
        # cumsum windows over |repos| rows, which is allowed only because
        # its input is the tiny groupBy(repo) aggregate — detect the bad
        # case: a window whose spec references path/commit sort WITHOUT a
        # partitioning column
        if "path" in spec and "repo" not in spec.split("ASC")[0]:
            raise AssertionError(f"unpartitioned doc-level window: {spec}")


def test_existing_doc_id_kept(spark):
    df = _corpus(spark, 10).withColumn("doc_id", F.lit(7))
    assert with_doc_ids(df).filter(F.col("doc_id") != 7).count() == 0
