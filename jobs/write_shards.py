"""spark-submit entry point: materialize token-budget training shards.

The last mile of the LLM-data pipeline this engine's ops feed: take the
corpus, subtract the hygiene drop list (dedup + decontamination +
span-dup — ops/decontam.pipeline_drop_list's output, or any (doc_id,
...) frame), assign docs to ~budget-token shards (ops/text.pack_shards —
the two-phase distributed prefix sum; --bpe switches the budget unit to
the pinned BPE token counts), and write the shards as a DISTRIBUTED
partitioned dataset:

  spark-submit --py-files dist/fts.zip jobs/write_shards.py \
      --docs docs:/root/testdata/sf0.01 --out /tmp/shards \
      --budget 2000 [--bpe] [--drop /tmp/drop_list] [--c4-clean] \
      [--format jsonl]

``--c4-clean`` additionally applies the pinned C4 line-keep rule
(ops/quality.c4_clean_text — a row-local HOF rewrite, no extra pass
shape) before budgeting, dropping docs whose every line fails.

Output layout: one directory per shard (`shard_id=N/`, Spark value
partitioning), rows sorted by doc_id within each shard's files — a
trainer streams shards in name order and docs in corpus order, no
driver-side materialization anywhere (the one collect in pack_shards is
its 1-row max(doc_id)). Formats: parquet (default; schema doc_id,
n_tokens, text) or jsonl (text format for tokenizer-side pipelines).

Prints ONE JSON summary line: {"n_docs": ..., "n_dropped": ...,
"n_shards": ..., "out": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="docs:<sf_dir> (driver fixture) or a corpus path")
    ap.add_argument("--out", required=True)
    ap.add_argument("--budget", type=int, default=2000)
    ap.add_argument("--bpe", action="store_true",
                    help="budget in pinned BPE tokens (ops/text.BPE_MERGES) "
                         "instead of word counts")
    ap.add_argument("--drop", help="parquet path of a (doc_id, ...) drop "
                                   "list to anti-join (e.g. "
                                   "pipeline_drop_list output)")
    ap.add_argument("--c4-clean", action="store_true",
                    help="apply the pinned C4 line-keep rule "
                         "(ops/quality.c4_clean_text) to every doc before "
                         "budgeting/packing; docs whose every line drops "
                         "are removed (counted in n_dropped)")
    ap.add_argument("--format", choices=("parquet", "jsonl"),
                    default="parquet")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from fastmorph_spark.ops.text import bpe_count_expr, pack_shards
    from fastmorph_spark.sources import read_corpus, read_documents

    spark = SparkSession.builder.appName("fastmorph-write-shards").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if args.docs.startswith("docs:"):
        docs = read_documents(spark, args.docs.split(":", 1)[1]) \
            .select("doc_id", "text")
    else:
        # contract corpus shape (repo,path,commit,lang,content):
        # deterministic dense doc_ids exactly as jobs/build_index.py
        # assigns them, so a drop list built against the indexed corpus
        # addresses the same ids here
        from fastmorph_spark.sources import with_doc_ids

        docs = with_doc_ids(read_corpus(spark, args.docs)) \
            .select("doc_id", F.col("content").alias("text"))
    n_total = docs.count()
    n_dropped = 0
    if args.drop:
        drop = spark.read.parquet(args.drop).select("doc_id").distinct()
        # broadcast anti-join: a drop list is decisions, not a corpus
        docs = docs.join(F.broadcast(drop), "doc_id", "left_anti")
        n_dropped = n_total - docs.count()

    if args.c4_clean:
        # row-local rewrite BEFORE counting/packing: shard text and the
        # token budget both see the post-cleaning bytes
        from fastmorph_spark.ops.quality import c4_clean_text

        before = n_total - n_dropped
        docs = docs.withColumn("text", c4_clean_text("text")) \
            .filter(F.length("text") > 0)
        n_dropped += before - docs.count()

    counts = bpe_count_expr("text") if args.bpe else None
    shards = pack_shards(docs, args.budget, counts=counts)
    out = (
        docs.join(shards, "doc_id")
        .repartition(F.col("shard_id"))
        .sortWithinPartitions("shard_id", "doc_id")
    )
    if args.format == "parquet":
        out.select("shard_id", "doc_id", "n_tokens", "text") \
            .write.mode("overwrite").partitionBy("shard_id") \
            .parquet(args.out)
    else:
        out.select("shard_id", F.to_json(F.struct("doc_id", "n_tokens",
                                                  "text")).alias("value")) \
            .write.mode("overwrite").partitionBy("shard_id") \
            .text(args.out)
    n_shards = shards.agg(F.countDistinct("shard_id")).collect()[0][0]
    print(json.dumps({"n_docs": n_total - n_dropped, "n_dropped": n_dropped,
                      "n_shards": int(n_shards or 0), "out": args.out}))


if __name__ == "__main__":
    main()
