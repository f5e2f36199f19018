"""packed_sketch_diff union-envelope block-skip evidence (round 5).

The sketch-diff serving form decodes neighbor blocks bounded by the
UNION of BOTH targets' doc-shard envelopes. At fixture scale one shard
covers everything, so — like jobs/bench_colloc.py, whose corpus recipe
this reuses — a larger deterministic corpus puts each target in its own
narrow doc-id range and measures:

  - block parquet files actually read (runtime input_file_name()) vs
    total on disk — the union keep-set touches ~2 shards out of ~100;
  - packed_sketch_diff == corpus-path sketch_diff (the pruned decode
    provably loses no shared collocate);
  - wall time pruned vs corpus scan.

Corpus: doc i = 30 tokens `w{(i*31 + j*7) % 500}`; target A appended to
docs [a_lo, a_lo + n), target B to [b_lo, b_lo + n) — disjoint ranges,
same rotating vocabulary, so shared collocates exist on both sides.

  python jobs/bench_sketch.py --out BENCH/sketch_prune.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TARGET_A, TARGET_B = "rareterma", "raretermb"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--a-lo", type=int, default=30_000)
    ap.add_argument("--b-lo", type=int, default=70_000)
    ap.add_argument("--target-n", type=int, default=500)
    ap.add_argument("--doc-shard-size", type=int, default=1024)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH/sketch_prune.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fastmorph_spark.index import build_dictionary, build_postings
    from fastmorph_spark.index.io import read_index, write_index
    from fastmorph_spark.search.collocation import packed_sketch_diff, sketch_diff
    from fastmorph_spark.search.packed import _apply_keep, pruned_blocks
    from fastmorph_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cores}]",
                      shuffle_partitions=2 * args.cores,
                      app_name="fastmorph-bench-sketch")
    spark.sparkContext.setLogLevel("ERROR")

    base = F.expr(
        "concat_ws(' ', transform(sequence(1, 30), "
        "j -> concat('w', pmod(id * 31 + j * 7, 500))))"
    )

    def in_range(lo):
        return (F.col("id") >= lo) & (F.col("id") < lo + args.target_n)

    docs = spark.range(args.n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(in_range(args.a_lo), F.concat(base, F.lit(" " + TARGET_A)))
        .when(in_range(args.b_lo), F.concat(base, F.lit(" " + TARGET_B)))
        .otherwise(base).alias("text"),
    ).persist()
    docs.count()

    work = tempfile.mkdtemp(prefix="fm_sketch_")
    idx_path = os.path.join(work, "idx")
    t0 = time.perf_counter()
    write_index(spark, docs, idx_path, doc_shard_size=args.doc_shard_size,
                block_size=128)
    build_sec = time.perf_counter() - t0
    idx = read_index(spark, idx_path)

    # --- file-level evidence on the UNION keep-set
    total_files = idx.postings.select(
        F.input_file_name().alias("f")).distinct().count()
    tgt_blocks = pruned_blocks(idx, [TARGET_A, TARGET_B])
    keep = tgt_blocks.groupBy("doc_shard").agg(
        F.min("first_doc").alias("_lo"), F.max("max_doc").alias("_hi"))
    kept = _apply_keep(
        idx.postings.withColumn("f", F.input_file_name()), keep)
    read_files = kept.select("f").distinct().count()
    kept_shards = keep.count()
    total_shards = idx.postings.select("doc_shard").distinct().count()

    # --- result equality + wall time
    t0 = time.perf_counter()
    packed_rows = [tuple(r) for r in packed_sketch_diff(
        idx, TARGET_A, TARGET_B, window=3, min_count=2, k=20).collect()]
    packed_sec = time.perf_counter() - t0
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    t0 = time.perf_counter()
    corpus_rows = [tuple(r) for r in sketch_diff(
        postings, dictionary, TARGET_A, TARGET_B,
        window=3, min_count=2, k=20).collect()]
    corpus_sec = time.perf_counter() - t0

    report = {
        "n_docs": args.n_docs,
        "target_docs_each": args.target_n,
        "doc_shard_size": args.doc_shard_size,
        "index_build_sec": round(build_sec, 2),
        "total_doc_shards": int(total_shards),
        "kept_doc_shards": int(kept_shards),
        "total_block_files": int(total_files),
        "block_files_read": int(read_files),
        "files_read_fraction": round(read_files / total_files, 4),
        "packed_rows": len(packed_rows),
        "results_equal_corpus_path": packed_rows == corpus_rows,
        "packed_sketch_sec": round(packed_sec, 2),
        "corpus_scan_sketch_sec": round(corpus_sec, 2),
        "note": ("union of both targets' doc-shard envelopes; equality vs "
                 "the corpus-path sketch_diff proves the skipped blocks "
                 "held no shared collocates"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
