"""Packed-collocation block-skip evidence (round 4, SURVEY §2.4 A8).

At fixture scale (500 docs = one doc shard) the target's doc-shard
envelope covers everything, so the driver query can't show the pruning.
This job builds a LARGER deterministic corpus where the target term is
confined to a narrow doc-id range — the regime the envelope pruning
serves (a rare/bursty term at 100 TB) — writes a real at-rest index, and
measures:

  - block parquet files actually read by the neighbor-side scan
    (runtime `input_file_name()`, NOT `.inputFiles()` — the latter lists
    the pre-pruning FileIndex) vs the total block files on disk;
  - packed_collocations == corpus-path collocations on the same corpus
    (result equality, so the pruned scan provably loses nothing);
  - wall time for the pruned packed profile vs the corpus-scan profile.

Corpus (no RNG, reproducible byte-for-byte): doc i = 30 tokens
`w{(i*31 + j*7) % 500}` for j in 1..30, plus the target token
`rareterm` appended to docs in [target_lo, target_lo + target_n).

  python jobs/bench_colloc.py --out BENCH/colloc_prune.json
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

TARGET = "rareterm"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--target-lo", type=int, default=50_000)
    ap.add_argument("--target-n", type=int, default=500)
    ap.add_argument("--doc-shard-size", type=int, default=1024)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH/colloc_prune.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fastmorph_spark.index import build_dictionary, build_postings
    from fastmorph_spark.index.io import read_index, write_index
    from fastmorph_spark.search.collocation import collocations, packed_collocations
    from fastmorph_spark.search.packed import _apply_keep, pruned_blocks
    from fastmorph_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cores}]",
                      shuffle_partitions=2 * args.cores,
                      app_name="fastmorph-bench-colloc")
    spark.sparkContext.setLogLevel("ERROR")

    # vocab 500 so window neighbors of the target REPEAT across its 500
    # docs (cooc >= min_count) — a 0-row profile would make the equality
    # check vacuous
    base = F.expr(
        "concat_ws(' ', transform(sequence(1, 30), "
        "j -> concat('w', pmod(id * 31 + j * 7, 500))))"
    )
    docs = spark.range(args.n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.col("id") >= args.target_lo)
            & (F.col("id") < args.target_lo + args.target_n),
            F.concat(base, F.lit(" " + TARGET)),
        ).otherwise(base).alias("text"),
    ).persist()
    docs.count()

    work = tempfile.mkdtemp(prefix="fm_colloc_")
    idx_path = os.path.join(work, "idx")
    t0 = time.perf_counter()
    write_index(spark, docs, idx_path, doc_shard_size=args.doc_shard_size,
                block_size=128)
    build_sec = time.perf_counter() - t0
    idx = read_index(spark, idx_path)

    # --- file-level evidence: neighbor blocks the pruned scan touches
    total_files = idx.postings.select(
        F.input_file_name().alias("f")).distinct().count()
    tgt_blocks = pruned_blocks(idx, [TARGET])
    keep = tgt_blocks.groupBy("doc_shard").agg(
        F.min("first_doc").alias("_lo"), F.max("max_doc").alias("_hi"))
    # tag the filename on the SCAN side before the (multi-source) join —
    # input_file_name() is undefined after joining two file relations
    kept = _apply_keep(
        idx.postings.withColumn("f", F.input_file_name()), keep)
    read_files = kept.select("f").distinct().count()
    kept_shards = keep.count()
    total_shards = idx.postings.select("doc_shard").distinct().count()

    # --- result equality + wall time: packed (pruned) vs corpus scan
    t0 = time.perf_counter()
    packed_rows = [tuple(r) for r in packed_collocations(
        idx, TARGET, window=3, min_count=2, k=20).collect()]
    packed_sec = time.perf_counter() - t0
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    t0 = time.perf_counter()
    corpus_rows = [tuple(r) for r in collocations(
        postings, dictionary, TARGET, window=3, min_count=2, k=20).collect()]
    corpus_sec = time.perf_counter() - t0

    report = {
        "n_docs": args.n_docs,
        "target_docs": args.target_n,
        "doc_shard_size": args.doc_shard_size,
        "index_build_sec": round(build_sec, 2),
        "total_doc_shards": int(total_shards),
        "kept_doc_shards": int(kept_shards),
        "total_block_files": int(total_files),
        "block_files_read": int(read_files),
        "files_read_fraction": round(read_files / total_files, 4),
        "packed_rows": len(packed_rows),
        "results_equal_corpus_path": packed_rows == corpus_rows,
        "packed_profile_sec": round(packed_sec, 2),
        "corpus_scan_profile_sec": round(corpus_sec, 2),
        "note": ("files_read counted with runtime input_file_name() on the "
                 "envelope-kept neighbor scan; equality vs the corpus-path "
                 "operator proves the skipped blocks contained no pairs"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
