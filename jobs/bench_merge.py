"""Scale evidence for the at-rest segment merge (SURVEY S17): fold two
persisted indexes with `merge_index_dirs` and compare its wall time to a
full from-scratch rebuild of the same union corpus — the claim under test
is "a merge is metadata-bound, not data-bound" (file moves + an O(vocab)
dictionary rewrite vs re-tokenizing every byte).

Protocol (one warm local[CPUS] session; deterministic synth corpus):
  1. synth_corpus(N) -> parquet (identical bytes for every phase)
  2. setup: write_index over each doc_id%2 half (different pack
     geometries per side — the caller contract allows it)
  3. timed A: merge_index_dirs([a, b] -> m)
  4. timed B: write_index over the FULL corpus (the rebuild a merge
     replaces)
  5. parity: search_wand top-10 over read_index(m) must equal the
     rebuild's top-10 exactly (rank + rounded score)

Writes BENCH/merge_scale.json:
  {docs, merge_sec, rebuild_sec, speedup, posting_files_moved,
   dict_rows, parity_ok}

Usage: python jobs/bench_merge.py [--docs 100000] [--out BENCH]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fastmorph_spark.index.fs import fs_count_files
    from fastmorph_spark.index.io import read_index, write_index
    from fastmorph_spark.index.merge import merge_index_dirs
    from fastmorph_spark.search.wand import search_wand
    from fastmorph_spark.session import get_spark

    if os.path.isdir("/dev/shm"):  # same rationale as bench_scaling.py
        tempfile.tempdir = "/dev/shm"
    work = tempfile.mkdtemp(prefix="fm_merge_bench_")
    spark = get_spark(master=f"local[{args.cpus}]",
                      shuffle_partitions=4 * args.cpus,
                      app_name="bench_merge")
    spark.sparkContext.setLogLevel("ERROR")

    from fastmorph_spark.sources import synth_corpus

    synth_corpus(spark, args.docs).repartition(128).write.mode(
        "overwrite").parquet(f"{work}/corpus")
    docs = spark.read.parquet(f"{work}/corpus")

    # setup (not the comparison): two persisted halves, mixed geometry
    write_index(spark, docs.filter(F.col("doc_id") % 2 == 0), f"{work}/a",
                text_col="content", doc_shard_size=4096, block_size=128)
    write_index(spark, docs.filter(F.col("doc_id") % 2 == 1), f"{work}/b",
                text_col="content", doc_shard_size=2048, block_size=64)
    n_files = (fs_count_files(spark, f"{work}/a/postings")
               + fs_count_files(spark, f"{work}/b/postings"))

    t0 = time.monotonic()
    counters = merge_index_dirs(spark, [f"{work}/a", f"{work}/b"],
                                f"{work}/m")
    merge_sec = time.monotonic() - t0

    t0 = time.monotonic()
    write_index(spark, docs, f"{work}/full", text_col="content",
                doc_shard_size=4096, block_size=128)
    rebuild_sec = time.monotonic() - t0

    q = "t3 t17 t900"  # one hot head term, one mid, one tail
    top_m = [(r["rank"], r["doc_id"], r["score"]) for r in search_wand(
        read_index(spark, f"{work}/m"), q, k=10, round_score=True).collect()]
    top_f = [(r["rank"], r["doc_id"], r["score"]) for r in search_wand(
        read_index(spark, f"{work}/full"), q, k=10,
        round_score=True).collect()]
    parity = top_m == top_f

    out = {
        "docs": args.docs,
        "cpus": args.cpus,
        "merge_sec": round(merge_sec, 2),
        "rebuild_sec": round(rebuild_sec, 2),
        "speedup": round(rebuild_sec / merge_sec, 1),
        "posting_files_moved": n_files,
        "counters": counters,
        "parity_ok": parity,
        "query": q,
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "merge_scale.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    if not parity:
        sys.exit(1)


if __name__ == "__main__":
    main()
