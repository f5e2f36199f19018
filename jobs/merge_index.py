"""spark-submit entry point: fold N persisted indexes into one AT REST.

The file-level segment merge (index/merge.merge_index_dirs): postings /
docs / doc_lens move file-for-file (one rename per side per tree), only
the dictionary + stats are rewritten from block metadata — a merge is
metadata-bound, not data-bound, at any corpus size. Optionally follow
with --compact to materialize the shard namespacing and return the tree
to a plain (re-mergeable) layout.

Usage:
  spark-submit --py-files dist/fts.zip jobs/merge_index.py \
      --src /tmp/idx_a --src /tmp/idx_b --out /tmp/idx_merged \
      [--compact] [--report BENCH/merge.json]

Sources are CONSUMED (their trees live under --out afterwards). A crash
mid-merge is safe: re-running the same command (or any read_index of
--out) rolls the journaled move forward.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", action="append", required=True,
                    help="source index directory (repeat; >= 2)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--compact", action="store_true",
                    help="normalize the merged layout afterwards "
                         "(materialize shards, drop the side= layer)")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from fastmorph_spark.index.io import compact_postings
    from fastmorph_spark.index.merge import merge_index_dirs

    spark = SparkSession.builder.appName("fts-merge-index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.monotonic()
    counters = merge_index_dirs(spark, args.src, args.out)
    merge_s = time.monotonic() - t0
    report = {"merge_sec": round(merge_s, 3), **counters}
    if args.compact:
        t1 = time.monotonic()
        report["compact"] = compact_postings(spark, args.out)
        report["compact_sec"] = round(time.monotonic() - t1, 3)
    line = json.dumps(report)
    print(line)
    if args.report:
        os.makedirs(os.path.dirname(args.report) or ".", exist_ok=True)
        with open(args.report, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
