"""Trigram-index pruning evidence (round 5 code-search wave).

At fixture scale the whole at-rest trigram index is a handful of files,
so the driver queries can't show the partition pruning. This job builds
a larger deterministic code-shaped corpus where a substring needle is
confined to a narrow doc range, writes a REAL at-rest index
(tg_bucket-partitioned varbyte blobs), and measures:

  - blob parquet files actually read by the candidate scan (runtime
    input_file_name(), not the pre-pruning FileIndex) vs total on disk —
    the PartitionFilters(tg_bucket) + PushedFilters In(trigram) claim;
  - substring_search over the at-rest index == brute-force instr() full
    scan (the pruned path provably loses and invents nothing);
  - wall time indexed vs full scan, and index build throughput.

Corpus (no RNG): doc i is a 3-line synthetic function over a 5000-name
identifier vocab; docs in [needle_lo, needle_lo + needle_n) carry one
extra line calling `needleXyz(x)` — the query 'needleXyz(x' crosses the
identifier/punctuation boundary, so only substring search can find it.

  python jobs/bench_trigram.py --out BENCH/trigram_prune.json
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

NEEDLE = "needleXyz(x"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--n-docs", type=int, default=200_000)
    ap.add_argument("--needle-lo", type=int, default=120_000)
    ap.add_argument("--needle-n", type=int, default=400)
    ap.add_argument("--doc-shard-size", type=int, default=16_384)
    ap.add_argument("--doc-lines", type=int, default=3,
                    help="body lines per doc (~30 bytes each) — raise to "
                         "make the corpus realistically file-sized")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH/trigram_prune.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fastmorph_spark.index.trigram import (
        build_trigram_index,
        pack_trigrams,
        read_trigram_index,
        trigrams_py,
        write_trigram_index,
    )
    from fastmorph_spark.search.substring import (
        MAX_PROBE_TRIGRAMS,
        substring_search,
    )
    from fastmorph_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cores}]",
                      shuffle_partitions=2 * args.cores,
                      app_name="fastmorph-bench-trigram")
    spark.sparkContext.setLogLevel("ERROR")

    name = "concat('fn', pmod(id * {m} + {c}, 5000))"
    extra = (
        "concat_ws(chr(10), transform(sequence(1, {k}), "
        "j -> concat('    v', j, ' = ', 'fn', pmod(id * 19 + j * 23, 5000), "
        "'(v', j, ') + offset', j)))"
    ).format(k=max(args.doc_lines - 3, 1))
    body = (
        "concat('def ', {n1}, '(a, b):', chr(10),"
        "       '    return ', {n2}, ' + ', {n3}, chr(10),"
        "       '    # ', {n4}, chr(10), {extra})"
    ).format(n1=name.format(m=31, c=7), n2=name.format(m=17, c=3),
             n3=name.format(m=13, c=11), n4=name.format(m=7, c=1),
             extra=extra)
    docs = spark.range(args.n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.col("id") >= args.needle_lo)
            & (F.col("id") < args.needle_lo + args.needle_n),
            F.expr(f"concat({body}, chr(10), '    x = needleXyz(x)')"),
        ).otherwise(F.expr(body)).alias("text"),
    ).persist()
    docs.count()

    work = tempfile.mkdtemp(prefix="fm_trigram_")
    # the queried corpus lives ON DISK (sorted by doc_id, so row-group
    # min/max stats serve the In(doc_id) verify pushdown) — comparing an
    # indexed query against an in-memory scan would flatter the scan
    docs.orderBy("doc_id").write.parquet(os.path.join(work, "corpus"))
    corpus = spark.read.parquet(os.path.join(work, "corpus"))
    t0 = time.perf_counter()
    idx = build_trigram_index(corpus)
    write_trigram_index(pack_trigrams(idx, doc_shard_size=args.doc_shard_size),
                        work)
    build_sec = time.perf_counter() - t0
    at = read_trigram_index(spark, work)

    # --- file-level evidence: replicate the query's internal pruning
    # predicate (rarest-probe trigrams) and count files under it
    total_files = at.blobs.select(F.input_file_name().alias("f")).distinct().count()
    grams = trigrams_py(NEEDLE)
    rows = at.dictionary.filter(F.col("trigram").isin(grams)).collect()
    dfs = {r["trigram"]: r["df"] for r in rows}
    bucket_of = {r["trigram"]: r["tg_bucket"] for r in rows}
    chosen = sorted(grams, key=lambda g: (dfs[g], g))[:MAX_PROBE_TRIGRAMS]
    pred = (F.col("tg_bucket").isin(sorted({bucket_of[g] for g in chosen}))
            & F.col("trigram").isin(chosen))
    read_files = (at.blobs.filter(pred)
                  .select(F.input_file_name().alias("f")).distinct().count())

    def _tree_bytes(root: str, names: set[str] | None = None) -> int:
        total = 0
        for dirpath, _, files in os.walk(root):
            for fn in files:
                p = os.path.join(dirpath, fn)
                if names is None or p in names:
                    total += os.path.getsize(p)
        return total

    read_names = {r["f"].replace("file://", "").replace("file:", "")
                  for r in at.blobs.filter(pred)
                  .select(F.input_file_name().alias("f")).distinct().collect()}
    corpus_bytes = _tree_bytes(os.path.join(work, "corpus"))
    index_bytes = _tree_bytes(os.path.join(work, "trigrams"))
    read_bytes = _tree_bytes(os.path.join(work, "trigrams"), read_names)

    # --- result equality + wall: indexed vs brute-force full scan,
    # both over the on-disk corpus
    t0 = time.perf_counter()
    indexed = [r["doc_id"] for r in substring_search(corpus, at, NEEDLE).collect()]
    indexed_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    substring_search(corpus, at, NEEDLE).collect()
    indexed_warm_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    brute = [r["doc_id"] for r in
             corpus.filter(F.instr(F.col("text"), NEEDLE) > 0)
             .select("doc_id").orderBy("doc_id").collect()]
    brute_sec = time.perf_counter() - t0

    report = {
        "n_docs": args.n_docs,
        "needle_docs": args.needle_n,
        "doc_shard_size": args.doc_shard_size,
        "index_build_sec": round(build_sec, 2),
        "build_docs_per_sec": round(args.n_docs / build_sec),
        "total_blob_files": int(total_files),
        "blob_files_read": int(read_files),
        "files_read_fraction": round(read_files / total_files, 4),
        "corpus_parquet_bytes": int(corpus_bytes),
        "index_blob_bytes": int(index_bytes),
        "blob_bytes_read": int(read_bytes),
        "posting_bytes_fraction_of_corpus": round(read_bytes / corpus_bytes, 6),
        "probe_trigrams": chosen,
        "matches": len(indexed),
        "results_equal_full_scan": indexed == brute,
        "indexed_query_sec": round(indexed_sec, 2),
        "indexed_query_warm_sec": round(indexed_warm_sec, 2),
        "full_scan_sec": round(brute_sec, 2),
        "note": ("files counted with runtime input_file_name() under the "
                 "query's own rarest-probe predicate; equality vs the "
                 "instr() full scan proves pruning is lossless. On local "
                 "NVMe at toy scale the page-cached full scan stays "
                 "sub-second, so wall time is dominated by fixed job "
                 "constants — the scaling quantity is bytes touched "
                 "(posting_bytes_fraction_of_corpus + the In(doc_id) "
                 "row-group-pruned verify), which is O(result), not "
                 "O(corpus)"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
