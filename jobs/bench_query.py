"""M5 — query latency: p50/p95 over the reference query set (BASELINE.md).

Builds (or reuses) the packed index for sf0.1 documents, runs every query
in fixtures/queries.json `--repeat` times (after one warm pass), and
reports per-query and aggregate latencies.

  python jobs/bench_query.py --sf-dir /root/testdata/sf0.1 --out BENCH/query_latency.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH/query_latency.json"))
    args = ap.parse_args()

    from fastmorph_spark.index import build_dictionary, build_postings
    from fastmorph_spark.index.io import build_index_frames
    from fastmorph_spark.search.queryset import load_query_set, run_query
    from fastmorph_spark.session import get_spark
    from fastmorph_spark.sources import read_documents

    spark = get_spark(master=f"local[{args.cores}]", shuffle_partitions=2 * args.cores,
                      app_name="fastmorph-bench-query")
    docs = read_documents(spark, args.sf_dir)
    # pack_partitions: size the in-memory pack exchange to the session —
    # without it the write-path default (N_PACK_BUCKETS*PACK_SLICES = 512
    # partitions) makes every decoded_postings mapInPandas launch 512
    # near-empty Arrow tasks (measured 11.8s vs 0.6s on packed_phrase at
    # sf0.1 local[8]); registry._packed_index and bench.py already do this
    idx = build_index_frames(
        docs, doc_shard_size=1024, block_size=128,
        pack_partitions=max(2 * spark.sparkContext.defaultParallelism, 8),
    )
    idx.postings = idx.postings.cache()
    idx.dictionary = idx.dictionary.cache()
    idx.stats = idx.stats.cache()
    idx.doc_lens = idx.doc_lens.cache()
    postings = build_postings(docs).cache()
    dictionary = build_dictionary(postings).cache()
    # per-lang indexes serve the lang-filtered BM25 queries (round-1's
    # latency tail was the filtered path re-aggregating the full corpus)
    from fastmorph_spark.index.io import build_lang_indexes

    lang_idx = build_lang_indexes(
        docs, doc_shard_size=1024, block_size=128,
        pack_partitions=max(2 * spark.sparkContext.defaultParallelism, 8),
    )
    for li in lang_idx.values():
        li.postings = li.postings.cache()
        li.dictionary = li.dictionary.cache()
        li.stats = li.stats.cache()
    # materialize caches (index build time, reported separately)
    t0 = time.perf_counter()
    idx.postings.count(); idx.dictionary.count(); postings.count(); dictionary.count()
    for li in lang_idx.values():
        li.postings.count(); li.dictionary.count()
    build_sec = time.perf_counter() - t0

    specs = load_query_set(os.path.join(REPO, "fixtures/queries.json"))
    lat: dict[str, list[float]] = {s["qid"]: [] for s in specs}
    for rep in range(args.repeat + 1):  # first pass warms, discarded
        for s in specs:
            t0 = time.perf_counter()
            n = run_query(s, docs, index=idx, postings=postings, dictionary=dictionary,
                          lang_indexes=lang_idx).count()
            dt = (time.perf_counter() - t0) * 1000
            assert n >= 0
            if rep > 0:
                lat[s["qid"]].append(dt)

    per_q = {q: round(statistics.median(v), 1) for q, v in lat.items()}
    allv = sorted(x for v in lat.values() for x in v)
    out = {
        "sf_dir": args.sf_dir,
        "cores": args.cores,
        "repeat": args.repeat,
        "index_build_cache_sec": round(build_sec, 2),
        "p50_ms": round(allv[len(allv) // 2], 1),
        "p95_ms": round(allv[int(len(allv) * 0.95)], 1),
        "per_query_median_ms": per_q,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "per_query_median_ms"}))
    spark.stop()


if __name__ == "__main__":
    main()
