"""Packed concordance-collocation block-skip evidence (round 5).

`conc_collocations_packed` bounds its single decode by the slot engine's
doc-range envelopes: a doc shard survives only if EVERY slot group
reaches it and the [max lo, min hi] envelope is non-empty. At fixture
scale (one doc shard) that pruning is invisible, so — mirroring
bench_colloc.py / bench_sketch.py — this job builds a larger
deterministic corpus where the 2-slot node is confined to a narrow
doc-id range (a rare multi-word expression at 100 TB) and measures:

  - block parquet files actually read by the envelope-kept decode
    (runtime `input_file_name()`, not the pre-pruning FileIndex);
  - packed result == corpus-path result (the skipped blocks provably
    held no node matches and no neighbor mass);
  - wall time packed vs corpus scan.

Corpus (no RNG): doc i = 30 tokens `w{(i*31 + j*7) % 500}` for j in
1..30, plus the node bigram `rarea rareb` appended to docs in
[target_lo, target_lo + target_n).

  python jobs/bench_conccoll.py --out BENCH/conccoll_prune.json
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

SLOTS = [{"term": "rarea"}, {"term": "rareb"}]
DISTS = [(1, 1)]
ML, WINDOW, MIN_COUNT, K = 2, 3, 2, 20


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--target-lo", type=int, default=50_000)
    ap.add_argument("--target-n", type=int, default=500)
    ap.add_argument("--doc-shard-size", type=int, default=1024)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH/conccoll_prune.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fastmorph_spark.index import build_dictionary, build_postings
    from fastmorph_spark.index.io import read_index, write_index
    from fastmorph_spark.search import engine
    from fastmorph_spark.search.collocation import (
        conc_collocations,
        conc_collocations_packed,
    )
    from fastmorph_spark.search.packed import (
        MAX_SLOT_EXPANSION,
        _apply_keep,
        _envelope_keep,
        _expand_slot_term_groups,
    )
    from fastmorph_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cores}]",
                      shuffle_partitions=2 * args.cores,
                      app_name="fastmorph-bench-conccoll")
    spark.sparkContext.setLogLevel("ERROR")

    # vocab 500 so window neighbors of the node REPEAT across its 500
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
            F.concat(base, F.lit(" rarea rareb")),
        ).otherwise(base).alias("text"),
    ).persist()
    docs.count()

    work = tempfile.mkdtemp(prefix="fm_conccoll_")
    idx_path = os.path.join(work, "idx")
    t0 = time.perf_counter()
    write_index(spark, docs, idx_path, doc_shard_size=args.doc_shard_size,
                block_size=128)
    build_sec = time.perf_counter() - t0
    idx = read_index(spark, idx_path)

    # --- file-level evidence: replicate the operator's metadata-only keep
    # and count the block files the kept scan touches at runtime
    total_files = idx.postings.select(
        F.input_file_name().alias("f")).distinct().count()
    groups = _expand_slot_term_groups(idx, SLOTS, MAX_SLOT_EXPANSION)
    assert groups is not None, "exact-term slots must stay dictionary-first"
    pairs = sorted({(t, gi) for gi, g in enumerate(groups) for t in g})
    tg = spark.createDataFrame(pairs, "term string, grp int")
    per = (
        idx.postings.select("term", "doc_shard", "first_doc", "max_doc")
        .join(F.broadcast(tg), "term")
        .groupBy("doc_shard", "grp")
        .agg(F.min("first_doc").alias("_lo"), F.max("max_doc").alias("_hi"))
    )
    kept = _apply_keep(
        idx.postings.withColumn("f", F.input_file_name()),
        _envelope_keep(per, len(groups)),
    )
    read_files = kept.select("f").distinct().count()
    kept_shards = kept.select("doc_shard").distinct().count()
    total_shards = idx.postings.select("doc_shard").distinct().count()

    # --- result equality + wall time: packed (pruned decode) vs corpus
    t0 = time.perf_counter()
    packed_rows = [tuple(r) for r in conc_collocations_packed(
        idx, SLOTS, DISTS, ML, WINDOW, MIN_COUNT, K).collect()]
    packed_sec = time.perf_counter() - t0
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    t0 = time.perf_counter()
    m = engine.slot_search(postings, dictionary, SLOTS, DISTS)
    corpus_rows = [tuple(r) for r in conc_collocations(
        m, postings, dictionary, ML, WINDOW, MIN_COUNT, K).collect()]
    corpus_sec = time.perf_counter() - t0

    report = {
        "n_docs": args.n_docs,
        "node_docs": args.target_n,
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
                 "envelope-kept decode feeding conc_collocations_packed; "
                 "equality vs the corpus-path operator proves the skipped "
                 "blocks held no node matches and no neighbor mass"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
