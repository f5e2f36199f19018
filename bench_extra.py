"""Extra benchmarks for the optimization round (guide §1.4): per-phase
noop-sink isolation of the headline queries so each sub-cost (tokenize
pass, pack shuffle, dictionary derivation, LSH stages, joins) is timed
separately from the driver-contract metric in bench.py (which is FROZEN).

Usage:  python bench_extra.py [phase ...]
Phases: wand bm25 dedup phrase relational all (default: all)

Prints one JSON line per phase with sub-timings. Same env contract as
bench.py ($SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS); same warmup protocol
so steady-state numbers are comparable with the driver bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    want = set(sys.argv[1:]) or {"all"}

    def on(name: str) -> bool:
        return "all" in want or name in want

    from pyspark.sql import functions as F

    from fastmorph_spark import registry
    from fastmorph_spark.session import get_spark
    from fastmorph_spark.sources import read_documents

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=2 * cpus,
                      app_name="fastmorph-bench-extra")
    sc = spark.sparkContext

    # warmup — same protocol as bench.py
    from fastmorph_spark.index.io import build_index_frames
    from fastmorph_spark.ops.dedup import minhash_lsh_pairs
    from fastmorph_spark.search.bm25 import bm25_topk_expression
    from fastmorph_spark.search.wand import search_wand

    warm = read_documents(spark, sf_dir).limit(200).cache()
    warm.count()
    bm25_topk_expression(warm, "fast hash join", k=5).count()
    widx = build_index_frames(
        warm, doc_shard_size=1000, block_size=64,
        pack_partitions=max(2 * sc.defaultParallelism, 8),
    )
    widx.postings = widx.postings.persist()
    search_wand(widx, "fast hash join", k=5).count()
    widx.postings.unpersist()
    minhash_lsh_pairs(warm, 3, 16, 4, 0.5).count()
    warm.unpersist()

    docs = read_documents(spark, sf_dir)
    out: dict[str, dict] = {}

    def timed(bucket: dict, label: str, fn):
        sc.setJobDescription(label)
        t0 = time.perf_counter()
        r = fn()
        bucket[label] = round(time.perf_counter() - t0, 4)
        sc.setJobDescription(None)
        return r

    if on("wand"):
        from fastmorph_spark.search.wand import dictionary_rows, search_wand

        t = {}
        idx = timed(t, "build_frames(lazy)", lambda: build_index_frames(
            docs, doc_shard_size=1000, block_size=64,
            pack_partitions=max(2 * sc.defaultParallelism, 8)))
        idx.postings = idx.postings.persist()
        idx.dictionary = idx.dictionary.persist()
        timed(t, "dictionary_rows", lambda: dictionary_rows(
            idx, ["fast", "hash", "join"]))
        timed(t, "stats_row", lambda: idx.stats_row())
        timed(t, "wand_query_first", lambda: search_wand(
            idx, "fast hash join", k=10, round_score=True).count())
        timed(t, "wand_query_steady", lambda: search_wand(
            idx, "fast hash join", k=10, round_score=True).count())
        timed(t, "postings_count(materialize check)",
              lambda: idx.postings.count())
        out["wand"] = t

    if on("bm25"):
        t = {}
        timed(t, "bm25_first", lambda: bm25_topk_expression(
            docs, "fast hash join", k=10, round_score=True).count())
        timed(t, "bm25_steady", lambda: bm25_topk_expression(
            docs, "fast hash join", k=10, round_score=True).count())
        out["bm25"] = t

    if on("dedup"):
        from fastmorph_spark.cache import pin
        from fastmorph_spark.ops.dedup import _shingles

        t = {}
        sh = pin(_shingles(docs, 3), None)
        timed(t, "shingles_persist", lambda: _noop(sh))
        mins = [F.min(F.md5(F.concat(F.lit(f"{i}_"), F.col("shingle")))).alias(f"h{i}")
                for i in range(16)]
        sigs = sh.groupBy("doc_id").agg(*mins)
        timed(t, "signatures", lambda: _noop(sigs))
        timed(t, "full_first", lambda: minhash_lsh_pairs(
            docs, 3, 16, 4, 0.5).count())
        timed(t, "full_steady", lambda: minhash_lsh_pairs(
            docs, 3, 16, 4, 0.5).count())
        out["dedup"] = t

    if on("phrase"):
        from fastmorph_spark.index.build import build_dictionary, build_postings
        from fastmorph_spark.search import engine

        t = {}
        postings = timed(t, "build_postings(lazy)", lambda: build_postings(docs).persist())
        timed(t, "postings_materialize", lambda: _noop(postings))
        timed(t, "phrase_first", lambda: engine.phrase_search(
            postings, registry.PHRASE_QUERY).count())
        timed(t, "phrase_steady", lambda: engine.phrase_search(
            postings, registry.PHRASE_QUERY).count())
        d = build_dictionary(postings)
        timed(t, "dictionary", lambda: _noop(d))
        out["phrase"] = t

    if on("relational"):
        t = {}
        timed(t, "top_orders_first", lambda: registry.q_top_orders(spark, sf_dir).count())
        timed(t, "top_orders_steady", lambda: registry.q_top_orders(spark, sf_dir).count())
        timed(t, "events_window", lambda: registry.q_events_window(spark, sf_dir).count())
        timed(t, "lang_id", lambda: registry.q_lang_id(spark, sf_dir).count())
        timed(t, "ann_arrow", lambda: registry.q_ann_cosine_topk_arrow(spark, sf_dir).count())
        timed(t, "wildcard_terms_cold(index_tables)",
              lambda: registry.q_wildcard_terms(spark, sf_dir).count())
        timed(t, "proximity", lambda: registry.q_proximity_search(spark, sf_dir).count())
        out["relational"] = t

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
