"""Logical postings decoded FROM the packed index — index-backed
phrase / proximity / slot / boolean queries.

The engine's position-predicate operators (engine.py) consume logical
postings `(term, doc_id, tf, positions)`. Building those from the corpus
per query re-tokenizes the whole corpus — fine as a fixture yardstick,
wrong at 100 TB. The packed index stores delta+varbyte (doc gaps, tfs,
positions) blocks exactly so a query can reproduce the logical rows for
its handful of terms from the index alone:

  dictionary lookup (term -> term_bucket, <= |q| rows, driver-side like
  the WAND path) -> pruned block scan (partition pruning on term_bucket +
  term pushdown + column pruning) -> Arrow decode kernel (numpy varbyte,
  Python loops over BLOCKS only, never postings) -> engine operators
  unchanged.

Decode parity with build_postings is pinned by
tests/test_packed_ops.py::test_decoded_postings_roundtrip; full query
parity (packed path == corpus path) by the *_packed driver queries
sharing the corpus path's DuckDB oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastmorph_spark.index.io import Index
from fastmorph_spark.index.varbyte import decode_doc_gaps, decode_positions, vb_decode
from fastmorph_spark.search import engine
from fastmorph_spark.tokenize import tokenize_py

DECODED_SCHEMA = "term string, doc_id long, tf int, positions array<int>"

# above this many expanded terms, skip the driver-side isin pushdown and
# semi-join a broadcast term frame instead (an isin literal of 10^5 terms
# bloats the plan; the bucket partition filter is then also moot)
MAX_TERM_PUSHDOWN = 1000


def _empty(spark) -> DataFrame:
    return spark.createDataFrame([], DECODED_SCHEMA)


def decoded_postings(index: Index, terms: list[str]) -> DataFrame:
    """Pruned scan + varbyte decode: logical `(term, doc_id, tf,
    positions)` rows for exactly `terms` from the packed index."""
    spark = index.postings.sparkSession
    terms = sorted(set(terms))
    if not terms:
        return _empty(spark)

    if len(terms) <= MAX_TERM_PUSHDOWN:
        # J1-style dictionary lookup: term_bucket rides in the dictionary,
        # so partition pruning costs one <=|terms|-row driver round-trip
        drows = index.dictionary.filter(F.col("term").isin(terms)) \
            .select("term", "term_bucket").collect()
        if not drows:
            return _empty(spark)
        buckets = sorted({int(r["term_bucket"]) for r in drows})
        present = sorted({r["term"] for r in drows})
        blocks = index.postings.filter(
            F.col("term_bucket").isin(buckets) & F.col("term").isin(present)
        )
    else:
        tdf = spark.createDataFrame([(t,) for t in terms], "term string")
        blocks = index.postings.join(F.broadcast(tdf), "term", "left_semi")
    blocks = blocks.select("term", "doc_gaps", "tfs", "positions")

    def _decode(it):
        for pdf in it:
            cols: dict[str, list] = {"term": [], "doc_id": [], "tf": [], "positions": []}
            for term, g, t, p in zip(pdf["term"], pdf["doc_gaps"], pdf["tfs"], pdf["positions"]):
                doc_ids = decode_doc_gaps(g).astype(np.int64)
                tfs = vb_decode(t).astype(np.int64)
                plists = decode_positions(p, tfs)
                cols["term"].extend([term] * doc_ids.size)
                cols["doc_id"].append(doc_ids)
                cols["tf"].append(tfs.astype(np.int32))
                cols["positions"].extend(pl.astype(np.int32) for pl in plists)
            if not cols["term"]:
                continue
            yield pd.DataFrame({
                "term": cols["term"],
                "doc_id": np.concatenate(cols["doc_id"]),
                "tf": np.concatenate(cols["tf"]),
                "positions": cols["positions"],
            })

    return blocks.mapInPandas(_decode, DECODED_SCHEMA)


def _expand_slot_terms(index: Index, slots: list[dict]) -> list[str]:
    """All concrete terms the slots can match, expanded dictionary-first
    (exact terms pass through; wildcard/stem slots scan the ~|vocab|-row
    dictionary once)."""
    from fastmorph_spark.stem import stem_expr, stem_py

    terms: set[str] = set()
    conds = []
    for s in slots:
        if s.get("case"):
            raise ValueError(
                "case-sensitive slots need the case-preserving twin index; "
                "use engine.slot_search with postings_cs"
            )
        if "term" in s:
            terms.add(s["term"].lower())
        elif "stem" in s:
            conds.append(stem_expr(F.col("term")) == stem_py(s["stem"].lower()))
        else:
            like = engine.wildcard_pattern_to_like(s["pattern"].lower())
            conds.append(F.col("term").like(like))
    if conds:
        pred = conds[0]
        for c in conds[1:]:
            pred = pred | c
        terms |= {r["term"] for r in index.dictionary.filter(pred).select("term").collect()}
    return sorted(terms)


def packed_slot_search(index: Index, slots: list[dict],
                       dists: list[tuple[int, int]]) -> DataFrame:
    """engine.slot_search semantics over the PACKED index: one pruned
    block scan + decode for all slots, then the unchanged HOF predicate
    chain. Result-identical to the corpus-built path (shared oracles)."""
    decoded = decoded_postings(index, _expand_slot_terms(index, slots))
    return engine.slot_search(decoded, index.dictionary, slots, dists)


def packed_phrase_search(index: Index, phrase: str) -> DataFrame:
    decoded = decoded_postings(index, tokenize_py(phrase))
    return engine.phrase_search(decoded, phrase)


def packed_proximity_search(index: Index, t1: str, t2: str,
                            dist_from: int, dist_to: int) -> DataFrame:
    decoded = decoded_postings(index, [t1.lower(), t2.lower()])
    return engine.proximity_search(decoded, t1, t2, dist_from, dist_to)


def packed_and_search(index: Index, query_text: str) -> DataFrame:
    decoded = decoded_postings(index, tokenize_py(query_text))
    return engine.and_search(decoded, query_text)


def packed_or_search(index: Index, query_text: str) -> DataFrame:
    decoded = decoded_postings(index, tokenize_py(query_text))
    return engine.or_search(decoded, query_text)
