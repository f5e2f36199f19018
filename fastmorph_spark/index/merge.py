"""Segment merge: one Index over A ∪ B with NO corpus re-scan and NO
block repack — the Lucene-merge analog, and the write-side complement of
NRT composed search (search/nrt.py reads base ∪ unindexed tail; this
folds two ALREADY-PACKED indexes into one).

Why this is cheap (and why it is exact):

- **Postings**: packed blocks are self-contained (term, doc_shard,
  envelope, varbyte payloads) — the merged postings frame is the UNION
  of both sides' block rows, zero payload bytes rewritten. The one
  invariant the union must preserve: the WAND kernel's segment sweep
  assigns ONE covering block per (term, segment) within a doc_shard
  group, i.e. block doc-ranges must stay disjoint per (doc_shard,
  term). Each side's pack guarantees that for itself, so side B's
  shard ids are namespaced above side A's (a metadata-only max + a
  column add) — groups never mix sides and the invariant is inherited,
  with no constraint on the sides' shard/block geometry.
- **Stats**: Σdl per side is recovered as round(avgdl·n) — exact int64
  while Σdl < 2^52 (the nrt.py argument; holds at 10^12 docs) — so the
  merged avgdl is the same once-rounded float64 a from-scratch build's
  F.avg would produce: BM25 scores over the merged index are
  bit-identical to a full rebuild, not merely close.
- **Impact bounds**: each side's block_max_impact was computed with ITS
  pack-time avgdl. The merged stats carry min_pack_avgdl =
  min(both sides') and the kernel scales bounds by
  avgdl_query/min_pack_avgdl (monotone impacts — search/wand.py), so
  pruning stays EXACT under the merged (drifted) avgdl. This is the
  same mechanism incremental finalize relies on; a merge adds no new
  assumption.
- **Dictionary**: rebuilt from block metadata alone
  (pack.dictionary_from_packed — blocks partition each term's postings,
  so df = Σ n_docs and cf = Σ block_cf are exact); max_score re-derives
  from the merged idf. One groupBy over |blocks| rows, no tokenization.
- **Twins & deletes**: case-preserving twins merge the same way when
  both sides carry them; live tombstone sets union (doc_ids are global).

Caller contract: the two sides are doc_id-DISJOINT and built with the
SAME tokenizer (terms must mean the same thing; the logical position
space is per-doc, so doc_shard_size / block_size MAY differ — shard ids
are only parallelism keys, and the kernel/decode paths are correct under
shard-id collisions between sides).

At-rest form: both sides' block parquet trees can be moved file-for-file
under one index directory (they are already partitioned by term_bucket)
and the rewritten dictionary/stats/docs written next to them via the
index.io writer discipline — the frame-level merge here is the semantics
of record and what the tests pin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fastmorph_spark.index.io import Index
from fastmorph_spark.index.pack import dictionary_from_packed


def merge_indexes(a: Index, b: Index) -> Index:
    """One Index over a ∪ b (frame-level, lazy). See module docstring
    for the exactness argument and the caller contract."""
    spark = a.postings.sparkSession
    sa, sb = a.stats_row(), b.stats_row()
    n_a, n_b = int(sa["n_docs"]), int(sb["n_docs"])
    n = n_a + n_b
    sum_dl = (int(round(float(sa["avgdl"] or 0.0) * n_a))
              + int(round(float(sb["avgdl"] or 0.0) * n_b)))
    avgdl = (sum_dl / n) if n else 0.0
    min_pack = min(
        float(sa.get("min_pack_avgdl") or sa["avgdl"] or avgdl or 1.0),
        float(sb.get("min_pack_avgdl") or sb["avgdl"] or avgdl or 1.0),
    )
    stats = spark.createDataFrame(
        [(n, float(avgdl), float(min_pack))],
        "n_docs long, avgdl double, min_pack_avgdl double",
    )

    # doc_shard is a grouping key with one hard invariant the WAND
    # kernel's segment sweep depends on: within a (doc_shard, term)
    # group, block doc-ranges are DISJOINT and sorted (one covering
    # block per segment). Each side's pack guarantees it for ITSELF; a
    # plain union would break it wherever the sides' shard ids collide
    # (same-term blocks from both sides would shadow each other). So
    # namespace side B's shards above side A's — one metadata-only agg
    # over A's block rows (|blocks| ~ |postings|/block_size), no
    # payload touched. The cs twin gets the SAME offset: twins share
    # one doc_shard space (cross-twin pruning contract, search/packed).
    off = int(a.postings.agg(F.max("doc_shard")).collect()[0][0] or 0) + 1
    shard_t = dict(a.postings.dtypes)["doc_shard"]

    def _shift(frame):
        return frame.withColumn(
            "doc_shard", (F.col("doc_shard") + F.lit(off)).cast(shard_t))

    postings = a.postings.unionByName(_shift(b.postings),
                                      allowMissingColumns=True)
    dictionary = dictionary_from_packed(postings, stats)
    docs = a.docs.unionByName(b.docs, allowMissingColumns=True)
    doc_lens = a.doc_lens.unionByName(b.doc_lens)

    postings_cs = dict_cs = None
    if a.postings_cs is not None and b.postings_cs is not None:
        postings_cs = a.postings_cs.unionByName(_shift(b.postings_cs),
                                                allowMissingColumns=True)
        dict_cs = dictionary_from_packed(postings_cs, stats)

    tomb = None
    if a.tombstones is not None and b.tombstones is not None:
        tomb = a.tombstones.unionByName(b.tombstones).distinct()
    elif a.tombstones is not None:
        tomb = a.tombstones
    elif b.tombstones is not None:
        tomb = b.tombstones

    return Index(docs=docs, doc_lens=doc_lens, dictionary=dictionary,
                 stats=stats, postings=postings,
                 postings_cs=postings_cs, dictionary_cs=dict_cs,
                 tombstones=tomb)
