"""Parallel (aligned) corpus search — the bilingual concordance surface.

The reference serves the Tatar National Corpus portal, whose standard
national-corpus feature set includes a PARALLEL subcorpus: aligned
source/translation segment pairs, searched on one side with the aligned
segment of the other side shown next to each concordance line [PK-med:
corpus.tatar exposes a Tatar–Russian parallel corpus; parallel
concordance is the canonical national-corpus capability, LIT: Evert &
Hardie 2011 §CQPweb parallel support].

Data model (SURVEY.md §1.3 extension): an ``alignment`` relation
``(pair_id, src_id, tgt_id)`` mapping source doc/segment ids to their
aligned translation ids — both sides ordinary rows of the documents
relation.  Alignment is data, not code: any upstream aligner that emits
id pairs plugs in.

Spark-first shape at 100 TB:
- the node query runs ONLY over the source side's postings — the full
  existing slot engine (wildcards / stems / tags / fuzzy / regex / case
  twins) applies unchanged, so the parallel surface inherits every slot
  capability for free;
- per-occurrence source KWIC lines come from ``engine.kwic`` (pure
  Catalyst slicing, no windows);
- the alignment join is keyed on src_id (at rest the alignment table
  would be bucketed by src_id); the match side is result-bounded, so
  AQE broadcasts it under threshold — no new shuffle shapes;
- the aligned segment join is keyed on tgt_id against the documents
  scan; a paged serving path would page BEFORE these joins exactly like
  engine.search_request pre-prunes (the joins here are per-occurrence,
  i.e. already bounded by the match set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastmorph_spark.search import engine


def parallel_search(
    documents_src: DataFrame,
    documents_tgt: DataFrame,
    alignment: DataFrame,
    postings: DataFrame,
    dictionary: DataFrame,
    slots: list[dict],
    dists: list[tuple[int, int]],
    width: int = 5,
    postings_cs: DataFrame | None = None,
    dictionary_cs: DataFrame | None = None,
) -> DataFrame:
    """Search the SOURCE side with a full slot pattern; return one row per
    match occurrence with the source KWIC line and the aligned target
    segment — the parallel-concordance result unit.

    ``postings``/``dictionary`` must be built over ``documents_src`` (the
    target side is not indexed for source-side queries; a target-side
    query is the same call with the roles swapped).

    Returns (pair_id, doc_id, pos, left_ctx, keyword, right_ctx,
    tgt_id, tgt_text) ordered by (doc_id, pos) — corpus order, the
    reference's result order.
    """
    matches = engine.slot_search(postings, dictionary, slots, dists,
                                 postings_cs=postings_cs,
                                 dictionary_cs=dictionary_cs)
    return _assemble(documents_src, documents_tgt, alignment, matches,
                     match_len=len(slots), width=width)


def parallel_search_packed(
    index,
    documents_src: DataFrame,
    documents_tgt: DataFrame,
    alignment: DataFrame,
    slots: list[dict],
    dists: list[tuple[int, int]],
    width: int = 5,
    scope=None,
) -> DataFrame:
    """The index-backed twin: slot matching runs over a PACKED index
    built from the source side (one pruned block scan + Arrow decode —
    search/packed.py's block-skip machinery applies unchanged), then the
    same KWIC + alignment assembly. Result-identical to the corpus path
    (the registry key shares its oracle)."""
    from fastmorph_spark.search.packed import packed_slot_search

    matches = packed_slot_search(index, slots, dists, scope=scope)
    return _assemble(documents_src, documents_tgt, alignment, matches,
                     match_len=len(slots), width=width)


def _assemble(documents_src: DataFrame, documents_tgt: DataFrame,
              alignment: DataFrame, matches: DataFrame,
              match_len: int, width: int) -> DataFrame:
    """Shared result assembly: slot_search-shaped matches -> per-occurrence
    source KWIC lines -> alignment + target-segment joins (both keyed,
    match-set-bounded — AQE broadcasts the result side)."""
    lines = engine.kwic(documents_src, matches, match_len=match_len,
                        width=width)
    tgt = documents_tgt.select(
        F.col("doc_id").alias("tgt_id"),
        F.col("text").alias("tgt_text"),
    )
    return (
        lines.join(alignment.withColumnRenamed("src_id", "doc_id"), "doc_id")
        .join(tgt, "tgt_id")
        .select("pair_id", "doc_id", "pos", "left_ctx", "keyword",
                "right_ctx", "tgt_id", "tgt_text")
        .orderBy("doc_id", "pos")
    )
