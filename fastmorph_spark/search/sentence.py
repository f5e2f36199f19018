"""Sentence-bounded search — the corpus-query `within <s>` operator.

Corpus query languages scope co-occurrence constraints to structural
units; the universally-supported one is the sentence. The engine's
positional index is sentence-agnostic (positions are global token
indexes), so sentence scope is realized as its own logical layer:

Pinned segmentation contract (mirrored by oracles_corpus.py):
- sentence boundaries = maximal runs of ``[.!?]`` — the text splits on
  ``[.!?]+`` and EVERY resulting segment keeps its ordinal (empty
  segments — leading/trailing/adjacent enders — still consume a
  sent_id, so both engines number identically without trimming rules);
- within each segment, tokens come from the same pinned ASCII tokenizer
  as the global index (``tokenize_expr`` — same folding, same
  boundaries), so a token's sentence never disagrees with its existence
  in the main index.

Plan shape: one Catalyst-only pass — split, posexplode segments, explode
tokens (WholeStageCodegen end to end, no Python) — then the groupBy-
having AND form keyed on (doc_id, sent_id) instead of doc_id: one
map-side-partial shuffle, the same family as engine.and_search (J3).
The sentence id is derived, never stored — no index format change, and
at 100 TB the scan parallelizes exactly like the tokenize scan the
logical index build already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastmorph_spark.tokenize import tokenize_expr, tokenize_py

SENT_SPLIT_PATTERN = "[.!?]+"

# Driver-fixture twin (slot_case convention): the synthetic corpus carries
# no sentence enders, so the sentence driver queries derive a punctuated
# text column DETERMINISTICALLY in both engines — literal 3-arg `replace`
# (identical leftmost-non-overlapping semantics in Spark SQL and DuckDB)
# turns two frequent tokens into sentence-final ones (~4-5 sentences/doc
# at sf0.01, both '.' and '!' enders exercised).
SENT_TEXT_SQL = "replace(replace(text, ' scan ', ' scan. '), ' value ', ' value! ')"


def sent_text_col() -> F.Column:
    """Spark twin of SENT_TEXT_SQL (same string, Spark SQL parser)."""
    return F.expr(SENT_TEXT_SQL)


def tokens_with_sentences(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sent_id, term) — one row per token occurrence, tagged
    with the 0-based ordinal of its sentence segment."""
    segs = F.split(F.coalesce(F.col(text_col), F.lit("")), SENT_SPLIT_PATTERN)
    per_seg = docs.select(
        "doc_id", F.posexplode(segs).alias("sent_id", "seg"))
    return per_seg.select(
        "doc_id",
        F.col("sent_id").cast("long").alias("sent_id"),
        F.explode(tokenize_expr("seg")).alias("term"),
    )


def within_sentence_search(docs: DataFrame, query_text: str,
                           text_col: str = "text") -> DataFrame:
    """Sentences containing ALL query terms (any order) — `t1 ... tN
    within <s>`.

    Output: (doc_id, sent_id) ordered, one row per qualifying sentence.
    """
    qterms = sorted(set(tokenize_py(query_text)))
    tok = tokens_with_sentences(docs, text_col)
    if not qterms:
        return tok.select("doc_id", "sent_id").filter(F.lit(False))
    return (
        tok.filter(F.col("term").isin(qterms))
        .groupBy("doc_id", "sent_id")
        .agg(F.countDistinct("term").alias("_nt"))
        .filter(F.col("_nt") == len(qterms))
        .select("doc_id", "sent_id")
        .orderBy("doc_id", "sent_id")
    )


def sentence_bounds(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Index-time side table: (doc_id, bounds) where bounds[i] = global
    token position of sentence i's first token (= cumulative token count
    of segments 0..i-1; bounds[0] = 0; empty segments contribute a
    DUPLICATE start).

    The whole array folds out of one Catalyst pass (split → per-segment
    token counts → running prefix via `aggregate`) — no explode, no
    shuffle; at 100 TB it rides the same scan as the index build and
    stores ~#sentences longs per doc next to the doc registry.

    Position → sentence mapping: sent(p) = size(filter(bounds, b -> b <=
    p)) - 1. This reproduces the TEXT-path ordinal exactly, duplicates
    included: for a token at position p inside (non-empty) segment j,
    every entry 0..j is <= p while every entry past j is >= bounds[j] +
    len_j > p — so the count is j+1 regardless of empty segments on
    either side.
    """
    from fastmorph_spark.constants import TOKEN_SPLIT_PATTERN

    segs = F.split(F.coalesce(F.col(text_col), F.lit("")), SENT_SPLIT_PATTERN)
    tok_counts = F.transform(
        segs,
        lambda s: F.size(F.filter(F.split(F.lower(s), TOKEN_SPLIT_PATTERN),
                                  lambda x: x != F.lit(""))).cast("long"),
    )
    bounds = F.aggregate(
        tok_counts,
        F.struct(
            F.expr("cast(array() as array<bigint>)").alias("arr"),
            F.lit(0).cast("long").alias("tot"),
        ),
        lambda acc, n: F.struct(
            F.concat(acc["arr"], F.array(acc["tot"])).alias("arr"),
            (acc["tot"] + n).alias("tot"),
        ),
        lambda acc: acc["arr"],
    )
    return docs.select("doc_id", bounds.alias("bounds"))


def within_sentence_indexed(postings: DataFrame, bounds: DataFrame,
                            query_text: str) -> DataFrame:
    """Same result as within_sentence_search, resolved from the POSITIONAL
    INDEX + the sentence-bounds side table — the at-scale path: query
    time never re-tokenizes text; each query term's positions map to
    sentence ids through one higher-order filter over the doc's bounds
    array, then the (doc_id, sent_id)-keyed groupBy-having AND applies.

    Plan: postings pruned to the query terms (J2 family) -> doc_id join
    with the bounds table (same key the postings shuffle already uses) ->
    HOF position→sentence map -> ONE aggregate. No Python anywhere.
    """
    qterms = sorted(set(tokenize_py(query_text)))
    if not qterms:
        return postings.select(
            "doc_id", F.lit(0).cast("long").alias("sent_id")
        ).filter(F.lit(False))
    m = postings.filter(F.col("term").isin(qterms)).join(bounds, "doc_id")
    sent_ids = F.array_distinct(F.transform(
        "positions",
        lambda p: (F.size(F.filter(F.col("bounds"), lambda b: b <= p)) - 1)
        .cast("long"),
    ))
    per_sent = m.select(
        "doc_id", "term", F.explode(sent_ids).alias("sent_id"))
    return (
        per_sent.groupBy("doc_id", "sent_id")
        .agg(F.countDistinct("term").alias("_nt"))
        .filter(F.col("_nt") == len(qterms))
        .select("doc_id", "sent_id")
        .orderBy("doc_id", "sent_id")
    )


SENT_KEY_BASE = 1 << 20  # composite (doc_id, sent_id) key: doc_id*BASE +
#                          sent_id. Bounds: <2^20 sentences per doc and
#                          doc_id < 2^43 — both comfortable for real
#                          corpora (a doc with 10^6 sentences is a
#                          shard-packing bug, not a document).


def sentence_postings(postings: DataFrame, bounds: DataFrame,
                      key_base: int = SENT_KEY_BASE) -> DataFrame:
    """Per-SENTENCE postings derived from ANY postings frame (corpus-built
    or packed-decoded) + the sentence-bounds side table: the composite
    key doc_id*key_base + sent_id plays doc_id, positions are re-based to
    sentence-LOCAL offsets.

    Because position DIFFERENCES are offset-invariant, every slot /
    phrase / proximity operator keeps its exact distance semantics when
    run over this frame — scoped to one sentence by construction (a
    match can never span two sentences: its tokens would live under
    different composite keys). One explode + ONE (key, term) groupBy; at
    scale this is the same shuffle family as the postings build itself,
    and deriving it from PACKED decoded postings means sentence-scoped
    queries ride the pruned block scan, not a corpus re-tokenization.
    """
    m = postings.join(bounds, "doc_id")
    occ = m.select("doc_id", "term", "bounds",
                   F.explode("positions").alias("p"))
    sent = (F.size(F.filter(F.col("bounds"), lambda b: b <= F.col("p"))) - 1) \
        .cast("long")
    occ = occ.withColumn("sent", sent)
    occ = occ.withColumn(
        "local",
        (F.col("p") - F.element_at(F.col("bounds"),
                                   (F.col("sent") + 1).cast("int"))).cast("int"))
    return (
        occ.groupBy((F.col("doc_id") * key_base + F.col("sent")).alias("doc_id"),
                    "term")
        .agg(F.sort_array(F.collect_list("local")).alias("positions"),
             F.count("*").cast("long").alias("tf"))
    )


def slot_within_sentence(postings: DataFrame, bounds: DataFrame,
                         dictionary: DataFrame | None,
                         slots: list[dict], dists: list[tuple[int, int]],
                         key_base: int = SENT_KEY_BASE) -> DataFrame:
    """Multi-slot token patterns scoped to ONE sentence — the corpus-query
    `A ... B within <s>` composition, with the FULL slot vocabulary
    (terms, wildcards, stems, tags, fuzzy) and distance ranges reused
    UNCHANGED: engine.slot_search runs over sentence_postings and never
    learns sentences exist.

    Output: (doc_id, sent_id, n_matches, match_starts) — match_starts are
    sentence-LOCAL token offsets (the within-sentence highlight
    positions), ordered (doc_id, sent_id).
    """
    from fastmorph_spark.search import engine

    sp = sentence_postings(postings, bounds, key_base)
    m = engine.slot_search(sp, dictionary, slots, dists)
    key = F.col("doc_id")
    return m.select(
        F.expr(f"doc_id div {key_base}").cast("long").alias("doc_id"),
        (key % key_base).cast("long").alias("sent_id"),
        "n_matches", "match_starts",
    ).orderBy("doc_id", "sent_id")


def slot_within_sentence_packed(index, bounds: DataFrame,
                                slots: list[dict],
                                dists: list[tuple[int, int]],
                                key_base: int = SENT_KEY_BASE) -> DataFrame:
    """slot_within_sentence off the PACKED index: the slots' postings come
    from the pruned block scan + Arrow decode (term_bucket partition
    pruning, doc-range block skip — exactly packed_slot_search's scan),
    then re-base through the bounds table. Sentence scope costs one extra
    join + groupBy over the ALREADY-PRUNED decode, never a corpus pass.
    Case-sensitive slots are rejected (the cs twin's position space is
    shared, but scoping it is untested territory — fail loudly)."""
    from fastmorph_spark.search.packed import (
        MAX_SLOT_EXPANSION,
        _packed_slot_postings,
    )

    if any(s.get("case") for s in slots):
        raise ValueError("case-sensitive slots are not supported within "
                         "sentence scope")
    decoded, dictionary, _, _ = _packed_slot_postings(
        index, slots, MAX_SLOT_EXPANSION)
    return slot_within_sentence(decoded, bounds, dictionary, slots, dists,
                                key_base)


def sentence_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus sentence profile: sentence count and mean tokens per
    non-empty sentence. Output: 1 row (n_sentences, avg_sent_len)."""
    from fastmorph_spark.constants import SCORE_DECIMALS

    tok = tokens_with_sentences(docs, text_col)
    per_sent = tok.groupBy("doc_id", "sent_id").agg(
        F.count("*").cast("long").alias("n_tokens"))
    return per_sent.agg(
        F.count("*").cast("long").alias("n_sentences"),
        F.round(F.avg("n_tokens"), SCORE_DECIMALS).alias("avg_sent_len"),
    )
