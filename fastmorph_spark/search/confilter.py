"""Concordance context filters + frequency breakdown — the two operations
a corpus portal offers ON an existing concordance [PK-high: the CQP/Sketch
Engine lineage fastmorph belongs to exposes both on every result page]:

* **context filter** ("positive"/"negative" filter): keep only the matches
  that DO (resp. do NOT) have some other token pattern within a window of
  token offsets around the match start — "show me `fast` only where `join`
  occurs within 5 tokens", or its negation. The filter pattern is a full
  slot spec (term/pattern/stem/tag/fuzzy/regex/case), reusing
  `engine.slot_postings`' dictionary-first expansion.

* **frequency breakdown**: group the match occurrences by the matched node
  form (which concrete token matched a wildcard/stem/tag slot) or group
  matched documents by a document attribute (lang/source) — the
  "Frequency" tab over a concordance.

Both consume `slot_search` output (doc_id, n_matches, match_starts) and the
filter RETURNS that same shape, so filters compose with kwic / snippets /
the request lifecycle and with themselves (filter chains).

Scale shape: the filter positions frame is doc_id-keyed and joined to the
match set once (left join; AQE broadcasts small match sets), the window
test is a higher-order `exists` over the per-doc sorted position array —
no per-row Python, no self-join on positions, no windows. The node-form
breakdown is one explode + ONE doc_id join into the tokenized documents
scan + a map-side-partial groupBy; the attribute breakdown never touches
text at all (joins the ~|matches| frame to the documents scan on doc_id,
aggregates counts already carried on the match rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastmorph_spark.search import engine
from fastmorph_spark.tokenize import tokenize_expr

__all__ = [
    "filter_context",
    "conc_freq_node",
    "conc_freq_attr",
    "packed_filter_context",
]


def _starts_arr():
    return F.split("match_starts", ",").cast("array<int>")


def filter_context(
    matches: DataFrame,
    postings: DataFrame,
    dictionary: DataFrame | None,
    filt: dict,
    window: tuple[int, int] = (-5, 5),
    mode: str = "positive",
    postings_cs: DataFrame | None = None,
    dictionary_cs: DataFrame | None = None,
) -> DataFrame:
    """Filter a match set by context: a match starting at position ``p``
    survives a *positive* filter iff some occurrence ``q`` of ``filt``
    exists in the same document with ``q - p`` in ``[lo, hi]`` (token
    offsets relative to the match START; lo may be negative for left
    context), and survives a *negative* filter iff no such ``q`` exists.

    Offsets are relative to the match start, so a window that should
    exclude a multi-token node span must say so explicitly (e.g. for a
    2-token match use (2, 6) for "within 5 tokens right of the node").
    Documents with no filter-pattern occurrence at all keep every match
    under ``negative`` and lose every match under ``positive`` — realized
    with one LEFT join + a null-safe exists, not a second anti-join pass.

    Returns the `slot_search` shape (doc_id, n_matches, match_starts),
    restricted to docs that still have >= 1 match.
    """
    lo, hi = int(window[0]), int(window[1])
    if lo > hi:
        raise ValueError(f"window lo {lo} > hi {hi}")
    if mode not in ("positive", "negative"):
        raise ValueError(f"mode must be positive|negative, got {mode!r}")
    fp = (
        engine.slot_postings(postings, dictionary, filt,
                             postings_cs=postings_cs,
                             dictionary_cs=dictionary_cs)
        .groupBy("doc_id")
        .agg(F.array_sort(F.array_distinct(F.flatten(F.collect_list("positions")))).alias("_fps"))
    )
    j = matches.select("doc_id", _starts_arr().alias("_starts")).join(fp, "doc_id", "left")

    def _has(p):
        # exists() over a NULL array is NULL; coalesce makes the missing-
        # filter-term doc behave as "no occurrence in window"
        return F.coalesce(
            F.exists(F.col("_fps"), lambda q: (q - p >= lo) & (q - p <= hi)),
            F.lit(False),
        )

    keep = _has if mode == "positive" else (lambda p: ~_has(p))
    kept = F.array_sort(F.filter(F.col("_starts"), keep))
    return (
        j.select("doc_id", kept.alias("_kept"))
        .filter(F.size("_kept") > 0)
        .select(
            "doc_id",
            F.size("_kept").cast("long").alias("n_matches"),
            F.array_join(F.col("_kept").cast("array<string>"), ",").alias("match_starts"),
        )
        .orderBy("doc_id")
    )


def conc_freq_node(
    matches: DataFrame,
    documents: DataFrame,
    match_len: int = 1,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Frequency breakdown of a concordance by NODE FORM: which concrete
    token sequence filled the matched slots, with occurrence and document
    counts — the "Frequency > node forms" view (ties broken
    (n_occ DESC, keyword ASC) for a deterministic top-k page).

    Returns (keyword, n_occ, n_docs) ordered by that key, limited to k.
    """
    occ = matches.select(
        "doc_id", F.explode(_starts_arr()).alias("pos")
    )
    toks = documents.select("doc_id", tokenize_expr(text_col).alias("_toks"))
    kw = occ.join(toks, "doc_id").select(
        "doc_id",
        F.array_join(F.slice("_toks", F.col("pos") + 1, F.lit(match_len)), " ").alias("keyword"),
    )
    return (
        kw.groupBy("keyword")
        .agg(
            F.count("*").alias("n_occ"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occ"), F.asc("keyword"))
        .limit(k)
    )


def conc_freq_attr(
    matches: DataFrame,
    documents: DataFrame,
    attr: str = "lang",
) -> DataFrame:
    """Frequency breakdown of a concordance by a DOCUMENT attribute
    (lang/source/...): per attribute value, total match occurrences and
    matched-document count — the "text type distribution" view. Never
    re-reads text: n_matches is already carried on the match rows, so this
    is one doc_id join (AQE-broadcast match set) + a tiny groupBy.

    Returns (attr, n_occ, n_docs) ordered (n_occ DESC, attr ASC).
    """
    j = matches.join(documents.select("doc_id", attr), "doc_id")
    return (
        j.groupBy(attr)
        .agg(
            F.sum("n_matches").cast("long").alias("n_occ"),
            F.count("*").alias("n_docs"),
        )
        .orderBy(F.desc("n_occ"), F.asc(attr))
    )


def packed_filter_context(
    index,
    slots: list[dict],
    dists: list[tuple[int, int]],
    filt: dict,
    window: tuple[int, int] = (-5, 5),
    mode: str = "positive",
    scope=None,
) -> DataFrame:
    """Context filter over the PACKED index: ONE pruned block scan +
    decode covers the query slots AND the filter pattern (the filter is
    passed as an extra slot to the decode planner, so block skipping,
    the predicate-direct wide-expansion regime, and the case-sensitive
    twin all engage exactly as in `packed_slot_search`), then the
    corpus-path `slot_search` + `filter_context` run over the decoded
    logical postings. Result-identical to the corpus path (shared
    oracle)."""
    from fastmorph_spark.search.packed import MAX_SLOT_EXPANSION, _packed_slot_postings, _pin_decoded

    every = list(slots) + [filt]
    decoded, dictionary, decoded_cs, dictionary_cs = _packed_slot_postings(
        index, every, MAX_SLOT_EXPANSION
    )
    decoded, decoded_cs = _pin_decoded(decoded, decoded_cs, every, scope)
    m = engine.slot_search(decoded, dictionary, slots, dists,
                           postings_cs=decoded_cs, dictionary_cs=dictionary_cs)
    return filter_context(m, decoded, dictionary, filt, window, mode,
                          postings_cs=decoded_cs, dictionary_cs=dictionary_cs)
