"""M1 — index-backed query operators with fastmorph's query semantics.

fastmorph answers token-slot pattern queries: word/lemma/wildcard slots,
distance ranges between slots, subcorpus filter, paginated results with
total counts [PK-high, SURVEY.md §1.1]. Re-expressed Spark-first:

- AND search        = posting-list intersection (J3) via groupBy-having
- phrase search     = positions self-predicate via higher-order functions (J4)
- proximity search  = slot distance window on position arrays (J4)
- wildcard search   = dictionary-first candidate match (P4), the same
                      shape as the reference's candidate-bitset pass
- pagination        = ranking window (O4/W1)
- BM25 top-k        = dictionary-broadcast join + score agg over postings

All operators take the LOGICAL index tables (postings/dictionary/doc_lens)
— the packed/WAND path (M2/M3) is a drop-in physical alternative that must
stay rank-identical.

Scale notes: query-term sets are tiny -> every dictionary/term join is a
broadcast; postings are filtered to query terms BEFORE any shuffle, so a
query touches only the matching term partitions (with the M2 layout,
only the matching term_bucket files are read at all).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastmorph_spark.constants import SCORE_DECIMALS

# docs per running-total bucket in `snippets` (two-phase prefix sum):
# monotone in doc_id, so (bucket asc, doc asc, pos asc) == global order;
# the only unpartitioned window runs over |matched_docs|/4096 count rows
SNIPPET_DOC_BUCKET = 4096
from fastmorph_spark.search.bm25 import bm25_score_col, sum_term_scores
from fastmorph_spark.tokenize import tokenize_expr, tokenize_py


def _filter_terms(postings: DataFrame, terms: list[str]) -> DataFrame:
    if not terms:
        return postings.filter(F.lit(False))
    return postings.filter(F.col("term").isin(terms))


def search_topk(
    postings: DataFrame,
    dictionary: DataFrame,
    doc_lens: DataFrame,
    stats: DataFrame,
    query_text: str,
    k: int = 10,
    round_score: bool = False,
) -> DataFrame:
    """Index-backed BM25 OR top-k; rank-identical to
    bm25.bm25_topk_expression (tested)."""
    qterms = sorted(set(tokenize_py(query_text)))
    matched = _filter_terms(postings, qterms)
    if "dl" not in matched.columns:  # postings from build_postings carry dl
        matched = matched.join(doc_lens, "doc_id")
    scored = (
        matched.join(F.broadcast(dictionary.filter(F.col("term").isin(qterms)).select("term", "df")), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_score",
            bm25_score_col(F.col("tf"), F.col("df"), F.col("n_docs"), F.col("dl"), F.col("avgdl")),
        )
    )
    scored = sum_term_scores(scored)
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    # rank over the UNROUNDED score (oracle parity); round only for output
    rank = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    out = topk.select(rank.cast("long").alias("rank"), "doc_id", "score")
    if round_score:
        out = out.withColumn("score", F.round("score", SCORE_DECIMALS))
    return out


def and_search(postings: DataFrame, query_text: str) -> DataFrame:
    """J3 — doc_ids containing ALL query terms (sorted). The groupBy-having
    form beats an n-way self-join: one shuffle on doc_id regardless of the
    number of terms, partial-aggregated map-side."""
    qterms = sorted(set(tokenize_py(query_text)))
    if not qterms:
        return postings.select("doc_id").filter(F.lit(False))
    return (
        _filter_terms(postings, qterms)
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("_nt"))
        .filter(F.col("_nt") == len(qterms))
        .select("doc_id")
    )


def _positions_map(postings: DataFrame, terms: list[str]) -> DataFrame:
    """Per doc containing ALL `terms`: map term -> positions array."""
    uniq = sorted(set(terms))
    return (
        _filter_terms(postings, uniq)
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("term", "positions"))).alias("pm"),
            F.count("*").alias("_nt"),
        )
        .filter(F.col("_nt") == len(uniq))
        .select("doc_id", "pm")
    )


def phrase_search(postings: DataFrame, phrase: str) -> DataFrame:
    """J4 — docs containing the exact token sequence (adjacent positions).

    Candidate docs (all terms present) are found by one agg; the sequence
    test is a Catalyst higher-order-function predicate over the position
    arrays — no Python, no extra shuffle. fastmorph's analog: nested
    position loops with distance==1 [PK-med]."""
    terms = tokenize_py(phrase)
    if not terms:
        return postings.select("doc_id").filter(F.lit(False))
    cand = _positions_map(postings, terms)
    pm = F.col("pm")
    pred = F.exists(
        pm[terms[0]],
        lambda p: reduce(
            lambda a, b: a & b,
            [F.array_contains(pm[t], p + i) for i, t in enumerate(terms[1:], 1)],
            F.lit(True),
        ),
    )
    return cand.filter(pred).select("doc_id").orderBy("doc_id")


def proximity_search(
    postings: DataFrame, t1: str, t2: str, dist_from: int, dist_to: int
) -> DataFrame:
    """J4 — fastmorph slot-distance semantics [PK-high]: docs where some
    occurrence of t2 is at pos(t1)+d for d in [dist_from, dist_to]."""
    cand = _positions_map(postings, [t1, t2])
    pm = F.col("pm")
    pred = F.exists(
        pm[t1],
        lambda p: F.exists(
            pm[t2], lambda q: (q - p >= dist_from) & (q - p <= dist_to)
        ),
    )
    return cand.filter(pred).select("doc_id").orderBy("doc_id")


def slot_postings(
    postings: DataFrame,
    dictionary: DataFrame | None,
    s: dict,
    postings_cs: DataFrame | None = None,
    dictionary_cs: DataFrame | None = None,
) -> DataFrame:
    """Postings rows matching ONE slot spec (the per-slot expansion shared
    by `slot_search` and the concordance context filter,
    fastmorph_spark.search.confilter).

    Dictionary-first expansion (broadcast semi-join) is the default: the
    stem/like/regex predicate then runs over the ~|vocab|-row dictionary,
    never per-posting. dictionary=None switches to DIRECT predicates on
    the postings' term column — only correct/cheap when the postings are
    already pruned to candidate terms (the packed decode path, where a
    huge wildcard expansion must not be collected or broadcast)."""
    cs = bool(s.get("case"))
    P = postings_cs if cs else postings
    D = dictionary_cs if cs else dictionary
    if cs and P is None:
        raise ValueError("case-sensitive slot needs postings_cs")
    if "term" in s:
        t = s["term"] if cs else s["term"].lower()
        return P.filter(F.col("term") == t)
    if "stem" in s:
        from fastmorph_spark.stem import stem_expr, stem_py

        if cs:
            raise ValueError("stem slots are case-folded by definition")
        target = stem_py(s["stem"].lower())
        if D is None:
            return P.filter(stem_expr(F.col("term")) == target)
        cand_terms = D.filter(stem_expr(F.col("term")) == target).select("term")
        return P.join(F.broadcast(cand_terms), "term", "left_semi")
    if "tag" in s:
        from fastmorph_spark.tags import TAG_CLASSES, tag_expr

        if cs:
            raise ValueError("tag slots are case-folded by definition")
        if s["tag"] not in TAG_CLASSES:
            raise ValueError(f"unknown tag class {s['tag']!r}")
        if D is None:
            return P.filter(tag_expr(F.col("term")) == s["tag"])
        cand_terms = D.filter(tag_expr(F.col("term")) == s["tag"]).select("term")
        return P.join(F.broadcast(cand_terms), "term", "left_semi")
    if "fuzzy" in s:
        # FUZZY slot: matches every token within `dist` Levenshtein
        # edits of the (folded) probe — approximate matching inside
        # multi-slot patterns; expanded dictionary-first like stems
        # (the |len| band + levenshtein run over the ~|vocab|
        # dictionary, JVM codegen, never per-posting)
        from fastmorph_spark.search.fuzzy import _fold_probe

        if cs:
            raise ValueError("fuzzy slots are case-folded by definition")
        w = _fold_probe(s["fuzzy"])
        d = int(s.get("dist", 1))
        pred = (
            (F.abs(F.length("term") - F.lit(len(w))) <= d)
            & (F.levenshtein(F.col("term"), F.lit(w)) <= d)
        )
        if D is None:
            return P.filter(pred)
        cand_terms = D.filter(pred).select("term")
        return P.join(F.broadcast(cand_terms), "term", "left_semi")
    if "regex" in s:
        # REGEX slot: whole-token match against the pinned
        # cross-engine subset (search/regex.py) — the CWB-style
        # power wildcards can't write; dictionary-first like
        # wildcards (RLike codegen over the ~|vocab| dictionary)
        from fastmorph_spark.search.regex import regex_pred

        pred = regex_pred(s["regex"], case=cs)
        if D is None:
            return P.filter(pred)
        cand_terms = D.filter(pred).select("term")
        return P.join(F.broadcast(cand_terms), "term", "left_semi")
    pat = s["pattern"] if cs else s["pattern"].lower()
    like = wildcard_pattern_to_like(pat)
    if D is None:
        return P.filter(F.col("term").like(like))
    cand_terms = D.filter(F.col("term").like(like)).select("term")
    return P.join(F.broadcast(cand_terms), "term", "left_semi")


def slot_search(
    postings: DataFrame,
    dictionary: DataFrame,
    slots: list[dict],
    dists: list[tuple[int, int]],
    postings_cs: DataFrame | None = None,
    dictionary_cs: DataFrame | None = None,
) -> DataFrame:
    """J4 generalized — fastmorph's defining query model [PK-high,
    SURVEY.md §1.1]: up to ~5 token slots, each independently constrained,
    with a distance RANGE between each consecutive pair.

    ``slots``: one dict per slot —
        {"term": "foo"}            exact token (case-folded match)
        {"pattern": "f*o?"}        wildcard slot (dictionary-first expansion)
        {"regex": "jo(in|b)s?"}    REGEX slot: whole-token match on the
                                   pinned cross-engine regex subset
                                   (search/regex.py); dictionary-first
                                   like wildcards
        {"stem": "joins"}          LEMMA slot: matches every token whose
                                   stem equals stem(value) — fastmorph's
                                   lemma-constrained slots [PK-high],
                                   realized with the deterministic rule
                                   stemmer (fastmorph_spark.stem); expanded
                                   dictionary-first like wildcards
        {"tag": "keyword"}         TOKEN-CLASS slot: matches every token
                                   whose class (fastmorph_spark.tags —
                                   number/keyword/stopword/ident) equals
                                   the value — the morph-tag-constrained
                                   slots fastmorph offers [PK-high],
                                   realized with the pinned deterministic
                                   classifier; expanded dictionary-first
                                   like stems
        {"fuzzy": "fasst"}         FUZZY slot: matches every token within
                                   "dist" (default 1) Levenshtein edits
                                   of the folded probe — approximate
                                   matching inside slot patterns;
                                   expanded dictionary-first
        + optional "case": True    case-SENSITIVE match (P5 case flags);
                                   requires the case-preserving twin index
                                   (postings_cs/dictionary_cs — same doc_id
                                   and position space, see tokenize_*_cs).
                                   ASCII-only contract: the shared position
                                   space between the folded and preserved
                                   tokenizations assumes ASCII case folding
                                   (constants.TOKEN_PATTERN_CS notes) —
                                   non-ASCII letters in documents must not
                                   be expected to form tokens when mixing
                                   case-sensitive and folded slots
    ``dists``: len(slots)-1 pairs (lo, hi); a match is positions
    p_0 < ... < p_{n-1} with p_{i+1} - p_i in [lo_i, hi_i].

    Returns (doc_id, n_matches, match_starts) where match_starts is the
    comma-joined sorted list of slot-0 positions that start a valid match —
    the highlight offsets fastmorph surfaces with results [PK-high].

    Plan shape at scale: each slot's postings are pruned dictionary-first
    (wildcards expand against the ~|vocab| dictionary, broadcast semi-join
    into postings), the union shuffles ONCE on doc_id, and the chained
    distance predicate runs as nested higher-order functions over the
    per-slot position arrays — no Python, no per-row UDF, no self-join
    explosion on positions.
    """
    n = len(slots)
    assert n >= 1 and len(dists) == n - 1
    parts = []
    for i, s in enumerate(slots):
        m = slot_postings(postings, dictionary, s,
                          postings_cs=postings_cs, dictionary_cs=dictionary_cs)
        parts.append(m.select("doc_id", F.lit(i).alias("slot"), "positions"))
    matched = reduce(DataFrame.unionByName, parts)
    per_slot = matched.groupBy("doc_id", "slot").agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("positions")))).alias("ps")
    )
    cand = (
        per_slot.groupBy("doc_id")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("slot", "ps"))).alias("pm"),
            F.count("*").alias("_n"),
        )
        .filter(F.col("_n") == n)
    )
    pm = F.col("pm")

    def _chain(i: int, p_prev):
        if i == n:
            return F.lit(True)
        lo, hi = dists[i - 1]
        return F.exists(
            pm[i], lambda q: (q >= p_prev + lo) & (q <= p_prev + hi) & _chain(i + 1, q)
        )

    starts = F.array_sort(F.filter(pm[0], lambda p: _chain(1, p)))
    return (
        cand.select("doc_id", starts.alias("_starts"))
        .filter(F.size("_starts") > 0)
        .select(
            "doc_id",
            F.size("_starts").cast("long").alias("n_matches"),
            F.array_join(F.col("_starts").cast("array<string>"), ",").alias("match_starts"),
        )
        .orderBy("doc_id")
    )


def wildcard_pattern_to_like(pattern: str) -> str:
    """fastmorph wildcard slots use * (any run) and ? (one char) [PK-high]."""
    return pattern.replace("%", r"\%").replace("_", r"\_").replace("*", "%").replace("?", "_")


def wildcard_terms(dictionary: DataFrame, pattern: str) -> DataFrame:
    """P4 — dictionary-first wildcard match: (term, df, cf) for terms
    matching the pattern, ordered (df DESC, term ASC). The dictionary is
    ~|vocab| rows — scanning it first, then semi-joining postings, mirrors
    the reference's candidate-bitset pass and avoids touching the corpus."""
    like = wildcard_pattern_to_like(pattern.lower())
    return dictionary.filter(F.col("term").like(like)).orderBy(F.desc("df"), F.asc("term"))


def wildcard_docs(postings: DataFrame, dictionary: DataFrame, pattern: str) -> DataFrame:
    """Distinct docs containing ANY term matching the wildcard."""
    terms = wildcard_terms(dictionary, pattern).select("term")
    return (
        postings.join(F.broadcast(terms), "term", "left_semi")
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
    )


def or_search(postings: DataFrame, query_text: str) -> DataFrame:
    """OR semantics with match strength — docs containing ANY query term,
    ranked by (n_terms matched DESC, total tf DESC, doc_id ASC). The
    boolean-OR counterpart of and_search: one groupBy shuffle on doc_id,
    partial-aggregated map-side; fastmorph's analog is the slot-less
    any-of candidate pass with per-doc hit counters [PK-med]."""
    qterms = sorted(set(tokenize_py(query_text)))
    if not qterms:
        return postings.select(
            "doc_id", F.lit(0).cast("long").alias("n_terms"),
            F.lit(0).cast("long").alias("total_tf"),
        ).filter(F.lit(False))
    return (
        _filter_terms(postings, qterms)
        .groupBy("doc_id")
        .agg(
            F.countDistinct("term").cast("long").alias("n_terms"),
            F.sum("tf").cast("long").alias("total_tf"),
        )
        .orderBy(F.desc("n_terms"), F.desc("total_tf"), F.asc("doc_id"))
    )


def stem_search(postings: DataFrame, dictionary: DataFrame, word: str) -> DataFrame:
    """Lemma search — docs containing ANY token that stems to stem(word),
    with the total occurrence count. Dictionary-first: the stem expression
    runs over the ~|vocab|-row dictionary (P4's candidate-bitset shape),
    then a broadcast semi-join prunes postings — the corpus-size table is
    never scanned with a per-row stem."""
    from fastmorph_spark.stem import stem_expr, stem_py

    target = stem_py(word.lower())
    cand_terms = dictionary.filter(stem_expr(F.col("term")) == target).select("term")
    return (
        postings.join(F.broadcast(cand_terms), "term", "left_semi")
        .groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("total_tf"))
        .orderBy("doc_id")
    )


def snippets(
    documents: DataFrame,
    matches: DataFrame,
    match_len: int,
    width: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Result assembly — fastmorph returns matched SENTENCES with highlight
    offsets and running totals, not bare doc ids [PK-high, SURVEY.md §3.1].

    ``matches`` is slot_search output (doc_id, n_matches, match_starts);
    each start position becomes one row with a token-window snippet:

      (doc_id, pos, hl_offset, snippet, running_total)

    pos        = 0-based token index of the match start in the document
    hl_offset  = 0-based token index of the match WITHIN the snippet
                 (the highlight offset; < width only when the match sits
                 near the document start)
    snippet    = the tokens [pos-width, pos+match_len-1+width] joined by
                 a single space (the canonical token stream — exactly
                 reconstructable by both engines)
    running_total = 1-based running count of matches in (doc_id, pos)
                 order — fastmorph's running totals surface

    Scale shape: matches explode to one row per occurrence, then ONE join
    against the documents scan on doc_id (sort-merge; broadcast when the
    match set is small enough for AQE to convert). Tokenization is the
    Catalyst expression twin — JVM-side, no Python. The running total is
    a two-phase distributed prefix sum (the pack_shards shape,
    ops/text.py): occurrences rank inside doc-id-range buckets (window
    PARTITIONED by bucket — fully distributed), cross-bucket offsets are
    an exclusive prefix sum over the tiny per-bucket counts (one task,
    |matched_docs|/SNIPPET_DOC_BUCKET rows). A common phrase at 100 TB
    never funnels millions of occurrence rows through one reducer
    (round-2's global Window.orderBy did — VERDICT r02 what's-wrong #2)."""
    occ = matches.select(
        id_col,
        F.explode(F.split("match_starts", ",").cast("array<int>")).alias("pos"),
    )
    toks = documents.select(F.col(id_col), tokenize_expr(text_col).alias("_toks"))
    j = occ.join(toks, id_col)
    start_el = F.greatest(F.col("pos") + 1 - width, F.lit(1))  # 1-based slice index
    end_el = F.least(F.col("pos") + match_len + width, F.size("_toks"))
    snip = F.array_join(F.slice("_toks", start_el, end_el - start_el + 1), " ")
    j = j.withColumn("_b", (F.col(id_col) / SNIPPET_DOC_BUCKET).cast("long"))
    w_local = Window.partitionBy("_b").orderBy(id_col, "pos")
    # per-bucket occurrence counts come from matches.n_matches (==
    # size(match_starts) by slot_search construction): no second pass
    # through the explode or the tokenize join. The semi-join against the
    # documents ids (column-pruned scan, no tokenize) keeps the counts
    # consistent with the emitted rows when `documents` covers only a
    # subset of the matched docs — otherwise occurrences dropped by the
    # inner join above would still be counted in _off and leave gaps in
    # running_total for later buckets (ADVICE r03 #2)
    counts = matches.join(documents.select(id_col), id_col, "left_semi").groupBy(
        (F.col(id_col) / SNIPPET_DOC_BUCKET).cast("long").alias("_b")
    ).agg(F.sum("n_matches").alias("_c"))
    w_cum = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_c").over(w_cum), F.lit(0)).cast("long").alias("_off")
    )
    return (
        j.select(
            F.col(id_col),
            F.col("pos").cast("long").alias("pos"),
            (F.col("pos") + 1 - start_el).cast("long").alias("hl_offset"),
            snip.alias("snippet"),
            "_b",
            F.row_number().over(w_local).cast("long").alias("_rn"),
        )
        .join(F.broadcast(offsets), "_b")
        .select(
            id_col, "pos", "hl_offset", "snippet",
            (F.col("_off") + F.col("_rn")).alias("running_total"),
        )
        .orderBy(id_col, "pos")
    )


def kwic(
    documents: DataFrame,
    matches: DataFrame,
    match_len: int,
    width: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """KWIC concordance — the keyword-in-context lines a corpus search
    interface presents, with the left context / keyword / right context
    SPLIT into separate columns so the caller can align on the keyword
    column [PK-high, SURVEY.md §3.1: fastmorph's result surface is
    concordance lines, not bare doc ids]. `snippets` is the joined-string
    twin; kwic is the aligned-column form.

    ``matches`` is slot_search output (doc_id, n_matches, match_starts);
    each start position becomes one row:

      (doc_id, pos, left_ctx, keyword, right_ctx)

    pos       = 0-based token index of the match start in the document
    left_ctx  = up to ``width`` tokens before the match, space-joined
                ('' at document start)
    keyword   = the ``match_len`` matched tokens, space-joined
    right_ctx = up to ``width`` tokens after the match, space-joined
                ('' at document end)

    Scale shape: identical to `snippets` minus the running total — one
    explode, ONE join against the documents scan on doc_id (sort-merge;
    AQE broadcasts small match sets), all slicing in JVM codegen via
    Catalyst array expressions. No windows at all, so nothing funnels
    through one reducer regardless of match-set size."""
    occ = matches.select(
        id_col,
        F.explode(F.split("match_starts", ",").cast("array<int>")).alias("pos"),
    )
    toks = documents.select(F.col(id_col), tokenize_expr(text_col).alias("_toks"))
    j = occ.join(toks, id_col)
    start_el = F.greatest(F.col("pos") + 1 - width, F.lit(1))  # 1-based slice index
    left_len = F.col("pos") + 1 - start_el  # >= 0; slice(_, _, 0) == []
    right_len = F.greatest(
        F.least(F.lit(width), F.size("_toks") - (F.col("pos") + match_len)), F.lit(0)
    )
    return j.select(
        F.col(id_col),
        F.col("pos").cast("long").alias("pos"),
        F.array_join(F.slice("_toks", start_el, left_len), " ").alias("left_ctx"),
        F.array_join(F.slice("_toks", F.col("pos") + 1, F.lit(match_len)), " ").alias("keyword"),
        F.array_join(F.slice("_toks", F.col("pos") + 1 + match_len, right_len), " ").alias("right_ctx"),
    ).orderBy(id_col, "pos")


def search_request(
    documents: DataFrame,
    postings: DataFrame,
    dictionary: DataFrame,
    slots: list[dict],
    dists: list[tuple[int, int]],
    skip: int = 0,
    until: int = 20,
    width: int = 2,
    postings_cs: DataFrame | None = None,
    dictionary_cs: DataFrame | None = None,
    scope=None,
    assembly: str = "snippets",
) -> DataFrame:
    """The FULL fastmorph request lifecycle in one call (SURVEY.md §3.1
    entry point 2 [PK-high]): slot pattern -> matches -> pagination window
    (ranks skip+1..until in corpus/doc_id order, the reference's result
    order) -> per-occurrence snippets with highlight offsets -> running
    totals within the page PLUS corpus-wide totals.

    Subcorpus filtering is upstream: pass lang-filtered `documents` and
    postings built from them (or a per-lang index's tables).

    Returns one row per match occurrence in the page:
      (rank, doc_id, pos, hl_offset, snippet, running_total,
       n_matches, total_docs, total_matches)

    Scale shape: the match set is computed ONCE (persisted — totals and
    the page read it twice); the page is pre-pruned with orderBy+limit
    (TakeOrderedAndProject) before any window; the page's <= until
    doc_ids are collected (bounded) and pushed into the documents scan
    as an In() filter, so the snippet stage reads a few parquet row
    groups — never the whole corpus. Cache lifetime: the
    persisted match set backs the returned lazy plan; pass a
    ``fastmorph_spark.cache.CacheScope`` as ``scope`` to have it freed
    when the scope closes (consume the result inside it), else the CALLER
    owns it — long-lived sessions should clearCache() between request
    bursts (ADVICE r02, VERDICT r03 #7)."""
    m = request_matches(postings, dictionary, slots, dists,
                        postings_cs=postings_cs, dictionary_cs=dictionary_cs,
                        scope=scope)
    return request_page(documents, m, len(slots), skip=skip, until=until,
                        width=width, assembly=assembly)


def request_matches(
    postings: DataFrame,
    dictionary: DataFrame,
    slots: list[dict],
    dists: list[tuple[int, int]],
    postings_cs: DataFrame | None = None,
    dictionary_cs: DataFrame | None = None,
    scope=None,
) -> DataFrame:
    """The request's persisted MATCH SET (doc_id, n_matches,
    match_starts) — computed once, read by totals and every page.
    Pagination continuation (SURVEY §3.1 entry point 3 [PK-med]: the
    reference re-serves skip/until windows from cached scan state) keeps
    this frame across requests and re-pages it via request_page."""
    from fastmorph_spark.cache import pin

    return pin(slot_search(postings, dictionary, slots, dists,
                           postings_cs=postings_cs, dictionary_cs=dictionary_cs),
               scope)


def request_page(
    documents: DataFrame,
    m: DataFrame,
    match_len: int,
    skip: int = 0,
    until: int = 20,
    width: int = 2,
    assembly: str = "snippets",
) -> DataFrame:
    """One pagination window over a request_matches frame: totals + page
    pre-prune + bounded snippet join (see search_request docstring for
    the scale shape).

    ``assembly`` picks the result surface: "snippets" (default) yields
    (rank, doc_id, pos, hl_offset, snippet, running_total, n_matches,
    total_docs, total_matches); "kwic" swaps the snippet columns for the
    aligned concordance form (rank, doc_id, pos, left_ctx, keyword,
    right_ctx, n_matches, total_docs, total_matches). Same pagination,
    same totals, same bounded page join either way."""
    if assembly not in ("snippets", "kwic"):
        raise ValueError(f"unknown assembly {assembly!r}")
    tot = m.agg(
        F.count("*").cast("long").alias("total_docs"),
        F.coalesce(F.sum("n_matches"), F.lit(0)).cast("long").alias("total_matches"),
    )
    # the snippet stage only ever reads the <= `until` page docs, but an
    # unfiltered `documents` frame would scan (and tokenize) the WHOLE
    # corpus to serve the join — at 100 TB that is a full-corpus read per
    # request. The page is bounded by `until`, so it is collected ONCE
    # (TakeOrderedAndProject over the persisted match set — each shard
    # keeps its local top-`until`, the driver k-merges) and re-planted as
    # a local frame; its doc_ids push an In() predicate into the scan, so
    # the snippet read is a few row-group fetches (parquet min/max
    # skipping) and the final job re-sorts nothing.
    spark = m.sparkSession
    page_rows = [
        (int(r["doc_id"]), i + 1, int(r["n_matches"]), r["match_starts"])
        for i, r in enumerate(
            m.select("doc_id", "n_matches", "match_starts")
            .orderBy("doc_id").limit(until).collect()
        )
        if i + 1 > skip
    ]
    page = spark.createDataFrame(
        page_rows, "doc_id long, rank long, n_matches long, match_starts string"
    )
    docs_page = documents.filter(
        F.col("doc_id").isin([d for d, _, _, _ in page_rows])
    )
    if assembly == "kwic":
        lines = kwic(docs_page, page, match_len=match_len, width=width)
        return (
            lines.join(F.broadcast(page.select("doc_id", "rank", "n_matches")), "doc_id")
            .crossJoin(F.broadcast(tot))
            .select("rank", "doc_id", "pos", "left_ctx", "keyword", "right_ctx",
                    "n_matches", "total_docs", "total_matches")
            .orderBy("doc_id", "pos")
        )
    snips = snippets(docs_page, page, match_len=match_len, width=width)
    return (
        snips.join(F.broadcast(page.select("doc_id", "rank", "n_matches")), "doc_id")
        .crossJoin(F.broadcast(tot))
        .select("rank", "doc_id", "pos", "hl_offset", "snippet",
                "running_total", "n_matches", "total_docs", "total_matches")
        .orderBy("doc_id", "pos")
    )


def paginate(ranked: DataFrame, skip: int, until: int) -> DataFrame:
    """O4 — fastmorph-style result window [PK-high]: ranks (skip, until]
    of a scored result. `ranked` must carry (doc_id, score).

    Scale shape: orderBy+limit(until) fuses to TakeOrderedAndProject —
    each partition keeps its local top-`until`, the driver k-merges — so
    the ranking window below runs over <= `until` rows, never the full
    match set through one task."""
    top = ranked.orderBy(F.desc("score"), F.asc("doc_id")).limit(until)
    rank = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    return (
        top.withColumn("rank", rank.cast("long"))
        .filter(F.col("rank") > skip)
        .select("rank", "doc_id", "score")
    )


def kwic_sorted(
    documents: DataFrame,
    matches: DataFrame,
    match_len: int,
    width: int = 5,
    by: str = "right",
    n: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SORTED concordance — the right-sort/left-sort view every corpus
    concordancer offers (group the keyword's continuations together so
    patterns pop out) [PK-high: sorting a concordance page is a core
    portal interaction; LIT: Sinclair 1991 on KWIC sort conventions].

    Pinned semantics (mirrored by oracles_corpus.kwic_sorted_sql):
    `by="right"` orders lines by the right-context STRING (binary/
    codepoint collation — tokens are space-joined, and ' ' < every
    tokenizer-emitted char, so the string order equals the 1R, 2R, ...
    token order), then left_ctx; `by="left"` orders by the REVERSED
    left-context token sequence space-joined (the 1L, 2L, ... read
    direction), then right_ctx. Final tie-break (doc_id, pos) makes the
    order total; `rank` materializes it.

    Scale shape: one `kwic` plan (explode + one doc_id join, no windows)
    + TakeOrderedAndProject for the page — the global sort never
    materializes, only top-n survives; the rank window runs over n rows
    on one partition, the bounded-page discipline of search_request."""
    if by not in ("right", "left"):
        raise ValueError(f"by must be 'right' or 'left', got {by!r}")
    lines = kwic(documents, matches, match_len, width, text_col, id_col)
    if by == "right":
        lines = lines.withColumn("_key", F.col("right_ctx"))
        tail = F.col("left_ctx")
    else:
        lines = lines.withColumn(
            "_key",
            F.array_join(F.reverse(F.split("left_ctx", " ")), " "))
        tail = F.col("right_ctx")
    order = [F.asc("_key"), tail.asc(), F.asc(id_col), F.asc("pos")]
    page = lines.orderBy(*order).limit(n)
    rank = F.row_number().over(Window.orderBy(*order))
    return page.select(
        rank.cast("long").alias("rank"),
        id_col, "pos", "left_ctx", "keyword", "right_ctx",
    )


GDEX_TARGET_LEN = 20  # preferred document token length for an example


def kwic_gdex(
    documents: DataFrame,
    dictionary: DataFrame,
    matches: DataFrame,
    match_len: int,
    width: int = 5,
    n: int = 100,
    target_len: int = GDEX_TARGET_LEN,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Best-example concordance sort — GDEX-style "good dictionary
    example" ranking [LIT: Kilgarriff et al. 2008, "GDEX: Automatically
    finding good dictionary examples in a corpus"]: surface the lines a
    lexicographer would pick first, instead of corpus order.

    Pinned heuristic (mirrored by oracles_corpus.kwic_gdex_sql), the two
    GDEX core signals that are deterministic on any corpus:

    - COMMON context reads easier: ``min_cf`` = the corpus frequency of
      the RAREST context token of the line (the kwic window minus the
      node span); a single obscure word disqualifies an example, which
      is why GDEX uses the minimum, not the mean. Empty context (the
      document IS the node) pins min_cf = 0.
    - MODERATE length reads easier: documents near ``target_len`` tokens
      are preferred.

        score = ln(1.0 + min_cf) - abs(dl - target_len) / target_len

    Rank over the UNROUNDED score, (score DESC, doc_id ASC, pos ASC)
    tie-break; output score rounded to SCORE_DECIMALS. Output:
    (rank, doc_id, pos, min_cf, dl, score, left_ctx, keyword,
    right_ctx).

    Scale shape: the kwic line set (one explode + one documents join,
    exactly engine.kwic) plus one line-bounded context explode
    (<= 2*width tokens per line) joined against the vocabulary-sized
    dictionary for cf, then TakeOrderedAndProject caps at n. No window
    over an unbounded partition; the rank window runs on <= n rows."""
    from fastmorph_spark.constants import SCORE_DECIMALS

    occ = matches.select(
        id_col,
        F.explode(F.split("match_starts", ",").cast("array<int>")).alias("pos"),
    )
    toks = documents.select(F.col(id_col), tokenize_expr(text_col).alias("_toks"))
    j = occ.join(toks, id_col)
    start_el = F.greatest(F.col("pos") + 1 - width, F.lit(1))
    left_len = F.col("pos") + 1 - start_el
    right_len = F.greatest(
        F.least(F.lit(width), F.size("_toks") - (F.col("pos") + match_len)),
        F.lit(0),
    )
    lines = j.select(
        F.col(id_col),
        F.col("pos").cast("long").alias("pos"),
        F.size("_toks").cast("long").alias("dl"),
        F.concat(
            F.slice("_toks", start_el, left_len),
            F.slice("_toks", F.col("pos") + 1 + match_len, right_len),
        ).alias("_ctx"),
        F.array_join(F.slice("_toks", start_el, left_len), " ").alias("left_ctx"),
        F.array_join(
            F.slice("_toks", F.col("pos") + 1, F.lit(match_len)), " "
        ).alias("keyword"),
        F.array_join(
            F.slice("_toks", F.col("pos") + 1 + match_len, right_len), " "
        ).alias("right_ctx"),
    )
    ctx = lines.select(id_col, "pos", F.explode("_ctx").alias("term"))
    # inner join loses nothing: every context token is in the dictionary
    # by construction (same tokenizer); empty-context lines re-enter
    # through the left join below with min_cf pinned to 0
    mins = (
        ctx.join(dictionary.select("term", "cf"), "term")
        .groupBy(id_col, "pos")
        .agg(F.min("cf").cast("long").alias("min_cf"))
    )
    scored = (
        lines.join(mins, [id_col, "pos"], "left")
        .withColumn("min_cf", F.coalesce(F.col("min_cf"), F.lit(0)))
        .withColumn(
            "score",
            # pinned: ln(1.0 + min_cf) - abs(dl - target) / target
            F.log(F.lit(1.0) + F.col("min_cf").cast("double"))
            - F.abs(F.col("dl").cast("double") - F.lit(float(target_len)))
            / F.lit(float(target_len)),
        )
    )
    topn = scored.orderBy(
        F.desc("score"), F.asc(id_col), F.asc("pos")).limit(n)
    rank = F.row_number().over(
        Window.orderBy(F.desc("score"), F.asc(id_col), F.asc("pos")))
    return topn.select(
        rank.cast("long").alias("rank"),
        id_col, "pos",
        "min_cf", "dl",
        F.round("score", SCORE_DECIMALS).alias("score"),
        "left_ctx", "keyword", "right_ctx",
    )
