"""Windowed collocation statistics — PMI-ranked neighbors of a target term.

Corpus-linguistics standard analysis [LIT: Church & Hanks 1990, "Word
Association Norms, Mutual Information, and Lexicography"] over the same
token-position model as the slot/proximity operators (SURVEY.md §1.1 —
the reference serves a corpus-linguistics portal, where collocation /
frequency profiles are the canonical companion analysis to concordance
search [PK-med]).

Semantics (pinned, mirrored exactly by oracles.collocations_sql):

- a PAIR is one (occurrence of `target` at position p_t, occurrence of
  another term at position p_n) in the same doc with
  ``1 <= |p_n - p_t| <= window`` (distinct terms can never share a
  position, so the lower bound is structural);
- ``cooc(n)`` = total pair count for neighbor term n over the corpus;
- ``pmi = ln((cooc * total_tokens) / (cf_target * cf_n))`` — pointwise
  mutual information on pair counts, window-unnormalized (the window
  factor is constant across neighbors, so it shifts every score equally
  and cannot reorder);
- neighbors below ``min_count`` pairs are dropped (PMI's low-frequency
  instability [LIT]);
- deterministic order/tie-break: ``(pmi DESC, term ASC)``, rank computed
  over the UNROUNDED pmi (same discipline as search_topk), output pmi
  rounded to SCORE_DECIMALS.

Scale shape (corpus/logical path): the target's postings row set is
df(target) rows; the neighbor side joins postings to it on doc_id —
broadcast by default (a collocation target is typically selective), with
``broadcast_target=False`` falling back to a shuffle join for corpus-
stopword targets. Pair counting is a Catalyst higher-order expression
over the two position arrays (JVM codegen, no Python); the only other
shuffle is the final groupBy(term).

Packed path (packed_collocations): the neighbor decode is bounded by the
TARGET's doc-shard envelopes — only blocks whose (doc_shard,
[first_doc, max_doc]) can intersect a target posting are decoded, the
same metadata-only block-skip machinery as search/packed.pruned_blocks.
For a rare target this touches a small fraction of the index; for a
corpus-stopword target it degrades toward a full decode, which is the
honest cost floor of a term-major layout (the corpus-scan path pays the
same). Tombstoned docs are dropped from both sides; like packed BM25,
dictionary stats (cf, total) are documented stale until purge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.tokenize import tokenize_expr

OUT_SCHEMA = "rank long, term string, cooc long, cf long, pmi double"

# auto broadcast gate: a target posting row is (doc_id, positions) —
# above this df the broadcast side stops being "small dim" and the pair
# join falls back to a shuffle join on doc_id
BROADCAST_TARGET_MAX_DF = 1_000_000


def _pair_counts(postings_rows: DataFrame, target: str, window: int,
                 broadcast_target: bool = True) -> DataFrame:
    """(term, cooc) pair counts from logical `(term, doc_id, positions)`
    rows. One join on doc_id (neighbor rows exist only for docs that
    contain the target) + one agg on term."""
    tgt = postings_rows.filter(F.col("term") == target) \
        .select("doc_id", F.col("positions").alias("_tpos"))
    if broadcast_target:
        tgt = F.broadcast(tgt)
    pairs_expr = F.expr(
        "aggregate(positions, 0L, (acc, p) -> "
        "acc + CAST(size(filter(_tpos, q -> abs(p - q) <= {w})) AS BIGINT))"
        .format(w=int(window))
    )
    return (
        postings_rows.filter(F.col("term") != target)
        .join(tgt, "doc_id")
        .select("term", pairs_expr.alias("_pairs"))
        .groupBy("term")
        .agg(F.sum("_pairs").alias("cooc"))
        .filter(F.col("cooc") > 0)
    )


def _score(cooc: DataFrame, dictionary: DataFrame, target: str,
           min_count: int, k: int) -> DataFrame:
    """PMI scoring tail shared by the corpus and packed paths: the
    target's mass is its corpus frequency."""
    tcf = dictionary.filter(F.col("term") == target) \
        .select(F.col("cf").cast("double").alias("_tcf"))
    return _score_with_mass(cooc, dictionary, tcf, min_count, k)


def _score_with_mass(cooc: DataFrame, dictionary: DataFrame,
                     mass: DataFrame, min_count: int, k: int) -> DataFrame:
    """PMI scoring tail over an explicit 1-row node-mass frame `_tcf`
    (a term's cf, or a concordance's total match occurrences). `cooc`
    is small (distinct neighbor terms); the dictionary join keys on it,
    the two stats frames are 1-row broadcasts."""
    tot = dictionary.agg(F.sum("cf").cast("double").alias("_total"))
    scored = (
        cooc.filter(F.col("cooc") >= min_count)
        .join(dictionary.select("term", "cf"), "term")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(mass))
        .withColumn(
            "pmi",
            # one pinned parenthesization, mirrored in the oracle SQL:
            # ln((cooc * total) / (mass * cf_n)) — all float64
            F.log((F.col("cooc").cast("double") * F.col("_total"))
                  / (F.col("_tcf") * F.col("cf").cast("double"))),
        )
    )
    topk = scored.orderBy(F.desc("pmi"), F.asc("term")).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("pmi"), F.asc("term")))
    return topk.select(
        rank.cast("long").alias("rank"),
        "term",
        F.col("cooc").cast("long").alias("cooc"),
        F.col("cf").cast("long").alias("cf"),
        F.round("pmi", SCORE_DECIMALS).alias("pmi"),
    )


def collocations(postings: DataFrame, dictionary: DataFrame, target: str,
                 window: int = 3, min_count: int = 2, k: int = 20,
                 broadcast_target: bool | None = None) -> DataFrame:
    """PMI-ranked collocations of `target` over logical postings
    `(term, doc_id, tf, positions)` (index.build_postings output).

    Returns (rank, term, cooc, cf, pmi) — see module docstring for the
    pinned semantics. Empty result (not an error) when the target is
    absent from the corpus.

    ``broadcast_target=None`` (default) decides from the dictionary's
    exact df — the same dictionary-first lookup every query path makes —
    so a selective target gets the map-side broadcast join while a
    corpus-stopword target (df > BROADCAST_TARGET_MAX_DF) falls back to
    a shuffle join instead of broadcasting an unbounded frame. The
    result is identical either way (tested); only the join strategy
    changes.
    """
    if broadcast_target is None:
        drow = dictionary.filter(F.col("term") == target) \
            .select("df").collect()
        broadcast_target = bool(drow) and int(drow[0]["df"]) <= BROADCAST_TARGET_MAX_DF
    return _score(
        _pair_counts(postings.select("term", "doc_id", "positions"),
                     target, window, broadcast_target),
        dictionary, target, min_count, k,
    )


def packed_collocations(index, target: str, window: int = 3,
                        min_count: int = 2, k: int = 20,
                        scope=None) -> DataFrame:
    """`collocations` off the PACKED index, without corpus re-tokenization.

    Block selection is metadata-only: the target's pruned block scan
    yields its per-shard [first_doc, max_doc] envelopes; every OTHER
    block outside those envelopes is skipped before any payload byte is
    read (search/packed._apply_keep). The surviving blocks are varbyte-
    decoded ONCE (the decode backs both sides of the pair join, hence the
    persist — caller-owned by default, or pass scope=CacheScope per the
    fastmorph_spark.cache contract), then fed to the same pair-count +
    PMI tail as the corpus path.
    """
    from fastmorph_spark.cache import pin
    from fastmorph_spark.search.packed import (
        _apply_keep,
        _decode_blocks,
        _live,
        pruned_blocks,
    )

    spark = index.postings.sparkSession
    tgt_blocks = pruned_blocks(index, [target])
    if tgt_blocks is None:
        cooc = spark.createDataFrame([], "term string, cooc long")
        return _score(cooc, index.dictionary, target, min_count, k)
    keep = tgt_blocks.groupBy("doc_shard").agg(
        F.min("first_doc").alias("_lo"), F.max("max_doc").alias("_hi")
    )
    blocks = _apply_keep(index.postings, keep)
    decoded = pin(_live(_decode_blocks(blocks, spark), index), scope)
    cooc = _pair_counts(decoded, target, window)
    return _score(cooc, index.dictionary, target, min_count, k)


def _pair_counts_directional(postings_rows: DataFrame, target: str,
                             window: int,
                             broadcast_target: bool = True) -> DataFrame:
    """(term, left_n, right_n) pair counts — the word-sketch split:
    left_n counts pairs where the neighbor occurrence PRECEDES the
    target (q - p in [1, window]), right_n where it follows. Same join
    shape as _pair_counts (one doc_id join + one term agg); the two
    sides come from two aggregate expressions over the same row, not a
    second pass."""
    tgt = postings_rows.filter(F.col("term") == target) \
        .select("doc_id", F.col("positions").alias("_tpos"))
    if broadcast_target:
        tgt = F.broadcast(tgt)
    left_expr = F.expr(
        "aggregate(positions, 0L, (acc, p) -> acc + CAST(size(filter("
        "_tpos, q -> q - p >= 1 AND q - p <= {w})) AS BIGINT))"
        .format(w=int(window)))
    right_expr = F.expr(
        "aggregate(positions, 0L, (acc, p) -> acc + CAST(size(filter("
        "_tpos, q -> p - q >= 1 AND p - q <= {w})) AS BIGINT))"
        .format(w=int(window)))
    return (
        postings_rows.filter(F.col("term") != target)
        .join(tgt, "doc_id")
        .select("term", left_expr.alias("_l"), right_expr.alias("_r"))
        .groupBy("term")
        .agg(F.sum("_l").alias("left_n"), F.sum("_r").alias("right_n"))
        .filter((F.col("left_n") + F.col("right_n")) > 0)
    )


def collocations_directional(postings: DataFrame, dictionary: DataFrame,
                             target: str, window: int = 3,
                             min_count: int = 2, k: int = 20,
                             broadcast_target: bool | None = None) -> DataFrame:
    """PMI-ranked collocations with the LEFT/RIGHT positional split a
    word-sketch view shows (does 'fast' attract 'join' before or after
    it?). Ranking and PMI are computed over the TOTAL cooc with the
    exact collocations() pinning; left_n/right_n are the breakdown
    (left_n + right_n == cooc by construction: distinct terms never
    share a position, so every within-window pair is strictly one-sided).
    Output: (rank, term, cooc, left_n, right_n, cf, pmi)."""
    if broadcast_target is None:
        df_row = dictionary.filter(F.col("term") == target) \
            .select("df").limit(1).collect()
        broadcast_target = bool(df_row) and \
            df_row[0]["df"] <= BROADCAST_TARGET_MAX_DF
    cooc = _pair_counts_directional(postings, target, window,
                                    broadcast_target=broadcast_target)
    cooc = cooc.withColumn("cooc", F.col("left_n") + F.col("right_n"))
    tot = dictionary.agg(F.sum("cf").cast("double").alias("_total"))
    tcf = dictionary.filter(F.col("term") == target) \
        .select(F.col("cf").cast("double").alias("_tcf"))
    scored = (
        cooc.filter(F.col("cooc") >= min_count)
        .join(dictionary.select("term", "cf"), "term")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tcf))
        .withColumn(
            "pmi",
            F.log((F.col("cooc").cast("double") * F.col("_total"))
                  / (F.col("_tcf") * F.col("cf").cast("double"))),
        )
    )
    topk = scored.orderBy(F.desc("pmi"), F.asc("term")).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("pmi"), F.asc("term")))
    return topk.select(
        rank.cast("long").alias("rank"),
        "term",
        F.col("cooc").cast("long").alias("cooc"),
        F.col("left_n").cast("long").alias("left_n"),
        F.col("right_n").cast("long").alias("right_n"),
        F.col("cf").cast("long").alias("cf"),
        F.round("pmi", SCORE_DECIMALS).alias("pmi"),
    )


def _pmi_profile(postings: DataFrame, dictionary: DataFrame, target: str,
                 window: int, min_count: int,
                 broadcast_target: bool | None = None) -> DataFrame:
    """One target's full PMI-scored collocate profile ``(term, cooc,
    pmi)`` — `collocations` without the top-k cut, reused by
    `sketch_diff` so both sides carry the exact A8 pinning."""
    if broadcast_target is None:
        df_row = dictionary.filter(F.col("term") == target) \
            .select("df").limit(1).collect()
        broadcast_target = bool(df_row) and \
            df_row[0]["df"] <= BROADCAST_TARGET_MAX_DF
    cooc = _pair_counts(postings, target, window,
                        broadcast_target=broadcast_target)
    tot = dictionary.agg(F.sum("cf").cast("double").alias("_total"))
    tcf = dictionary.filter(F.col("term") == target) \
        .select(F.col("cf").cast("double").alias("_tcf"))
    return (
        cooc.filter(F.col("cooc") >= min_count)
        .join(dictionary.select("term", "cf"), "term")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tcf))
        .select(
            "term",
            F.col("cooc").cast("long").alias("cooc"),
            # the pinned collocations parenthesization:
            # ln((cooc * total) / (cf_target * cf_n))
            F.log((F.col("cooc").cast("double") * F.col("_total"))
                  / (F.col("_tcf") * F.col("cf").cast("double"))).alias("pmi"),
        )
    )


def sketch_diff(postings: DataFrame, dictionary: DataFrame,
                target_a: str, target_b: str, window: int = 3,
                min_count: int = 2, k: int = 20,
                broadcast_target: bool | None = None) -> DataFrame:
    """Word-sketch DIFF — the two-word comparison view a corpus portal
    shows for near-synonyms [LIT: Kilgarriff et al. 2004, the Sketch
    Engine's "sketch difference"]: collocates SHARED by `target_a` and
    `target_b`, ranked by how much more strongly A attracts them than B.

    Semantics (pinned, mirrored by oracles_corpus.sketch_diff_sql): each
    side is the full `collocations` profile under the A8 pinning
    (min_count applied per side); the panel is the INNER join on the
    collocate term (the shared-collocate panel — one-sided collocates
    are what the plain per-word sketch already shows);
    ``diff = pmi_a - pmi_b``; order/tie-break ``(diff DESC, term ASC)``,
    rank over the UNROUNDED diff, pmi/diff rounded on output.

    Scale shape: two `_pair_counts` joins (each df(target)-bounded and
    broadcast-gated exactly like `collocations`) + one join between two
    collocate-profile frames that are each at most |vocab| rows."""
    pa = _pmi_profile(postings, dictionary, target_a, window, min_count,
                      broadcast_target)
    pb = _pmi_profile(postings, dictionary, target_b, window, min_count,
                      broadcast_target)
    return _sketch_diff_tail(pa, pb, k)


def _sketch_diff_tail(pa: DataFrame, pb: DataFrame, k: int) -> DataFrame:
    """Shared-collocate join + diff ranking — the sketch_diff tail,
    shared with the packed twin so both carry one pinning."""
    joined = (
        pa.select("term", F.col("cooc").alias("cooc_a"),
                  F.col("pmi").alias("pmi_a"))
        .join(pb.select("term", F.col("cooc").alias("cooc_b"),
                        F.col("pmi").alias("pmi_b")), "term")
        .withColumn("diff", F.col("pmi_a") - F.col("pmi_b"))
    )
    topk = joined.orderBy(F.desc("diff"), F.asc("term")).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("diff"), F.asc("term")))
    return topk.select(
        rank.cast("long").alias("rank"),
        "term",
        F.col("cooc_a").cast("long").alias("cooc_a"),
        F.col("cooc_b").cast("long").alias("cooc_b"),
        F.round("pmi_a", SCORE_DECIMALS).alias("pmi_a"),
        F.round("pmi_b", SCORE_DECIMALS).alias("pmi_b"),
        F.round("diff", SCORE_DECIMALS).alias("diff"),
    )


def packed_sketch_diff(index, target_a: str, target_b: str, window: int = 3,
                       min_count: int = 2, k: int = 20,
                       scope=None) -> DataFrame:
    """`sketch_diff` off the PACKED index — the serving path for the
    `{"sketch_diff": [a, b]}` request form.

    Block selection is metadata-only like packed_collocations, with the
    UNION of both targets' doc-shard envelopes as the keep set (a
    correct superset of each side's needs: pair counting only reads
    neighbor postings inside the respective target's docs, and extra
    decoded rows can't create pairs). Both PMI profiles run over ONE
    pinned decode; the tail is byte-identical to the corpus path."""
    from fastmorph_spark.cache import pin
    from fastmorph_spark.search.packed import (
        _apply_keep,
        _decode_blocks,
        _live,
        pruned_blocks,
    )

    spark = index.postings.sparkSession
    tgt_blocks = pruned_blocks(index, [target_a, target_b])
    if tgt_blocks is None:
        empty = spark.createDataFrame(
            [], "term string, cooc long, pmi double")
        return _sketch_diff_tail(empty, empty, k)
    keep = tgt_blocks.groupBy("doc_shard").agg(
        F.min("first_doc").alias("_lo"), F.max("max_doc").alias("_hi")
    )
    blocks = _apply_keep(index.postings, keep)
    decoded = pin(_live(_decode_blocks(blocks, spark), index), scope)
    pa = _pmi_profile(decoded, index.dictionary, target_a, window, min_count)
    pb = _pmi_profile(decoded, index.dictionary, target_b, window, min_count)
    return _sketch_diff_tail(pa, pb, k)


def collocations_measures(postings: DataFrame, dictionary: DataFrame,
                          target: str, window: int = 3, min_count: int = 2,
                          k: int = 20,
                          broadcast_target: bool | None = None) -> DataFrame:
    """The full association-measure PANEL per collocate — the three
    scores a corpus portal's collocation tab lets the user rank by
    [LIT: Rychlý 2008 "A lexicographer-friendly association score"
    (logDice, the Sketch Engine default); Church et al. 1991 (t-score);
    Church & Hanks 1990 (PMI)]:

      (rank, term, cooc, cf, pmi, logdice, tscore)

    Pinned formulas (mirrored textually by
    oracles_corpus.collocations_measures_sql; all float64, rounded to
    SCORE_DECIMALS on output, rank over the UNROUNDED logdice):

    - ``pmi`` — exactly the A8 pinning:
      ``ln((cooc * total) / (cf_target * cf_n))``;
    - ``logdice = 14 + ln((2.0 * cooc) / (cf_target + cf_n)) / ln(2)``
      (log2 pinned as ln/ln2, the keyness discipline) — frequency-stable
      under corpus growth, which is why it is the default RANKING here:
      order/tie-break ``(logdice DESC, term ASC)``;
    - ``tscore = (cooc - (cf_target * cf_n) / total) / sqrt(cooc)`` —
      pair counts against the independence expectation.

    Same scale shape as `collocations`: ONE df(target)-gated doc_id join
    for pair counts + one term agg; the measures are three expressions
    over the same joined row (no extra pass, no extra shuffle).
    """
    if broadcast_target is None:
        df_row = dictionary.filter(F.col("term") == target) \
            .select("df").limit(1).collect()
        broadcast_target = bool(df_row) and \
            df_row[0]["df"] <= BROADCAST_TARGET_MAX_DF
    cooc = _pair_counts(postings.select("term", "doc_id", "positions"),
                        target, window, broadcast_target)
    tot = dictionary.agg(F.sum("cf").cast("double").alias("_total"))
    tcf = dictionary.filter(F.col("term") == target) \
        .select(F.col("cf").cast("double").alias("_tcf"))
    c = F.col("cooc").cast("double")
    n = F.col("cf").cast("double")
    scored = (
        cooc.filter(F.col("cooc") >= min_count)
        .join(dictionary.select("term", "cf"), "term")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tcf))
        .withColumn("pmi", F.log((c * F.col("_total"))
                                 / (F.col("_tcf") * n)))
        .withColumn("logdice",
                    F.lit(14.0) + F.log((F.lit(2.0) * c)
                                        / (F.col("_tcf") + n))
                    / F.log(F.lit(2.0)))
        .withColumn("tscore",
                    (c - (F.col("_tcf") * n) / F.col("_total"))
                    / F.sqrt(c))
    )
    topk = scored.orderBy(F.desc("logdice"), F.asc("term")).limit(k)
    rank = F.row_number().over(
        Window.orderBy(F.desc("logdice"), F.asc("term")))
    return topk.select(
        rank.cast("long").alias("rank"),
        "term",
        F.col("cooc").cast("long").alias("cooc"),
        F.col("cf").cast("long").alias("cf"),
        F.round("pmi", SCORE_DECIMALS).alias("pmi"),
        F.round("logdice", SCORE_DECIMALS).alias("logdice"),
        F.round("tscore", SCORE_DECIMALS).alias("tscore"),
    )


def _conc_pair_counts(matches: DataFrame, postings_rows: DataFrame,
                      match_len: int, window: int,
                      broadcast_matches: bool = True) -> DataFrame:
    """(term, cooc) pair counts around a CONCORDANCE's node spans: one
    pair per (match start p, occurrence q of a term) in the same doc with
    q within `window` tokens of the node span [p, p+match_len-1] and q
    OUTSIDE the span. Same join shape as _pair_counts — the match set
    replaces the target's postings rows."""
    st = matches.select(
        "doc_id", F.split("match_starts", ",").cast("array<int>").alias("_starts")
    )
    if broadcast_matches:
        st = F.broadcast(st)
    sl = int(match_len) - 1  # span end offset from the start
    pairs_expr = F.expr(
        "aggregate(positions, 0L, (acc, q) -> acc + CAST(size(filter("
        "_starts, p -> q >= p - {w} AND q <= p + {sl} + {w} "
        "AND NOT (q >= p AND q <= p + {sl}))) AS BIGINT))"
        .format(w=int(window), sl=sl)
    )
    return (
        postings_rows.join(st, "doc_id")
        .select("term", pairs_expr.alias("_pairs"))
        .groupBy("term")
        .agg(F.sum("_pairs").alias("cooc"))
        .filter(F.col("cooc") > 0)
    )


def conc_collocations(matches: DataFrame, postings: DataFrame,
                      dictionary: DataFrame, match_len: int = 1,
                      window: int = 3, min_count: int = 2, k: int = 20,
                      broadcast_matches: bool = True) -> DataFrame:
    """PMI-ranked collocates of a CONCORDANCE — the portal's collocation
    analysis over an arbitrary slot-pattern result set, not just a single
    target term [PK-high: the Sketch-Engine/CQPweb "collocation" tab runs
    on the current concordance]. ``matches`` is slot_search output; the
    node span at each start p is [p, p+match_len-1] (pass the phrase
    length for contiguous patterns, 1 to anchor on the match start for
    ranged patterns — offsets are then start-relative, documented).

    Pinned semantics mirror `collocations` with the node MASS = total
    match occurrences replacing the target's cf:
    ``pmi = ln((cooc * total_tokens) / (n_node_occ * cf_n))``; node-span
    POSITIONS are excluded from neighbors (a term occurring both inside
    and outside the span still collocates through its outside
    occurrences). Same (pmi DESC, term ASC) order, min_count gate,
    SCORE_DECIMALS rounding.

    Scale shape: the match set is ~|matched docs| rows and broadcasts by
    default (pass broadcast_matches=False for a stopword-sized node);
    pair counting is one doc_id join + a HOF aggregate (JVM codegen) +
    one term groupBy — identical to the single-term profile."""
    mass = matches.agg(
        F.sum("n_matches").cast("double").alias("_tcf"))
    cooc = _conc_pair_counts(matches, postings.select("term", "doc_id", "positions"),
                             match_len, window, broadcast_matches)
    return _score_with_mass(cooc, dictionary, mass, min_count, k)


def conc_collocations_packed(index, slots: list[dict],
                             dists: list[tuple[int, int]],
                             match_len: int = 1, window: int = 3,
                             min_count: int = 2, k: int = 20,
                             scope=None) -> DataFrame:
    """`conc_collocations` off the PACKED index with ONE decode serving
    both the node match set and the neighbor side.

    Block selection is metadata-only, reusing the slot engine's doc-range
    machinery: every matched doc must contain a candidate term from EVERY
    slot, so a shard survives only if all slot groups reach it and their
    [max lo, min hi] envelope is non-empty (packed._envelope_keep) — the
    neighbor decode is bounded by the same envelopes that bound the node
    scan. Wide expansions (predicate-direct regime) and case-sensitive
    slots fall back to a full decode: the neighbor side needs every term
    anyway, so there is no cheaper correct bound there."""
    from fastmorph_spark.cache import pin
    from fastmorph_spark.search import engine
    from fastmorph_spark.search.packed import (
        MAX_SLOT_EXPANSION,
        _apply_keep,
        _decode_blocks,
        _envelope_keep,
        _expand_slot_term_groups,
        _live,
    )

    spark = index.postings.sparkSession
    groups = _expand_slot_term_groups(index, slots, MAX_SLOT_EXPANSION)
    if groups is not None and not any(s.get("case") for s in slots):
        pairs = sorted({(t, gi) for gi, g in enumerate(groups) for t in g})
        if not pairs:  # no slot candidate exists in the dictionary
            cooc = spark.createDataFrame([], "term string, cooc long")
            mass = spark.createDataFrame([(0.0,)], "_tcf double")
            return _score_with_mass(cooc, index.dictionary, mass, min_count, k)
        tg = spark.createDataFrame(pairs, "term string, grp int")
        meta = (
            index.postings.select("term", "doc_shard", "first_doc", "max_doc")
            .join(F.broadcast(tg), "term")
        )
        per = meta.groupBy("doc_shard", "grp").agg(
            F.min("first_doc").alias("_lo"), F.max("max_doc").alias("_hi")
        )
        blocks = _apply_keep(index.postings, _envelope_keep(per, len(groups)))
    else:
        blocks = index.postings
    decoded = pin(_live(_decode_blocks(blocks, spark), index), scope)
    m = engine.slot_search(decoded, index.dictionary, slots, dists)
    return conc_collocations(m, decoded, index.dictionary, match_len,
                             window, min_count, k)


# --- corpus-wide multiword-expression candidates -------------------------

import math as _math

_LN2 = _math.log(2.0)  # correctly-rounded double; == DuckDB ln(2)

MWE_SCHEMA = ("rank long, w1 string, w2 string, f_xy long, f_x long, "
              "f_y long, logdice double")


def mwe_bigrams(docs: DataFrame, min_count: int = 5, k: int = 50,
                text_col: str = "text",
                dictionary: DataFrame | None = None) -> DataFrame:
    """Corpus-WIDE association ranking of adjacent bigrams — terminology
    / multiword-expression extraction, the portal view that finds "word
    sketch candidates" without a target term [LIT: Rychlý 2008, "A
    lexicographer-friendly association score" — logDice is Sketch
    Engine's default measure precisely because it is corpus-size
    independent].

    Pinned semantics (mirrored by oracles_corpus.mwe_bigrams_sql):

    - a bigram is an ADJACENT ordered token pair (toks[i], toks[i+1])
      under the standard tokenizer; f_xy = its corpus count;
    - f_x / f_y = unigram corpus frequencies of the two sides;
    - ``logdice = 14 + ln((2 * f_xy) / (f_x + f_y)) / ln(2)`` — written
      as ln/ln2, not native log2 (the keyness.py cross-engine pin);
    - candidates below ``min_count`` occurrences are dropped BEFORE the
      cf joins; order (logdice DESC, w1 ASC, w2 ASC) over the UNROUNDED
      score, output rounded to SCORE_DECIMALS.

    Scale shape: the bigram stream is one Catalyst transform+explode
    (token-stream-sized, same as any unigram agg) into ONE map-side-
    partial groupBy(w1, w2) — the bigram-vocabulary shuffle a corpus-
    wide pair count must pay. The min_count gate runs before the two
    unigram-cf joins, so the join probe side is the (small) candidate
    set, not the raw bigram stream. Pass ``dictionary`` (term, cf —
    index.build_dictionary output, identical cf by construction) to
    source the unigram frequencies from precomputed index METADATA:
    without it the inline unigram agg appears under BOTH cf joins and
    Catalyst plans the corpus scan twice (plan-audited) — with it the
    whole statistic costs exactly one corpus scan. TakeOrderedAndProject
    caps the output at k."""
    toks = docs.select(tokenize_expr(text_col).alias("toks"))
    bi = toks.select(F.explode(F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "transform(slice(toks, 1, size(toks) - 1), "
        "(w, i) -> struct(w AS w1, toks[i + 1] AS w2)) "
        "ELSE array() END")).alias("b")).select("b.w1", "b.w2")
    fxy = (bi.groupBy("w1", "w2").agg(F.count("*").alias("f_xy"))
             .filter(F.col("f_xy") >= min_count))
    if dictionary is not None:
        uni = dictionary.select("term", F.col("cf").cast("long").alias("cf"))
    else:
        uni = (toks.select(F.explode("toks").alias("term"))
                   .groupBy("term").agg(F.count("*").alias("cf")))
    scored = (
        fxy
        .join(uni.select(F.col("term").alias("w1"), F.col("cf").alias("f_x")),
              "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("cf").alias("f_y")),
              "w2")
        .withColumn(
            "logdice",
            # pinned: 14 + ln((2 * f_xy) / (f_x + f_y)) / ln(2)
            F.lit(14.0)
            + F.log((F.lit(2.0) * F.col("f_xy").cast("double"))
                    / (F.col("f_x").cast("double")
                       + F.col("f_y").cast("double"))) / F.lit(_LN2),
        )
    )
    topk = scored.orderBy(F.desc("logdice"), F.asc("w1"), F.asc("w2")).limit(k)
    rank = F.row_number().over(
        Window.orderBy(F.desc("logdice"), F.asc("w1"), F.asc("w2")))
    return topk.select(
        rank.cast("long").alias("rank"),
        "w1", "w2",
        F.col("f_xy").cast("long").alias("f_xy"),
        F.col("f_x").cast("long").alias("f_x"),
        F.col("f_y").cast("long").alias("f_y"),
        F.round("logdice", SCORE_DECIMALS).alias("logdice"),
    )


# --- positional collocate profile (per-offset breakdown) -----------------

OFFSET_SCHEMA = "offset int, rank long, term string, cooc long"


def _offset_counts(postings_rows: DataFrame, target: str, window: int,
                   broadcast_target: bool = True) -> DataFrame:
    """(term, offset, cooc) pair counts split by SIGNED offset
    ``p_neighbor - p_target`` in [-window, window] \\ {0}. Same doc_id
    join shape as _pair_counts; the offset breakdown comes from one
    flatten(transform(...)) + explode over the pair offsets (pair-count-
    sized, the honest cost of a per-offset view), then ONE groupBy."""
    tgt = postings_rows.filter(F.col("term") == target) \
        .select("doc_id", F.col("positions").alias("_tpos"))
    if broadcast_target:
        tgt = F.broadcast(tgt)
    offsets_expr = F.expr(
        "flatten(transform(positions, p -> "
        "transform(filter(_tpos, q -> abs(p - q) <= {w}), q -> p - q)))"
        .format(w=int(window))
    )
    return (
        postings_rows.filter(F.col("term") != target)
        .join(tgt, "doc_id")
        .select("term", F.explode(offsets_expr).alias("offset"))
        .groupBy("term", "offset")
        .agg(F.count("*").alias("cooc"))
    )


def _offset_rank_tail(counts: DataFrame, min_count: int,
                      k_per_offset: int) -> DataFrame:
    """min_count gate + per-offset (cooc DESC, term ASC) top-k, shared
    by the corpus and packed paths so both carry one pinning."""
    counts = counts.filter(F.col("cooc") >= min_count)
    w = Window.partitionBy("offset").orderBy(F.desc("cooc"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_per_offset)
        .select(
            F.col("offset").cast("int").alias("offset"),
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("cooc").cast("long").alias("cooc"),
        )
        .orderBy(F.asc("offset"), F.asc("rank"))
    )


def colloc_by_offset(postings: DataFrame, dictionary: DataFrame,
                     target: str, window: int = 3, min_count: int = 2,
                     k_per_offset: int = 5,
                     broadcast_target: bool | None = None) -> DataFrame:
    """The classic positional collocation view: for each slot -window..-1,
    +1..+window around the target, the top collocates AT THAT OFFSET — a
    concordancer's per-position frequency columns, finer than the
    left/right split of collocations_directional.

    Pinned semantics (mirrored by oracles_corpus.colloc_by_offset_sql):
    offset = p_neighbor - p_target (positive = after the target); pairs
    counted exactly as collocations() but kept per offset; neighbors
    below min_count AT AN OFFSET are dropped; within each offset rank by
    (cooc DESC, term ASC), keep k_per_offset; rows ordered (offset ASC,
    rank ASC). Raw counts, no association score — the per-offset PMI
    would rank identically per offset (target mass and totals are
    constant within an offset).

    Scale shape: one broadcast-gated doc_id join (the collocations()
    gate), one explode bounded by the PAIR count (not the token stream),
    one groupBy(term, offset), and a row_number window whose partitions
    are per-offset vocabularies — bounded, never a global sort."""
    if broadcast_target is None:
        df_row = dictionary.filter(F.col("term") == target) \
            .select("df").limit(1).collect()
        broadcast_target = bool(df_row) and \
            df_row[0]["df"] <= BROADCAST_TARGET_MAX_DF
    counts = _offset_counts(postings, target, window,
                            broadcast_target=broadcast_target)
    return _offset_rank_tail(counts, min_count, k_per_offset)


def colloc_by_offset_packed(index, target: str, window: int = 3,
                            min_count: int = 2, k_per_offset: int = 5,
                            scope=None) -> DataFrame:
    """colloc_by_offset off the PACKED index — identical block-skip
    machinery to packed_collocations: the target's pruned block scan
    yields per-shard doc-id envelopes, every block outside them is
    skipped before any payload byte is read, and the surviving blocks
    are decoded once for both sides of the pair join."""
    from fastmorph_spark.cache import pin
    from fastmorph_spark.search.packed import (
        _apply_keep,
        _decode_blocks,
        _live,
        pruned_blocks,
    )

    spark = index.postings.sparkSession
    tgt_blocks = pruned_blocks(index, [target])
    if tgt_blocks is None:
        return spark.createDataFrame([], OFFSET_SCHEMA)
    keep = tgt_blocks.groupBy("doc_shard").agg(
        F.min("first_doc").alias("_lo"), F.max("max_doc").alias("_hi")
    )
    blocks = _apply_keep(index.postings, keep)
    decoded = pin(_live(_decode_blocks(blocks, spark), index), scope)
    counts = _offset_counts(decoded, target, window)
    return _offset_rank_tail(counts, min_count, k_per_offset)


NEXT_WORD_SCHEMA = "rank long, w2 string, f_xy long, frac double"


def next_word(docs: DataFrame, target: str, min_count: int = 1,
              k: int = 20, text_col: str = "text") -> DataFrame:
    """Phrase completion: the most frequent words immediately FOLLOWING
    the target — a portal's query-autocomplete / "continue the phrase"
    box, and the unigram-context special case of an n-gram language
    model's next-token table.

    Pinned semantics (mirrored by oracles_corpus.next_word_sql): f_xy =
    adjacent-bigram count (target, w2) under the standard tokenizer;
    ``frac = f_xy / total_continuations`` over ALL continuations of the
    target (not just the emitted top-k), both float64, rounded to
    SCORE_DECIMALS; min_count gate; order (f_xy DESC, w2 ASC).

    Scale shape: the bigram transform filters to the target INSIDE the
    per-row expression (only the target's continuations are emitted, so
    the explode is df(target)-bounded, not token-stream-bounded), then
    ONE map-side-partial groupBy(w2) + a 1-row broadcast total."""
    toks = docs.select(tokenize_expr(text_col).alias("toks"))
    cont = toks.select(F.explode(F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "filter(transform(slice(toks, 1, size(toks) - 1), "
        "(w, i) -> struct(w AS w1, toks[i + 1] AS w2)), "
        "b -> b.w1 = '{t}') ELSE array() END"
        .format(t=target.replace("'", "\\'")))).alias("b")
    ).select("b.w2")
    counts = cont.groupBy("w2").agg(F.count("*").alias("f_xy"))
    # total from the continuation STREAM, not from `counts`: identical
    # value (both count the same rows), but aggregating `counts` would
    # recompute its subtree THROUGH THE SHUFFLE just to produce 1 number
    # — this form's second pass is scan + map-side partial agg only
    # (the keyness.py totals discipline)
    tot = cont.agg(F.count("*").cast("double").alias("_tot"))
    scored = (
        counts.filter(F.col("f_xy") >= min_count)
        .crossJoin(F.broadcast(tot))
        .withColumn("frac",
                    F.col("f_xy").cast("double") / F.col("_tot"))
    )
    topk = scored.orderBy(F.desc("f_xy"), F.asc("w2")).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("f_xy"), F.asc("w2")))
    return topk.select(
        rank.cast("long").alias("rank"),
        "w2",
        F.col("f_xy").cast("long").alias("f_xy"),
        F.round("frac", SCORE_DECIMALS).alias("frac"),
    )


def collocations_by_attr(postings: DataFrame, dictionary: DataFrame,
                         target: str, attr: str = "stem", window: int = 3,
                         min_count: int = 2, k: int = 20,
                         broadcast_target: bool | None = None) -> DataFrame:
    """PMI collocation profile with neighbors GROUPED BY ATTRIBUTE —
    the word-sketch convention of listing collocates by LEMMA rather
    than surface form [LIT: Kilgarriff et al. 2004, the Sketch Engine
    groups collocates under lemma heads; PK-med: the reference's
    lemma-indexed corpus model makes its collocate lists lemma-keyed by
    construction]. "joins"/"joined" co-occurrences pool under one "join"
    row instead of splitting the statistic across inflections.

    ``attr``: "stem" (rule-stemmer lemma class, the J4c matching rule)
    or "tag" (token class, J4e). Pinned semantics on top of the module
    pins: cooc(key) = Σ pair counts over neighbor TERMS in the class
    (the target term itself still excluded — a DIFFERENT inflection of
    the target's own lemma counts, deliberately: that self-collocation
    is real signal the surface-form profile cannot see); cf(key) =
    Σ dictionary cf over the class (its corpus mass); the node mass
    stays the literal target TERM's cf (the query asked about that
    form); pmi = ln((cooc * total) / (tcf * cf_key)) — same
    parenthesization; (pmi DESC, key ASC) over the unrounded statistic.

    Returns (rank, key, cooc, cf, pmi). Scale shape: _pair_counts'
    df(target)-bounded join + its term groupBy, then one
    vocabulary-bounded regroup to classes on each side — both inputs to
    the scoring join are <= |vocab| rows, so the grouping adds no
    corpus-sized work.
    """
    if broadcast_target is None:
        drow = dictionary.filter(F.col("term") == target) \
            .select("df").collect()
        broadcast_target = bool(drow) and \
            int(drow[0]["df"]) <= BROADCAST_TARGET_MAX_DF
    cooc = _pair_counts(postings.select("term", "doc_id", "positions"),
                        target, window, broadcast_target)
    return _score_by_attr(cooc, dictionary, target, attr, min_count, k)


def _attr_key(attr: str):
    """The pinned class expression an attr names — the SAME rule the
    slot matchers use (J4c/J4e)."""
    if attr == "stem":
        from fastmorph_spark.stem import stem_expr as key_of
    elif attr == "tag":
        from fastmorph_spark.tags import tag_expr as key_of
    else:
        raise ValueError(f"attr must be stem|tag, got {attr!r}")
    return key_of


def _score_by_attr(cooc: DataFrame, dictionary: DataFrame, target: str,
                   attr: str, min_count: int, k: int) -> DataFrame:
    """Class-grouped PMI tail shared by the corpus and packed by-attr
    paths: regroup surface (term, cooc) and dictionary cf to classes
    (both vocabulary-bounded), then the pinned scoring."""
    key_of = _attr_key(attr)
    cooc_k = (
        cooc.select(key_of("term").alias("key"), "cooc")
        .groupBy("key").agg(F.sum("cooc").cast("long").alias("cooc"))
    )
    dict_k = (
        dictionary.select(key_of("term").alias("key"), "cf")
        .groupBy("key").agg(F.sum("cf").cast("long").alias("cf"))
    )
    tcf = dictionary.filter(F.col("term") == target) \
        .select(F.col("cf").cast("double").alias("_tcf"))
    tot = dictionary.agg(F.sum("cf").cast("double").alias("_total"))
    scored = (
        cooc_k.filter(F.col("cooc") >= min_count)
        .join(dict_k, "key")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tcf))
        .withColumn(
            "pmi",
            F.log((F.col("cooc").cast("double") * F.col("_total"))
                  / (F.col("_tcf") * F.col("cf").cast("double"))),
        )
    )
    topk = scored.orderBy(F.desc("pmi"), F.asc("key")).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("pmi"), F.asc("key")))
    return topk.select(
        rank.cast("long").alias("rank"),
        "key",
        F.col("cooc").cast("long").alias("cooc"),
        F.col("cf").cast("long").alias("cf"),
        F.round("pmi", SCORE_DECIMALS).alias("pmi"),
    )


def packed_collocations_by_attr(index, target: str, attr: str = "stem",
                                window: int = 3, min_count: int = 2,
                                k: int = 20, scope=None) -> DataFrame:
    """`collocations_by_attr` off the PACKED index: exactly
    packed_collocations' metadata-only block selection and one-shot
    decode (see its docstring), feeding the class-grouped scoring tail.
    The attr regroup adds only vocabulary-bounded work on top of the
    decode, so the block-skip evidence for A8 carries over unchanged."""
    from fastmorph_spark.cache import pin
    from fastmorph_spark.search.packed import (
        _apply_keep,
        _decode_blocks,
        _live,
        pruned_blocks,
    )

    _attr_key(attr)  # validate before any Spark work
    spark = index.postings.sparkSession
    tgt_blocks = pruned_blocks(index, [target])
    if tgt_blocks is None:
        cooc = spark.createDataFrame([], "term string, cooc long")
        return _score_by_attr(cooc, index.dictionary, target, attr,
                              min_count, k)
    keep = tgt_blocks.groupBy("doc_shard").agg(
        F.min("first_doc").alias("_lo"), F.max("max_doc").alias("_hi")
    )
    blocks = _apply_keep(index.postings, keep)
    decoded = pin(_live(_decode_blocks(blocks, spark), index), scope)
    cooc = _pair_counts(decoded, target, window)
    return _score_by_attr(cooc, index.dictionary, target, attr,
                          min_count, k)
