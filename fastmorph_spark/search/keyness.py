"""Subcorpus frequency statistics: keyness, relative frequency, dispersion.

The reference engine serves a national-corpus search UI whose analytical
tabs compare SUBCORPORA — which words are characteristic of one slice
(keyness), how frequent a word is per slice normalized for slice size
(ipm — items per million), and how evenly a word spreads across the
corpus (dispersion). All three are pure aggregations over the tokenized
corpus; none touch positions.

Pinned semantics (mirrored textually by oracles_corpus.py — the driver
hash-compares at sf0.01):

- **keyness** — log-likelihood G² (Dunning 1993, the standard corpus-
  linguistics keyness statistic) between a FOCUS subcorpus (lang ==
  focus_lang) and the REFERENCE subcorpus (every other doc):

      e1 = (f1 + f2) * n1 / n        (expected focus count)
      e2 = (f1 + f2) * n2 / n
      g2 = 2 * (  [f1 > 0] * f1 * ln(f1 / e1)
                + [f2 > 0] * f2 * ln(f2 / e2) )

  plus Hardie's effect-size Log Ratio with a pinned always-on 0.5
  additive smoothing (so zero counts stay finite):

      log_ratio = log2( ((f1 + 0.5) / n1) / ((f2 + 0.5) / n2) )

  Rank over the UNROUNDED g2 (DESC, term ASC tie-break), output rounded
  to SCORE_DECIMALS — the search_topk / collocation discipline.

- **term_profile** — per (term, lang): token frequency and
  ipm = tf * 1000000 / lang_tokens. Only (term, lang) pairs where the
  term occurs are emitted.

- **dispersion** — Juilland's D over P = `parts` equal doc-id classes
  (part = doc_id % parts — deterministic, balanced for sequential ids):

      mean = s / p                  (s  = Σ per-part counts; zero parts
      var  = ss / p - mean * mean    ss = Σ squared per-part counts —
      d    = 1 - (sqrt(greatest(var, 0)) / mean) / sqrt(p - 1)

  zeros enter through the /p divisors, so no part densification (and no
  P×V grid materialization) is ever needed — the whole statistic folds
  into two sums per term.

Scale shape: each statistic is one tokenize scan (Catalyst `tokenize_expr`,
WholeStageCodegen — no Python) + ONE map-side-partial groupBy on term
(the vocabulary-sized shuffle an agg on 100 TB must pay) + a broadcast of
the 1-row (or #langs-row) totals; keyness tops out in a
TakeOrderedAndProject. No joins on corpus-sized frames, no windows over
unbounded partitions, no driver-side materialization beyond top-k.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LN2 = math.log(2.0)  # correctly-rounded double; == DuckDB ln(2)

from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.tokenize import tokenize_expr

KEYNESS_SCHEMA = ("rank long, term string, f_focus long, f_ref long, "
                  "g2 double, log_ratio double")


def _tokens_with_lang(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(lang, term) one row per token occurrence — Catalyst-only."""
    return docs.select(
        "lang", F.explode(tokenize_expr(text_col)).alias("term")
    )


def keyness(docs: DataFrame, focus_lang: str, min_count: int = 5,
            k: int = 50, text_col: str = "text") -> DataFrame:
    """G²-ranked key terms of the `focus_lang` subcorpus vs the rest.

    Output: (rank, term, f_focus, f_ref, g2, log_ratio) — g2 always
    positive (strength of evidence), log_ratio signed (direction:
    positive = overused in focus).
    """
    tok = _tokens_with_lang(docs, text_col)
    is_focus = F.col("lang") == focus_lang
    # ONE shuffle: conditional sums split the sides without a self-join
    counts = tok.groupBy("term").agg(
        F.sum(F.when(is_focus, 1).otherwise(0)).cast("long").alias("f_focus"),
        F.sum(F.when(is_focus, 0).otherwise(1)).cast("long").alias("f_ref"),
    )
    # totals from the TOKEN stream, not from `counts`: numerically
    # identical (both are exact integer sums of the same tokens), but the
    # unpersisted `counts` subtree would otherwise be recomputed THROUGH
    # ITS TERM SHUFFLE just to produce 2 numbers — this form's second
    # corpus pass is scan + map-side partial agg only (plan-audited)
    totals = tok.agg(
        F.sum(F.when(is_focus, 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(is_focus, 0).otherwise(1)).cast("double").alias("n2"),
    )
    f1 = F.col("f_focus").cast("double")
    f2 = F.col("f_ref").cast("double")
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    e1 = (f1 + f2) * n1 / n
    e2 = (f1 + f2) * n2 / n
    g2 = 2 * (
        F.when(f1 > 0, f1 * F.log(f1 / e1)).otherwise(F.lit(0.0))
        + F.when(f2 > 0, f2 * F.log(f2 / e2)).otherwise(F.lit(0.0))
    )
    # pinned as ln(x)/ln(2) — NOT the native log2, whose last bit may
    # differ between engines (oracles_corpus.py mirrors this form)
    log_ratio = F.log(((f1 + 0.5) / n1) / ((f2 + 0.5) / n2)) / _LN2
    scored = (
        counts.filter((F.col("f_focus") + F.col("f_ref")) >= min_count)
        .crossJoin(F.broadcast(totals))
        .withColumn("g2", g2)
        .withColumn("log_ratio", log_ratio)
    )
    topk = scored.orderBy(F.desc("g2"), F.asc("term")).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("g2"), F.asc("term")))
    return topk.select(
        rank.cast("long").alias("rank"),
        "term", "f_focus", "f_ref",
        F.round("g2", SCORE_DECIMALS).alias("g2"),
        F.round("log_ratio", SCORE_DECIMALS).alias("log_ratio"),
    )


def term_profile(docs: DataFrame, terms: list[str],
                 text_col: str = "text") -> DataFrame:
    """Per-subcorpus relative frequency (ipm) for a fixed term list.

    Output: (term, lang, tf, lang_tokens, ipm), one row per (term, lang)
    pair where the term occurs; ordered (term ASC, lang ASC).
    """
    tok = _tokens_with_lang(docs, text_col)
    lang_totals = tok.groupBy("lang").agg(
        F.count("*").cast("long").alias("lang_tokens"))
    counts = (
        tok.filter(F.col("term").isin(sorted(set(terms))))
        .groupBy("term", "lang").agg(F.count("*").cast("long").alias("tf"))
    )
    ipm = F.col("tf").cast("double") * 1000000 / F.col("lang_tokens")
    return (
        counts.join(F.broadcast(lang_totals), "lang")
        .select("term", "lang", "tf", "lang_tokens",
                F.round(ipm, SCORE_DECIMALS).alias("ipm"))
        .orderBy("term", "lang")
    )


def dispersion(docs: DataFrame, terms: list[str], parts: int = 8,
               text_col: str = "text") -> DataFrame:
    """Juilland's D for each term over `parts` doc-id classes.

    Output: (term, cf, d) ordered by term; d in [0, 1], higher = more
    evenly dispersed. Requires parts >= 2.
    """
    assert parts >= 2, "Juilland's D needs at least 2 parts"
    tok = docs.select(
        (F.col("doc_id") % parts).alias("part"),
        F.explode(tokenize_expr(text_col)).alias("term"),
    ).filter(F.col("term").isin(sorted(set(terms))))
    per_part = tok.groupBy("term", "part").agg(
        F.count("*").cast("double").alias("v"))
    p = float(parts)
    s, ss = F.sum("v"), F.sum(F.col("v") * F.col("v"))
    mean = s / p
    var = ss / p - mean * mean
    d = 1 - (F.sqrt(F.greatest(var, F.lit(0.0))) / mean) / float((p - 1) ** 0.5)
    return (
        per_part.groupBy("term")
        .agg(s.cast("long").alias("cf"), F.round(d, SCORE_DECIMALS).alias("d"))
        .orderBy("term")
    )


def lexdiv(docs: DataFrame, group_col: str = "lang",
           text_col: str = "text") -> DataFrame:
    """Per-subcorpus lexical diversity — the vocabulary-richness panel of
    a corpus statistics tab [LIT: type-token ratio; Baayen 2001 on
    hapax-based richness measures]:

      (group, tokens, types, ttr, hapax, hapax_ratio)

    ttr = types / tokens, hapax = terms occurring exactly once WITHIN
    the group, hapax_ratio = hapax / tokens; both ratios are single
    divisions of exact integer counts (bit-identical across engines),
    rounded to SCORE_DECIMALS; ordered by group.

    Scale shape: one tokenize scan + ONE (group, term) partial-agg
    groupBy (the keyness shuffle shape — hot terms absorbed map-side)
    + a groups-sized re-agg. No joins, no windows."""
    per_term = (
        docs.select(F.col(group_col).alias("grp"),
                    F.explode(tokenize_expr(text_col)).alias("term"))
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_term.groupBy("grp")
        .agg(
            F.sum("cnt").alias("tokens"),
            F.count(F.lit(1)).alias("types"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("hapax"),
        )
        .select(
            F.col("grp").alias(group_col),
            F.col("tokens").cast("long").alias("tokens"),
            F.col("types").cast("long").alias("types"),
            F.round(F.col("types").cast("double")
                    / F.col("tokens").cast("double"),
                    SCORE_DECIMALS).alias("ttr"),
            F.col("hapax").cast("long").alias("hapax"),
            F.round(F.col("hapax").cast("double")
                    / F.col("tokens").cast("double"),
                    SCORE_DECIMALS).alias("hapax_ratio"),
        )
        .orderBy(group_col)
    )


def corpus_summary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whole-corpus summary card — the "about this corpus" numbers a
    portal's front page and the serving protocol's ``{"stats": true}``
    form surface: (n_docs, n_tokens, vocab, avgdl), one row.

    n_docs counts ALL documents (token-less ones included); avgdl is one
    division of two exact integers rounded to SCORE_DECIMALS. Scale
    shape: one tokenize scan with a map-side-partial global agg (count +
    approx-free exact distinct via the term-keyed partial) plus a
    metadata-cheap count of documents; the single-row cross join is
    trivially broadcast."""
    t = (
        docs.select(F.explode(tokenize_expr(text_col)).alias("term"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct("term").cast("long").alias("vocab"),
        )
    )
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return n.crossJoin(F.broadcast(t)).select(
        "n_docs", "n_tokens", "vocab",
        F.round(F.col("n_tokens").cast("double")
                / F.col("n_docs").cast("double"),
                SCORE_DECIMALS).alias("avgdl"),
    )


def freq_spectrum(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Frequency spectrum — the (frequency, number of types with exactly
    that frequency) table under a corpus statistics tab [LIT: Baayen
    2001, "Word Frequency Distributions": the spectrum is the standard
    summary of a corpus's Zipfian shape, and spectrum[1] is the hapax
    count lexdiv reports per group].

    Returns (freq, n_types), every occurring frequency, ascending. All
    integers — bit-exact across engines, no rounding pins needed.

    Scale shape: one tokenize scan + term-keyed partial-agg groupBy
    (the A2 dictionary shuffle) + a second groupBy over ~|vocab| rows
    keyed by count — at most |distinct frequencies| output rows (tiny;
    Zipf guarantees it)."""
    per_term = (
        docs.select(F.explode(tokenize_expr(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        per_term.groupBy("freq")
        .agg(F.count(F.lit(1)).cast("long").alias("n_types"))
        .select(F.col("freq").cast("long").alias("freq"), "n_types")
        .orderBy("freq")
    )


def vocab_growth(docs: DataFrame, points: int = 10,
                 text_col: str = "text") -> DataFrame:
    """Vocabulary growth curve — cumulative (docs, tokens, types) at
    ``points`` equal-width corpus prefixes in doc_id order: the
    empirical Heaps'-law curve a corpus statistics tab plots [LIT:
    Heaps 1978; Baayen 2001 on vocabulary growth]. Relies on the data
    model's pinned DENSE doc_ids (SURVEY §1.3: dense rank over
    (repo,path,commit) — ids are 0..N-1 by construction).

    Pinned semantics (mirrored by oracles_corpus.vocab_growth_sql):
    ``bucket(d) = (doc_id(d) * points) DIV N + 1`` (integer division,
    N = document count) assigns each doc to one of 1..points; a TYPE
    counts from the bucket of its FIRST occurrence (min doc_id); row i
    reports the totals over buckets 1..i. Empty buckets still produce a
    row (the curve is defined at every checkpoint). All integers —
    bit-exact, no rounding.

    Scale shape: one tokenize scan feeding (a) per-doc token counts and
    (b) the term-keyed min(doc_id) partial agg; both reduce to ≤points
    rows BEFORE the only window (a cumulative sum over the points-row
    frame — bounded by the argument, not the data). N rides a 1-row
    broadcast; no global row_number over the corpus."""
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    bucket = (F.expr(f"(doc_id * {int(points)}) DIV _n") + 1).alias("bucket")
    per_doc = (
        docs.select("doc_id", F.size(tokenize_expr(text_col)).alias("_toks"))
        .crossJoin(F.broadcast(n))
        .select(bucket, "_toks")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_docs"), F.sum("_toks").alias("_tokens"))
    )
    first_occ = (
        docs.select("doc_id", F.explode(tokenize_expr(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("doc_id"))
        .crossJoin(F.broadcast(n))
        .select(bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_types"))
    )
    spark = docs.sparkSession
    grid = spark.range(1, int(points) + 1).select(F.col("id").alias("bucket"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.join(per_doc, "bucket", "left")
        .join(first_occ, "bucket", "left")
        .select(
            "bucket",
            F.sum(F.coalesce("_docs", F.lit(0))).over(w)
            .cast("long").alias("docs"),
            F.sum(F.coalesce("_tokens", F.lit(0))).over(w)
            .cast("long").alias("tokens"),
            F.sum(F.coalesce("_types", F.lit(0))).over(w)
            .cast("long").alias("types"),
        )
        .orderBy("bucket")
    )


DOC_KEYWORDS_SCHEMA = ("doc_id long, rank long, term string, tf long, "
                       "df long, tfidf double")


def doc_keywords(docs: DataFrame, m: int = 3,
                 text_col: str = "text") -> DataFrame:
    """Per-DOCUMENT keyword extraction: the top-m TF-IDF terms of every
    doc — the "what is this text about" panel a corpus portal shows next
    to a document view, and the per-doc topic signal an LLM-data
    pipeline attaches as metadata.

    Pinned semantics (mirrored by oracles_corpus.doc_keywords_sql):

    - tf = term count within the doc, df = number of docs containing
      the term, N = corpus doc count;
    - ``tfidf = tf * ln((N + 1) / (df + 1))`` — add-one smoothed idf so
      a corpus-universal term (df == N) scores near (not below) zero
      and the ratio stays finite on any input;
    - per doc rank over the UNROUNDED score, (tfidf DESC, term ASC)
      tie-break; keep rank <= m; output rounded to SCORE_DECIMALS,
      ordered (doc_id ASC, rank ASC).

    Scale shape: ONE groupBy(doc_id, term) (map-side partial — the
    dominant shuffle, token-stream keyed but doc-local so perfectly
    balanced), a vocabulary-sized groupBy(term) REUSING the tf frame
    (no second corpus scan), a 1-row broadcast for N, and a row_number
    window whose partitions are per-doc vocabularies — bounded by the
    longest doc, never a global sort."""
    tok = docs.select("doc_id", F.explode(tokenize_expr(text_col)).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").cast("double").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            # pinned: tf * ln((N + 1) / (df + 1)) — all float64
            F.col("tf").cast("double")
            * F.log((F.col("_n") + F.lit(1.0))
                    / (F.col("df").cast("double") + F.lit(1.0))),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= m)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round("tfidf", SCORE_DECIMALS).alias("tfidf"),
        )
        .orderBy(F.asc("doc_id"), F.asc("rank"))
    )


POSITION_DIST_SCHEMA = "term string, decile int, n_occ long, frac double"


def term_position_dist(docs: DataFrame, terms: list[str], bins: int = 10,
                       text_col: str = "text") -> DataFrame:
    """WHERE inside documents a term occurs — the concordancer's
    "distribution plot" (a strip per document position decile): terms
    concentrated in openings (imports, headers, titles) versus endings
    versus spread evenly. Complements dispersion (BETWEEN-doc evenness)
    with the WITHIN-doc axis.

    Pinned semantics (mirrored by oracles_corpus.term_position_dist_sql):
    for each occurrence at 0-based token index pos in a doc of dl
    tokens, ``decile = floor((pos * bins) / dl)`` computed in float64
    (pos < dl, so decile is always in [0, bins-1]); n_occ = occurrences
    of the term in that decile; ``frac = n_occ / total_occ(term)`` —
    rounded to SCORE_DECIMALS; rows ordered (term ASC, decile ASC).
    Deciles with zero occurrences are OMITTED (no densification).

    Scale shape: one posexplode scan filtered to the target terms (the
    filter prunes before the shuffle), ONE groupBy(term, decile), and a
    per-term window over <= bins rows for the fraction."""
    t = (
        docs.select("doc_id", tokenize_expr(text_col).alias("toks"))
        .select(
            F.size("toks").alias("dl"),
            F.posexplode("toks").alias("pos", "term"),
        )
        .filter(F.col("term").isin(list(terms)))
    )
    decile = F.floor(
        (F.col("pos").cast("double") * F.lit(float(bins))) / F.col("dl")
    ).cast("int")
    counts = (
        t.select("term", decile.alias("decile"))
        .groupBy("term", "decile")
        .agg(F.count("*").alias("n_occ"))
    )
    tot = F.sum("n_occ").over(Window.partitionBy("term"))
    return (
        counts.withColumn(
            "frac",
            F.col("n_occ").cast("double") / tot.cast("double"))
        .select(
            "term",
            F.col("decile").cast("int").alias("decile"),
            F.col("n_occ").cast("long").alias("n_occ"),
            F.round("frac", SCORE_DECIMALS).alias("frac"),
        )
        .orderBy(F.asc("term"), F.asc("decile"))
    )


def dispersion_dp(docs: DataFrame, terms: list[str], parts: int = 8,
                  text_col: str = "text") -> DataFrame:
    """Gries' DP ("deviation of proportions") — the field's current
    standard dispersion measure [LIT: Gries 2008, "Dispersions and
    adjusted frequencies in corpora"], complementing Juilland's D
    (dispersion): DP weights parts by their actual SIZE, so it stays
    meaningful when parts are unequal.

    Pinned semantics (mirrored by oracles_corpus.dispersion_dp_sql),
    over the same doc-id classes as dispersion (part = doc_id % parts):

        s_i = tokens in part i / total tokens    (the part's share)
        v_i = term occurrences in part i / cf    (the term's share)
        dp  = 0.5 * (1.0 + sum_present(abs(v_i - s_i) - s_i))

    The closed form folds the absent parts in WITHOUT densification:
    an absent part contributes |0 - s_i| = s_i, and sum_all(s_i) == 1,
    so only parts where the term OCCURS enter the aggregation — the
    same no-P×V-grid discipline as Juilland's D. dp in [0, 1), lower =
    more evenly dispersed (note the inverted sense vs D). ``range_parts``
    = parts containing the term. Output ordered by term.

    Scale shape: one filtered tokenize scan + ONE groupBy(term, part)
    for the term side; the part-share side is a second scan + a
    parts-row groupBy broadcast onto it. No joins on corpus-sized
    frames."""
    assert parts >= 2, "DP needs at least 2 parts"
    tok = docs.select(
        (F.col("doc_id") % parts).alias("part"),
        tokenize_expr(text_col).alias("toks"),
    )
    # part shares from the full token stream (map-side partial agg into
    # a parts-row frame — broadcast onto the per-term side)
    shares = (
        tok.groupBy("part")
        .agg(F.sum(F.size("toks")).cast("double").alias("_ptok"))
    )
    tot = shares.agg(F.sum("_ptok").alias("_tot"))
    shares = shares.crossJoin(F.broadcast(tot)) \
        .select("part", (F.col("_ptok") / F.col("_tot")).alias("s"))
    per_part = (
        docs.select(
            (F.col("doc_id") % parts).alias("part"),
            F.explode(tokenize_expr(text_col)).alias("term"),
        )
        .filter(F.col("term").isin(sorted(set(terms))))
        .groupBy("term", "part")
        .agg(F.count("*").cast("double").alias("n"))
    )
    cf = F.sum("n").over(Window.partitionBy("term"))
    scored = (
        per_part.withColumn("_cf", cf)
        .join(F.broadcast(shares), "part")
        .withColumn("_term_contrib",
                    F.abs(F.col("n") / F.col("_cf") - F.col("s"))
                    - F.col("s"))
    )
    dp = F.lit(0.5) * (F.lit(1.0) + F.sum("_term_contrib"))
    return (
        scored.groupBy("term")
        .agg(
            F.max("_cf").cast("long").alias("cf"),
            F.count("*").cast("long").alias("range_parts"),
            F.round(dp, SCORE_DECIMALS).alias("dp"),
        )
        .orderBy("term")
    )


def freq_by_attr(docs: DataFrame, attr: str = "word", k: int = 100,
                 min_count: int = 1, text_col: str = "text") -> DataFrame:
    """Frequency list grouped by token ATTRIBUTE — the portal frequency
    tab's "group by wordform / lemma / tag" selector [PK-high: the
    reference's frequency views group by word form, lemma, or morph tag
    over its interned id arrays; here the attribute is computed by the
    same pinned rule the slot engine matches on].

    ``attr``: "word" (the token itself), "stem" (the rule-stemmer lemma
    class, stem.stem_expr — the J4c matching rule), or "tag" (the
    deterministic token class, tags.tag_expr — the J4e matching rule).

    Returns (rank, key, count, df, ipm): count = total occurrences of
    the class (a frequency list counts every occurrence), df = number of
    docs containing >= 1 token of the class, ipm = count * 1e6 / total
    corpus tokens rounded to SCORE_DECIMALS (the term_profile ipm pin —
    total counted over ALL tokens BEFORE the min_count gate, so ipm is
    comparable across attrs and gates). Deterministic total order:
    (count DESC, key ASC), rank over the same.

    Scale shape: one tokenize scan into groupBy(key) with map-side
    partial agg — hot classes (a stopword tag at 100 TB) fold map-side,
    never a hot join key; the 1-row total pays its own map-side-
    collapsing scan and broadcasts (the keyness/term_profile totals
    pattern — Catalyst shares no subplans, and caching a corpus-sized
    token stream would cost more than re-scanning it);
    orderBy+limit fuses to TakeOrderedAndProject; the rank window runs
    over <= k rows. Plan-verified: HashAggregate partials + broadcast
    total + TakeOrderedAndProject, zero Python.
    """
    if attr == "word":
        key = F.col("term")
    elif attr == "stem":
        from fastmorph_spark.stem import stem_expr

        key = stem_expr("term")
    elif attr == "tag":
        from fastmorph_spark.tags import tag_expr

        key = tag_expr("term")
    else:
        raise ValueError(f"attr must be word|stem|tag, got {attr!r}")
    toks = docs.select(
        "doc_id", F.explode(tokenize_expr(text_col)).alias("term")
    ).select("doc_id", key.alias("key"))
    total = toks.agg(F.count(F.lit(1)).cast("double").alias("_total"))
    top = (
        toks.groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("count"),
             F.countDistinct("doc_id").cast("long").alias("df"))
        .filter(F.col("count") >= min_count)
        .crossJoin(F.broadcast(total))
        .withColumn("ipm", F.round(F.col("count") * F.lit(1000000.0)
                                   / F.col("_total"), SCORE_DECIMALS))
        .orderBy(F.desc("count"), F.asc("key"))
        .limit(k)
    )
    rank = F.row_number().over(Window.orderBy(F.desc("count"), F.asc("key")))
    return top.withColumn("rank", rank.cast("long")).select(
        "rank", "key", "count", "df", "ipm"
    )
