"""Repetition + PII quality filters for training-data curation.

The two filter families every large-scale LLM data pipeline runs between
dedup and packing [LIT: Rae et al. 2021 ("Gopher"), Appendix A1.1
repetition filters; Penedo et al. 2023 (RefinedWeb) §3; Soldaini et al.
2024 (Dolma) §4 PII handling]:

- REPETITION: documents dominated by repeated lines or by one runaway
  n-gram are boilerplate/spam, not prose. Per-doc fractions let the
  pipeline threshold-drop (Gopher drops dup_line_frac > 0.30,
  top 2-gram char fraction > 0.20, etc. — thresholds belong to the
  caller; this module computes the pinned evidence columns).
- PII: emails / phone numbers / IPv4 addresses are counted and scrubbed
  to typed placeholders before the text reaches a training shard.

Everything is DuckDB-mirrorable (oracles_ops.line_repetition_sql /
top_ngram_repetition_sql / pii_profile_sql share the exact semantics)
and scale-shaped: the repetition ops are explode + ONE map-side-partial
groupBy keyed by (doc_id, ...) — doc_id in every grouping key means NO
hot-key skew by construction (same argument as index/pack.py's doc-shard
salt) — and PII is a pure column-expression chain (whole-stage codegen,
zero Python, zero shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.tokenize import tokenize_expr

# ---- repetition: duplicate lines ---------------------------------------


def line_repetition(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-doc duplicate-line statistics (Gopher A1.1 line filters):

    ``(doc_id, n_lines, n_distinct_lines, dup_line_frac,
    dup_line_char_frac)`` where lines are the NON-EMPTY ``\\n``-separated
    segments of the text, ``dup_line_frac = (n_lines - n_distinct) /
    n_lines`` (the fraction of line occurrences that are repeats of an
    earlier-seen line), and ``dup_line_char_frac`` is the character mass
    of those repeat occurrences over the character mass of all lines:
    ``sum_distinct((cnt-1) * len(line)) / sum_distinct(cnt * len(line))``.

    Pinned edge: a document with zero non-empty lines produces NO output
    row (there is nothing to measure). Both fractions are rounded to
    SCORE_DECIMALS after float64 division, mirrored textually in
    oracles_ops.line_repetition_sql.

    Scale shape: explode(lines) + groupBy(doc_id, line) + groupBy(doc_id)
    — both keys carry doc_id, so partial aggregation absorbs everything
    and no single reducer can be hot regardless of how pathological one
    document's line distribution is. No joins, no windows.
    """
    lines = F.filter(F.split(F.col(text_col), "\n"),
                     lambda l: F.length(l) > 0)
    per_line = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(lines).alias("line"))
        .groupBy("doc_id", "line")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("doc_id", "cnt", F.length("line").alias("chars"))
    )
    agg = per_line.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_lines"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_lines"),
        F.sum((F.col("cnt") - 1) * F.col("chars")).alias("_dup_chars"),
        F.sum(F.col("cnt") * F.col("chars")).alias("_all_chars"),
    )
    return agg.select(
        "doc_id", "n_lines", "n_distinct_lines",
        F.round((F.col("n_lines") - F.col("n_distinct_lines")).cast("double")
                / F.col("n_lines"), SCORE_DECIMALS).alias("dup_line_frac"),
        F.round(F.col("_dup_chars").cast("double") / F.col("_all_chars"),
                SCORE_DECIMALS).alias("dup_line_char_frac"),
    )


# ---- repetition: top n-gram mass ---------------------------------------


def top_ngram_repetition(df: DataFrame, ns: tuple[int, ...] = (2, 3),
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Per-doc most-frequent-n-gram statistics (Gopher A1.1 "fraction of
    characters in the most common n-gram"), LONG format — one row per
    (doc, n): ``(doc_id, n, top_ngram, top_count, top_char_frac)``.

    Pinned semantics (mirrored in oracles_ops.top_ngram_repetition_sql):

    - n-grams are space-joined windows of the pinned tokenizer's output
      (ngram_freq's construction); a doc contributes rows for n only
      when it has >= n tokens;
    - the top n-gram is chosen by ``(count DESC, ngram ASC)`` — the
      repo-wide deterministic tie-break;
    - ``top_char_frac = top_count * length(top_ngram) /
      sum_g(count_g * length(g))`` — the winner's character mass over
      the character mass of ALL the doc's n-gram occurrences (float64
      division once, rounded to SCORE_DECIMALS).

    Scale shape: the per-n n-gram struct arrays are concatenated and
    exploded in ONE pass over the corpus (one scan for all n), counted
    with a (doc_id, n, ngram)-keyed partial-agg groupBy, and the
    winner + denominator come from ONE window partitioned by
    (doc_id, n) — a per-document partition, so the window never sees
    more rows than one doc's distinct n-grams (no global sort, no skew:
    doc_id is in the partition key).
    """
    toks = tokenize_expr(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"),
                     F.size(toks).alias("_n_tok"))
    def _gram_structs(n: int):
        # single-param lambda: pyspark HOFs pass the array index to a
        # second parameter, so `n` must be captured by closure, not by a
        # default argument
        idx = F.sequence(F.lit(0), F.col("_n_tok") - n)
        return F.when(
            F.col("_n_tok") >= n,
            F.transform(idx, lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice(F.col("_t"), i + 1, n)).alias("g"))),
        ).otherwise(F.expr("array()").cast("array<struct<n:int,g:string>>"))

    gram_arrays = [_gram_structs(n) for n in ns]
    grams = base.select(
        "doc_id", F.explode(F.concat(*gram_arrays)).alias("_p")
    ).select("doc_id", F.col("_p.n").alias("n"), F.col("_p.g").alias("ngram"))
    counts = grams.groupBy("doc_id", "n", "ngram").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.partitionBy("doc_id", "n")
    ranked = counts.select(
        "doc_id", "n", "ngram", "cnt",
        F.row_number().over(w.orderBy(F.desc("cnt"), F.asc("ngram"))).alias("_rn"),
        F.sum(F.col("cnt") * F.length("ngram")).over(w).alias("_all_chars"),
    )
    return ranked.filter(F.col("_rn") == 1).select(
        "doc_id", F.col("n").cast("int").alias("n"),
        F.col("ngram").alias("top_ngram"),
        F.col("cnt").alias("top_count"),
        F.round((F.col("cnt") * F.length("ngram")).cast("double")
                / F.col("_all_chars"), SCORE_DECIMALS).alias("top_char_frac"),
    )


# ---- PII detection + scrubbing ------------------------------------------

# Pinned patterns — deliberately simple so Java regex (Spark) and RE2
# (DuckDB) agree on every input: character classes + bounded greedy
# quantifiers only (no backrefs, no lookaround, leftmost-first in both).
# These are curation-grade detectors, not validators: a 999.999.999.999
# "IPv4" is counted — a training pipeline scrubs it anyway.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

# scrub order is pinned: email first (its domain contains dots that the
# relaxed IPv4 pattern must never see), phone, then IPv4
PII_SCRUB: tuple[tuple[str, str], ...] = (
    (PII_EMAIL, "<EMAIL>"),
    (PII_PHONE, "<PHONE>"),
    (PII_IPV4, "<IP>"),
)


def pii_scrub_expr(text_col: str = "text"):
    """The scrubbed text as ONE column expression (codegen; reusable on
    batch or streaming frames): each pinned pattern replace-ALL'd with
    its typed placeholder, in PII_SCRUB order."""
    s = F.col(text_col)
    for pat, rep in PII_SCRUB:
        s = F.regexp_replace(s, pat, rep)
    return s


def pii_profile(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII evidence: ``(doc_id, n_emails, n_phones, n_ipv4,
    scrub_sha256)`` — match counts per pinned pattern plus the sha256 of
    the scrubbed text (the hash, not the text: the row stays narrow and
    the oracle still proves the replacement byte-for-byte).

    Counts are computed on the ORIGINAL text, so n_ipv4 counts real IPv4
    literals even though the scrub pass sees an email-free string. Pure
    column expressions end to end — regexp_count / regexp_replace /
    sha2 are all whole-stage-codegen JVM ops; at 100 TB this op is a
    single scan with zero shuffle and zero Python.
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(F.col(text_col), F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(F.col(text_col), F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count(F.col(text_col), F.lit(PII_IPV4)).cast("long").alias("n_ipv4"),
        F.sha2(pii_scrub_expr(text_col), 256).alias("scrub_sha256"),
    )


# ---- unigram-LM perplexity (the Gopher/CCNet-family LM filter) ----------


def unigram_ppl(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-doc perplexity under a SELF-TRAINED corpus unigram LM — the
    language-model quality filter of the CCNet/Gopher family [LIT:
    Wenzek et al. 2020 (CCNet) score documents by LM perplexity; Rae et
    al. 2021 use it alongside the repetition filters]. A real pipeline
    often uses an external 5-gram LM; a unigram LM trained on the corpus
    itself is the deterministic, dependency-free member of the family —
    it still separates natural-frequency prose from token-salad and
    boilerplate (whose words are corpus-atypical), and it is exactly
    DuckDB-mirrorable.

    Pinned semantics (mirrored textually by oracles_ops.unigram_ppl_sql):

    - LM: add-one smoothing over the corpus vocabulary,
      ``p(t) = (cf_t + 1) / (total + V)`` (smoothing pinned even though
      every in-corpus token has cf >= 1, so the formula is total/V-
      stable and reusable for scoring held-out text);
    - per doc: ``avg_nll = (n * ln(total + V) - S) / n`` with
      ``S = Σ c_t * ln(cf_t + 1)`` and ``ppl = exp(avg_nll)``, both
      rounded to SCORE_DECIMALS;
    - **summation order pinned** (the A5 bm25 discipline): S is a strict
      LEFT FOLD over the doc's distinct terms in term-ASC order — Spark
      folds a sort_array'd struct list, the oracle folds
      list(... ORDER BY term) — so both engines add the same doubles in
      the same order and agree bit-for-bit before rounding. A plain
      SUM() would be order-nondeterministic in both engines.
    - docs with zero tokens produce no row (no 0/0).

    Scale shape: one tokenize scan -> groupBy(doc_id, term) partial agg
    (doc_id in the key: no hot-key skew); cf derived from that frame by
    ONE vocabulary groupBy (no second scan); the (total, V) row is a
    broadcast; the per-doc fold runs over collect_list of the doc's
    DISTINCT terms — bounded by doc length, the snippet-assembly class
    of per-doc work, never corpus-wide.
    """
    toks = df.select(F.col(id_col).alias("doc_id"),
                     F.explode(tokenize_expr(text_col)).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    cf = tf.groupBy("term").agg(F.sum("c").cast("long").alias("cf"))
    tot = cf.agg(F.sum("cf").cast("double").alias("_total"),
                 F.count(F.lit(1)).cast("double").alias("_v"))
    per = (
        tf.join(cf, "term")
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("n_tokens"),
             F.sort_array(F.collect_list(F.struct("term", "c", "cf")))
             .alias("_terms"))
        .crossJoin(F.broadcast(tot))
    )
    s = F.aggregate(
        "_terms", F.lit(0.0),
        lambda acc, x: acc + x["c"].cast("double") * F.log(x["cf"] + 1),
    )
    nll = (F.col("n_tokens").cast("double")
           * F.log(F.col("_total") + F.col("_v")) - s) \
        / F.col("n_tokens").cast("double")
    return per.select(
        "doc_id", "n_tokens",
        F.round(nll, SCORE_DECIMALS).alias("avg_nll"),
        F.round(F.exp(nll), SCORE_DECIMALS).alias("ppl"),
    ).orderBy("doc_id")


# ---- C4-style line cleaning --------------------------------------------

# pinned C4 line-keep rule [LIT: Raffel et al. 2020 (C4), §2.2]: a line
# survives iff it ends in terminal punctuation, has >= C4_MIN_WORDS
# whitespace-words, and carries none of the boilerplate markers. The
# policy-term list is the pinned subset of C4's (javascript notice,
# lorem ipsum filler, code brace); thresholds/terms are constants shared
# with oracles_ops.c4_clean_sql.
C4_MIN_WORDS = 5
C4_TERMINAL_RE = '[.!?"]$'
C4_BAD_SUBSTRINGS = ("javascript", "lorem ipsum", "{")


def _c4_keep(line):
    """Boolean column: does this line survive the pinned C4 rule?"""
    t = F.trim(line)
    words = F.size(F.filter(F.split(t, " "), lambda x: x != ""))
    keep = t.rlike(C4_TERMINAL_RE) & (words >= C4_MIN_WORDS)
    for bad in C4_BAD_SUBSTRINGS:
        keep = keep & ~F.contains(F.lower(t), F.lit(bad))
    return keep


def c4_kept_lines(text_col: str = "text"):
    """Array column of the lines surviving the pinned C4 rule."""
    lines = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"),
                     lambda l: F.length(l) > 0)
    return F.filter(lines, _c4_keep)


def c4_clean_text(text_col: str = "text"):
    """The CLEANED text column (kept lines rejoined with newlines) — the
    form jobs/write_shards.py applies in-line so shard text and budget
    counts both see the post-cleaning bytes. Empty string when every
    line drops."""
    return F.concat_ws("\n", c4_kept_lines(text_col))


def c4_clean(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """C4-style line cleaning evidence + cleaned text identity:

    ``(doc_id, n_lines, n_kept, kept_frac, clean_sha256)`` where
    clean_sha256 is the sha256 of the surviving lines rejoined with
    newlines (the P3 content-identity discipline — the oracle verifies
    the CLEANED BYTES, not just counts). Docs whose every line is
    dropped keep their row with n_kept = 0 and the empty-string sha.

    Scale shape: a pure row-local column expression — split + filter +
    concat + sha over the line ARRAY via higher-order functions, no
    explode, no shuffle, no Python. At 100 TB this is a narrow map
    fused into the scan."""
    lines = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"),
                     lambda l: F.length(l) > 0)
    kept = c4_kept_lines(text_col)
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.round(
            F.when(F.size(lines) > 0,
                   F.size(kept).cast("double") / F.size(lines).cast("double"))
            .otherwise(F.lit(0.0)),
            SCORE_DECIMALS,
        ).alias("kept_frac"),
        F.sha2(F.concat_ws("\n", kept), 256).alias("clean_sha256"),
    )
