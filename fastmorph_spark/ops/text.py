"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure column expressions (whole-stage codegen;
zero Python on the hot path) and all DuckDB-expressible for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.tokenize import tokenize_expr

# tiny deterministic stopword lists per language (heuristic lang-ID);
# shared verbatim with the DuckDB oracle (oracles_ops.py)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "fr": ("le", "la", "de", "et", "un", "une", "est", "les"),
    "es": ("el", "la", "de", "y", "un", "una", "es", "los"),
    "de": ("der", "die", "das", "und", "ein", "ist", "zu", "den"),
}


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_distinct, n_chars_engine): whitespace/regex
    token counting + distinct count per doc."""
    toks = tokenize_expr(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_engine"),
    )


def _quality_features(text_col: str):
    """(mean_len, alpha_ratio, stop_ratio, distinct_ratio, composite)
    column expressions — shared by quality_score and the streaming
    quality gate so the pinned semantics exist once."""
    toks = tokenize_expr(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9_]", ""))
    stop_arr = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_len = F.when(n_tok > 0, alpha_chars.cast("double") / n_tok).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha_chars.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(0.0))
    distinct_ratio = F.when(n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok).otherwise(F.lit(0.0))
    mean_len_norm = F.least(mean_len / F.lit(8.0), F.lit(1.0))
    comp = (mean_len_norm + alpha_ratio + stop_ratio + distinct_ratio) / F.lit(4.0)
    return mean_len, alpha_ratio, stop_ratio, distinct_ratio, comp


def quality_expr(text_col: str = "text"):
    """The composite quality score as ONE column expression (codegen;
    usable on batch or streaming frames without a join)."""
    return _quality_features(text_col)[4]


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score:
    - mean token length, alpha ratio (alnum chars / chars),
    - stopword ratio (en list), distinct-token ratio,
    - composite: 0.25*each, clamped ratios. Deterministic arithmetic."""
    mean_len, alpha_ratio, stop_ratio, distinct_ratio, comp = _quality_features(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.round(mean_len, SCORE_DECIMALS).alias("mean_token_len"),
        F.round(alpha_ratio, SCORE_DECIMALS).alias("alpha_ratio"),
        F.round(stop_ratio, SCORE_DECIMALS).alias("stopword_ratio"),
        F.round(distinct_ratio, SCORE_DECIMALS).alias("distinct_ratio"),
        F.round(comp, SCORE_DECIMALS).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID: per language, count tokens in its list;
    argmax with deterministic tie-break (higher count, then language code
    ascending); 'und' when no votes."""
    toks = tokenize_expr(text_col)
    langs = sorted(LANG_STOPWORDS)

    def _votes(lang: str):
        stop_arr = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        # single-arg lambda only: pyspark treats a 2-param lambda (incl.
        # default args) as (element, index) and passes a Column as index
        return F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).alias(f"v_{lang}")

    votes = [_votes(lang) for lang in langs]
    d = df.select(F.col(id_col).alias("doc_id"), *votes)
    # argmax via struct max: (votes, negated-lang-rank) — lang asc on ties
    packed = F.array(*[
        F.struct(F.col(f"v_{lang}").alias("v"), F.lit(-i).alias("nr"), F.lit(lang).alias("lang"))
        for i, lang in enumerate(langs)
    ])
    best = F.array_max(packed)
    return d.select(
        "doc_id",
        F.when(best["v"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["v"].cast("long").alias("votes"),
    )


def fingerprint(df: DataFrame, n: int = 5, keep: int = 4,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Winnowing-style document fingerprint: the `keep` lexicographically
    smallest md5 hashes of word n-gram shingles, joined with '|'. Robust
    to local edits; equal fingerprints => near-identical docs."""
    toks = tokenize_expr(text_col)
    d = df.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    d = d.withColumn("n_tok", F.size("t"))
    idx = F.sequence(F.lit(0), F.greatest(F.col("n_tok") - n, F.lit(0)))
    hashes = F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("t"), i + 1, n))))
    smallest = F.slice(F.array_sort(F.array_distinct(hashes)), 1, keep)
    return d.filter(F.col("n_tok") >= n).select(
        "doc_id", F.concat_ws("|", smallest).alias("fingerprint")
    )


def sample_hash(df: DataFrame, rate: float, id_col: str = "doc_id") -> DataFrame:
    """Deterministic reproducible subsampling — the training-pipeline
    sampler: keep a doc iff the first 8 hex chars of md5(str(doc_id)),
    read as an integer, fall below rate * 2^32. Engine-agnostic (md5 of
    the decimal string is identical everywhere), stable under
    repartitioning, and composable (a 10% sample is a superset of a 5%
    one). Returns the kept (doc_id)s sorted."""
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .filter(bucket < int(rate * (1 << 32)))
        .orderBy("doc_id")
    )


def pack_shards(
    df: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    counts=None,
) -> DataFrame:
    """Token-budget sequence packing: assign docs (in doc_id order) to
    contiguous training shards of ~budget tokens —
    shard_id = floor(exclusive_prefix_sum(n_tokens) / budget).

    ``counts`` (VERDICT r04 #8): either a Column expression over ``df``
    or a (doc_id, n) DataFrame supplying the per-doc budget unit —
    e.g. ops.text.bpe_count_expr(...) for tokenizer-accurate BPE budgets
    instead of the default whitespace/regex word count. Docs absent from
    a counts FRAME pack at 0 tokens (they cost nothing in the budget).

    Two-phase distributed cumsum (the with_doc_ids shape — never a global
    unpartitioned window): docs bucket by contiguous doc_id range; the
    within-bucket running sum is a window partitioned by bucket (fully
    distributed), bucket offsets are an exclusive prefix sum over
    |n_buckets| rows (one tiny task), joined back on the bucket key.
    Result is independent of partitioning and of n_buckets."""
    from pyspark.sql import Column

    from fastmorph_spark.constants import TOKEN_PATTERN

    max_doc = df.agg(F.max(id_col).alias("m")).collect()[0]["m"]
    if max_doc is None:
        return df.sparkSession.createDataFrame(
            [], "doc_id long, n_tokens long, shard_id long")
    width = max_doc // n_buckets + 1
    bucket = (F.col("doc_id") / width).cast("long").alias("_b")
    if isinstance(counts, DataFrame):
        cnt = counts.select(F.col(counts.columns[0]).alias("doc_id"),
                            F.col(counts.columns[1]).cast("long").alias("_cn"))
        t = (
            df.select(F.col(id_col).alias("doc_id"))
            .join(cnt, "doc_id", "left")
            .select("doc_id", F.coalesce("_cn", F.lit(0)).alias("_n"), bucket)
        )
    else:
        if isinstance(counts, Column):
            n = counts.cast("long")
        else:
            n = F.regexp_count(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(TOKEN_PATTERN)
            ).cast("long")
        t = df.select(F.col(id_col).alias("doc_id"), n.alias("_n")) \
              .select("doc_id", "_n", bucket)
    from pyspark.sql import Window

    w_local = Window.partitionBy("_b").orderBy("doc_id")
    local = t.withColumn("_lc", F.sum("_n").over(w_local))  # inclusive cumsum
    per_bucket = t.groupBy("_b").agg(F.sum("_n").alias("_c"))
    w_cum = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_b", F.coalesce(F.sum("_c").over(w_cum), F.lit(0)).cast("long").alias("_off")
    )
    return (
        local.join(offsets, "_b")
        .select(
            "doc_id",
            F.col("_n").alias("n_tokens"),
            F.floor((F.col("_off") + F.col("_lc") - F.col("_n")) / budget_tokens)
            .cast("long").alias("shard_id"),
        )
        .orderBy("doc_id")
    )


def ngram_freq(
    df: DataFrame,
    n: int = 2,
    k: int = 100,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k corpus n-gram FREQUENCY LIST — the corpus-linguistics
    surface next to collocations: (rank, ngram, count, df) where count
    is total occurrences (NOT distinct-per-doc: a frequency list counts
    every occurrence) and df is the number of docs containing the
    n-gram. Deterministic total order: (count DESC, ngram ASC).

    Scale shape: one explode + ONE groupBy on ngram (map-side partial
    agg absorbs hot n-grams — no join, so no hot-key blowup), then
    orderBy+limit fuses to TakeOrderedAndProject (shard-local top-k, the
    driver k-merges <= k rows); the rank window runs over the <= k
    collected rows only. This is an OFFLINE analysis op by design — a
    serving request form would re-scan the corpus per request, which is
    exactly what an index exists to avoid.
    """
    toks = tokenize_expr(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    base = base.withColumn("n_tok", F.size("t")).filter(F.col("n_tok") >= n)
    idx = F.sequence(F.lit(0), F.col("n_tok") - n)
    grams = base.select(
        "doc_id",
        F.explode(F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, n))
        )).alias("ngram"),
    )
    top = (
        grams.groupBy("ngram")
        .agg(F.count("*").cast("long").alias("count"),
             F.countDistinct("doc_id").cast("long").alias("df"))
        .filter(F.col("count") >= min_count)
        .orderBy(F.desc("count"), F.asc("ngram"))
        .limit(k)
    )
    from pyspark.sql import Window

    rank = F.row_number().over(Window.orderBy(F.desc("count"), F.asc("ngram")))
    return top.withColumn("rank", rank.cast("long")).select(
        "rank", "ngram", "count", "df"
    )


# ---- pinned deterministic BPE token counting (VERDICT r04 #8) ----------

# Pinned merge table: an ORDERED list of symbol-pair merges, applied as
# ONE left-to-right replace-all pass per rule, in this exact order (the
# train-free analog of a learned BPE vocab — fixed here so every engine
# reproduces identical segmentations forever). Word-internal only: words
# are joined with a '|' sentinel no merge pair can contain or create, so
# merges never cross word boundaries. Pairs are chosen over the corpus's
# own character bigrams so common fixture words (the/hash/join/fast/scan/
# data/merge/key/sort/order/...) compress to 1-2 subwords — the counts
# are tokenizer-accurate budgets, not char counts.
#
# PINNED PASS SEMANTICS: symbols are space-separated and the working
# string is wrapped in leading/trailing spaces, so a rule matches
# " a b " — EXACT symbols only (a bare "a b" could false-match the tail
# of a longer symbol: "or t" contains "r t"). Each rule runs as TWO
# non-overlapping left-to-right replace passes: a replacement consumes
# its trailing delimiter space, so an immediately adjacent merge site
# loses its leading space and is skipped in pass one — pass two catches
# it (e.g. "t h t h" under (t,h): pass1 " th t h ", pass2 " th th ").
# Contrived 4+-site adjacency chains may still under-merge vs exhaustive
# per-rule BPE — a deterministic, documented divergence, IDENTICAL in
# all three engines, which is the property the oracle gate needs.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"),                      # the
    ("i", "n"), ("e", "r"), ("a", "n"), ("o", "r"),
    ("s", "t"), ("a", "r"), ("o", "w"), ("l", "e"),
    ("o", "u"), ("u", "p"),
    ("s", "c"), ("sc", "an"),                     # scan
    ("h", "a"), ("ha", "s"), ("has", "h"),        # hash
    ("j", "o"), ("jo", "in"),                     # join
    ("f", "a"), ("fa", "st"),                     # fast
    ("d", "a"), ("da", "t"), ("dat", "a"),        # data
    ("m", "er"), ("mer", "g"), ("merg", "e"),     # merge
    ("k", "e"), ("ke", "y"),                      # key
    ("s", "or"), ("sor", "t"),                    # sort
    ("or", "d"), ("ord", "er"),                   # order
)


def bpe_encode_py(word: str, merges=BPE_MERGES) -> list[str]:
    """Pure-Python reference encoder (test oracle): one replace pass per
    merge over the space-wrapped, space-joined character string —
    str.replace's non-overlapping left-to-right scan IS the pinned pass
    semantics."""
    if not word:
        return []
    s = " " + " ".join(word) + " "
    for a, b in merges:
        s = s.replace(f" {a} {b} ", f" {a}{b} ")
        s = s.replace(f" {a} {b} ", f" {a}{b} ")  # pass 2 (adjacency)
    return s.strip().split(" ")


def bpe_count_expr(text_col: str = "text"):
    """Per-doc BPE token count as ONE Catalyst expression chain: tokens
    -> '|'-joined -> char-spaced + space-wrapped -> |merges| chained
    literal replaces (whole-stage codegen; zero Python, zero shuffle) ->
    segment count excluding the sentinel. O(|merges|) string passes per
    doc — the same work a real BPE encoder does per merge rank,
    expressed JVM-side."""
    toks = tokenize_expr(text_col)
    s = F.concat_ws("|", toks)
    s = F.concat(F.lit(" "), F.regexp_replace(s, "(.)", "$1 "))
    for a, b in BPE_MERGES:
        pat, rep = F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
        s = F.replace(F.replace(s, pat, rep), pat, rep)  # 2 passes/rule
    n = F.size(F.filter(F.split(F.trim(s), " "), lambda x: x != F.lit("|")))
    return F.when(F.size(toks) == 0, F.lit(0)).otherwise(n).cast("long")


def token_count_bpe(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_bpe): word count next to the pinned-BPE
    subword count — the tokenizer-accurate budget a training pipeline
    packs against (feed to pack_shards via counts=)."""
    toks = tokenize_expr(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        bpe_count_expr(text_col).alias("n_bpe"),
    )


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      group_col: str = "lang",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic PER-GROUP subsampling — the training-mixture knob
    next to sample_hash's flat rate: each ``group_col`` value gets its
    own keep fraction (a data pipeline upsamples scarce languages and
    downsamples crawl-heavy ones by exactly this shape). Groups absent
    from ``fractions`` are dropped — an explicit mixture spec, not a
    passthrough.

    Same md5 discipline as sample_hash: keep a doc iff the first 8 hex
    chars of md5(str(doc_id)), as an integer, fall below
    fraction[group] * 2^32. Engine-agnostic, repartition-stable, and
    NESTED across rates (a group's 10% sample is a superset of its 5%
    one), so mixtures can be retuned without resampling churn. The
    threshold comparison is on int64 — exact, no float boundary.

    Returns (doc_id, group) kept rows sorted by doc_id. Scale shape:
    one scan, zero shuffles before the output sort (which a writer
    drops); the fractions map compiles to a CASE chain over
    |fractions| literals — no join, no broadcast, no Python.
    """
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    thresh = F.lit(None).cast("long")
    for g in sorted(fractions):
        thresh = F.when(F.col(group_col) == g,
                        F.lit(int(fractions[g] * (1 << 32)))
                        ).otherwise(thresh)
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.col(group_col).alias("group"))
        .filter(bucket < thresh)
        .orderBy("doc_id")
    )
