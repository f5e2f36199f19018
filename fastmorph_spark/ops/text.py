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
) -> DataFrame:
    """Token-budget sequence packing: assign docs (in doc_id order) to
    contiguous training shards of ~budget tokens —
    shard_id = floor(exclusive_prefix_sum(n_tokens) / budget).

    Two-phase distributed cumsum (the with_doc_ids shape — never a global
    unpartitioned window): docs bucket by contiguous doc_id range; the
    within-bucket running sum is a window partitioned by bucket (fully
    distributed), bucket offsets are an exclusive prefix sum over
    |n_buckets| rows (one tiny task), joined back on the bucket key.
    Result is independent of partitioning and of n_buckets."""
    from fastmorph_spark.constants import TOKEN_PATTERN

    max_doc = df.agg(F.max(id_col).alias("m")).collect()[0]["m"]
    if max_doc is None:
        return df.sparkSession.createDataFrame(
            [], "doc_id long, n_tokens long, shard_id long")
    width = max_doc // n_buckets + 1
    n = F.regexp_count(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(TOKEN_PATTERN)
    ).cast("long")
    t = df.select(
        F.col(id_col).alias("doc_id"), n.alias("_n"),
        (F.col(id_col) / width).cast("long").alias("_b"),
    )
    from pyspark.sql import Window

    w_local = Window.partitionBy("_b").orderBy("doc_id")
    local = t.withColumn("_lc", F.sum("_n").over(w_local))  # inclusive cumsum
    counts = t.groupBy("_b").agg(F.sum("_n").alias("_c"))
    w_cum = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
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
