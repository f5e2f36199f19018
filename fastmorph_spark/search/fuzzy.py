"""Fuzzy (edit-distance) term matching — dictionary-first, like wildcards.

The reference's query language offers approximate term matching for
misspellings and orthographic variants. The Spark-first realization
follows the wildcard discipline (SURVEY.md P4/J2): expand the query
against the DICTIONARY (vocabulary-sized, tiny next to the corpus), then
broadcast the expansion into the postings — the corpus itself is never
string-compared.

Pinned semantics:
- the probe word is folded exactly like corpus tokens (``tokenize_py``;
  a probe that folds to several tokens takes the FIRST — one fuzzy probe
  per call, the reference's shape);
- distance = plain Levenshtein (unit insert/delete/substitute), computed
  by the built-in JVM `levenshtein` expression (whole-stage codegen) and
  DuckDB's identical `levenshtein` function in the oracle;
- the length band |len(term) - len(word)| <= max_dist is applied FIRST —
  it is implied by the distance bound, costs one codegen comparison per
  dictionary row, and is the predicate a future length-partitioned
  dictionary layout would prune on (the SymSpell deletion-neighborhood
  index is the documented scale-up if the vocabulary ever outgrows a
  scan: precompute all ≤d-deletions of dictionary terms once, bucket-join
  probes by their own deletions — candidates meet in a hash join, no scan);
- order: (dist ASC, df DESC, term ASC), top-k.

``fuzzy_docs`` then resolves matched docs through the postings with the
expansion BROADCAST (it is at most `k` terms), one map-side join + one
doc_id groupBy — the same plan family as wildcard_docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastmorph_spark.tokenize import tokenize_py


# Driver-fixture twin (slot_case convention): the synthetic corpus has no
# 1-edit term pairs, so the fuzzy driver queries derive a typo-bearing text
# column DETERMINISTICALLY in both engines — literal 3-arg `replace` (same
# leftmost-non-overlapping semantics in Spark SQL and DuckDB) keyed on
# doc_id classes: 'fasst' (1 insert) and 'fst' (1 delete) variants of 'fast'.
FUZZY_TEXT_SQL = (
    "CASE WHEN doc_id % 5 = 0 THEN replace(text, ' fast ', ' fasst ') "
    "WHEN doc_id % 7 = 0 THEN replace(text, ' fast ', ' fst ') "
    "ELSE text END"
)


def fuzzy_text_col() -> F.Column:
    """Spark twin of FUZZY_TEXT_SQL (same string, Spark SQL parser)."""
    return F.expr(FUZZY_TEXT_SQL)


def _fold_probe(word: str) -> str:
    toks = tokenize_py(word)
    if not toks:
        raise ValueError(f"fuzzy probe {word!r} folds to no token")
    return toks[0]


def fuzzy_terms(dictionary: DataFrame, word: str, max_dist: int = 1,
                k: int = 50) -> DataFrame:
    """Dictionary terms within `max_dist` edits of `word`.

    Output: (term, df, dist) ordered (dist ASC, df DESC, term ASC),
    top-k. The probe itself (dist=0) is included when present.
    """
    w = _fold_probe(word)
    dist = F.levenshtein(F.col("term"), F.lit(w))
    return (
        dictionary
        .filter(F.abs(F.length("term") - F.lit(len(w))) <= max_dist)
        .withColumn("dist", dist.cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select("term", "df", "dist")
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def _deletions_py(w: str) -> list[str]:
    return [w[:i] + w[i + 1:] for i in range(len(w))]


DICT_DELETION_KEYS = (
    "array_union(array(term), transform(sequence(1, length(term)), "
    "i -> concat(substring(term, 1, i - 1), "
    "substring(term, i + 1, length(term)))))"
)


def fuzzy_terms_batch(spark, dictionary: DataFrame, words: list[str],
                      max_dist: int = 1) -> DataFrame:
    """SymSpell-style deletion-neighborhood matching for a BATCH of probes
    — the scale path the scan-based ``fuzzy_terms`` documents.

    Precompute (here: derive; in a deployment: persist once next to the
    dictionary) every term's 1-deletion neighborhood as join keys; probes
    bring their own neighborhoods; candidates MEET IN A HASH JOIN — the
    dictionary is never distance-scanned per probe, so a 10⁶-probe typo
    normalization pass costs one join however large the vocabulary. The
    deletion-key containment property (two strings within 1 edit always
    share a key in {self} ∪ deletions) guarantees no candidate is missed;
    an exact `levenshtein` verify then removes false candidates — the
    generate-then-verify discipline of the MinHash/LSH dedup ops.

    Output: (probe, term, df, dist) with dist <= max_dist, ordered
    (probe, dist ASC, df DESC, term ASC). max_dist=1 pinned (the d=2
    extension applies the deletion transform twice on both sides).
    """
    assert max_dist == 1, "deletion-neighborhood path is pinned to d=1"
    rows = []
    for w0 in sorted(set(words)):
        w = _fold_probe(w0)
        for key in [w, *_deletions_py(w)]:
            rows.append((w, key))
    probe_df = spark.createDataFrame(rows, "probe string, key string").distinct()
    dict_keys = dictionary.select(
        "term", "df", F.explode(F.expr(DICT_DELETION_KEYS)).alias("key"))
    cand = (
        dict_keys.join(F.broadcast(probe_df), "key")
        .select("probe", "term", "df").distinct()
    )
    dist = F.levenshtein(F.col("term"), F.col("probe"))
    return (
        cand.withColumn("dist", dist.cast("long"))
        .filter(F.col("dist") <= max_dist)
        .orderBy(F.asc("probe"), F.asc("dist"), F.desc("df"), F.asc("term"))
    )


def fuzzy_docs(postings: DataFrame, dictionary: DataFrame, word: str,
               max_dist: int = 1, k_terms: int = 50) -> DataFrame:
    """Docs containing any fuzzy variant of `word`.

    Output: (doc_id, best_dist, tf_sum) — the closest matched variant's
    distance and the summed tf over all matched variants; ordered doc_id.
    """
    variants = fuzzy_terms(dictionary, word, max_dist, k_terms) \
        .select("term", "dist")
    return (
        postings.join(F.broadcast(variants), "term")
        .groupBy("doc_id")
        .agg(
            F.min("dist").cast("long").alias("best_dist"),
            F.sum("tf").cast("long").alias("tf_sum"),
        )
        .orderBy("doc_id")
    )
