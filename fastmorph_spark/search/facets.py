"""Facet counts over a search's match set — the result-page sidebar.

A corpus search UI shows, next to the hit list, how the matches
distribute over the metadata dimensions (language, source/genre, ...) so
the user can drill into a subcorpus. This is a first-class serving
surface of the reference's request lifecycle.

Plan shape: the match set arrives as a doc_id frame (any search
operator's output — AND, slot, packed), is made distinct, then joined to
the doc registry once, and ALL facet fields are counted in a single
groupBy by unpivoting (field, value) pairs inline with `explode(array(
struct(...)))` — one join + one aggregation regardless of how many
fields are faceted, never one pass per field. At 100 TB the join is a
doc_id-keyed shuffle the result assembly already pays (J5); AQE
broadcasts the match side when the query is selective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FACET_FIELDS = ("lang", "source")


def facet_counts(docs: DataFrame, matches: DataFrame,
                 fields: tuple[str, ...] = FACET_FIELDS) -> DataFrame:
    """Per-(field, value) doc counts over the match set.

    `matches` needs a doc_id column; duplicates are collapsed so operators
    that emit one row per occurrence still count each doc once.
    Output: (facet, value, n_docs) ordered (facet ASC, n_docs DESC,
    value ASC).
    """
    m = matches.select("doc_id").distinct()
    j = docs.join(m, "doc_id")
    pairs = j.select(
        F.explode(F.array(*[
            F.struct(F.lit(f).alias("facet"),
                     F.col(f).cast("string").alias("value"))
            for f in fields
        ])).alias("p")
    ).select("p.facet", "p.value")
    return (
        pairs.groupBy("facet", "value")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy(F.asc("facet"), F.desc("n_docs"), F.asc("value"))
    )
