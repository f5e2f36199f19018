"""BM25F: field-weighted ranking over structured documents (path +
content here — the "filename boost" every code-search engine ships).

A source file is not one bag of words: a query-term hit in the PATH
(`src/json/parser.py`) is far stronger evidence than one in the body, and
zoekt/Sourcegraph-class engines boost filename matches for exactly that
reason [PK-high: zoekt's scoring weights filename atoms above content
atoms]. The principled form is BM25F (Robertson & Zaragoza [LIT: "The
Probabilistic Relevance Framework: BM25 and Beyond", 2009]): combine the
PER-FIELD normalized term frequencies into one pseudo-frequency BEFORE
the k1 saturation — a term spread across fields saturates once, unlike a
naive per-field-BM25 sum which double-dips the saturation curve.

Pinned formula (all float64, parenthesization fixed for oracle parity):

    B_f(d)    = (1 - b_f) + b_f * dl_f(d) / avgdl_f
    wtf(t,d)  = Σ_f  w_f * tf_f(t,d) / B_f(d)        (field-order fold)
    idf(t)    = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
    score(d)  = Σ_t  idf(t) * (wtf * (k1 + 1) / (wtf + k1))
                                                      (sorted-term fold)

where df(t) counts docs containing t in ANY field (the merged (doc,term)
frame's per-term row count — one row per doc regardless of how many
fields hit), N is the total doc count, and avgdl_f averages over ALL
docs (zero-length fields included). With a single field of weight 1 this
reduces algebraically to classic BM25 (tf/B saturated by k1 ≡ tf
saturated by k1·B), which the tests pin against bm25_topk_expression.

Plan shape at scale (mirrors search/bm25.py): each field pays one
corpus-pass tokenization whose tf frame is filtered to the (tiny) query
term set BEFORE any join and pinned so it computes once; per-field
global stats are 1-row broadcasts; the field merge is a ≤|fields|-row
fold per (doc, term); df and the final scoring join are broadcast; the
result is TakeOrderedAndProject-limited. No shuffle is wider than the
per-field tf aggregation the plain BM25 path already pays. A doc with an
EMPTY field corpus-wide (avgdl_f = 0) simply contributes no rows for
that field — no division guard needed, the match frame is empty.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastmorph_spark.cache import pin
from fastmorph_spark.constants import BM25_K1, SCORE_DECIMALS
from fastmorph_spark.search.bm25 import corpus_stats, sum_term_scores
from fastmorph_spark.tokenize import tokenize_py

# (column, weight, b) — path hits boosted over content, path length
# normalization softer (paths are uniformly short; b=0.5 keeps a long
# nested path from being over-penalized)
DEFAULT_FIELDS: tuple[tuple[str, float, float], ...] = (
    ("path", 3.0, 0.5),
    ("content", 1.0, 0.75),
)


def bm25f_scores(
    documents: DataFrame,
    query_text: str,
    fields: Sequence[tuple[str, float, float]] = DEFAULT_FIELDS,
    k1: float = BM25_K1,
    id_col: str = "doc_id",
    tokenizer: str = "code",
    scope=None,
) -> DataFrame:
    """Per-doc BM25F scores (id_col, score) for all docs matching any
    query term in any field — the un-truncated core (bm25.bm25_scores
    convention; bm25f_topk TakeOrdered-limits it)."""
    from fastmorph_spark.tokenize import tokenize_py_code, tokenize_py_uni

    spark = documents.sparkSession
    tok_py = {"uni": tokenize_py_uni, "code": tokenize_py_code}.get(tokenizer, tokenize_py)
    qterms = sorted(set(tok_py(query_text)))
    empty = spark.createDataFrame([], f"{id_col} long, score double")
    if not qterms or not fields:
        return empty

    # per-field matched (id, term, fidx, wtf) — fidx pins the fold order
    parts: list[DataFrame] = []
    n_frame = None
    for fidx, (col, w, b) in enumerate(fields):
        fdocs = documents.select(F.col(id_col), F.col(col).alias("text"))
        tf_f, _, gs_f = corpus_stats(fdocs, text_col="text", id_col=id_col,
                                     tokenizer=tokenizer)
        if n_frame is None:  # N is field-independent (doc_lens covers all docs)
            n_frame = gs_f.select("n_docs")
        matched = pin(tf_f.filter(F.col("term").isin(qterms)), scope)
        parts.append(
            matched.crossJoin(F.broadcast(gs_f.select("avgdl"))).select(
                F.col(id_col), "term", F.lit(fidx).alias("fidx"),
                (F.lit(float(w)) * F.col("tf").cast("double")
                 / (F.lit(1.0 - b)
                    + F.lit(float(b)) * F.col("dl").cast("double") / F.col("avgdl"))
                 ).alias("wtf"),
            )
        )

    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)

    # field merge: one row per (doc, term) hit in ANY field; the ≤|fields|
    # contributions fold in field order (bit-stable, like sum_term_scores)
    wtf = cand.groupBy(id_col, "term").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("fidx", "wtf"))),
            F.lit(0.0),
            lambda acc, x: acc + x["wtf"],
        ).alias("wtf")
    )
    wtf = pin(wtf, scope)

    # df-any-field = the merged frame's per-term row count
    df_t = wtf.groupBy("term").agg(F.count("*").alias("df"))

    wtf_d = F.col("wtf")
    idf = F.log(F.lit(1.0) + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    scored = (
        wtf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_frame))
        .withColumn("term_score",
                    idf * (wtf_d * F.lit(k1 + 1.0) / (wtf_d + F.lit(float(k1)))))
    )
    return sum_term_scores(scored, id_col)


def bm25f_topk(
    documents: DataFrame,
    query_text: str,
    k: int = 10,
    fields: Sequence[tuple[str, float, float]] = DEFAULT_FIELDS,
    k1: float = BM25_K1,
    id_col: str = "doc_id",
    round_score: bool = False,
    tokenizer: str = "code",
    scope=None,
) -> DataFrame:
    """Field-weighted top-k: (rank, id_col, score) with the engine-wide
    (score DESC, id ASC) tie-break and TakeOrderedAndProject pre-prune."""
    scores = bm25f_scores(documents, query_text, fields, k1=k1, id_col=id_col,
                          tokenizer=tokenizer, scope=scope)
    topk = scores.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("score"), F.asc(id_col)))
    out = topk.select(rank.cast("long").alias("rank"), id_col, "score")
    if round_score:
        out = out.withColumn("score", F.round("score", SCORE_DECIMALS))
    return out
