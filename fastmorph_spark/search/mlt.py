"""More-like-this: similar-document retrieval off the BM25 surface.

The classic fulltext-engine feature (Lucene's MoreLikeThis, Solr/ES
`more_like_this`): given ONE source document, derive a query from its
most characteristic terms and rank every OTHER document against it with
the engine's own scoring function. For an LLM-data pipeline this doubles
as lexical semantic retrieval — "find documents like this seed" — the
sparse counterpart of the embedding ANN path (ops/similarity.py).

Pinned semantics (mirrored by oracles.more_like_this_sql):

1. Term selection: the source doc's terms ranked by
   ``tfidf = tf_src * ln((N + 1) / (df + 1))`` — byte-identical to the
   doc_keywords panel's pinned form (search/keyness.py) so the "what is
   this doc about" panel and the MLT query agree on what characterises
   a document. Tie-break (tfidf DESC, term ASC); keep the top ``m``.
2. Scoring: the canonical BM25 disjunction over those m terms
   (bm25_score_col — idf multiplied LAST; sorted-term left fold per
   doc), universe = the full document set, SOURCE DOC EXCLUDED.
3. Output (rank, doc_id, score): rank over the unrounded score with the
   (score DESC, doc_id ASC) tie-break; score rounded to SCORE_DECIMALS.

Scale shape (100 TB): ONE corpus tokenize pass (pinned, reused by all
three subtrees), never a vocabulary-wide shuffle — df is aggregated only
over postings whose term occurs in the source doc (map-side partial), a
set bounded by one document's vocabulary, so the df frame and the m-term
query frame are both broadcast. The two top-N cuts (top-m terms, top-k
docs) fuse into TakeOrderedAndProject — no global sort materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastmorph_spark.cache import pin
from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.search.bm25 import bm25_score_col, corpus_stats, sum_term_scores


def _top_terms(src: DataFrame, df_t: DataFrame, global_stats: DataFrame,
               m: int) -> DataFrame:
    """(term, tf_src, df, tfidf) — the source doc's top-m TF-IDF terms,
    doc_keywords' pinned form. src = the source doc's tf rows; df_t = df
    restricted to the source doc's terms (bounded by one doc's
    vocabulary, hence broadcast)."""
    return (
        src.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(global_stats))
        .select(
            "term",
            F.col("tf").alias("tf_src"),
            "df",
            (F.col("tf").cast("double")
             * F.log((F.col("n_docs").cast("double") + F.lit(1.0))
                     / (F.col("df").cast("double") + F.lit(1.0)))).alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), F.asc("term"))
        .limit(m)
    )


def mlt_query_terms(
    documents: DataFrame,
    source_doc_id: int,
    m: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope=None,
) -> DataFrame:
    """(term, tf_src, df, tfidf) — the source doc's top-m TF-IDF terms.

    Exposed separately so the packed twin can derive the SAME query-term
    set from the at-rest index (dictionary df) + one-row tokenize and be
    rank-identical to this corpus-path selection.
    """
    tf, _doc_lens, global_stats = corpus_stats(documents, text_col=text_col,
                                               id_col=id_col)
    tf = pin(tf, scope)
    src = tf.filter(F.col(id_col) == source_doc_id)
    # df restricted to the source doc's terms: postings join against the
    # (bounded-by-one-doc-vocabulary) term set, then map-side partial agg
    cand = tf.join(F.broadcast(src.select("term")), "term")
    df_t = cand.groupBy("term").agg(F.count("*").alias("df"))
    return _top_terms(src, df_t, global_stats, m)


def more_like_this_packed(
    index,
    documents: DataFrame,
    source_doc_id: int,
    m: int = 10,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """more_like_this served off the at-rest packed index — the form a
    warm search daemon runs, rank-identical to the corpus path (shares
    its oracle).

    Term selection never rescans the corpus: tf comes from tokenizing
    the ONE source document row (doc_id filter pushed into the parquet
    scan), df from the index dictionary (joined against the broadcast
    source-term set — bounded by one doc's vocabulary, so the full
    dictionary is never broadcast or collected), N from the index stats.
    The m selected terms are collected (bounded, like WAND's ≤|q|
    dictionary lookup) and scored by the Block-Max WAND kernel with
    k+1 requested; dropping the source doc from a top-(k+1) list and
    keeping k is exact — the source either occupies one of the k+1
    slots (removed) or none (the k+1 list already contains the true
    top-k of the others).

    Assumes the index was built over a document set CONTAINING the
    source doc (every source term has a dictionary row); built with the
    default ascii tokenizer (the one build_postings applies here).
    """
    from fastmorph_spark.index.build import build_postings
    from fastmorph_spark.search.wand import search_wand_terms

    src = build_postings(
        documents.filter(F.col(id_col) == source_doc_id),
        text_col=text_col, id_col=id_col, with_positions=False,
    )
    df_t = (
        index.dictionary.join(F.broadcast(src.select("term")), "term")
        .select("term", "df")
    )
    qt = _top_terms(src, df_t, index.stats, m)
    terms = sorted(r["term"] for r in qt.select("term").collect())
    topk1 = search_wand_terms(index, terms, k=k + 1)
    w_rank = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    return (
        topk1.filter(F.col("doc_id") != source_doc_id)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select(w_rank.alias("rank"), "doc_id",
                F.round("score", SCORE_DECIMALS).alias("score"))
    )


def more_like_this(
    documents: DataFrame,
    source_doc_id: int,
    m: int = 10,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_score: bool = True,
    scope=None,
) -> DataFrame:
    """Top-k documents most similar to ``source_doc_id`` (excluded).

    Returns (rank, doc_id, score). ``m`` bounds the derived query to the
    source doc's m strongest TF-IDF terms (Lucene MLT's maxQueryTerms).
    """
    tf, _doc_lens, global_stats = corpus_stats(documents, text_col=text_col,
                                               id_col=id_col)
    tf = pin(tf, scope)
    src = tf.filter(F.col(id_col) == source_doc_id)
    cand = tf.join(F.broadcast(src.select("term")), "term")
    df_t = cand.groupBy("term").agg(F.count("*").alias("df"))
    qt = _top_terms(src, df_t, global_stats, m).select("term")
    matched = (
        cand.join(F.broadcast(qt), "term")
        .filter(F.col(id_col) != source_doc_id)
    )
    scored = (
        matched.join(F.broadcast(df_t), "term")  # tf rows already carry dl
        .crossJoin(F.broadcast(global_stats))
        .withColumn(
            "term_score",
            bm25_score_col(F.col("tf"), F.col("df"), F.col("n_docs"),
                           F.col("dl"), F.col("avgdl")),
        )
    )
    scored = sum_term_scores(scored, id_col)
    topk = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    w_rank = F.row_number().over(Window.orderBy(F.desc("score"), F.asc(id_col)))
    out = topk.select(w_rank.alias("rank"), F.col(id_col).alias("doc_id"), "score")
    if round_score:
        out = out.withColumn("score", F.round("score", SCORE_DECIMALS))
    return out
