"""Synonym query expansion: BM25 over a thesaurus-expanded term set.

The classic recall lever (Lucene synonym filter, corpus-portal "search
with similar words"): each query term pulls in its top-n
distributionally similar terms (search/thesaurus.py — the pinned Dice
similarity over windowed co-occurrence profiles), and the canonical BM25
disjunction scores the UNION of original + expansion terms. Because both
building blocks are already pinned and oracle-mirrored, the composition
is too: the DuckDB twin (oracles_corpus.expanded_bm25_sql) derives the
same expansion set inside SQL and must hash-match end to end.

Pinned semantics:
- query terms = sorted set of tokenize_py(query_text);
- per query term, expansion = the thesaurus top-``n_expand`` neighbor
  terms (rank (sim DESC, term ASC) over the UNROUNDED sim — exactly
  thesaurus()'s cut); a term absent from the co-occurrence profiles
  expands to nothing but still scores itself;
- scored term set = set-union (original ∪ all expansions), deduplicated;
- scoring/ties/rounding = bm25_topk_expression verbatim.

Scale shape: ONE co-occurrence pair-count pass shared by all |q| lookups
(profiles persisted — the serving shape thesaurus(profiles=) exists
for); each lookup's collect is bounded by n_expand; the final scoring
pass is the flagship BM25 plan over <= |q| * (n_expand + 1) terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from fastmorph_spark.cache import pin
from fastmorph_spark.search.bm25 import bm25_topk_expression
from fastmorph_spark.search.thesaurus import cooc_profiles, thesaurus
from fastmorph_spark.tokenize import tokenize_py


def expand_terms(
    documents: DataFrame,
    query_text: str,
    n_expand: int = 3,
    window: int = 3,
    min_shared: int = 2,
    profiles: DataFrame | None = None,
    scope=None,
) -> list[str]:
    """Sorted deduplicated term list: query terms ∪ their top-n
    thesaurus neighbors. ``profiles`` reuses a persisted cooc_profiles
    output (the warm-daemon shape); otherwise one is pinned here for
    the |q| lookups (scope-owned, else caller-owned — the bm25 cache
    contract)."""
    qterms = sorted(set(tokenize_py(query_text)))
    if not qterms:
        return []
    prof = profiles if profiles is not None \
        else pin(cooc_profiles(documents, window), scope)
    out = set(qterms)
    for t in qterms:
        rows = thesaurus(documents, t, window=window, min_shared=min_shared,
                         k=n_expand, profiles=prof).collect()
        out.update(r["term"] for r in rows)
    return sorted(out)


def expanded_bm25(
    documents: DataFrame,
    query_text: str,
    n_expand: int = 3,
    window: int = 3,
    min_shared: int = 2,
    k: int = 10,
    profiles: DataFrame | None = None,
    scope=None,
) -> DataFrame:
    """(rank, doc_id, score): the flagship BM25 top-k over the expanded
    term set. Joining the expanded terms back into one query string is
    lossless — every term is already a single token, so tokenize_py
    round-trips the set unchanged (tested)."""
    terms = expand_terms(documents, query_text, n_expand=n_expand,
                         window=window, min_shared=min_shared,
                         profiles=profiles, scope=scope)
    return bm25_topk_expression(documents, " ".join(terms), k=k,
                                round_score=True, scope=scope)
