"""Scoped cache-lifetime management (VERDICT r03 #7).

Several operators persist an intermediate that feeds multiple subtrees of
the RETURNED lazy plan (search_request's match set, minhash_lsh_pairs'
shingle table, dup_groups' converged labels, bm25_topk_expression's
matched-tf table). Unpersisting inside the operator would defeat the
reuse — the block backs the result — so by default the CALLER owns the
cache and long-lived sessions must ``spark.catalog.clearCache()`` between
request bursts (ADVICE r02). That contract is easy to forget.

``CacheScope`` makes the safe pattern the easy one: every operator that
persists accepts ``scope=``; inside a ``with CacheScope() as cs:`` block
the operator registers its pins with the scope, and leaving the block
unpersists them ALL — a serving loop of 100 requests ends with zero
pinned storage blocks (pinned by the test suite via
``pinned_rdd_count``). Consume (collect/write) the returned DataFrame
INSIDE the scope: after exit its backing blocks are gone and any further
action recomputes from source.

Usage::

    with CacheScope() as cs:
        page = search_request(docs, postings, dictionary, slots, dists,
                              scope=cs)
        rows = page.collect()
    # zero blocks pinned here

``scope=None`` (the default everywhere) keeps the historical
caller-owned behavior unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class CacheScope:
    """Registry of DataFrames persisted on behalf of one request/stage;
    ``close()`` (or leaving the ``with`` block) unpersists all of them,
    most-recent first. Idempotent; usable as a plain try/finally handle
    when a context manager doesn't fit."""

    def __init__(self) -> None:
        self._pinned: list[DataFrame] = []
        self._closed = False

    def pin(self, df: DataFrame) -> DataFrame:
        """persist ``df`` and own its lifetime."""
        out = df.persist()
        self._pinned.append(out)
        return out

    def adopt(self, df: DataFrame) -> DataFrame:
        """Own the lifetime of an ALREADY-persisted ``df`` (e.g. the
        surviving frame of an iterative loop that manages its own
        intermediate persists)."""
        self._pinned.append(df)
        return df

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        for df in reversed(self._pinned):
            try:
                df.unpersist()
            except Exception:
                pass  # session torn down first — nothing left to free
        self._pinned.clear()

    def __enter__(self) -> "CacheScope":
        return self

    def __exit__(self, *exc) -> bool:
        self.close()
        return False


def pin(df: DataFrame, scope: CacheScope | None) -> DataFrame:
    """persist ``df``; when ``scope`` is given the scope owns the
    lifetime, otherwise the caller does (historical contract)."""
    return df.persist() if scope is None else scope.pin(df)


def adopt(df: DataFrame, scope: CacheScope | None) -> DataFrame:
    """Register an already-persisted ``df`` with ``scope`` (no-op when
    scope is None — caller-owned)."""
    return df if scope is None else scope.adopt(df)


def pinned_rdd_count(spark: SparkSession) -> int:
    """Number of storage-pinned RDDs in the session — the test-suite
    assertion surface for 'a request loop leaks no cache'."""
    return spark.sparkContext._jsc.getPersistentRDDs().size()
