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
        self._rdd_ids: list[tuple] = []  # (SparkContext, rdd_id) pairs
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

    def adopt_rdd_ids(self, sc, ids) -> None:
        """Own the lifetime of JVM-side persistent RDDs by id — the only
        way to free a ``localCheckpoint``'s backing blocks (PySpark's
        ``Dataset.unpersist`` goes through the CacheManager, which never
        saw them). Used by :func:`local_checkpoint`."""
        for rid in ids:
            self._rdd_ids.append((sc, int(rid)))

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
        for sc, rid in reversed(self._rdd_ids):
            try:
                rdd = sc._jsc.getPersistentRDDs().get(rid)
                if rdd is not None:
                    rdd.unpersist()
            except Exception:
                pass  # session torn down first — nothing left to free
        self._rdd_ids.clear()

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


def local_checkpoint(df: DataFrame, scope: CacheScope | None) -> DataFrame:
    """``df.localCheckpoint(eager=True)`` with lifetime tracking
    (optimization r06): the checkpoint truncates an arbitrarily fat
    lineage to one LogicalRDD node — the guide §3.3 "materialise an
    intermediate" move for iterative loops whose analyzed plan otherwise
    grows with every round. With ``scope=`` the backing blocks are freed
    on scope close (tracked by JVM rdd id — see adopt_rdd_ids); with
    scope=None they live until the ContextCleaner garbage-collects the
    RDD (``clearCache()`` does NOT free them — bounded: one small RDD
    per call, so long-lived sessions pay a few MB, not a leak-per-row)."""
    sc = df.sparkSession.sparkContext
    if scope is None:
        return df.localCheckpoint(eager=True)
    before = {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}
    out = df.localCheckpoint(eager=True)
    after = {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}
    scope.adopt_rdd_ids(sc, sorted(after - before))
    return out


def pinned_rdd_count(spark: SparkSession) -> int:
    """Number of storage-pinned RDDs in the session — the test-suite
    assertion surface for 'a request loop leaks no cache'."""
    return spark.sparkContext._jsc.getPersistentRDDs().size()
