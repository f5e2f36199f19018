"""M1 — logical (uncompressed) index tables: docs, postings, dictionary,
doc stats (SURVEY.md §1.3 schemas).

The reference interns words/lemmas/tags into integer-ID arrays at load
time [PK-med, SURVEY.md §1.1]; the Spark-native analog is these DataFrame
aggregations — Catalyst plans partial (map-side) + final hash aggregation,
so tf counting never ships raw token rows across the shuffle unreduced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_parallelism(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Scale-adaptive input widening (guide §2.5 "input skew": one huge
    unsplittable file -> repartition immediately after the read).

    A corpus that arrives as FEWER scan partitions than the session has
    cores (the driver fixture is a single-row-group parquet file — one
    unsplittable split) serializes every downstream per-batch kernel:
    tokenize, shingle+md5, varbyte encode all run on one task while the
    other cores idle. Repartition by the deterministic id key ONLY in that
    case; an at-scale scan already has >= cores partitions, so this adds
    no shuffle at 100 TB. Streaming inputs and frames without the key are
    returned unchanged.
    """
    try:
        if df.isStreaming or key_col not in df.columns:
            return df
        target = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            return df.repartition(target, key_col)
    except Exception:
        pass
    return df


def doc_len_count(text_col: Column | str, tokenizer: str = "ascii") -> Column:
    """Token count of a text column as ONE pure-JVM ``regexp_count`` —
    no token array materialized, no Python pass. Equals the tokenizer's
    ``len(tokens)`` for every tokenizer twin (parity pinned by
    tests/test_tokenize + test_unicode + test_code_tokenizer); shared by
    build_docs, corpus_stats and the index doc_lens path."""
    from fastmorph_spark.constants import TOKEN_PATTERN_UNI_JAVA

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if tokenizer == "code":
        from fastmorph_spark.constants import TOKEN_PATTERN_CODE
        from fastmorph_spark.tokenize import code_boundaries_expr

        counted = F.lower(code_boundaries_expr(c))
        count_pattern = TOKEN_PATTERN_CODE
    else:
        counted = F.lower(F.coalesce(c, F.lit("")))
        count_pattern = TOKEN_PATTERN_UNI_JAVA if tokenizer == "uni" else r"[a-z0-9_]+"
    return F.regexp_count(counted, F.lit(count_pattern)).cast("long")


def build_docs(corpus: DataFrame, id_col: str = "doc_id", tokenizer: str = "ascii") -> DataFrame:
    """Doc registry: identity + the per-row sha256 invariant
    (BASELINE.json input_hint: content sha256 equality vs source)."""
    cols = [c for c in ("repo", "path", "commit", "lang") if c in corpus.columns]
    text_col = "content" if "content" in corpus.columns else "text"
    return corpus.select(
        F.col(id_col),
        *cols,
        F.sha2(F.col(text_col), 256).alias("content_sha256"),
        # token count == number of token-pattern runs; regexp_count avoids
        # materializing the token array (split() allocates ~len(doc)
        # UTF8Strings per row and turns the job GC-bound — measured flat
        # 15s at ANY core count on 100k docs vs <2s with regexp_count)
        doc_len_count(text_col, tokenizer).alias("doc_len"),
    )


POSTINGS_SCHEMA = "term string, doc_id long, tf int, positions array<int>, dl long"
POSTINGS_SCHEMA_NOPOS = "term string, doc_id long, tf int, dl long"
POSTINGS_SCHEMA_VB = "term string, doc_id long, tf int, positions_vb binary, dl long"


def build_postings(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id", fold_case: bool = True, with_positions: bool = True, positions_vb: bool = False, tokenizer: str = "ascii") -> DataFrame:
    """Partition-LOCAL posting build (north_star: "partition-local
    posting-list build"): (term, doc_id, tf, positions sorted ascending),
    positions = 0-based token indexes.

    Carries ``dl`` (the doc's token count) on every posting row for free —
    the packer then needs NO doc_lens join (a 10^10-row shuffle avoided).

    Every (term, doc_id) group lives entirely inside ONE document row, so
    a global groupBy(term, doc_id) would shuffle 10^10 posting rows to
    merge nothing — and its map-side object-hash aggregation thrashes
    execution memory as cores/node rise (measured 10x CPU inflation from
    8 -> 32 local threads). Instead each Arrow batch builds its own
    postings inside the Python worker with vectorized numpy run-length
    grouping: flatten tokens, factorize, ONE stable lexsort by
    (doc, term), slice positions at run boundaries. No shuffle, no agg
    hash map, no per-token Python.

    ``fold_case=False`` builds the case-preserving twin index (per-slot
    case-sensitive match, P5). ``tokenizer="uni"`` builds over the Unicode
    twin tokenizer (non-Latin corpora — constants.TOKEN_PATTERN_UNI_PY;
    folded only). ``with_positions=False`` skips the position
    payload (column pruning can't reach inside the kernel) for tf-only
    consumers like expression BM25. ``positions_vb=True`` emits positions
    PRE-ENCODED as per-posting delta+varbyte bytes (first value raw —
    byte-identical to what the packer produces): each posting's encoding
    is self-contained, so the pack shuffle carries ~1.1 B/position instead
    of Spark's ~4 B array elements and the pack kernel concatenates byte
    slices instead of re-encoding. The physical-index build path uses this.
    """
    import itertools
    import re as _re

    import numpy as np
    import pandas as pd

    from fastmorph_spark.constants import (
        CODE_BOUNDARY_A,
        CODE_BOUNDARY_B,
        TOKEN_PATTERN,
        TOKEN_PATTERN_CODE,
        TOKEN_PATTERN_CS,
        TOKEN_PATTERN_UNI_PY,
    )

    if tokenizer == "code":
        assert fold_case, "the code tokenizer has no case-preserving twin"
        pattern = TOKEN_PATTERN_CODE
    elif tokenizer == "uni":
        # fold_case=False builds the uni case-preserving twin: same \w+
        # boundaries, no lower() — positions shared with the folded twin
        # for 1:1 case mappings (ASCII/Cyrillic; caveat at
        # tokenize.tokenize_py_uni_cs)
        pattern = TOKEN_PATTERN_UNI_PY
    else:
        pattern = TOKEN_PATTERN if fold_case else TOKEN_PATTERN_CS

    def _build(batches):
        rx = _re.compile(pattern)
        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf[text_col].fillna("")
            if tokenizer == "code":
                # boundary-insertion passes (vectorized) precede the fold —
                # same rule as tokenize_udf_code
                texts = texts.str.replace(CODE_BOUNDARY_A, r"\1 \2", regex=True) \
                             .str.replace(CODE_BOUNDARY_B, r"\1 \2", regex=True)
            if fold_case:
                texts = texts.str.lower()
            toks = texts.str.findall(rx)
            lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
            total = int(lens.sum())
            if total == 0:
                continue
            doc_ids = pdf[id_col].to_numpy(dtype=np.int64)
            fdoc = np.repeat(doc_ids, lens)
            frow = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
            flat = np.empty(total, dtype=object)
            flat[:] = list(itertools.chain.from_iterable(toks))
            codes, uniq = pd.factorize(flat, sort=False)
            # stable sort by (doc, term): equal keys keep input order, so
            # positions stay ascending within each run
            order = np.lexsort((codes, fdoc))
            sc, sd, sr = codes[order], fdoc[order], frow[order]
            if with_positions or positions_vb:
                starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                fpos = (np.arange(total, dtype=np.int64) - np.repeat(starts, lens)).astype(np.int32)
                sp = fpos[order]
            b = np.flatnonzero(np.concatenate(([True], (sc[1:] != sc[:-1]) | (sd[1:] != sd[:-1]))))
            tf = np.diff(np.append(b, sc.size)).astype(np.int32)
            out = {
                "term": np.asarray(uniq, dtype=object)[sc[b]],
                "doc_id": sd[b],
                "tf": tf,
            }
            if positions_vb:
                from fastmorph_spark.index.varbyte import vb_encode_with_lengths

                # per-posting delta (first value raw) — independent of
                # neighbors, so concatenation in ANY posting order later
                # reproduces the packer's block payload byte-for-byte
                pdelta = sp.astype(np.uint64).copy()
                if sp.size:
                    pdelta[1:] = (sp[1:].astype(np.int64) - sp[:-1].astype(np.int64)).astype(np.uint64)
                    pdelta[b] = sp[b].astype(np.uint64)
                p_bytes, p_nb = vb_encode_with_lengths(pdelta)
                p_off = np.concatenate(([0], np.cumsum(p_nb)))
                p_mem = p_bytes.tobytes()
                ends = np.append(b[1:], sc.size)
                out["positions_vb"] = [
                    p_mem[p_off[lo]:p_off[hi]] for lo, hi in zip(b.tolist(), ends.tolist())
                ]
            elif with_positions:
                out["positions"] = [sp[lo:lo + n] for lo, n in zip(b.tolist(), tf.tolist())]
            out["dl"] = lens[sr[b]]
            yield pd.DataFrame(out)

    if positions_vb:
        schema = POSTINGS_SCHEMA_VB
    else:
        schema = POSTINGS_SCHEMA if with_positions else POSTINGS_SCHEMA_NOPOS
    # widen a narrower-than-cores scan before the per-batch kernel (no-op
    # at scale — guide §2.5; measured: the single-split fixture otherwise
    # tokenizes the whole corpus on one task)
    narrow = documents.select(F.col(id_col).alias(id_col), text_col)
    return ensure_parallelism(narrow, id_col).mapInPandas(_build, schema)


def build_dictionary(postings: DataFrame) -> DataFrame:
    """(term, df, cf): document frequency + collection frequency.
    df is exact (rank-identity needs exact idf), never approximate."""
    return postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )


def build_doc_lens(documents: DataFrame, postings: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl) for ALL docs — empty docs keep dl=0 so N/avgdl are
    over the full corpus."""
    dl = postings.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    return (
        documents.select(F.col(id_col).alias("doc_id"))
        .join(dl, "doc_id", "left")
        .select("doc_id", F.coalesce("dl", F.lit(0)).cast("long").alias("dl"))
    )


def global_stats(doc_lens: DataFrame) -> DataFrame:
    """1-row (n_docs, avgdl)."""
    return doc_lens.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
