"""Logical postings decoded FROM the packed index — index-backed
phrase / proximity / slot / boolean queries.

The engine's position-predicate operators (engine.py) consume logical
postings `(term, doc_id, tf, positions)`. Building those from the corpus
per query re-tokenizes the whole corpus — fine as a fixture yardstick,
wrong at 100 TB. The packed index stores delta+varbyte (doc gaps, tfs,
positions) blocks exactly so a query can reproduce the logical rows for
its handful of terms from the index alone:

  dictionary lookup (term -> term_bucket, <= |q| rows, driver-side like
  the WAND path) -> pruned block scan (partition pruning on term_bucket +
  term pushdown + column pruning) -> Arrow decode kernel (numpy varbyte,
  Python loops over BLOCKS only, never postings) -> engine operators
  unchanged.

Decode parity with build_postings is pinned by
tests/test_packed_ops.py::test_decoded_postings_roundtrip; full query
parity (packed path == corpus path) by the *_packed driver queries
sharing the corpus path's DuckDB oracles.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastmorph_spark.index.io import Index
from fastmorph_spark.index.varbyte import decode_doc_gaps, decode_positions, vb_decode
from fastmorph_spark.search import engine
from fastmorph_spark.tokenize import tokenize_py

DECODED_SCHEMA = "term string, doc_id long, tf int, positions array<int>"

# above this many expanded terms, skip the driver-side isin pushdown and
# semi-join a broadcast term frame instead (an isin literal of 10^5 terms
# bloats the plan; the bucket partition filter is then also moot)
MAX_TERM_PUSHDOWN = 1000

# above this many dictionary-matched terms, a wildcard/stem slot is NOT
# enumerated on the driver at all: the packed scan and the engine's slot
# predicates run the like/stem expression directly (a `s*` slot over a
# 10^8-term vocabulary must never collect or broadcast millions of
# strings). Term-level partition pruning is moot for such a slot anyway —
# a huge expansion hashes into every term_bucket.
MAX_SLOT_EXPANSION = 10_000

# doc-range block-skip pruning is two tiny metadata aggregations + a
# broadcast join — ~fixed cost (a few hundred ms of extra stages on a
# small cluster), with a payoff proportional to the decode volume it can
# skip. Engage it only when the query's total posting estimate (Σ df from
# the dictionary lookup we already do) clears this bar; below it the full
# decode is already cheaper than the metadata pass. At 100 TB any
# multi-term query clears it by orders of magnitude.
PRUNE_MIN_POSTINGS = 100_000


def _empty(spark) -> DataFrame:
    return spark.createDataFrame([], DECODED_SCHEMA)


def _base_blocks(spark, postings: DataFrame, dictionary: DataFrame,
                 terms: list[str]) -> tuple[DataFrame | None, int | None]:
    """The shared head of the pruned packed scan (twin-index capable):
    term-pushdown block scan + the Σdf pruning-gate estimate. Returns
    (blocks, est_postings); (None, 0) when no term exists in the
    dictionary; est None for wide expansions (assume big, always prune)."""
    terms = sorted(set(terms))
    if not terms:
        return None, 0
    if len(terms) <= MAX_TERM_PUSHDOWN:
        # J1-style dictionary lookup: term_bucket (and df, the pruning-
        # gate estimate) ride in the dictionary, so partition pruning
        # costs one <=|terms|-row driver round-trip
        drows = dictionary.filter(F.col("term").isin(terms)) \
            .select("term", "term_bucket", "df").collect()
        if not drows:
            return None, 0
        buckets = sorted({int(r["term_bucket"]) for r in drows})
        present = sorted({r["term"] for r in drows})
        est = sum(int(r["df"]) for r in drows)
        return postings.filter(
            F.col("term_bucket").isin(buckets) & F.col("term").isin(present)
        ), est
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    return postings.join(F.broadcast(tdf), "term", "left_semi"), None


def _envelope_keep(per: DataFrame, n_groups: int) -> DataFrame:
    """Doc-range envelope per shard: keep a shard only if ALL groups reach
    it and their [max lo, min hi] envelope is non-empty. `per` is bounded
    by the rarest group's shard count, so the result broadcasts."""
    env = per.groupBy("doc_shard").agg(
        F.count("*").alias("_ng"),
        F.max("_lo").alias("_lo"), F.min("_hi").alias("_hi"),
    )
    return env.filter(
        (F.col("_ng") == n_groups) & (F.col("_lo") <= F.col("_hi"))
    ).select("doc_shard", "_lo", "_hi")


def _apply_keep(blocks: DataFrame, keep: DataFrame) -> DataFrame:
    """Drop blocks outside the kept shards/envelopes BEFORE any payload
    byte is read (broadcast join on metadata columns only)."""
    return (
        blocks.join(F.broadcast(keep), "doc_shard")
        .filter((F.col("max_doc") >= F.col("_lo")) & (F.col("first_doc") <= F.col("_hi")))
    )


def _doc_range_prune(blocks: DataFrame, per: DataFrame, n_groups: int) -> DataFrame:
    """Shared tail of doc-range block-skip pruning (see _envelope_keep)."""
    return _apply_keep(blocks, _envelope_keep(per, n_groups))


def pruned_blocks(index: Index, terms: list[str],
                  groups: list[list[str]] | None = None,
                  prune_min_postings: int = PRUNE_MIN_POSTINGS) -> DataFrame | None:
    """The pruned PACKED block scan for `terms` (pre-decode): partition
    pruning on term_bucket + term pushdown + column pruning, and — when
    ``groups`` gives the query's AND structure — doc-range BLOCK-SKIP
    pruning (the position-query analog of WAND's score-based skipping).

    ``groups``: a list of term lists; the query only matches docs that
    contain >=1 term from EVERY group (phrase/AND: one group per term;
    slot patterns: one group per slot with its dictionary-expanded terms).
    Blocks never span a doc_shard (pack groups by (bucket, slice,
    doc_shard)), so the intersection runs on block METADATA only:

      1. keep a doc_shard only if all groups have >=1 block in it;
      2. within a kept shard, candidate docs lie in the ENVELOPE
         [max_g min(first_doc), min_g max(max_doc)] — blocks outside it
         are skipped before any payload byte is read.

    The metadata pass is a column-pruned scan (term/doc_shard/first_doc/
    max_doc — no binaries); `keep` is bounded by the RAREST group's shard
    count, so for selective queries it broadcasts (no payload shuffle).
    A phrase of two common terms keeps most shards — exactly the case
    where no doc-range pruning is possible; the envelope still bounds it.

    The pruning engages only when the dictionary's Σ df estimate clears
    ``prune_min_postings`` (its cost is ~fixed; its payoff scales with the
    decode volume — see PRUNE_MIN_POSTINGS). Tests force it with
    prune_min_postings=0.

    Returns None when no query term exists in the dictionary.
    """
    spark = index.postings.sparkSession
    blocks, est_postings = _base_blocks(spark, index.postings, index.dictionary, terms)
    if blocks is None:
        return None

    prune_pays = est_postings is None or est_postings >= prune_min_postings
    if groups is not None and len(groups) >= 2 and prune_pays:
        pairs = sorted({(t, gi) for gi, g in enumerate(groups) for t in g})
        tg = spark.createDataFrame(pairs, "term string, grp int")
        meta = (
            blocks.select("term", "doc_shard", "first_doc", "max_doc")
            .join(F.broadcast(tg), "term")
        )
        per = meta.groupBy("doc_shard", "grp").agg(
            F.min("first_doc").alias("_lo"), F.max("max_doc").alias("_hi")
        )
        blocks = _doc_range_prune(blocks, per, len(groups))
    return blocks


def _live(decoded: DataFrame, index: Index) -> DataFrame:
    """Drop tombstoned docs from decoded logical postings (broadcast
    anti-join against the live delete set — bounded by purge cadence,
    index/tombstones.py). Identity when the index has no live deletes.
    Position/slot/phrase semantics need no stats correction (unlike BM25,
    which documents stale stats until purge)."""
    t = getattr(index, "tombstones", None)
    if t is None:
        return decoded
    return decoded.join(
        F.broadcast(t.select("doc_id").distinct()), "doc_id", "left_anti"
    )


def _decode_blocks(blocks: DataFrame, spark) -> DataFrame:
    """Varbyte decode of a (pruned) packed block scan into logical
    `(term, doc_id, tf, positions)` rows — the shared Arrow kernel behind
    decoded_postings and decoded_postings_pred."""
    blocks = blocks.select("term", "doc_gaps", "tfs", "positions")
    # after pruning only a handful of blocks survive; coalesce so the
    # decode doesn't inherit the pack exchange's width (a write-path
    # default of 512 partitions means 512 near-empty Arrow tasks — the
    # measured 16x packed-query latency tax, VERDICT r02 #1)
    blocks = blocks.coalesce(max(spark.sparkContext.defaultParallelism, 1))

    def _decode(it):
        for pdf in it:
            cols: dict[str, list] = {"term": [], "doc_id": [], "tf": [], "positions": []}
            for term, g, t, p in zip(pdf["term"], pdf["doc_gaps"], pdf["tfs"], pdf["positions"]):
                doc_ids = decode_doc_gaps(g).astype(np.int64)
                tfs = vb_decode(t).astype(np.int64)
                plists = decode_positions(p, tfs)
                cols["term"].extend([term] * doc_ids.size)
                cols["doc_id"].append(doc_ids)
                cols["tf"].append(tfs.astype(np.int32))
                cols["positions"].extend(pl.astype(np.int32) for pl in plists)
            if not cols["term"]:
                continue
            yield pd.DataFrame({
                "term": cols["term"],
                "doc_id": np.concatenate(cols["doc_id"]),
                "tf": np.concatenate(cols["tf"]),
                "positions": cols["positions"],
            })

    return blocks.mapInPandas(_decode, DECODED_SCHEMA)


def decoded_postings(index: Index, terms: list[str],
                     groups: list[list[str]] | None = None,
                     prune_min_postings: int = PRUNE_MIN_POSTINGS) -> DataFrame:
    """Pruned scan + varbyte decode: logical `(term, doc_id, tf,
    positions)` rows for exactly `terms` from the packed index. Pass
    ``groups`` (see pruned_blocks) to skip blocks whose doc ranges cannot
    intersect the query's AND structure."""
    spark = index.postings.sparkSession
    blocks = pruned_blocks(index, terms, groups, prune_min_postings)
    if blocks is None:
        return _empty(spark)
    return _live(_decode_blocks(blocks, spark), index)


def _slot_pred(s: dict):
    """A slot's membership test as a Catalyst predicate on `term` — the
    no-enumeration twin of _expand_slot_term_groups's dictionary pass."""
    from fastmorph_spark.stem import stem_expr, stem_py

    if "term" in s:
        t = s["term"] if s.get("case") else s["term"].lower()
        return F.col("term") == t
    if "stem" in s:
        return stem_expr(F.col("term")) == stem_py(s["stem"].lower())
    if "tag" in s:
        from fastmorph_spark.tags import tag_expr

        return tag_expr(F.col("term")) == s["tag"]
    if "fuzzy" in s:
        from fastmorph_spark.search.fuzzy import _fold_probe

        w = _fold_probe(s["fuzzy"])
        d = int(s.get("dist", 1))
        return (F.abs(F.length("term") - F.lit(len(w))) <= d) \
            & (F.levenshtein(F.col("term"), F.lit(w)) <= d)
    if "regex" in s:
        from fastmorph_spark.search.regex import regex_pred

        return regex_pred(s["regex"], case=bool(s.get("case")))
    pat = s["pattern"] if s.get("case") else s["pattern"].lower()
    like = engine.wildcard_pattern_to_like(pat)
    return F.col("term").like(like)


def decoded_postings_pred(index: Index, preds: list) -> DataFrame:
    """Predicate-direct packed scan + decode for slot patterns too wide to
    enumerate (> MAX_SLOT_EXPANSION dictionary terms): the slot predicates
    run straight on the block scan's `term` column — no driver collect, no
    broadcast of an expanded term list. Term-bucket partition pruning is
    skipped (a huge expansion hashes into every bucket anyway), but
    doc-range block-skip pruning still applies: group membership is
    evaluated per metadata row in ONE column-pruned pass (array of matched
    slot ids, exploded), then the shared shard-intersection + envelope
    logic drops blocks before any payload byte is read."""
    spark = index.postings.sparkSession
    blocks = index.postings.filter(reduce(lambda a, b: a | b, preds))
    if len(preds) >= 2:
        arr = F.array_compact(F.array(
            *[F.when(p, F.lit(i)) for i, p in enumerate(preds)]
        ))
        per = (
            blocks.select("doc_shard", "first_doc", "max_doc", arr.alias("_g"))
            .select("doc_shard", "first_doc", "max_doc", F.explode("_g").alias("grp"))
            .groupBy("doc_shard", "grp")
            .agg(F.min("first_doc").alias("_lo"), F.max("max_doc").alias("_hi"))
        )
        blocks = _doc_range_prune(blocks, per, len(preds))
    return _live(_decode_blocks(blocks, spark), index)


def _require_cs(index: Index) -> None:
    if index.postings_cs is None or index.dictionary_cs is None:
        raise ValueError(
            "case-sensitive slots need the case-preserving twin index: "
            "build_index_frames(..., case_sensitive=True)"
        )


def _expand_slot_term_groups(
    index: Index, slots: list[dict],
    max_expansion: int = MAX_SLOT_EXPANSION,
) -> list[list[str]] | None:
    """Per-slot concrete term lists, expanded dictionary-first (exact terms
    pass through; wildcard/stem/tag slots scan the ~|vocab|-row dictionary
    ONCE for all such slots — case-SENSITIVE slots scan the cs twin
    dictionary instead, VERDICT r03 #1). The per-slot structure feeds
    block-skip pruning: a doc must hold >=1 term from every slot.

    Returns None when the expansion exceeds ``max_expansion`` dictionary
    terms — the caller must then take the predicate-direct path
    (decoded_postings_pred) instead of materializing the term lists on the
    driver. The overflow check rides the same dictionary pass (LIMIT
    max_expansion+1), so the wide case costs one truncated scan, not a
    count plus a collect."""
    from fastmorph_spark.stem import stem_expr, stem_py

    # (slot_idx, predicate), split by which dictionary they expand against
    conds: dict[bool, list] = {False: [], True: []}
    groups: list[list[str]] = []
    for i, s in enumerate(slots):
        cs = bool(s.get("case"))
        if cs:
            _require_cs(index)
        if "term" in s:
            groups.append([s["term"] if cs else s["term"].lower()])
        elif "stem" in s:
            if cs:
                raise ValueError("stem slots are case-folded by definition")
            groups.append([])
            conds[cs].append((i, stem_expr(F.col("term")) == stem_py(s["stem"].lower())))
        elif "tag" in s:
            from fastmorph_spark.tags import TAG_CLASSES, tag_expr

            if cs:
                raise ValueError("tag slots are case-folded by definition")
            if s["tag"] not in TAG_CLASSES:
                raise ValueError(f"unknown tag class {s['tag']!r}")
            groups.append([])
            conds[cs].append((i, tag_expr(F.col("term")) == s["tag"]))
        elif "fuzzy" in s:
            from fastmorph_spark.search.fuzzy import _fold_probe

            if cs:
                raise ValueError("fuzzy slots are case-folded by definition")
            w = _fold_probe(s["fuzzy"])
            d = int(s.get("dist", 1))
            groups.append([])
            conds[cs].append((
                i,
                (F.abs(F.length("term") - F.lit(len(w))) <= d)
                & (F.levenshtein(F.col("term"), F.lit(w)) <= d),
            ))
        elif "regex" in s:
            from fastmorph_spark.search.regex import regex_pred

            groups.append([])
            conds[cs].append((i, regex_pred(s["regex"], case=cs)))
        else:
            groups.append([])
            pat = s["pattern"] if cs else s["pattern"].lower()
            conds[cs].append((i, F.col("term").like(engine.wildcard_pattern_to_like(pat))))
    for cs_side, clist in conds.items():
        if not clist:
            continue
        D = index.dictionary_cs if cs_side else index.dictionary
        sel = D.select(
            "term", *[c.alias(f"_m{i}") for i, c in clist]
        ).filter(reduce(lambda a, b: a | b, [F.col(f"_m{i}") for i, _ in clist]))
        rows = sel.limit(max_expansion + 1).collect()
        if len(rows) > max_expansion:
            return None
        for r in rows:
            for i, _ in clist:
                if r[f"_m{i}"]:
                    groups[i].append(r["term"])
    return [sorted(set(g)) for g in groups]


def _flat(groups: list[list[str]]) -> list[str]:
    return sorted({t for g in groups for t in g})


def _grouped_decode_two(index: Index, groups: list[list[str]],
                        cs_flags: list[bool],
                        prune_min_postings: int = PRUNE_MIN_POSTINGS,
                        ) -> tuple[DataFrame, DataFrame]:
    """Pruned scan + decode across BOTH twins (folded + case-preserving)
    with CROSS-TWIN doc-range block-skip pruning: the two tokenizations
    share one doc_id/position/doc_shard space (ASCII contract, Index
    docstring), so the shard-intersection + envelope metadata pass runs
    over the UNION of both twins' per-(shard, slot) doc ranges — a shard
    is kept only if every slot (whichever twin serves it) reaches it.
    Returns (decoded_folded, decoded_cs) logical posting frames."""
    spark = index.postings.sparkSession
    f_terms = [t for g, c in zip(groups, cs_flags) if not c for t in g]
    c_terms = [t for g, c in zip(groups, cs_flags) if c for t in g]
    bf, est_f = _base_blocks(spark, index.postings, index.dictionary, f_terms) \
        if f_terms else (None, 0)
    bc, est_c = _base_blocks(spark, index.postings_cs, index.dictionary_cs, c_terms) \
        if c_terms else (None, 0)
    # a slot whose whole expansion is absent from its dictionary makes the
    # AND pattern unsatisfiable
    if (f_terms and bf is None) or (c_terms and bc is None):
        return _empty(spark), _empty(spark)
    n_groups = len(groups)
    est_known = est_f is not None and est_c is not None
    prune_pays = (not est_known) or (est_f + est_c) >= prune_min_postings
    if n_groups >= 2 and prune_pays:
        pers = []
        for blocks, side_cs in ((bf, False), (bc, True)):
            if blocks is None:
                continue
            pairs = sorted({
                (t, gi) for gi, (g, c) in enumerate(zip(groups, cs_flags))
                if c == side_cs for t in g
            })
            tg = spark.createDataFrame(pairs, "term string, grp int")
            pers.append(
                blocks.select("term", "doc_shard", "first_doc", "max_doc")
                .join(F.broadcast(tg), "term")
                .groupBy("doc_shard", "grp")
                .agg(F.min("first_doc").alias("_lo"), F.max("max_doc").alias("_hi"))
            )
        keep = _envelope_keep(reduce(DataFrame.unionByName, pers), n_groups)
        bf = _apply_keep(bf, keep) if bf is not None else None
        bc = _apply_keep(bc, keep) if bc is not None else None
    return (
        _live(_decode_blocks(bf, spark), index) if bf is not None else _empty(spark),
        _live(_decode_blocks(bc, spark), index) if bc is not None else _empty(spark),
    )


def _pred_decode_two(index: Index, slots: list[dict]) -> tuple[DataFrame, DataFrame]:
    """Predicate-direct twin of _grouped_decode_two (wide expansions: no
    driver collect, no broadcast term lists — see decoded_postings_pred).
    Slot predicates run straight on each twin's block scan; cross-twin
    doc-range pruning unions the per-(shard, slot) metadata exactly like
    the enumerate path."""
    spark = index.postings.sparkSession
    sides = {False: [], True: []}  # cs -> [(slot_idx, predicate)]
    for i, s in enumerate(slots):
        sides[bool(s.get("case"))].append((i, _slot_pred(s)))
    if sides[True]:
        _require_cs(index)
    scans = {}
    for side_cs, plist in sides.items():
        if not plist:
            continue
        P = index.postings_cs if side_cs else index.postings
        scans[side_cs] = (P.filter(reduce(lambda a, b: a | b, [p for _, p in plist])), plist)
    if len(slots) >= 2:
        pers = []
        for blocks, plist in scans.values():
            arr = F.array_compact(F.array(
                *[F.when(p, F.lit(i)) for i, p in plist]
            ))
            pers.append(
                blocks.select("doc_shard", "first_doc", "max_doc", arr.alias("_g"))
                .select("doc_shard", "first_doc", "max_doc", F.explode("_g").alias("grp"))
                .groupBy("doc_shard", "grp")
                .agg(F.min("first_doc").alias("_lo"), F.max("max_doc").alias("_hi"))
            )
        keep = _envelope_keep(reduce(DataFrame.unionByName, pers), len(slots))
        scans = {cs: (_apply_keep(b, keep), pl) for cs, (b, pl) in scans.items()}
    return (
        _live(_decode_blocks(scans[False][0], spark), index) if False in scans else _empty(spark),
        _live(_decode_blocks(scans[True][0], spark), index) if True in scans else _empty(spark),
    )


def _packed_slot_postings(
    index: Index, slots: list[dict], max_expansion: int,
) -> tuple[DataFrame, DataFrame | None, DataFrame | None, DataFrame | None]:
    """Decoded logical postings for a slot pattern, choosing between the
    enumerate path (collect expanded terms, term-level pushdown + exact
    per-slot groups) and the predicate-direct path (huge wildcard/stem
    expansions: no collect, no broadcast — VERDICT r02-era hardening).
    Case-sensitive slots route through the case-preserving twin index
    (VERDICT r03 #1) on either path. Returns (postings, dictionary,
    postings_cs, dictionary_cs) for engine.slot_search; dictionaries are
    None on the predicate path so the engine's slot predicates also run
    direct (the decoded rows are already pruned to candidate terms)."""
    cs_flags = [bool(s.get("case")) for s in slots]
    groups = _expand_slot_term_groups(index, slots, max_expansion)
    if groups is None:
        if any(cs_flags):
            pf, pc = _pred_decode_two(index, slots)
            return pf, None, pc, None
        return decoded_postings_pred(index, [_slot_pred(s) for s in slots]), None, None, None
    if any(cs_flags):
        pf, pc = _grouped_decode_two(index, groups, cs_flags)
        return pf, index.dictionary, pc, index.dictionary_cs
    return decoded_postings(index, _flat(groups), groups), index.dictionary, None, None


def _pin_decoded(decoded, decoded_cs, slots, scope):
    """engine.slot_search scans its postings frame once PER SLOT (one
    union branch each); on the packed path that frame is the Arrow
    varbyte decode, so without a persist the decode kernel re-runs
    n_slots times (measured 2x the whole-query latency at 2 slots,
    sf0.1). Persist when >= 2 slots share it. Cache lifetime: backs the
    returned lazy plan — caller-owned by default (clearCache between
    bursts), or pass scope=CacheScope (fastmorph_spark.cache)."""
    if len(slots) < 2:
        return decoded, decoded_cs
    from fastmorph_spark.cache import pin

    decoded = pin(decoded, scope)
    if decoded_cs is not None:
        decoded_cs = pin(decoded_cs, scope)
    return decoded, decoded_cs


def packed_slot_search(index: Index, slots: list[dict],
                       dists: list[tuple[int, int]],
                       max_expansion: int = MAX_SLOT_EXPANSION,
                       scope=None) -> DataFrame:
    """engine.slot_search semantics over the PACKED index: one pruned
    block scan + decode for all slots (per twin when case flags are
    present), then the unchanged HOF predicate chain. Result-identical to
    the corpus-built path (shared oracles)."""
    decoded, dictionary, decoded_cs, dictionary_cs = \
        _packed_slot_postings(index, slots, max_expansion)
    decoded, decoded_cs = _pin_decoded(decoded, decoded_cs, slots, scope)
    return engine.slot_search(decoded, dictionary, slots, dists,
                              postings_cs=decoded_cs, dictionary_cs=dictionary_cs)


def packed_phrase_search(index: Index, phrase: str) -> DataFrame:
    terms = tokenize_py(phrase)
    decoded = decoded_postings(index, terms, [[t] for t in terms])
    return engine.phrase_search(decoded, phrase)


def packed_proximity_search(index: Index, t1: str, t2: str,
                            dist_from: int, dist_to: int) -> DataFrame:
    t1, t2 = t1.lower(), t2.lower()
    decoded = decoded_postings(index, [t1, t2], [[t1], [t2]])
    return engine.proximity_search(decoded, t1, t2, dist_from, dist_to)


def packed_and_search(index: Index, query_text: str) -> DataFrame:
    terms = tokenize_py(query_text)
    decoded = decoded_postings(index, terms, [[t] for t in terms])
    return engine.and_search(decoded, query_text)


def packed_or_search(index: Index, query_text: str) -> DataFrame:
    # OR semantics: no AND structure, so no doc-range pruning applies
    decoded = decoded_postings(index, tokenize_py(query_text))
    return engine.or_search(decoded, query_text)


def packed_search_request(
    documents: DataFrame,
    index: Index,
    slots: list[dict],
    dists: list[tuple[int, int]],
    skip: int = 0,
    until: int = 20,
    width: int = 2,
    max_expansion: int = MAX_SLOT_EXPANSION,
    scope=None,
    assembly: str = "snippets",
) -> DataFrame:
    """The FULL fastmorph request lifecycle (engine.search_request, O7)
    over the PACKED index: the slot pattern's postings are reproduced from
    the index (pruned block scan + decode — the corpus is touched only by
    the <= `until`-doc snippet join), then the unchanged request pipeline:
    pagination in corpus order, per-occurrence snippets/highlights,
    running + corpus-wide totals. Subcorpus filtering = pass a per-lang
    index (build_lang_indexes / read_lang_indexes) and the matching
    filtered `documents`. Result-identical to the corpus-built
    search_request (shared oracle: driver query `slot_request_packed`)."""
    m = packed_request_matches(index, slots, dists,
                               max_expansion=max_expansion, scope=scope)
    return engine.request_page(documents, m, len(slots),
                               skip=skip, until=until, width=width,
                               assembly=assembly)


def packed_request_matches(index: Index, slots: list[dict],
                           dists: list[tuple[int, int]],
                           max_expansion: int = MAX_SLOT_EXPANSION,
                           scope=None) -> DataFrame:
    """The request's persisted match set off the PACKED index (pruned
    block scan + decode + slot predicates). Pagination continuation
    (SURVEY §3.1 entry point 3) holds this frame across skip/until
    windows — search/protocol.py keys it per request shape — so page N+1
    re-pages cached matches instead of re-decoding the index."""
    decoded, dictionary, decoded_cs, dictionary_cs = \
        _packed_slot_postings(index, slots, max_expansion)
    decoded, decoded_cs = _pin_decoded(decoded, decoded_cs, slots, scope)
    return engine.request_matches(decoded, dictionary, slots, dists,
                                  postings_cs=decoded_cs,
                                  dictionary_cs=dictionary_cs, scope=scope)
