"""Unified query-string language — the "one search box" front door.

Every production code-search engine exposes a single textual query
syntax that composes filters with ranked full-text atoms (zoekt's
query language, Sourcegraph's search syntax, GitHub code search
[PK-high via the public zoekt query docs]). This module is that front
door for this engine: one string parses into metadata filters plus
positive / phrase / negated text atoms, and compiles to a composition
of the operators that already exist — Catalyst metadata pushdown,
``bm25.bm25_scores`` for ranking, ``engine.and_search`` /
``engine.phrase_search`` for containment constraints.

Grammar (whitespace-separated atoms; pinned, mirrored by the DuckDB
oracle in oracles.query_lang_sql):

- ``repo:VALUE`` / ``path:VALUE`` — metadata filters on the contract
  corpus columns; ``*`` (any run) and ``?`` (one char) wildcards per
  the engine's wildcard-slot convention (engine.wildcard_pattern_to_
  like); byte-exact case. At most one of each; negation not allowed.
- ``lang:VALUE`` — exact subcorpus filter (the bm25 form's ``lang=``).
- ``"quoted text"`` — phrase atom: the tokenized sequence must appear
  at adjacent positions (engine.phrase_search semantics).
- ``-atom`` / ``-"quoted text"`` — negation: docs containing the
  tokenized sequence (adjacent) are excluded. A single-token sequence
  degenerates to plain containment exclusion.
- bare atom — required term(s): every subtoken the active tokenizer
  yields must be present (AND, no adjacency — quote the atom to also
  require adjacency). Under ``tokenizer="code"`` a bare ``parseJSON``
  therefore requires both ``parse`` and ``json``.

Ranking (pinned): BM25 over the distinct union of positive-atom and
phrase subtokens, stats (df/N/avgdl) scoped to the metadata-FILTERED
corpus — the same scoped-stats semantic as bm25_topk_expression's
``lang=`` (a ``repo:`` query is "search within this repo"). Hard
constraints (required terms, phrases, negations) apply BEFORE the
top-k cut, so a constrained-out doc never steals a result slot.
Ties break (score DESC, doc_id ASC); scores round to SCORE_DECIMALS.

Plan shape at scale: metadata filters are plain Catalyst predicates on
the corpus scan (partition-prunable on a repo/lang-partitioned lake
layout); scoring reads the tiny per-query-term tf slice with broadcast
df/stats (see bm25_scores); constraint sets are per-doc single rows
semi-/anti-joined before a TakeOrderedAndProject top-k — no global
sort, no collect. Position postings are built only when a phrase or
negation atom is present.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.search import engine
from fastmorph_spark.search.bm25 import bm25_scores
from fastmorph_spark.tokenize import tokenize_py, tokenize_py_code, tokenize_py_uni

# quoted (optionally negated) atom, or any non-space run
_ATOM_RE = re.compile(r'-?"[^"]*"|\S+')
_FILTER_FIELDS = ("repo", "path", "lang")


def _tok_py(tokenizer: str):
    return {"uni": tokenize_py_uni, "code": tokenize_py_code}.get(
        tokenizer, tokenize_py)


def parse_query(q: str, tokenizer: str = "ascii") -> dict:
    """Parse a query string into the pinned spec dict:
    ``{"terms": [tok...], "phrases": [[tok...]...], "excludes":
    [[tok...]...], "repo": str|None, "path": str|None, "lang":
    str|None}``. Raises ValueError (client-addressable message) on
    malformed input — the serving layer maps it to a protocol error."""
    tok = _tok_py(tokenizer)
    spec: dict = {"terms": [], "phrases": [], "excludes": [],
                  "repo": None, "path": None, "lang": None}
    if not isinstance(q, str) or not q.strip():
        raise ValueError("query must be a non-empty string")
    for atom in _ATOM_RE.findall(q):
        neg = atom.startswith("-") and len(atom) > 1
        body = atom[1:] if neg else atom
        if body.startswith('"'):
            if not (len(body) >= 2 and body.endswith('"')):
                raise ValueError(f"unterminated quote in {atom!r}")
            toks = tok(body[1:-1])
            if not toks:
                raise ValueError(f"phrase {atom!r} has no tokens")
            spec["excludes" if neg else "phrases"].append(toks)
            continue
        head, sep, value = body.partition(":")
        if sep and head in _FILTER_FIELDS:
            if neg:
                raise ValueError(
                    f"negation applies to terms and phrases, not {head}:")
            if not value:
                raise ValueError(f"{head}: needs a value")
            if spec[head] is not None:
                raise ValueError(f"duplicate {head}: filter")
            spec[head] = value
            continue
        if sep and re.fullmatch(r"[A-Za-z]+", head):
            raise ValueError(
                f"unknown filter {head!r} (known: {', '.join(_FILTER_FIELDS)};"
                ' quote the atom to search for a literal colon)')
        toks = tok(body)
        if not toks:
            raise ValueError(f"atom {atom!r} has no tokens")
        if neg:
            spec["excludes"].append(toks)
        else:
            spec["terms"].extend(toks)
    if not spec["terms"] and not spec["phrases"]:
        raise ValueError("query needs at least one positive term or phrase")
    return spec


def _meta_filter(documents: DataFrame, spec: dict) -> DataFrame:
    cols = set(documents.columns)
    out = documents
    for field in _FILTER_FIELDS:
        value = spec[field]
        if value is None:
            continue
        if field not in cols:
            raise ValueError(
                f"query uses {field}: but the corpus has no {field} column")
        if field != "lang" and ("*" in value or "?" in value):
            out = out.filter(
                F.col(field).like(engine.wildcard_pattern_to_like(value)))
        else:
            out = out.filter(F.col(field) == value)
    return out


def query_search(documents: DataFrame, q: str, k: int = 10,
                 tokenizer: str = "ascii", scope=None) -> DataFrame:
    """Execute a query-language string over a corpus frame carrying
    ``doc_id, text`` plus optional ``repo/path/lang`` metadata columns.

    Returns (rank, doc_id[, repo, path], score) — repo/path echo into
    the result when the corpus carries them (the code-search result
    unit is a file, not an opaque id); rank is BIGINT, score rounded.
    """
    spec = parse_query(q, tokenizer=tokenizer)
    filtered = _meta_filter(documents, spec)
    docs = filtered.select("doc_id", "text")

    score_terms = sorted(set(spec["terms"])
                         | {t for p in spec["phrases"] for t in p})
    scored = bm25_scores(docs, " ".join(score_terms),
                         tokenizer=tokenizer, scope=scope)

    required = sorted(set(spec["terms"]))
    sequences = spec["phrases"] + spec["excludes"]
    # a single bare term with no phrase atoms needs no containment join:
    # every OR-scored doc already matched the lone score term
    need_and = bool(required) and (len(required) > 1 or bool(spec["phrases"]))
    if need_and or sequences:
        # the constraint joins re-tokenize their query strings with the
        # ASCII tokenizer — folded ascii/code tokens round-trip unchanged
        # ([a-z0-9_]+), other twins (uni) must refuse rather than silently
        # drop tokens
        for toks in ([required] if need_and else []) + sequences:
            if tokenize_py(" ".join(toks)) != [t for t in toks]:
                raise ValueError(
                    f"tokenizer {tokenizer!r} tokens {toks!r} are not "
                    "expressible in the constraint path (ascii/code only)")
        # one position-bearing posting build serves every constraint;
        # tf-only suffices when only bare-term AND containment is needed
        from fastmorph_spark.index.build import build_postings

        postings = build_postings(docs, tokenizer=tokenizer,
                                  with_positions=bool(sequences))
        if need_and:
            scored = scored.join(
                engine.and_search(postings, " ".join(required)),
                "doc_id", "semi")
        for p in spec["phrases"]:
            scored = scored.join(
                engine.phrase_search(postings, " ".join(p)), "doc_id", "semi")
        for e in spec["excludes"]:
            scored = scored.join(
                engine.phrase_search(postings, " ".join(e)),
                "doc_id", "left_anti")

    # qlang pins its tie discipline on the ROUNDED score (then doc_id):
    # the output score is rounded anyway, and ranking over the rounded
    # value is summation-order-independent — near-tie rank flips between
    # engines (strict-fold Spark sum vs arbitrary-order SQL sum) cannot
    # surface, unlike the raw-score ranking bm25_topk pins (whose corpus
    # separates scores well beyond SCORE_DECIMALS)
    scored = scored.withColumn("score", F.round("score", SCORE_DECIMALS))
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    out = topk.select(rank.cast("long").alias("rank"), "doc_id", "score")
    meta = [c for c in ("repo", "path") if c in documents.columns]
    if meta:
        # k-row result broadcast against the filtered corpus metadata
        out = (filtered.select("doc_id", *meta)
               .join(F.broadcast(out), "doc_id")
               .select("rank", "doc_id", *meta, "score")
               .orderBy("rank"))
    return out
