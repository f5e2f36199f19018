"""Substring + regex search over the trigram index (round 5 code-search
wave) — the grep/ripgrep/zoekt query surface token search cannot express.

Query algebra [LIT: R. Cox, "Regular Expression Matching with a Trigram
Index"]: a document containing substring ``q`` contains every trigram of
``q`` (folded: if raw text contains q, folded text contains lower(q)).
So candidates = AND over (a rarest subset of) q's trigrams against the
folded index, then an EXACT verify on the candidates' raw text restores
both precision and case sensitivity. Choosing only the R rarest trigrams
(by the exact df dictionary) is the zoekt move: it bounds posting IO for
long queries without losing recall — any subset intersection is a
superset of the true match set, and verify is exact.

For regexes, ``required_factors`` extracts one mandatory literal factor
per top-level alternation branch from the pinned cross-engine subset
(search/regex.py): any match of the pattern must CONTAIN one branch's
factor as a substring, so candidates = OR over branches of the factor's
trigram AND. Conservative by construction — group bodies and quantified
atoms never contribute to a factor (a `(...)`/`[...]`/`x*`/`x?` may
repeat or vanish, so the characters around it need not be contiguous;
`x+`/`x{m>=1,..}` keeps x itself but breaks contiguity after it).
Patterns with some branch's longest factor under 3 chars are honestly
unindexable (Cox's answer too) and fall back to the full scan, still
exact.

Scale shape: the query's trigrams prune the at-rest index to their
tg_bucket partitions with the trigram equality pushed into parquet
(PartitionFilters + PushedFilters — audited in BENCH/plans_r05.md); a
small candidate set becomes an In(doc_id) filter pushed into the corpus
scan so the VERIFY read is row-group-pruned too (large sets fall back
to a broadcast semi-join); verify and line assembly are pure Catalyst
(instr / rlike inside codegen). An absent query trigram short-circuits
to EMPTY without touching postings at all (df lookup is a |q|-row
dictionary filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastmorph_spark.index.trigram import TrigramIndex, trigrams_py
from fastmorph_spark.search.grep import split_lines
from fastmorph_spark.search.regex import validate_regex

# rarest-first probe width: intersecting more lists shrinks candidates
# but reads more postings; zoekt uses a small constant too. Verify keeps
# this a pure IO/precision trade, never a correctness one.
MAX_PROBE_TRIGRAMS = 6

# candidate sets at or under this size are collected (bounded
# limit(N+1)) and pushed as an In(doc_id) filter into the corpus scan —
# parquet row-group min/max stats on the sorted doc_id then prune the
# VERIFY read too (a broadcast semi-join filters rows but still reads
# every corpus byte; at 100 TB the verify scan, not the posting scan, is
# the dominant cost for selective queries). Larger candidate sets fall
# back to the semi-join. Same bounded-collect + In() pushdown discipline
# as the request page path (engine.py).
MAX_ID_PUSHDOWN = 10_000


def _scope_corpus(corpus: DataFrame, cands: DataFrame | None,
                  id_col: str) -> DataFrame:
    if cands is None:
        return corpus
    ids = [r["doc_id"] for r in cands.limit(MAX_ID_PUSHDOWN + 1).collect()]
    if len(ids) <= MAX_ID_PUSHDOWN:
        return corpus.filter(F.col(id_col).isin(ids))
    return corpus.join(
        F.broadcast(cands.withColumnRenamed("doc_id", id_col)), id_col, "left_semi"
    )


def _candidate_doc_ids(idx: TrigramIndex, grams: list[str],
                       probe: int = MAX_PROBE_TRIGRAMS) -> DataFrame | None:
    """doc_ids containing ALL of the ``probe`` rarest grams, or None for
    'no trigram pruning possible' (empty grams), or an EMPTY frame when
    some gram is absent from the corpus (zero matches, proven by the
    dictionary alone). ONE |q|-row dictionary lookup yields dfs AND
    bucket list (the dictionary carries tg_bucket for exactly this)."""
    if not grams:
        return None
    rows = idx.dictionary.filter(F.col("trigram").isin(grams)).collect()
    dfs = {r["trigram"]: r["df"] for r in rows}
    bucket_of = {r["trigram"]: r["tg_bucket"] for r in rows}
    spark = idx.dictionary.sparkSession
    if len(dfs) < len(grams):
        # some trigram of q occurs nowhere -> no document can contain q
        return spark.range(0).select(F.col("id").alias("doc_id"))
    chosen = sorted(grams, key=lambda g: (dfs[g], g))[:probe]
    buckets = sorted({bucket_of[g] for g in chosen})
    pred = F.col("tg_bucket").isin(buckets) & F.col("trigram").isin(chosen)
    if idx.blobs is not None:
        # at-rest path: prune the parquet scan BELOW the Arrow decode
        # (PartitionFilters on tg_bucket, PushedFilters In(trigram))
        from fastmorph_spark.index.trigram import decode_blob_docs

        hits = decode_blob_docs(idx.blobs.filter(pred))
    else:
        hits = idx.postings.filter(pred)
    return (
        hits.groupBy("doc_id")
        .agg(F.count("*").alias("_ntg"))
        .filter(F.col("_ntg") == len(chosen))
        .select("doc_id")
    )


def substring_search(
    corpus: DataFrame,
    idx: TrigramIndex | None,
    q: str,
    case: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """doc_ids whose text contains ``q`` as a raw substring (``case=False``
    folds both sides). Queries under 3 chars get the exact full-scan path
    (no trigrams exist for them — documented fallback, same results), as
    does ``idx=None`` (a serving deployment without a trigram sidecar)."""
    if not q:
        raise ValueError("substring query must be non-empty")
    hay = F.col(text_col) if case else F.lower(F.col(text_col))
    needle = q if case else q.lower()
    verify = F.instr(hay, needle) > 0
    cands = None if idx is None else _candidate_doc_ids(idx, trigrams_py(q))
    scoped = _scope_corpus(corpus, cands, id_col)
    return scoped.filter(verify).select(F.col(id_col).cast("long").alias("doc_id")) \
        .orderBy("doc_id")


def substring_grep(
    corpus: DataFrame,
    idx: TrigramIndex | None,
    q: str,
    case: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """grep result unit for substring queries: (doc_id, line_no, line)
    for every line containing ``q``. Candidates prune DOCS first (the
    trigram index is doc-granular, as in zoekt), then the line explode
    runs only over verified docs."""
    docs = substring_search(corpus, idx, q, case=case,
                            text_col=text_col, id_col=id_col)
    hay_line = F.col("line") if case else F.lower(F.col("line"))
    needle = q if case else q.lower()
    scoped = _scope_corpus(corpus, docs, id_col)
    return (
        split_lines(scoped, text_col=text_col, id_col=id_col)
        .filter(F.instr(hay_line, needle) > 0)
        .orderBy(id_col, "line_no")
    )


# ---------------------------------------------------------------- regex

def _split_top_alternation(pat: str) -> list[str]:
    """Split on `|` at group/class depth 0. The pattern is pre-validated
    (balanced brackets), so the depth bookkeeping cannot underflow."""
    branches, depth, cur, in_class = [], 0, [], False
    for ch in pat:
        if in_class:
            cur.append(ch)
            if ch == "]":
                in_class = False
            continue
        if ch == "[":
            in_class = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "|" and depth == 0:
            branches.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    branches.append("".join(cur))
    return branches


def _is_plain_literal(ch: str) -> bool:
    return ch.isalnum() or ch == "_"


def _skip_group(pat: str, i: int) -> int:
    """index just past the `)` matching pat[i] == '(' (classes inside
    groups hide parens)."""
    depth, in_class = 0, False
    while i < len(pat):
        ch = pat[i]
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced group")  # unreachable on validated input


def _quant_after(pat: str, i: int) -> tuple[bool, bool, int]:
    """Inspect a quantifier starting at pat[i]: (quantified, min_zero,
    next_index). `{m,n}` parses m (the subset guarantees the shape)."""
    if i < len(pat) and pat[i] in "*+?":
        return True, pat[i] != "+", i + 1
    if i < len(pat) and pat[i] == "{":
        j = pat.index("}", i)
        m = pat[i + 1 : j].split(",")[0]
        return True, int(m) == 0, j + 1
    return False, False, i


def _literal_runs(branch: str) -> list[str]:
    """Maximal mandatory-contiguous literal runs of one branch. A
    quantified literal with min>=1 (x+ / x{2,5}) keeps x in the current
    run but BREAKS contiguity after it; min==0 (x* / x? / x{0,n}) drops
    x entirely. Groups, classes and `.` are opaque run breakers (their
    own quantifiers are consumed with them)."""
    runs, cur, i = [], [], 0

    def flush():
        if cur:
            runs.append("".join(cur))
            cur.clear()

    while i < len(branch):
        ch = branch[i]
        if _is_plain_literal(ch):
            quant, min_zero, nxt = _quant_after(branch, i + 1)
            if not quant:
                cur.append(ch)
            elif min_zero:
                flush()
            else:
                cur.append(ch)
                flush()
            i = nxt if quant else i + 1
            continue
        if ch == "(":
            i = _skip_group(branch, i)
        elif ch == "[":
            i = branch.index("]", i + 1) + 1
        elif ch == ".":
            i += 1
        else:  # a stray quantifier/brace after an opaque atom
            _, _, i2 = _quant_after(branch, i)
            i = i2 if i2 > i else i + 1
        flush()
        # consume the opaque atom's own quantifier, if any
        _, _, i = _quant_after(branch, i)
    flush()
    return runs


def required_factors(pat: str) -> list[str] | None:
    """One mandatory literal factor per top-level branch, or None when
    any branch cannot contribute a >=3-char factor (pattern unindexable;
    callers full-scan). Validates the pattern against the pinned
    cross-engine subset first — rejection is a loud error, not a scan."""
    branches = _split_top_alternation(validate_regex(pat))
    factors = []
    for b in branches:
        runs = [r for r in _literal_runs(b) if len(r) >= 3]
        if not runs:
            return None
        factors.append(max(runs, key=len))
    return factors


def regex_grep(
    corpus: DataFrame,
    idx: TrigramIndex | None,
    pat: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, line_no, line) for lines with an UNANCHORED match of
    ``pat`` (the ripgrep contract; Java `rlike` and DuckDB/RE2
    `regexp_matches` are both find-anywhere, and on the validated subset
    the dialects agree). Doc candidates come from the factor trigrams
    when the pattern is indexable; otherwise (or with ``idx=None``) the
    verify runs over the full corpus — identical results either way."""
    if idx is None:
        validate_regex(pat)  # still reject out-of-subset patterns loudly
        factors = None
    else:
        factors = required_factors(pat)
    if factors is not None:
        per_branch = [_candidate_doc_ids(idx, trigrams_py(f)) for f in factors]
        cands = per_branch[0]
        for extra in per_branch[1:]:
            cands = cands.unionByName(extra)
        scoped = _scope_corpus(corpus, cands.distinct(), id_col)
    else:
        scoped = corpus
    return (
        split_lines(scoped, text_col=text_col, id_col=id_col)
        .filter(F.col("line").rlike(pat))
        .orderBy(id_col, "line_no")
    )
