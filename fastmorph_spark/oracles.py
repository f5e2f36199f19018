"""DuckDB ANSI-SQL oracle builders (driver contract, __spark_entry__.py).

Each function renders a self-contained SQL string that DuckDB 1.0 can run
over the pre-registered fixture views (documents, lineitem, ...). The SQL
mirrors the engine's pinned semantics EXACTLY (constants, tokenizer,
tie-breaks — fastmorph_spark.constants); float-bearing outputs are rounded
to SCORE_DECIMALS in both engines so the driver's order-insensitive
value-hash is immune to summation-order noise.

DuckDB type discipline (schema must match Spark):
- count(*)/sum over BIGINT are cast ::BIGINT (DuckDB sum -> HUGEINT);
- row_number() is BIGINT in DuckDB, so Spark ranks are cast to long.
"""

from __future__ import annotations

from fastmorph_spark.constants import BM25_B, BM25_K1, SCORE_DECIMALS
from fastmorph_spark.tokenize import tokenize_py

# DuckDB fragment: text column -> list of tokens (identical to tokenize_py).
TOK = "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9_]+'), x -> x <> '')"


def _qterms_values(query_text: str, tokenize=tokenize_py) -> str:
    terms = sorted(set(tokenize(query_text)))
    if not terms:
        return "SELECT NULL::VARCHAR AS term WHERE false"
    inner = ", ".join("('" + t + "')" for t in terms)
    return f"SELECT * FROM (VALUES {inner}) AS qt(term)"


def _docs_cte(lang: str | None, text_expr: str = "text") -> str:
    where = f" WHERE lang = '{lang}'" if lang else ""
    return f"SELECT doc_id, {text_expr} AS text FROM documents{where}"


def _corpus_ctes(lang: str | None = None, tok_fragment: str = TOK,
                 text_expr: str = "text", docs_cte: str | None = None) -> str:
    """Shared CTE chain: docs -> tok -> tf -> dl -> gs (global stats).
    ``tok_fragment``/``text_expr`` let the Unicode twin swap in its
    tokenizer and a derived (e.g. synthetic-Cyrillic) text column;
    ``docs_cte`` replaces the docs source wholesale (must yield
    (doc_id, text) — the HEAD-resolved corpus uses this)."""
    tok = tok_fragment.format(col="text")
    return f"""
docs AS ({docs_cte if docs_cte is not None else _docs_cte(lang, text_expr)}),
tok AS (
  SELECT doc_id, unnest({tok}) AS term FROM docs
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term
),
dl AS (
  SELECT d.doc_id, coalesce(sum(tf.tf), 0)::BIGINT AS dl
  FROM docs d LEFT JOIN tf ON d.doc_id = tf.doc_id GROUP BY d.doc_id
),
gs AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl
)"""


def bm25_topk_sql(query_text: str, k: int = 10, lang: str | None = None,
                  tok_fragment: str = TOK, text_expr: str = "text",
                  tokenize=tokenize_py, docs_cte: str | None = None) -> str:
    """Mirror of search.bm25.bm25_topk_expression(round_score=True).
    The uni twin passes its tokenizer fragment + tokenize_py_uni (query
    folding) + the synthetic-Cyrillic text expression; the HEAD-resolved
    twin passes ``docs_cte`` (any (doc_id, text) source — doc_id may be
    a string key such as a file path)."""
    k1, b = BM25_K1, BM25_B
    return f"""
WITH {_corpus_ctes(lang, tok_fragment, text_expr, docs_cte)},
q AS ({_qterms_values(query_text, tokenize)}),
m AS (SELECT tf.* FROM tf JOIN q USING (term)),
dft AS (SELECT term, count(*)::BIGINT AS df FROM m GROUP BY term),
s AS (
  SELECT m.doc_id,
         sum(
           ln(1.0 + (gs.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * (m.tf * ({k1} + 1.0)
              / (m.tf + {k1} * (1.0 - {b} + {b} * dl.dl / gs.avgdl)))
         )::DOUBLE AS score
  FROM m
  JOIN dft USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN gs
  GROUP BY m.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       round(score, {SCORE_DECIMALS}) AS score
FROM s
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_topk_meta_sql(query_text: str, k: int = 10) -> str:
    """bm25_topk joined back to per-doc metadata (J5 result assembly)."""
    base = bm25_topk_sql(query_text, k).strip()
    return f"""
WITH topk AS ({base}),
reg AS (
  SELECT doc_id, lang, sha256(text) AS content_sha256,
         len({TOK.format(col="text")})::BIGINT AS doc_len
  FROM documents
)
SELECT t.rank, t.doc_id, t.score, r.lang, r.content_sha256, r.doc_len
FROM topk t JOIN reg r USING (doc_id)
"""


def more_like_this_sql(source_doc_id: int, m: int = 10, k: int = 10) -> str:
    """Mirror of search.mlt.more_like_this (round_score=True): top-m
    TF-IDF query terms of the source doc (doc_keywords' pinned
    tf*ln((N+1)/(df+1)) form, (tfidf DESC, term ASC) cut), then the
    canonical BM25 disjunction over the full corpus with the source doc
    excluded."""
    k1, b = BM25_K1, BM25_B
    return f"""
WITH {_corpus_ctes()},
src AS (SELECT term, tf FROM tf WHERE doc_id = {source_doc_id}),
cand AS (SELECT tf.* FROM tf JOIN (SELECT term FROM src) st USING (term)),
dft AS (SELECT term, count(*)::BIGINT AS df FROM cand GROUP BY term),
qt AS (
  SELECT s.term
  FROM src s JOIN dft USING (term) CROSS JOIN gs
  ORDER BY s.tf * ln((gs.n_docs + 1.0) / (dft.df + 1.0)) DESC, s.term ASC
  LIMIT {m}
),
mm AS (
  SELECT c.* FROM cand c JOIN qt USING (term)
  WHERE c.doc_id <> {source_doc_id}
),
s AS (
  SELECT mm.doc_id,
         sum(
           ln(1.0 + (gs.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * (mm.tf * ({k1} + 1.0)
              / (mm.tf + {k1} * (1.0 - {b} + {b} * dl.dl / gs.avgdl)))
         )::DOUBLE AS score
  FROM mm
  JOIN dft USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN gs
  GROUP BY mm.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       round(score, {SCORE_DECIMALS}) AS score
FROM s
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def doc_stats_sql(lang: str | None = None) -> str:
    return f"""
WITH {_corpus_ctes(lang)}
SELECT n_docs, round(avgdl, {SCORE_DECIMALS}) AS avgdl FROM gs
"""


def dictionary_sql(n: int = 100, lang: str | None = None) -> str:
    """Top-n dictionary rows by (df DESC, term ASC): term, df, cf."""
    return f"""
WITH {_corpus_ctes(lang)}
SELECT term,
       count(*)::BIGINT AS df,
       sum(tf)::BIGINT AS cf
FROM tf
GROUP BY term
ORDER BY df DESC, term ASC
LIMIT {n}
"""


def doc_lengths_sql() -> str:
    """Per-doc length + sha256 invariant (P3, BASELINE.json input_hint)."""
    return f"""
WITH {_corpus_ctes(None)}
SELECT d.doc_id, dl.dl AS doc_len, sha256(d.text) AS content_sha256
FROM docs d JOIN dl ON d.doc_id = dl.doc_id
ORDER BY d.doc_id
"""


def _positions_cte(lang: str | None = None) -> str:
    """docs -> per-token (doc_id, term, pos) with 0-based positions.
    Parallel unnests zip in DuckDB (verified)."""
    tok = TOK.format(col="text")
    return f"""
docs AS ({_docs_cte(lang)}),
tokarr AS (SELECT doc_id, {tok} AS toks FROM docs),
pos AS (
  SELECT doc_id, unnest(toks) AS term, unnest(range(len(toks)))::INT AS pos
  FROM tokarr
)"""


def and_search_sql(query_text: str) -> str:
    terms = sorted(set(tokenize_py(query_text)))
    if not terms:
        return "SELECT NULL::BIGINT AS doc_id WHERE false"
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_positions_cte()}
SELECT doc_id FROM pos WHERE term IN ({inlist})
GROUP BY doc_id HAVING count(DISTINCT term) = {len(terms)}
ORDER BY doc_id
"""


def phrase_search_sql(phrase: str) -> str:
    terms = tokenize_py(phrase)
    if not terms:
        return "SELECT NULL::BIGINT AS doc_id WHERE false"
    joins = "\n".join(
        f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.term = '{t}' AND p{i}.pos = p0.pos + {i}"
        for i, t in enumerate(terms[1:], 1)
    )
    return f"""
WITH {_positions_cte()}
SELECT DISTINCT p0.doc_id AS doc_id FROM pos p0
{joins}
WHERE p0.term = '{terms[0]}'
ORDER BY p0.doc_id
"""


def proximity_search_sql(t1: str, t2: str, dist_from: int, dist_to: int) -> str:
    return f"""
WITH {_positions_cte()}
SELECT DISTINCT a.doc_id AS doc_id FROM pos a
JOIN pos b ON b.doc_id = a.doc_id AND b.term = '{t2}'
          AND b.pos - a.pos BETWEEN {dist_from} AND {dist_to}
WHERE a.term = '{t1}'
ORDER BY a.doc_id
"""


TOK_CS = "list_filter(regexp_split_to_array({col}, '[^A-Za-z0-9_]+'), x -> x <> '')"


def _slot_cond(s: dict) -> str:
    """DuckDB predicate for ONE slot spec over the pos CTE's (term,
    term_cs) columns — the SQL mirror of engine.slot_postings, shared by
    slot_search_sql and the concordance context-filter oracle."""
    cs = bool(s.get("case"))
    col = "term_cs" if cs else "term"
    if "term" in s:
        t = s["term"] if cs else s["term"].lower()
        return f"{col} = '{t}'"
    if "stem" in s:
        from fastmorph_spark.stem import duckdb_stem, stem_py

        assert not cs, "stem slots are case-folded by definition"
        return f"{duckdb_stem(col)} = '{stem_py(s['stem'].lower())}'"
    if "tag" in s:
        from fastmorph_spark.tags import duckdb_tag

        assert not cs, "tag slots are case-folded by definition"
        return f"{duckdb_tag(col)} = '{s['tag']}'"
    if "fuzzy" in s:
        assert not cs, "fuzzy slots are case-folded by definition"
        w = tokenize_py(s["fuzzy"])[0]
        d = int(s.get("dist", 1))
        return (f"(abs(length({col}) - {len(w)}) <= {d} "
                f"AND levenshtein({col}, '{w}') <= {d})")
    if "regex" in s:
        from fastmorph_spark.search.regex import duckdb_regex_cond

        return duckdb_regex_cond(col, s["regex"], case=cs)
    pat = s["pattern"] if cs else s["pattern"].lower()
    like = pat.replace("%", r"\%").replace("_", r"\_").replace("*", "%").replace("?", "_")
    return f"{col} LIKE '{like}' ESCAPE '\\'"


def slot_search_sql(slots: list[dict], dists: list[tuple[int, int]], text_expr: str = "text",
                    lang: str | None = None, tok_fragment: str | None = None,
                    tok_cs_fragment: str | None = None,
                    pos_cte: str | None = None) -> str:
    """Mirror of engine.slot_search: same slot specs, same chained distance
    semantics, same output columns (doc_id, n_matches, match_starts). The
    case-sensitive twin tokenization shares positions with the folded one
    (identical boundaries under ASCII), so one parallel unnest zips both."""
    n = len(slots)
    assert n >= 1 and len(dists) == n - 1
    cond = _slot_cond

    slot_ctes = ",\n".join(
        f"s{i} AS (SELECT doc_id, list_sort(list(DISTINCT pos)) AS ps FROM pos "
        f"WHERE {cond(s)} GROUP BY doc_id)"
        for i, s in enumerate(slots)
    )
    joins = " ".join(f"JOIN s{i} USING (doc_id)" for i in range(1, n))
    proj = ", ".join(f"s{i}.ps AS p{i}" for i in range(n))

    # innermost-out chained predicate: exists q_i in p_i with the distance bound
    expr = "true"
    for i in range(n - 1, 0, -1):
        lo, hi = dists[i - 1]
        prev = f"v{i - 1}"
        expr = (
            f"len(list_filter(p{i}, v{i} -> v{i} >= {prev} + {lo} "
            f"AND v{i} <= {prev} + {hi} AND {expr})) > 0"
        )
    where = f" WHERE lang = '{lang}'" if lang else ""
    # uni twin: both unnest columns use the SAME uni fragment (no case
    # slots exist there), keeping the parallel unnest length-aligned
    tok = (tok_fragment or TOK).format(col="text")
    tok_cs = (tok_cs_fragment or (tok_fragment or TOK_CS)).format(col="text")
    # a caller-supplied pos CTE chain (must end defining pos(doc_id,
    # term, term_cs, pos)) swaps in an alternative position space —
    # the sentence-scoped composite-key twin (oracles_corpus)
    intro = pos_cte if pos_cte is not None else f"""docs AS (SELECT doc_id, {text_expr} AS text FROM documents{where}),
tokarr AS (SELECT doc_id, {tok} AS toks, {tok_cs} AS toks_cs FROM docs),
pos AS (
  SELECT doc_id, unnest(toks) AS term, unnest(toks_cs) AS term_cs,
         unnest(range(len(toks)))::INT AS pos
  FROM tokarr
)"""
    return f"""
WITH {intro},
{slot_ctes},
cand AS (SELECT s0.doc_id, {proj} FROM s0 {joins}),
m AS (
  SELECT doc_id, list_sort(list_filter(p0, v0 -> {expr})) AS starts FROM cand
)
SELECT doc_id, len(starts)::BIGINT AS n_matches, array_to_string(starts, ',') AS match_starts
FROM m WHERE len(starts) > 0 ORDER BY doc_id
"""


def or_search_sql(query_text: str) -> str:
    """Mirror of engine.or_search."""
    terms = sorted(set(tokenize_py(query_text)))
    if not terms:
        return "SELECT NULL::BIGINT AS doc_id, NULL::BIGINT AS n_terms, NULL::BIGINT AS total_tf WHERE false"
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_corpus_ctes(None)}
SELECT doc_id, count(DISTINCT term)::BIGINT AS n_terms, sum(tf)::BIGINT AS total_tf
FROM tf WHERE term IN ({inlist})
GROUP BY doc_id ORDER BY n_terms DESC, total_tf DESC, doc_id ASC
"""


def stem_search_sql(word: str) -> str:
    """Mirror of engine.stem_search: dictionary-first stem expansion."""
    from fastmorph_spark.stem import duckdb_stem, stem_py

    target = stem_py(word.lower())
    return f"""
WITH {_corpus_ctes(None)}
SELECT doc_id, sum(tf)::BIGINT AS total_tf
FROM tf WHERE {duckdb_stem("term")} = '{target}'
GROUP BY doc_id ORDER BY doc_id
"""


def snippets_sql(slots: list[dict], dists: list[tuple[int, int]],
                 match_len: int, width: int = 2) -> str:
    """Mirror of engine.snippets over engine.slot_search(slots, dists):
    per-occurrence token-window snippets with highlight offsets and a
    running total in (doc_id, pos) order."""
    inner = slot_search_sql(slots, dists).strip().rstrip()
    return f"""
WITH m AS ({inner}),
occ AS (
  SELECT doc_id, unnest(string_split(match_starts, ','))::INT AS pos FROM m
),
tk AS (SELECT doc_id, {TOK.format(col="text")} AS toks FROM documents),
j AS (
  SELECT occ.doc_id, occ.pos,
         greatest(occ.pos + 1 - {width}, 1) AS s_el,
         least(occ.pos + {match_len} + {width}, len(tk.toks)) AS e_el,
         tk.toks AS toks
  FROM occ JOIN tk ON occ.doc_id = tk.doc_id
)
SELECT doc_id, pos::BIGINT AS pos,
       (pos + 1 - s_el)::BIGINT AS hl_offset,
       array_to_string(toks[s_el:e_el], ' ') AS snippet,
       row_number() OVER (ORDER BY doc_id, pos)::BIGINT AS running_total
FROM j ORDER BY doc_id, pos
"""


def kwic_sql(slots: list[dict], dists: list[tuple[int, int]],
             match_len: int, width: int = 5) -> str:
    """Mirror of engine.kwic over engine.slot_search(slots, dists):
    per-occurrence concordance lines with left/keyword/right columns.
    DuckDB list slices are 1-based and end-inclusive; toks[a:b] with
    b < a is empty, matching Spark's slice(_, _, 0) == []."""
    inner = slot_search_sql(slots, dists).strip().rstrip()
    return f"""
WITH m AS ({inner}),
occ AS (
  SELECT doc_id, unnest(string_split(match_starts, ','))::INT AS pos FROM m
),
tk AS (SELECT doc_id, {TOK.format(col="text")} AS toks FROM documents),
j AS (SELECT occ.doc_id, occ.pos, tk.toks FROM occ JOIN tk ON occ.doc_id = tk.doc_id)
SELECT doc_id, pos::BIGINT AS pos,
       coalesce(array_to_string(toks[greatest(pos + 1 - {width}, 1):pos], ' '), '')
         AS left_ctx,
       array_to_string(toks[pos + 1:pos + {match_len}], ' ') AS keyword,
       coalesce(array_to_string(
         toks[pos + 1 + {match_len}:least(pos + {match_len} + {width}, len(toks))], ' '
       ), '') AS right_ctx
FROM j ORDER BY doc_id, pos
"""


def search_request_sql(slots: list[dict], dists: list[tuple[int, int]],
                       skip: int, until: int, width: int = 2,
                       lang: str | None = None) -> str:
    """Mirror of engine.search_request: slot matches -> doc_id-ordered
    pagination window -> per-occurrence snippets + running/page totals."""
    inner = slot_search_sql(slots, dists, lang=lang).strip()
    match_len = len(slots)
    where = f" WHERE lang = '{lang}'" if lang else ""
    return f"""
WITH m AS ({inner}),
tot AS (
  SELECT count(*)::BIGINT AS total_docs,
         coalesce(sum(n_matches), 0)::BIGINT AS total_matches FROM m
),
ranked AS (
  SELECT doc_id, n_matches, match_starts,
         row_number() OVER (ORDER BY doc_id)::BIGINT AS rank FROM m
),
page AS (SELECT * FROM ranked WHERE rank > {skip} AND rank <= {until}),
occ AS (
  SELECT doc_id, unnest(string_split(match_starts, ','))::INT AS pos FROM page
),
tk AS (SELECT doc_id, {TOK.format(col="text")} AS toks FROM documents{where}),
j AS (
  SELECT occ.doc_id, occ.pos,
         greatest(occ.pos + 1 - {width}, 1) AS s_el,
         least(occ.pos + {match_len} + {width}, len(tk.toks)) AS e_el,
         tk.toks AS toks
  FROM occ JOIN tk ON occ.doc_id = tk.doc_id
)
SELECT page.rank, j.doc_id, j.pos::BIGINT AS pos,
       (j.pos + 1 - j.s_el)::BIGINT AS hl_offset,
       array_to_string(j.toks[j.s_el:j.e_el], ' ') AS snippet,
       row_number() OVER (ORDER BY j.doc_id, j.pos)::BIGINT AS running_total,
       page.n_matches, tot.total_docs, tot.total_matches
FROM j JOIN page ON j.doc_id = page.doc_id CROSS JOIN tot
ORDER BY j.doc_id, j.pos
"""


def wildcard_terms_sql(pattern: str) -> str:
    assert "%" not in pattern and "_like_" not in pattern
    like = pattern.lower().replace("*", "%").replace("?", "_")
    return f"""
WITH {_corpus_ctes(None)}
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
FROM tf WHERE term LIKE '{like}'
GROUP BY term ORDER BY df DESC, term ASC
"""


def wildcard_docs_sql(pattern: str) -> str:
    like = pattern.lower().replace("*", "%").replace("?", "_")
    return f"""
WITH {_corpus_ctes(None)}
SELECT DISTINCT doc_id FROM tf WHERE term LIKE '{like}' ORDER BY doc_id
"""


def pagination_sql(query_text: str, skip: int, until: int, lang: str | None = None) -> str:
    """Ranks (skip, until] of the scored result — same scoring CTEs as
    bm25_topk_sql."""
    k1, b = BM25_K1, BM25_B
    return f"""
WITH {_corpus_ctes(lang)},
q AS ({_qterms_values(query_text)}),
m AS (SELECT tf.* FROM tf JOIN q USING (term)),
dft AS (SELECT term, count(*)::BIGINT AS df FROM m GROUP BY term),
s AS (
  SELECT m.doc_id,
         sum(
           ln(1.0 + (gs.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * (m.tf * ({k1} + 1.0)
              / (m.tf + {k1} * (1.0 - {b} + {b} * dl.dl / gs.avgdl)))
         )::DOUBLE AS score
  FROM m JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN gs
  GROUP BY m.doc_id
),
r AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, round(score, {SCORE_DECIMALS}) AS score
  FROM s
)
SELECT rank, doc_id, score FROM r
WHERE rank > {skip} AND rank <= {until}
ORDER BY rank
"""


def match_counts_sql(query_text: str, lang: str | None = None) -> str:
    """A6 — 'found N': per-term df plus OR/AND doc counts for one query."""
    return f"""
WITH {_corpus_ctes(lang)},
q AS ({_qterms_values(query_text)}),
m AS (SELECT tf.* FROM tf JOIN q USING (term)),
nq AS (SELECT count(*)::BIGINT AS n_terms FROM q)
SELECT
  (SELECT count(DISTINCT doc_id) FROM m)::BIGINT AS docs_or,
  (SELECT count(*) FROM (
     SELECT doc_id FROM m GROUP BY doc_id
     HAVING count(DISTINCT term) = (SELECT n_terms FROM nq)
  ))::BIGINT AS docs_and
"""

def collocations_sql(target: str, window: int = 3, min_count: int = 2,
                     k: int = 20) -> str:
    """Mirror of search.collocation.collocations (and its packed twin):
    windowed pair counts + PMI with the pinned parenthesization
    ln((cooc * total) / (cf_target * cf_n)); rank over the UNROUNDED pmi,
    output rounded. Distinct terms never share a position, so
    abs(p - t) <= window needs no lower bound."""
    return f"""
WITH {_positions_cte()},
tot AS (SELECT count(*)::DOUBLE AS total FROM pos),
cf AS (SELECT term, count(*)::BIGINT AS cf FROM pos GROUP BY term),
tpos AS (SELECT doc_id, pos FROM pos WHERE term = '{target}'),
pairs AS (
  SELECT p.term, count(*)::BIGINT AS cooc
  FROM pos p JOIN tpos t
    ON p.doc_id = t.doc_id AND abs(p.pos - t.pos) <= {window}
  WHERE p.term <> '{target}'
  GROUP BY p.term
),
scored AS (
  SELECT p.term, p.cooc, cf.cf,
         ln((p.cooc::DOUBLE * tot.total) / (tcf.tcf * cf.cf::DOUBLE)) AS pmi
  FROM pairs p
  JOIN cf USING (term)
  CROSS JOIN tot
  CROSS JOIN (SELECT cf::DOUBLE AS tcf FROM cf WHERE term = '{target}') tcf
  WHERE p.cooc >= {min_count}
)
SELECT row_number() OVER (ORDER BY pmi DESC, term ASC) AS rank,
       term, cooc, cf, round(pmi, {SCORE_DECIMALS}) AS pmi
FROM scored
ORDER BY pmi DESC, term ASC
LIMIT {k}
"""


def filter_context_sql(slots: list[dict], dists: list[tuple[int, int]],
                       filt: dict, window: tuple[int, int],
                       mode: str = "positive", lang: str | None = None) -> str:
    """Mirror of confilter.filter_context over slot_search_sql's result:
    a match start p survives a positive filter iff some occurrence q of
    the filter slot has q - p in [lo, hi]; negative iff none does. Docs
    without the filter pattern keep all (negative) / lose all (positive)
    matches via the LEFT JOIN's NULL fps."""
    base = slot_search_sql(slots, dists, lang=lang)
    lo, hi = int(window[0]), int(window[1])
    fcond = _slot_cond(filt)
    where = f" WHERE lang = '{lang}'" if lang else ""
    tok = TOK.format(col="text")
    tok_cs = TOK_CS.format(col="text")
    inwin = f"len(list_filter(fps, q -> q - p >= {lo} AND q - p <= {hi})) > 0"
    keep = (f"fps IS NOT NULL AND {inwin}" if mode == "positive"
            else f"(fps IS NULL OR NOT ({inwin}))")
    return f"""
WITH base AS (SELECT * FROM ({base}) _b),
docs AS (SELECT doc_id, text FROM documents{where}),
tokarr AS (SELECT doc_id, {tok} AS toks, {tok_cs} AS toks_cs FROM docs),
pos AS (
  SELECT doc_id, unnest(toks) AS term, unnest(toks_cs) AS term_cs,
         unnest(range(len(toks)))::INT AS pos
  FROM tokarr
),
fs AS (SELECT doc_id, list_sort(list(DISTINCT pos)) AS fps FROM pos
       WHERE {fcond} GROUP BY doc_id),
st AS (SELECT doc_id,
              list_transform(string_split(match_starts, ','), x -> x::INT) AS starts
       FROM base),
flt AS (
  SELECT st.doc_id,
         list_sort(list_filter(starts, p -> {keep})) AS starts
  FROM st LEFT JOIN fs USING (doc_id)
)
SELECT doc_id, len(starts)::BIGINT AS n_matches,
       array_to_string(starts, ',') AS match_starts
FROM flt WHERE len(starts) > 0 ORDER BY doc_id
"""


def conc_freq_node_sql(slots: list[dict], dists: list[tuple[int, int]],
                       match_len: int | None = None, k: int = 100,
                       lang: str | None = None) -> str:
    """Mirror of confilter.conc_freq_node: breakdown of the concordance by
    matched node form (the match_len tokens at each start position)."""
    base = slot_search_sql(slots, dists, lang=lang)
    ml = len(slots) if match_len is None else int(match_len)
    where = f" WHERE lang = '{lang}'" if lang else ""
    tok = TOK.format(col="text")
    return f"""
WITH base AS (SELECT * FROM ({base}) _b),
docs AS (SELECT doc_id, text FROM documents{where}),
tokarr AS (SELECT doc_id, {tok} AS toks FROM docs),
occ AS (
  SELECT doc_id,
         unnest(list_transform(string_split(match_starts, ','), x -> x::INT)) AS pos
  FROM base
),
kw AS (
  SELECT occ.doc_id,
         array_to_string(toks[pos + 1 : pos + {ml}], ' ') AS keyword
  FROM occ JOIN tokarr USING (doc_id)
)
SELECT keyword, count(*)::BIGINT AS n_occ, count(DISTINCT doc_id)::BIGINT AS n_docs
FROM kw GROUP BY keyword ORDER BY n_occ DESC, keyword ASC LIMIT {k}
"""


def conc_freq_attr_sql(slots: list[dict], dists: list[tuple[int, int]],
                       attr: str = "lang", lang: str | None = None) -> str:
    """Mirror of confilter.conc_freq_attr: text-type distribution of a
    concordance over a document attribute."""
    base = slot_search_sql(slots, dists, lang=lang)
    return f"""
WITH base AS (SELECT * FROM ({base}) _b)
SELECT d.{attr} AS {attr}, sum(base.n_matches)::BIGINT AS n_occ,
       count(*)::BIGINT AS n_docs
FROM base JOIN documents d USING (doc_id)
GROUP BY d.{attr} ORDER BY n_occ DESC, {attr} ASC
"""


def conc_collocations_sql(slots: list[dict], dists: list[tuple[int, int]],
                          match_len: int = 1, window: int = 3,
                          min_count: int = 2, k: int = 20,
                          lang: str | None = None) -> str:
    """Mirror of collocation.conc_collocations over slot_search_sql's
    result: PMI-ranked collocates of the concordance, node mass = total
    match occurrences, node-span positions excluded from neighbors,
    pinned pmi = ln((cooc * total) / (node_occ * cf_n))."""
    base = slot_search_sql(slots, dists, lang=lang)
    sl = int(match_len) - 1
    where = f" WHERE lang = '{lang}'" if lang else ""
    tok = TOK.format(col="text")
    return f"""
WITH base AS (SELECT * FROM ({base}) _b),
docs AS (SELECT doc_id, text FROM documents{where}),
tokarr AS (SELECT doc_id, {tok} AS toks FROM docs),
pos AS (
  SELECT doc_id, unnest(toks) AS term, unnest(range(len(toks)))::INT AS pos
  FROM tokarr
),
cf AS (SELECT term, count(*)::BIGINT AS cf FROM pos GROUP BY term),
tot AS (SELECT count(*)::DOUBLE AS total FROM pos),
nocc AS (SELECT sum(n_matches)::DOUBLE AS node_occ FROM base),
st AS (SELECT doc_id,
              list_transform(string_split(match_starts, ','), x -> x::INT) AS starts
       FROM base),
pairs AS (
  SELECT p.term,
         sum(len(list_filter(starts, s ->
             p.pos >= s - {int(window)} AND p.pos <= s + {sl + int(window)}
             AND NOT (p.pos >= s AND p.pos <= s + {sl}))))::BIGINT AS cooc
  FROM pos p JOIN st ON p.doc_id = st.doc_id
  GROUP BY p.term
),
scored AS (
  SELECT p.term, p.cooc, cf.cf,
         ln((p.cooc::DOUBLE * tot.total) / (nocc.node_occ * cf.cf::DOUBLE)) AS pmi
  FROM pairs p
  JOIN cf USING (term)
  CROSS JOIN tot
  CROSS JOIN nocc
  WHERE p.cooc >= {int(min_count)} AND p.cooc > 0
)
SELECT row_number() OVER (ORDER BY pmi DESC, term ASC) AS rank,
       term, cooc, cf, round(pmi, {SCORE_DECIMALS}) AS pmi
FROM scored
ORDER BY pmi DESC, term ASC
LIMIT {int(k)}
"""


def collocations_by_attr_sql(target: str, attr: str = "stem",
                             window: int = 3, min_count: int = 2,
                             k: int = 20) -> str:
    """Mirror of search.collocation.collocations_by_attr: pair counts
    regrouped to the attribute class (duckdb_stem/duckdb_tag — the same
    fragments the slot oracles match on), class mass = Σ cf over the
    class, node mass = the literal target term's cf, same pinned pmi
    parenthesization."""
    if attr == "stem":
        from fastmorph_spark.stem import duckdb_stem as key_sql
    elif attr == "tag":
        from fastmorph_spark.tags import duckdb_tag as key_sql
    else:
        raise ValueError(f"attr must be stem|tag, got {attr!r}")
    return f"""
WITH {_positions_cte()},
tot AS (SELECT count(*)::DOUBLE AS total FROM pos),
cf AS (SELECT term, count(*)::BIGINT AS cf FROM pos GROUP BY term),
cfk AS (SELECT {key_sql('term')} AS key, sum(cf)::BIGINT AS cf
        FROM cf GROUP BY 1),
tpos AS (SELECT doc_id, pos FROM pos WHERE term = '{target}'),
pairs AS (
  SELECT p.term, count(*)::BIGINT AS cooc
  FROM pos p JOIN tpos t
    ON p.doc_id = t.doc_id AND abs(p.pos - t.pos) <= {window}
  WHERE p.term <> '{target}'
  GROUP BY p.term
),
pairsk AS (
  SELECT {key_sql('term')} AS key, sum(cooc)::BIGINT AS cooc
  FROM pairs GROUP BY 1
),
scored AS (
  SELECT p.key, p.cooc, cfk.cf,
         ln((p.cooc::DOUBLE * tot.total) / (tcf.tcf * cfk.cf::DOUBLE)) AS pmi
  FROM pairsk p
  JOIN cfk USING (key)
  CROSS JOIN tot
  CROSS JOIN (SELECT cf::DOUBLE AS tcf FROM cf WHERE term = '{target}') tcf
  WHERE p.cooc >= {min_count}
)
SELECT row_number() OVER (ORDER BY pmi DESC, key ASC) AS rank,
       key, cooc, cf, round(pmi, {SCORE_DECIMALS}) AS pmi
FROM scored
ORDER BY pmi DESC, key ASC
LIMIT {k}
"""


def grep_lines_sql(term: str, text_expr: str = "text") -> str:
    """Mirror of search.grep.grep_lines: 1-based line numbers via the
    parallel-unnest zip (lines ∥ range) — DuckDB's posexplode analog —
    token-boundary match via the canonical TOK fragment per line."""
    folded = tokenize_py(term)
    assert len(folded) == 1, f"grep term must fold to one token: {folded!r}"
    return f"""
WITH src AS (
  SELECT doc_id, string_split({text_expr}, chr(10)) AS lines FROM documents
),
l AS (
  SELECT doc_id,
         unnest(lines) AS line,
         unnest(range(1, len(lines) + 1))::INT AS line_no
  FROM src
)
SELECT doc_id, line_no, line
FROM l
WHERE list_contains({TOK.format(col='line')}, '{folded[0]}')
ORDER BY doc_id, line_no
"""


def grep_context_sql(term: str, context: int = 2,
                     text_expr: str = "text") -> str:
    """Mirror of search.grep.grep_context: per-doc match line-number
    list, context membership via list_filter (DuckDB's HOF exists
    analog), is_match as 0/1 BIGINT (same cast as the Spark side)."""
    folded = tokenize_py(term)
    assert len(folded) == 1, f"grep term must fold to one token: {folded!r}"
    return f"""
WITH src AS (
  SELECT doc_id, string_split({text_expr}, chr(10)) AS lines FROM documents
),
l AS (
  SELECT doc_id,
         unnest(lines) AS line,
         unnest(range(1, len(lines) + 1))::INT AS line_no
  FROM src
),
m AS (
  SELECT doc_id, list(line_no) AS mls
  FROM l
  WHERE list_contains({TOK.format(col='line')}, '{folded[0]}')
  GROUP BY doc_id
)
SELECT l.doc_id, l.line_no, l.line,
       list_contains(m.mls, l.line_no)::BIGINT AS is_match
FROM l JOIN m USING (doc_id)
WHERE len(list_filter(m.mls, x -> abs(l.line_no - x) <= {context})) > 0
ORDER BY doc_id, line_no
"""


def repo_rank_sql(query_text: str, repo_expr: str, k: int = 10,
                  tok_fragment: str = TOK, text_expr: str = "text",
                  tokenize=tokenize_py) -> str:
    """Mirror of search.grep.repo_rank: the bm25 scoring chain, then
    max-score + matching-file count per repo (``repo_expr`` derives the
    repo from doc_id exactly as the Spark fixture corpus does)."""
    k1, b = BM25_K1, BM25_B
    return f"""
WITH {_corpus_ctes(None, tok_fragment, text_expr)},
q AS ({_qterms_values(query_text, tokenize)}),
m AS (SELECT tf.* FROM tf JOIN q USING (term)),
dft AS (SELECT term, count(*)::BIGINT AS df FROM m GROUP BY term),
s AS (
  SELECT m.doc_id,
         sum(
           ln(1.0 + (gs.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * (m.tf * ({k1} + 1.0)
              / (m.tf + {k1} * (1.0 - {b} + {b} * dl.dl / gs.avgdl)))
         )::DOUBLE AS score
  FROM m
  JOIN dft USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN gs
  GROUP BY m.doc_id
),
r AS (
  SELECT {repo_expr} AS repo, max(score) AS score,
         count(*)::BIGINT AS n_files
  FROM s GROUP BY 1
)
SELECT row_number() OVER (ORDER BY score DESC, repo ASC) AS rank,
       repo, round(score, {SCORE_DECIMALS}) AS score, n_files
FROM r
ORDER BY score DESC, repo ASC
LIMIT {k}
"""


def code_defs_sql(def_pattern: str, text_expr: str = "text") -> str:
    """Mirror of search.grep.code_defs (same pinned DEF_PATTERN verbatim;
    regexp_matches gate == Spark's kind != '' filter because group 1 of
    any match is one of the non-empty keyword alternatives)."""
    return f"""
WITH src AS (
  SELECT doc_id, string_split({text_expr}, chr(10)) AS lines FROM documents
),
l AS (
  SELECT doc_id,
         unnest(lines) AS line,
         unnest(range(1, len(lines) + 1))::INT AS line_no
  FROM src
)
SELECT doc_id, line_no,
       regexp_extract(line, '{def_pattern}', 1) AS kind,
       regexp_extract(line, '{def_pattern}', 2) AS symbol
FROM l
WHERE regexp_matches(line, '{def_pattern}')
ORDER BY doc_id, line_no
"""


def substring_docs_sql(q: str, case: bool = True, text_expr: str = "text") -> str:
    """Mirror of search.substring.substring_search: exact substring
    containment (DuckDB contains == Spark instr>0 — both literal, no
    pattern semantics), folded on both sides when case=False. The
    oracle is pure brute force on purpose: the Spark path must prove
    the trigram candidate/verify pipeline loses and invents nothing."""
    hay, needle = (text_expr, q) if case else (f"lower({text_expr})", q.lower())
    return f"""
SELECT doc_id
FROM documents
WHERE contains({hay}, '{needle}')
ORDER BY doc_id
"""


def substring_grep_sql(q: str, case: bool = True, text_expr: str = "text") -> str:
    """Mirror of search.substring.substring_grep: per-line containment
    with 1-based line numbers (the parallel-unnest zip, as
    grep_lines_sql)."""
    hay, needle = ("line", q) if case else ("lower(line)", q.lower())
    return f"""
WITH src AS (
  SELECT doc_id, string_split({text_expr}, chr(10)) AS lines FROM documents
),
l AS (
  SELECT doc_id,
         unnest(lines) AS line,
         unnest(range(1, len(lines) + 1))::INT AS line_no
  FROM src
)
SELECT doc_id, line_no, line
FROM l
WHERE contains({hay}, '{needle}')
ORDER BY doc_id, line_no
"""


def regex_grep_sql(pat: str, text_expr: str = "text") -> str:
    """Mirror of search.substring.regex_grep: UNANCHORED per-line match.
    DuckDB regexp_matches (RE2 find) == Spark rlike (Java find) on the
    validated cross-engine subset (search/regex.py)."""
    return f"""
WITH src AS (
  SELECT doc_id, string_split({text_expr}, chr(10)) AS lines FROM documents
),
l AS (
  SELECT doc_id,
         unnest(lines) AS line,
         unnest(range(1, len(lines) + 1))::INT AS line_no
  FROM src
)
SELECT doc_id, line_no, line
FROM l
WHERE regexp_matches(line, '{pat}')
ORDER BY doc_id, line_no
"""


def symbol_boosted_sql(symbol: str, def_pattern: str, k: int = 10,
                       boost: float = 1000.0,
                       text_expr: str = "text") -> str:
    """Mirror of search.symbols.symbol_boosted_topk: canonical BM25 on
    the folded symbol token + ``boost`` for docs with a definition line
    whose extracted symbol equals ``symbol`` case-exactly. Rank over the
    unrounded boosted score; round only for output."""
    k1, b = BM25_K1, BM25_B
    folded = tokenize_py(symbol)
    assert len(folded) == 1, f"symbol must fold to one token: {folded!r}"
    return f"""
WITH {_corpus_ctes(text_expr=text_expr)},
m AS (SELECT * FROM tf WHERE term = '{folded[0]}'),
dft AS (SELECT term, count(*)::BIGINT AS df FROM m GROUP BY term),
s AS (
  SELECT m.doc_id,
         sum(
           ln(1.0 + (gs.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * (m.tf * ({k1} + 1.0)
              / (m.tf + {k1} * (1.0 - {b} + {b} * dl.dl / gs.avgdl)))
         )::DOUBLE AS score
  FROM m JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN gs
  GROUP BY m.doc_id
),
deflines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM docs
),
defs AS (
  SELECT DISTINCT doc_id FROM deflines
  WHERE regexp_matches(line, '{def_pattern}')
    AND regexp_extract(line, '{def_pattern}', 2) = '{symbol}'
),
bo AS (
  SELECT s.doc_id,
         s.score + CASE WHEN d.doc_id IS NOT NULL THEN {boost}
                        ELSE 0.0 END AS score
  FROM s LEFT JOIN defs d USING (doc_id)
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       round(score, {SCORE_DECIMALS}) AS score
FROM bo
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def _like_sql(col: str, value: str) -> str:
    """Predicate fragment mirroring querylang._meta_filter: equality,
    or LIKE with the engine's wildcard translation when the value
    carries * / ? (DuckDB needs the ESCAPE clause spelled out; the
    backslash is literal inside DuckDB's escape-free strings)."""
    if "*" in value or "?" in value:
        from fastmorph_spark.search.engine import wildcard_pattern_to_like

        return f"{col} LIKE '{wildcard_pattern_to_like(value)}' ESCAPE '\\'"
    return f"{col} = '{value}'"


def query_lang_sql(q: str, k: int, docs_cte: str, tok_fragment: str = TOK,
                   tokenizer: str = "ascii") -> str:
    """Mirror of search.querylang.query_search over ``docs_cte`` — any
    source yielding (doc_id, repo, path, lang, text) BEFORE metadata
    filters. The spec is parsed by the very parser the engine uses, so
    grammar and SQL can't drift; scoring stats are scoped to the
    filtered corpus, constraints apply before the top-k cut, ties
    break (score DESC, doc_id ASC) — all per the querylang pinning."""
    from fastmorph_spark.search.querylang import parse_query

    spec = parse_query(q, tokenizer=tokenizer)
    k1, b = BM25_K1, BM25_B
    tok = tok_fragment.format(col="text")

    where = " AND ".join(
        [_like_sql(f, spec[f]) for f in ("repo", "path") if spec[f]]
        + ([f"lang = '{spec['lang']}'"] if spec["lang"] else [])
    ) or "true"

    score_terms = sorted(set(spec["terms"])
                         | {t for p in spec["phrases"] for t in p})
    qvals = ", ".join(f"('{t}')" for t in score_terms)

    required = sorted(set(spec["terms"]))
    need_and = bool(required) and (len(required) > 1 or bool(spec["phrases"]))

    ctes = [f"corpus AS ({docs_cte})",
            f"fdocs AS (SELECT * FROM corpus WHERE {where})",
            "docs AS (SELECT doc_id, text FROM fdocs)",
            f"tok AS (SELECT doc_id, unnest({tok}) AS term FROM docs)",
            "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf"
            " FROM tok GROUP BY doc_id, term)",
            "dl AS (SELECT d.doc_id, coalesce(sum(tf.tf), 0)::BIGINT AS dl"
            " FROM docs d LEFT JOIN tf ON d.doc_id = tf.doc_id"
            " GROUP BY d.doc_id)",
            "gs AS (SELECT count(*)::BIGINT AS n_docs,"
            " avg(dl)::DOUBLE AS avgdl FROM dl)",
            f"q AS (SELECT * FROM (VALUES {qvals}) AS qt(term))",
            "m AS (SELECT tf.* FROM tf JOIN q USING (term))",
            "dft AS (SELECT term, count(*)::BIGINT AS df FROM m"
            " GROUP BY term)",
            f"""s AS (
  SELECT m.doc_id,
         sum(
           ln(1.0 + (gs.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * (m.tf * ({k1} + 1.0)
              / (m.tf + {k1} * (1.0 - {b} + {b} * dl.dl / gs.avgdl)))
         )::DOUBLE AS score
  FROM m JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN gs
  GROUP BY m.doc_id
)"""]
    joins, antis = [], []
    if need_and:
        inlist = ", ".join(f"'{t}'" for t in required)
        ctes.append(
            f"req AS (SELECT doc_id FROM tf WHERE term IN ({inlist})"
            f" GROUP BY doc_id HAVING count(DISTINCT term) = {len(required)})")
        joins.append("req")
    sequences = spec["phrases"] + spec["excludes"]
    if sequences:
        ctes.append(f"tokarr AS (SELECT doc_id, {tok} AS toks FROM docs)")
        ctes.append("pos AS (SELECT doc_id, unnest(toks) AS term,"
                    " unnest(range(len(toks)))::INT AS pos FROM tokarr)")
    for si, seq in enumerate(sequences):
        name = f"seq{si}"
        adj = "\n".join(
            f"  JOIN pos p{i} ON p{i}.doc_id = p0.doc_id"
            f" AND p{i}.term = '{t}' AND p{i}.pos = p0.pos + {i}"
            for i, t in enumerate(seq[1:], 1))
        ctes.append(
            f"{name} AS (SELECT DISTINCT p0.doc_id AS doc_id FROM pos p0\n"
            f"{adj}\n  WHERE p0.term = '{seq[0]}')")
        (joins if si < len(spec["phrases"]) else antis).append(name)

    sel_joins = "".join(f" JOIN {j} USING (doc_id)" for j in joins)
    sel_antis = "".join(
        f" AND s.doc_id NOT IN (SELECT doc_id FROM {a})" for a in antis)
    with_block = ",\n".join(ctes)
    return f"""
WITH {with_block},
sel AS (SELECT s.doc_id, round(s.score, {SCORE_DECIMALS}) AS score
        FROM s{sel_joins} WHERE true{sel_antis}),
top AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM sel ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT t.rank, t.doc_id, f.repo, f.path, t.score
FROM top t JOIN fdocs f USING (doc_id)
ORDER BY t.rank
"""


def bm25f_topk_sql(query_text: str, path_expr: str, content_expr: str,
                   w_path: float, b_path: float,
                   w_content: float, b_content: float,
                   k: int = 10, k1: float = BM25_K1,
                   tok_fragment: str = TOK, tokenize=tokenize_py) -> str:
    """Mirror of search.bm25f.bm25f_topk(round_score=True) for the pinned
    two-field (path, content) case. Same CTE discipline as bm25_topk_sql,
    duplicated per field; the field merge is a FULL OUTER JOIN whose
    coalesce-sum reproduces the engine's field-order fold exactly
    (0.0 + wtf_path + wtf_content, missing legs contributing +0.0); df is
    the merged frame's per-term row count (df-any-field, one row per doc
    however many fields hit); avgdl_f averages over ALL docs including
    zero-length fields (LEFT JOIN + coalesce)."""
    tokp = tok_fragment.format(col="path")
    tokc = tok_fragment.format(col="content")
    qterms = _qterms_values(query_text, tokenize)
    return f"""
WITH docs AS (
  SELECT doc_id, {path_expr} AS path, {content_expr} AS content FROM documents
),
n AS (SELECT count(*)::BIGINT AS n_docs FROM docs),
tokp AS (SELECT doc_id, unnest({tokp}) AS term FROM docs),
tfp AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tokp GROUP BY doc_id, term),
dlp AS (
  SELECT d.doc_id, coalesce(sum(tfp.tf), 0)::BIGINT AS dl
  FROM docs d LEFT JOIN tfp ON d.doc_id = tfp.doc_id GROUP BY d.doc_id
),
gsp AS (SELECT avg(dl)::DOUBLE AS avgdl FROM dlp),
tokc AS (SELECT doc_id, unnest({tokc}) AS term FROM docs),
tfc AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tokc GROUP BY doc_id, term),
dlc AS (
  SELECT d.doc_id, coalesce(sum(tfc.tf), 0)::BIGINT AS dl
  FROM docs d LEFT JOIN tfc ON d.doc_id = tfc.doc_id GROUP BY d.doc_id
),
gsc AS (SELECT avg(dl)::DOUBLE AS avgdl FROM dlc),
q AS ({qterms}),
mp AS (
  SELECT tfp.doc_id, tfp.term,
         {w_path} * tfp.tf
         / ((1.0 - {b_path}) + {b_path} * dlp.dl / gsp.avgdl) AS wtf
  FROM tfp JOIN q USING (term) JOIN dlp USING (doc_id) CROSS JOIN gsp
),
mc AS (
  SELECT tfc.doc_id, tfc.term,
         {w_content} * tfc.tf
         / ((1.0 - {b_content}) + {b_content} * dlc.dl / gsc.avgdl) AS wtf
  FROM tfc JOIN q USING (term) JOIN dlc USING (doc_id) CROSS JOIN gsc
),
m AS (
  SELECT coalesce(mp.doc_id, mc.doc_id) AS doc_id,
         coalesce(mp.term, mc.term) AS term,
         coalesce(mp.wtf, 0.0) + coalesce(mc.wtf, 0.0) AS wtf
  FROM mp FULL OUTER JOIN mc ON mp.doc_id = mc.doc_id AND mp.term = mc.term
),
dft AS (SELECT term, count(*)::BIGINT AS df FROM m GROUP BY term),
s AS (
  SELECT m.doc_id,
         sum(
           ln(1.0 + (n.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * (m.wtf * ({k1} + 1.0) / (m.wtf + {k1}))
         )::DOUBLE AS score
  FROM m JOIN dft USING (term) CROSS JOIN n
  GROUP BY m.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       round(score, {SCORE_DECIMALS}) AS score
FROM s
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
