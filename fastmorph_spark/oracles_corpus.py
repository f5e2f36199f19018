"""DuckDB oracles for the corpus-statistics / fuzzy / facet / sentence
operators (search/keyness.py, fuzzy.py, facets.py, sentence.py).

Same discipline as oracles.py: every formula is mirrored TEXTUALLY —
identical operand order and nesting — so the driver's value-hash compare
at sf0.01 sees bit-equal doubles after SCORE_DECIMALS rounding; ranks
are computed over the UNROUNDED statistic in both engines.

Cross-engine numeric pins worth naming:
- log2 is written as ``ln(x) / ln(2)`` in SQL and ``log(x) / lit(ln 2)``
  in Spark — NOT the engines' native log2, whose last bit may differ;
- Juilland's D uses only +,*,/ of sums plus one correctly-rounded sqrt,
  so both engines agree bit-for-bit before rounding;
- ``levenshtein`` is the plain unit-cost edit distance in both engines
  (pinned by tests/test_corpusstats.py).
"""

from __future__ import annotations

import math

from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.oracles import TOK, _corpus_ctes
from fastmorph_spark.tokenize import tokenize_py

LN2 = math.log(2.0)  # correctly-rounded double, == DuckDB ln(2)


def keyness_sql(focus_lang: str, min_count: int = 5, k: int = 50) -> str:
    """Mirror of search.keyness.keyness."""
    tok = TOK.format(col="text")
    return f"""
WITH tok AS (
  SELECT lang, unnest({tok}) AS term FROM documents
),
counts AS (
  SELECT term,
         sum(CASE WHEN lang = '{focus_lang}' THEN 1 ELSE 0 END)::BIGINT AS f_focus,
         sum(CASE WHEN lang = '{focus_lang}' THEN 0 ELSE 1 END)::BIGINT AS f_ref
  FROM tok GROUP BY term
),
tot AS (
  SELECT sum(f_focus)::DOUBLE AS n1, sum(f_ref)::DOUBLE AS n2 FROM counts
),
scored AS (
  SELECT term, f_focus, f_ref,
         2 * (CASE WHEN f1 > 0 THEN f1 * ln(f1 / ((f1 + f2) * n1 / (n1 + n2)))
                   ELSE 0.0 END
            + CASE WHEN f2 > 0 THEN f2 * ln(f2 / ((f1 + f2) * n2 / (n1 + n2)))
                   ELSE 0.0 END) AS g2,
         ln(((f1 + 0.5) / n1) / ((f2 + 0.5) / n2)) / ln(2) AS log_ratio
  FROM (
    SELECT term, f_focus, f_ref,
           f_focus::DOUBLE AS f1, f_ref::DOUBLE AS f2, n1, n2
    FROM counts CROSS JOIN tot
    WHERE f_focus + f_ref >= {min_count}
  )
)
SELECT row_number() OVER (ORDER BY g2 DESC, term ASC) AS rank,
       term, f_focus, f_ref,
       round(g2, {SCORE_DECIMALS}) AS g2,
       round(log_ratio, {SCORE_DECIMALS}) AS log_ratio
FROM scored
ORDER BY g2 DESC, term ASC
LIMIT {k}
"""


def term_profile_sql(terms: list[str]) -> str:
    """Mirror of search.keyness.term_profile."""
    tok = TOK.format(col="text")
    inlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH tok AS (
  SELECT lang, unnest({tok}) AS term FROM documents
),
lang_totals AS (
  SELECT lang, count(*)::BIGINT AS lang_tokens FROM tok GROUP BY lang
),
counts AS (
  SELECT term, lang, count(*)::BIGINT AS tf FROM tok
  WHERE term IN ({inlist}) GROUP BY term, lang
)
SELECT c.term, c.lang, c.tf, lt.lang_tokens,
       round(c.tf::DOUBLE * 1000000 / lt.lang_tokens, {SCORE_DECIMALS}) AS ipm
FROM counts c JOIN lang_totals lt USING (lang)
ORDER BY term, lang
"""


def dispersion_sql(terms: list[str], parts: int = 8) -> str:
    """Mirror of search.keyness.dispersion (Juilland's D)."""
    tok = TOK.format(col="text")
    inlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    p = f"{float(parts):.1f}"
    return f"""
WITH tok AS (
  SELECT doc_id % {parts} AS part, unnest({tok}) AS term FROM documents
),
per_part AS (
  SELECT term, part, count(*)::DOUBLE AS v FROM tok
  WHERE term IN ({inlist}) GROUP BY term, part
)
SELECT term, sum(v)::BIGINT AS cf,
       round(1 - (sqrt(greatest(sum(v * v) / {p} - (sum(v) / {p}) * (sum(v) / {p}), 0.0))
                  / (sum(v) / {p})) / sqrt({parts} - 1), {SCORE_DECIMALS}) AS d
FROM per_part
GROUP BY term
ORDER BY term
"""


def _dict_cte(text_expr: str = "text") -> str:
    return f"""
{_corpus_ctes(None, text_expr=text_expr)},
dict AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
)"""


def fuzzy_terms_sql(word: str, max_dist: int = 1, k: int = 50,
                    text_expr: str = "text") -> str:
    """Mirror of search.fuzzy.fuzzy_terms. ``text_expr`` lets the driver
    fixture derive a typo-bearing corpus (the slot_case convention)."""
    w = tokenize_py(word)[0]
    return f"""
WITH {_dict_cte(text_expr).strip()}
SELECT term, df, levenshtein(term, '{w}')::BIGINT AS dist
FROM dict
WHERE abs(length(term) - {len(w)}) <= {max_dist}
  AND levenshtein(term, '{w}') <= {max_dist}
ORDER BY dist ASC, df DESC, term ASC
LIMIT {k}
"""


def fuzzy_docs_sql(word: str, max_dist: int = 1, k_terms: int = 50,
                   text_expr: str = "text") -> str:
    """Mirror of search.fuzzy.fuzzy_docs."""
    w = tokenize_py(word)[0]
    return f"""
WITH {_dict_cte(text_expr).strip()},
variants AS (
  SELECT term, levenshtein(term, '{w}')::BIGINT AS dist
  FROM dict
  WHERE abs(length(term) - {len(w)}) <= {max_dist}
    AND levenshtein(term, '{w}') <= {max_dist}
  ORDER BY dist ASC, df DESC, term ASC
  LIMIT {k_terms}
)
SELECT tf.doc_id, min(v.dist)::BIGINT AS best_dist, sum(tf.tf)::BIGINT AS tf_sum
FROM tf JOIN variants v USING (term)
GROUP BY tf.doc_id
ORDER BY tf.doc_id
"""


def fuzzy_batch_sql(words: list[str], max_dist: int = 1,
                    text_expr: str = "text") -> str:
    """Mirror of search.fuzzy.fuzzy_terms_batch — the oracle states the
    SEMANTICS (all dictionary terms within max_dist of each probe); the
    engine's deletion-neighborhood join must produce exactly this set."""
    probes = sorted({tokenize_py(w)[0] for w in words})
    values = ", ".join(f"('{p}')" for p in probes)
    return f"""
WITH {_dict_cte(text_expr).strip()},
probes AS (SELECT * FROM (VALUES {values}) AS p(probe))
SELECT p.probe, d.term, d.df, levenshtein(d.term, p.probe)::BIGINT AS dist
FROM dict d CROSS JOIN probes p
WHERE abs(length(d.term) - length(p.probe)) <= {max_dist}
  AND levenshtein(d.term, p.probe) <= {max_dist}
ORDER BY p.probe ASC, dist ASC, d.df DESC, d.term ASC
"""


def kwic_sample_sql(slots: list, dists: list, match_len: int, n: int,
                    width: int = 5) -> str:
    """Mirror of the deterministic concordance sample: engine.kwic lines
    ordered by md5(doc_id || ':' || pos) (unique per line), first n —
    the md5-family sampling discipline (ops/text.sample_10pct)."""
    from fastmorph_spark.oracles import kwic_sql

    inner = kwic_sql(slots, dists, match_len, width).strip()
    return f"""
SELECT doc_id, pos, left_ctx, keyword, right_ctx
FROM ({inner})
ORDER BY md5(doc_id::VARCHAR || ':' || pos::VARCHAR)
LIMIT {n}
"""


def facet_counts_sql(query_text: str,
                     fields: tuple[str, ...] = ("lang", "source")) -> str:
    """Mirror of search.facets.facet_counts over engine.and_search's
    match set for `query_text`."""
    terms = sorted(set(tokenize_py(query_text)))
    inlist = ", ".join(f"'{t}'" for t in terms)
    tok = TOK.format(col="text")
    branches = "\nUNION ALL\n".join(
        f"SELECT '{f}' AS facet, {f}::VARCHAR AS value, count(*)::BIGINT AS n_docs "
        f"FROM j GROUP BY {f}"
        for f in fields
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({tok}) AS term FROM documents
),
matches AS (
  SELECT doc_id FROM tok WHERE term IN ({inlist})
  GROUP BY doc_id HAVING count(DISTINCT term) = {len(terms)}
),
j AS (
  SELECT d.lang, d.source FROM documents d JOIN matches USING (doc_id)
)
SELECT * FROM ({branches})
ORDER BY facet ASC, n_docs DESC, value ASC
"""


_SENT_SPLIT = "[.!?]+"


def _sentence_tok_cte(text_expr: str = "text") -> str:
    tok = TOK.format(col="seg")
    return f"""
segarr AS (
  SELECT doc_id,
         regexp_split_to_array(coalesce({text_expr}, ''), '{_SENT_SPLIT}') AS segs
  FROM documents
),
segs AS (
  SELECT doc_id, unnest(segs) AS seg,
         unnest(range(len(segs)))::BIGINT AS sent_id
  FROM segarr
),
tok AS (
  SELECT doc_id, sent_id, unnest({tok}) AS term FROM segs
)"""


def within_sentence_sql(query_text: str, text_expr: str = "text") -> str:
    """Mirror of search.sentence.within_sentence_search."""
    terms = sorted(set(tokenize_py(query_text)))
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_sentence_tok_cte(text_expr).strip()}
SELECT doc_id, sent_id FROM tok WHERE term IN ({inlist})
GROUP BY doc_id, sent_id HAVING count(DISTINCT term) = {len(terms)}
ORDER BY doc_id, sent_id
"""


def slot_within_sentence_sql(slots: list, dists: list,
                             text_expr: str = "text",
                             key_base: int = 1 << 20) -> str:
    """Mirror of search.sentence.slot_within_sentence: the composite-key
    position space (doc_id*key_base + sent_id, sentence-local positions)
    swapped into the UNCHANGED slot_search_sql machinery via pos_cte,
    then decomposed back to (doc_id, sent_id)."""
    from fastmorph_spark.oracles import slot_search_sql

    tok = TOK.format(col="seg")
    pos_cte = f"""segarr AS (
  SELECT doc_id,
         regexp_split_to_array(coalesce({text_expr}, ''), '{_SENT_SPLIT}') AS segs
  FROM documents
),
segs AS (
  SELECT doc_id, unnest(segs) AS seg,
         unnest(range(len(segs)))::BIGINT AS sent_id
  FROM segarr
),
segtok AS (SELECT doc_id, sent_id, {tok} AS toks FROM segs),
pos AS (
  SELECT doc_id * {key_base} + sent_id AS doc_id,
         unnest(toks) AS term, unnest(toks) AS term_cs,
         unnest(range(len(toks)))::INT AS pos
  FROM segtok
)"""
    inner = slot_search_sql(slots, dists, pos_cte=pos_cte).strip()
    return f"""
SELECT (doc_id // {key_base})::BIGINT AS doc_id,
       (doc_id % {key_base})::BIGINT AS sent_id,
       n_matches, match_starts
FROM ({inner})
ORDER BY doc_id, sent_id
"""


def sentence_stats_sql(text_expr: str = "text") -> str:
    """Mirror of search.sentence.sentence_stats."""
    return f"""
WITH {_sentence_tok_cte(text_expr).strip()},
per_sent AS (
  SELECT doc_id, sent_id, count(*)::BIGINT AS n_tokens FROM tok
  GROUP BY doc_id, sent_id
)
SELECT count(*)::BIGINT AS n_sentences,
       round(avg(n_tokens), {SCORE_DECIMALS}) AS avg_sent_len
FROM per_sent
"""


def collocations_directional_sql(target: str, window: int = 3,
                                 min_count: int = 2, k: int = 20) -> str:
    """Mirror of search.collocation.collocations_directional — the
    collocations_sql pinning (PMI parenthesization, rank over unrounded)
    plus the left/right pair-count split."""
    from fastmorph_spark.oracles import _positions_cte

    return f"""
WITH {_positions_cte().strip()},
tot AS (SELECT count(*)::DOUBLE AS total FROM pos),
cf AS (SELECT term, count(*)::BIGINT AS cf FROM pos GROUP BY term),
tpos AS (SELECT doc_id, pos FROM pos WHERE term = '{target}'),
pairs AS (
  SELECT p.term,
         sum(CASE WHEN t.pos - p.pos >= 1 AND t.pos - p.pos <= {window}
             THEN 1 ELSE 0 END)::BIGINT AS left_n,
         sum(CASE WHEN p.pos - t.pos >= 1 AND p.pos - t.pos <= {window}
             THEN 1 ELSE 0 END)::BIGINT AS right_n
  FROM pos p JOIN tpos t
    ON p.doc_id = t.doc_id AND abs(p.pos - t.pos) <= {window}
  WHERE p.term <> '{target}'
  GROUP BY p.term
),
scored AS (
  SELECT p.term, p.left_n + p.right_n AS cooc, p.left_n, p.right_n, cf.cf,
         ln(((p.left_n + p.right_n)::DOUBLE * tot.total)
            / (tcf.tcf * cf.cf::DOUBLE)) AS pmi
  FROM pairs p
  JOIN cf USING (term)
  CROSS JOIN tot
  CROSS JOIN (SELECT cf::DOUBLE AS tcf FROM cf WHERE term = '{target}') tcf
  WHERE p.left_n + p.right_n >= {min_count}
)
SELECT row_number() OVER (ORDER BY pmi DESC, term ASC) AS rank,
       term, cooc, left_n, right_n, cf, round(pmi, {SCORE_DECIMALS}) AS pmi
FROM scored
ORDER BY pmi DESC, term ASC
LIMIT {k}
"""


def paradigm_sql(word: str, text_expr: str = "text") -> str:
    """Mirror of fastmorph_spark.stem.paradigm."""
    from fastmorph_spark.stem import duckdb_stem, stem_py

    target = stem_py(word.lower())
    return f"""
WITH {_corpus_ctes(None, text_expr=text_expr).strip()},
dict AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
  FROM tf GROUP BY term
)
SELECT term, df, cf FROM dict
WHERE {duckdb_stem("term")} = '{target}'
ORDER BY cf DESC, term ASC
"""


def thesaurus_sql(target: str, window: int = 3, min_shared: int = 2,
                  k: int = 20) -> str:
    """Mirror of search.thesaurus.thesaurus — symmetric windowed pair
    counts (both orientations of the ordered-pair table summed), Dice
    sim (2.0 * shared) / (tmass + mass), rank over the unrounded sim."""
    from fastmorph_spark.oracles import _positions_cte

    return f"""
WITH {_positions_cte().strip()},
op AS (
  SELECT p.term AS a, q.term AS b, count(*)::BIGINT AS n
  FROM pos p JOIN pos q
    ON p.doc_id = q.doc_id
   AND q.pos - p.pos >= 1 AND q.pos - p.pos <= {window}
  WHERE p.term <> q.term
  GROUP BY p.term, q.term
),
prof AS (
  SELECT a, b, sum(n)::BIGINT AS n FROM (
    SELECT a, b, n FROM op UNION ALL SELECT b AS a, a AS b, n FROM op
  ) GROUP BY a, b
),
mass AS (SELECT a, sum(n)::BIGINT AS mass FROM prof GROUP BY a),
tgt AS (SELECT b, n FROM prof WHERE a = '{target}'),
tmass AS (SELECT mass::DOUBLE AS tmass FROM mass WHERE a = '{target}'),
shared AS (
  SELECT p.a, sum(least(p.n, t.n))::BIGINT AS shared
  FROM prof p JOIN tgt t USING (b)
  WHERE p.a <> '{target}'
  GROUP BY p.a
  HAVING sum(least(p.n, t.n)) >= {min_shared}
),
scored AS (
  SELECT s.a AS term, s.shared, m.mass,
         (2.0 * s.shared) / (tmass.tmass + m.mass::DOUBLE) AS sim
  FROM shared s JOIN mass m ON s.a = m.a CROSS JOIN tmass
)
SELECT row_number() OVER (ORDER BY sim DESC, term ASC) AS rank,
       term, shared, mass, round(sim, {SCORE_DECIMALS}) AS sim
FROM scored
ORDER BY sim DESC, term ASC
LIMIT {k}
"""


def sketch_diff_sql(target_a: str, target_b: str, window: int = 3,
                    min_count: int = 2, k: int = 20) -> str:
    """Mirror of search.collocation.sketch_diff — each side is the
    collocations_sql profile (same pinned PMI parenthesization and
    min_count), inner-joined on the collocate term; diff = pmi_a -
    pmi_b; rank over the unrounded diff."""
    from fastmorph_spark.oracles import _positions_cte

    def side(target: str, alias: str) -> str:
        return f"""
tpos_{alias} AS (SELECT doc_id, pos FROM pos WHERE term = '{target}'),
pairs_{alias} AS (
  SELECT p.term, count(*)::BIGINT AS cooc
  FROM pos p JOIN tpos_{alias} t
    ON p.doc_id = t.doc_id AND abs(p.pos - t.pos) <= {window}
  WHERE p.term <> '{target}'
  GROUP BY p.term
),
prof_{alias} AS (
  SELECT p.term, p.cooc,
         ln((p.cooc::DOUBLE * tot.total) / (tcf.tcf * cf.cf::DOUBLE)) AS pmi
  FROM pairs_{alias} p
  JOIN cf USING (term)
  CROSS JOIN tot
  CROSS JOIN (SELECT cf::DOUBLE AS tcf FROM cf WHERE term = '{target}') tcf
  WHERE p.cooc >= {min_count}
)"""

    return f"""
WITH {_positions_cte().strip()},
tot AS (SELECT count(*)::DOUBLE AS total FROM pos),
cf AS (SELECT term, count(*)::BIGINT AS cf FROM pos GROUP BY term),
{side(target_a, 'a').strip()},
{side(target_b, 'b').strip()},
joined AS (
  SELECT a.term, a.cooc AS cooc_a, b.cooc AS cooc_b,
         a.pmi AS pmi_a, b.pmi AS pmi_b, a.pmi - b.pmi AS diff
  FROM prof_a a JOIN prof_b b USING (term)
)
SELECT row_number() OVER (ORDER BY diff DESC, term ASC) AS rank,
       term, cooc_a, cooc_b,
       round(pmi_a, {SCORE_DECIMALS}) AS pmi_a,
       round(pmi_b, {SCORE_DECIMALS}) AS pmi_b,
       round(diff, {SCORE_DECIMALS}) AS diff
FROM joined
ORDER BY diff DESC, term ASC
LIMIT {k}
"""


def kwic_sorted_sql(slots: list, dists: list, match_len: int,
                    by: str = "right", n: int = 100,
                    width: int = 5) -> str:
    """Mirror of engine.kwic_sorted over engine.kwic's line set: binary
    string collation on the sort key (right_ctx, or the reversed left
    token sequence re-joined), the same total tie-break, rank
    materializing the order."""
    from fastmorph_spark.oracles import kwic_sql

    inner = kwic_sql(slots, dists, match_len, width).strip()
    if by == "right":
        key, tail = "right_ctx", "left_ctx"
    else:
        key = "array_to_string(list_reverse(string_split(left_ctx, ' ')), ' ')"
        tail = "right_ctx"
    return f"""
WITH lines AS ({inner})
SELECT row_number() OVER (
         ORDER BY {key} ASC, {tail} ASC, doc_id ASC, pos ASC) AS rank,
       doc_id, pos, left_ctx, keyword, right_ctx
FROM lines
ORDER BY {key} ASC, {tail} ASC, doc_id ASC, pos ASC
LIMIT {n}
"""


def lexdiv_sql(group_col: str = "lang") -> str:
    """Mirror of search.keyness.lexdiv — per-group type/token/hapax
    counts, ratios as single divisions of exact integers."""
    tok = TOK.format(col="text")
    return f"""
WITH tok AS (
  SELECT {group_col} AS grp, unnest({tok}) AS term FROM documents
),
per_term AS (
  SELECT grp, term, count(*)::BIGINT AS cnt FROM tok GROUP BY grp, term
)
SELECT grp AS {group_col},
       sum(cnt)::BIGINT AS tokens,
       count(*)::BIGINT AS types,
       round(count(*)::DOUBLE / sum(cnt)::DOUBLE, {SCORE_DECIMALS}) AS ttr,
       sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax,
       round(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::DOUBLE
             / sum(cnt)::DOUBLE, {SCORE_DECIMALS}) AS hapax_ratio
FROM per_term
GROUP BY grp
ORDER BY {group_col}
"""


def corpus_summary_sql() -> str:
    """Mirror of search.keyness.corpus_summary — whole-corpus summary
    card (served as the protocol's {"stats": true} form): doc count,
    token occurrences, distinct vocabulary, avg doc length. avgdl is ONE
    division of two exact integers, bit-equal across engines before
    SCORE_DECIMALS rounding."""
    tok = TOK.format(col="text")
    return f"""
WITH tok AS (
  SELECT unnest({tok}) AS term FROM documents
),
t AS (
  SELECT count(*)::BIGINT AS n_tokens, count(DISTINCT term)::BIGINT AS vocab
  FROM tok
),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
SELECT n.n_docs, t.n_tokens, t.vocab,
       round(t.n_tokens::DOUBLE / n.n_docs::DOUBLE, {SCORE_DECIMALS}) AS avgdl
FROM n, t
"""


def collocations_measures_sql(target: str, window: int = 3,
                              min_count: int = 2, k: int = 20) -> str:
    """Mirror of search.collocation.collocations_measures — the A8 pair
    counts with the three-measure panel. Pins (textual, float64):
    pmi = ln((cooc * total) / (tcf * cf));
    logdice = 14 + ln((2.0 * cooc) / (tcf + cf)) / ln(2);
    tscore = (cooc - (tcf * cf) / total) / sqrt(cooc);
    rank over the UNROUNDED logdice, order (logdice DESC, term ASC)."""
    from fastmorph_spark.oracles import _positions_cte
    return f"""
WITH {_positions_cte().strip()},
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
         ln((p.cooc::DOUBLE * tot.total) / (tcf.tcf * cf.cf::DOUBLE)) AS pmi,
         14 + ln((2.0 * p.cooc::DOUBLE) / (tcf.tcf + cf.cf::DOUBLE)) / ln(2) AS logdice,
         (p.cooc::DOUBLE - (tcf.tcf * cf.cf::DOUBLE) / tot.total)
           / sqrt(p.cooc::DOUBLE) AS tscore
  FROM pairs p
  JOIN cf USING (term)
  CROSS JOIN tot
  CROSS JOIN (SELECT cf::DOUBLE AS tcf FROM cf WHERE term = '{target}') tcf
  WHERE p.cooc >= {min_count}
)
SELECT row_number() OVER (ORDER BY logdice DESC, term ASC) AS rank,
       term, cooc, cf,
       round(pmi, {SCORE_DECIMALS}) AS pmi,
       round(logdice, {SCORE_DECIMALS}) AS logdice,
       round(tscore, {SCORE_DECIMALS}) AS tscore
FROM scored
ORDER BY logdice DESC, term ASC
LIMIT {k}
"""


def regex_terms_sql(pattern: str) -> str:
    """Mirror of search.regex.regex_terms — dictionary expansion of a
    validated, folded, anchored regex (same subset/anchoring pins as the
    Spark side; RE2 `regexp_matches` ≡ Java `rlike` on the subset)."""
    from fastmorph_spark.oracles import _corpus_ctes
    from fastmorph_spark.search.regex import duckdb_regex_cond
    return f"""
WITH {_corpus_ctes(None)}
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
FROM tf WHERE {duckdb_regex_cond('term', pattern)}
GROUP BY term ORDER BY df DESC, term ASC
"""


def freq_spectrum_sql() -> str:
    """Mirror of search.keyness.freq_spectrum — all-integer, no pins
    beyond the shared tokenizer."""
    tok = TOK.format(col="text")
    return f"""
WITH tok AS (
  SELECT unnest({tok}) AS term FROM documents
),
per_term AS (SELECT term, count(*)::BIGINT AS freq FROM tok GROUP BY term)
SELECT freq, count(*)::BIGINT AS n_types
FROM per_term GROUP BY freq ORDER BY freq
"""


def vocab_growth_sql(points: int = 10) -> str:
    """Mirror of search.keyness.vocab_growth — same integer bucket
    formula ((doc_id * points) // N + 1), same first-occurrence type
    attribution, same empty-bucket grid + cumulative sums."""
    tok = TOK.format(col="text")
    return f"""
WITH n AS (SELECT count(*)::BIGINT AS n FROM documents),
per_doc AS (
  SELECT ((doc_id * {int(points)}) // n.n) + 1 AS bucket,
         len({tok})::BIGINT AS n_toks
  FROM documents, n
),
b_doc AS (
  SELECT bucket, count(*)::BIGINT AS _docs, sum(n_toks)::BIGINT AS _tokens
  FROM per_doc GROUP BY bucket
),
first_occ AS (
  SELECT term, min(doc_id) AS doc_id
  FROM (SELECT doc_id, unnest({tok}) AS term FROM documents)
  GROUP BY term
),
b_type AS (
  SELECT ((doc_id * {int(points)}) // n.n) + 1 AS bucket,
         count(*)::BIGINT AS _types
  FROM first_occ, n GROUP BY bucket
),
grid AS (SELECT unnest(range(1, {int(points)} + 1))::BIGINT AS bucket)
SELECT grid.bucket,
       sum(coalesce(b_doc._docs, 0)) OVER w::BIGINT AS docs,
       sum(coalesce(b_doc._tokens, 0)) OVER w::BIGINT AS tokens,
       sum(coalesce(b_type._types, 0)) OVER w::BIGINT AS types
FROM grid
LEFT JOIN b_doc USING (bucket)
LEFT JOIN b_type USING (bucket)
WINDOW w AS (ORDER BY grid.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY grid.bucket
"""


def mwe_bigrams_sql(min_count: int = 5, k: int = 50) -> str:
    """Mirror of search.collocation.mwe_bigrams: adjacent-bigram logDice
    with the pinned ln/ln2 form and (logdice DESC, w1, w2) order."""
    tok = TOK.format(col="text")
    return f"""
WITH tokarr AS (SELECT {tok} AS toks FROM documents),
bi AS (
  SELECT unnest(toks[1:len(toks) - 1]) AS w1,
         unnest(toks[2:len(toks)]) AS w2
  FROM tokarr WHERE len(toks) >= 2
),
fxy AS (
  SELECT w1, w2, count(*)::BIGINT AS f_xy FROM bi GROUP BY w1, w2
  HAVING count(*) >= {int(min_count)}
),
uni AS (
  SELECT term, count(*)::BIGINT AS cf
  FROM (SELECT unnest(toks) AS term FROM tokarr) GROUP BY term
),
scored AS (
  SELECT f.w1, f.w2, f.f_xy, ux.cf AS f_x, uy.cf AS f_y,
         14 + ln((2 * f.f_xy::DOUBLE) / (ux.cf::DOUBLE + uy.cf::DOUBLE))
             / ln(2) AS logdice
  FROM fxy f
  JOIN uni ux ON f.w1 = ux.term
  JOIN uni uy ON f.w2 = uy.term
)
SELECT row_number() OVER (ORDER BY logdice DESC, w1 ASC, w2 ASC) AS rank,
       w1, w2, f_xy, f_x, f_y, round(logdice, {SCORE_DECIMALS}) AS logdice
FROM scored
ORDER BY logdice DESC, w1 ASC, w2 ASC
LIMIT {int(k)}
"""


def colloc_by_offset_sql(target: str, window: int = 3, min_count: int = 2,
                         k_per_offset: int = 5) -> str:
    """Mirror of search.collocation.colloc_by_offset: signed-offset
    pair counts (offset = p_neighbor - p_target), per-offset
    (cooc DESC, term ASC) top-k."""
    tok = TOK.format(col="text")
    return f"""
WITH tokarr AS (SELECT doc_id, {tok} AS toks FROM documents),
pos AS (
  SELECT doc_id, unnest(toks) AS term, unnest(range(len(toks)))::INT AS pos
  FROM tokarr
),
tp AS (SELECT doc_id, pos AS q FROM pos WHERE term = '{target}'),
counts AS (
  SELECT p.term, (p.pos - tp.q)::INT AS "offset", count(*)::BIGINT AS cooc
  FROM pos p JOIN tp ON p.doc_id = tp.doc_id
  WHERE p.term <> '{target}' AND abs(p.pos - tp.q) <= {int(window)}
  GROUP BY p.term, (p.pos - tp.q)
  HAVING count(*) >= {int(min_count)}
),
ranked AS (
  SELECT "offset",
         row_number() OVER (PARTITION BY "offset"
                            ORDER BY cooc DESC, term ASC) AS rank,
         term, cooc
  FROM counts
)
SELECT "offset", rank, term, cooc FROM ranked
WHERE rank <= {int(k_per_offset)}
ORDER BY "offset" ASC, rank ASC
"""


def doc_keywords_sql(m: int = 3) -> str:
    """Mirror of search.keyness.doc_keywords: per-doc top-m TF-IDF with
    the pinned tf * ln((N + 1) / (df + 1)) score."""
    tok = TOK.format(col="text")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({tok}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         tf.tf::DOUBLE * ln((n.n + 1.0) / (dfreq.df::DOUBLE + 1.0)) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rank,
         term, tf, df, tfidf
  FROM scored
)
SELECT doc_id, rank, term, tf, df, round(tfidf, {SCORE_DECIMALS}) AS tfidf
FROM ranked
WHERE rank <= {int(m)}
ORDER BY doc_id ASC, rank ASC
"""


def term_position_dist_sql(terms: list[str], bins: int = 10) -> str:
    """Mirror of search.keyness.term_position_dist: within-doc decile
    histogram, decile = floor((pos * bins) / dl) in float64."""
    tok = TOK.format(col="text")
    inlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH tokarr AS (SELECT {tok} AS toks FROM documents),
pos AS (
  SELECT len(toks)::BIGINT AS dl, unnest(toks) AS term,
         unnest(range(len(toks)))::BIGINT AS pos
  FROM tokarr
),
counts AS (
  SELECT term,
         CAST(floor((pos::DOUBLE * {float(bins)}) / dl) AS INT) AS decile,
         count(*)::BIGINT AS n_occ
  FROM pos WHERE term IN ({inlist})
  GROUP BY term, CAST(floor((pos::DOUBLE * {float(bins)}) / dl) AS INT)
)
SELECT term, decile, n_occ,
       round(n_occ::DOUBLE / sum(n_occ) OVER (PARTITION BY term)::DOUBLE,
             {SCORE_DECIMALS}) AS frac
FROM counts
ORDER BY term ASC, decile ASC
"""


def next_word_sql(target: str, min_count: int = 1, k: int = 20) -> str:
    """Mirror of search.collocation.next_word: adjacent-bigram
    continuations of the target, frac over ALL continuations."""
    tok = TOK.format(col="text")
    return f"""
WITH tokarr AS (SELECT {tok} AS toks FROM documents),
bi AS (
  SELECT unnest(toks[1:len(toks) - 1]) AS w1,
         unnest(toks[2:len(toks)]) AS w2
  FROM tokarr WHERE len(toks) >= 2
),
counts AS (
  SELECT w2, count(*)::BIGINT AS f_xy FROM bi
  WHERE w1 = '{target}' GROUP BY w2
),
tot AS (SELECT sum(f_xy)::DOUBLE AS tot FROM counts),
scored AS (
  SELECT w2, f_xy, f_xy::DOUBLE / tot.tot AS frac
  FROM counts CROSS JOIN tot
  WHERE f_xy >= {int(min_count)}
)
SELECT row_number() OVER (ORDER BY f_xy DESC, w2 ASC) AS rank,
       w2, f_xy, round(frac, {SCORE_DECIMALS}) AS frac
FROM scored
ORDER BY f_xy DESC, w2 ASC
LIMIT {int(k)}
"""


def dispersion_dp_sql(terms: list[str], parts: int = 8) -> str:
    """Mirror of search.keyness.dispersion_dp: Gries' DP with the
    absent-parts closed form dp = 0.5 * (1 + sum_present(|v-s| - s))."""
    tok = TOK.format(col="text")
    inlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH tokarr AS (SELECT doc_id % {int(parts)} AS part, {tok} AS toks
                FROM documents),
shares AS (
  SELECT part, sum(len(toks))::DOUBLE
           / (SELECT sum(len(toks))::DOUBLE FROM tokarr) AS s
  FROM tokarr GROUP BY part
),
per_part AS (
  SELECT term, part, count(*)::DOUBLE AS n
  FROM (SELECT part, unnest(toks) AS term FROM tokarr)
  WHERE term IN ({inlist})
  GROUP BY term, part
),
scored AS (
  SELECT p.term, p.n,
         sum(p.n) OVER (PARTITION BY p.term) AS cf,
         abs(p.n / sum(p.n) OVER (PARTITION BY p.term) - sh.s) - sh.s
           AS term_contrib
  FROM per_part p JOIN shares sh USING (part)
)
SELECT term, cf::BIGINT AS cf, count(*)::BIGINT AS range_parts,
       round(0.5 * (1.0 + sum(term_contrib)), {SCORE_DECIMALS}) AS dp
FROM scored
GROUP BY term, cf
ORDER BY term
"""


def kwic_gdex_sql(slots: list, dists: list, match_len: int,
                  width: int = 5, n: int = 100,
                  target_len: int = 20) -> str:
    """Mirror of engine.kwic_gdex: GDEX-style best-example ranking —
    score = ln(1.0 + min_cf) - abs(dl - target) / target over the kwic
    line set, min_cf = rarest context-token corpus frequency (0 for an
    empty context)."""
    from fastmorph_spark.oracles import TOK, slot_search_sql

    inner = slot_search_sql(slots, dists).strip()
    tok = TOK.format(col="text")
    t = float(target_len)
    return f"""
WITH m AS ({inner}),
occ AS (
  SELECT doc_id, unnest(string_split(match_starts, ','))::INT AS pos FROM m
),
tk AS (SELECT doc_id, {tok} AS toks FROM documents),
cf AS (
  SELECT term, count(*)::BIGINT AS cf
  FROM (SELECT unnest(toks) AS term FROM tk) GROUP BY term
),
lines AS (
  SELECT occ.doc_id, occ.pos::BIGINT AS pos, len(toks)::BIGINT AS dl,
         list_concat(
           toks[greatest(occ.pos + 1 - {int(width)}, 1):occ.pos],
           toks[occ.pos + 1 + {int(match_len)}:
                least(occ.pos + {int(match_len)} + {int(width)}, len(toks))]
         ) AS ctx,
         coalesce(array_to_string(
           toks[greatest(occ.pos + 1 - {int(width)}, 1):occ.pos], ' '), '')
           AS left_ctx,
         array_to_string(
           toks[occ.pos + 1:occ.pos + {int(match_len)}], ' ') AS keyword,
         coalesce(array_to_string(
           toks[occ.pos + 1 + {int(match_len)}:
                least(occ.pos + {int(match_len)} + {int(width)}, len(toks))],
           ' '), '') AS right_ctx
  FROM occ JOIN tk ON occ.doc_id = tk.doc_id
),
mins AS (
  SELECT doc_id, pos, min(cf.cf)::BIGINT AS min_cf
  FROM (SELECT doc_id, pos, unnest(ctx) AS term FROM lines) c
  JOIN cf USING (term)
  GROUP BY doc_id, pos
),
scored AS (
  SELECT l.doc_id, l.pos, coalesce(m2.min_cf, 0)::BIGINT AS min_cf, l.dl,
         ln(1.0 + coalesce(m2.min_cf, 0)::DOUBLE)
           - abs(l.dl::DOUBLE - {t}) / {t} AS score,
         l.left_ctx, l.keyword, l.right_ctx
  FROM lines l LEFT JOIN mins m2 ON l.doc_id = m2.doc_id AND l.pos = m2.pos
)
SELECT row_number() OVER (
         ORDER BY score DESC, doc_id ASC, pos ASC) AS rank,
       doc_id, pos, min_cf, dl, round(score, {SCORE_DECIMALS}) AS score,
       left_ctx, keyword, right_ctx
FROM scored
ORDER BY score DESC, doc_id ASC, pos ASC
LIMIT {int(n)}
"""


def freq_by_attr_sql(attr: str = "word", k: int = 100,
                     min_count: int = 1) -> str:
    """Mirror of search.keyness.freq_by_attr: the frequency tab's
    group-by-attribute list. The key expression reuses the SAME pinned
    SQL fragments the slot oracles match on (stem.duckdb_stem,
    tags.duckdb_tag), so a drift between matcher and frequency view is
    impossible by construction."""
    if attr == "word":
        key = "term"
    elif attr == "stem":
        from fastmorph_spark.stem import duckdb_stem

        key = duckdb_stem("term")
    elif attr == "tag":
        from fastmorph_spark.tags import duckdb_tag

        key = duckdb_tag("term")
    else:
        raise ValueError(f"attr must be word|stem|tag, got {attr!r}")
    tok = TOK.format(col="text")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({tok}) AS term FROM documents
),
keyed AS (
  SELECT doc_id, {key} AS key FROM tok
),
total AS (
  SELECT count(*)::DOUBLE AS total FROM keyed
),
counts AS (
  SELECT key, count(*)::BIGINT AS count,
         count(DISTINCT doc_id)::BIGINT AS df
  FROM keyed GROUP BY key
  HAVING count(*) >= {min_count}
)
SELECT row_number() OVER (ORDER BY count DESC, key ASC) AS rank,
       key, count, df,
       round(count * 1000000.0 / total, {SCORE_DECIMALS}) AS ipm
FROM counts CROSS JOIN total
ORDER BY count DESC, key ASC
LIMIT {k}
"""


def expanded_bm25_sql(query_text: str, n_expand: int = 3, window: int = 3,
                      min_shared: int = 2, k: int = 10) -> str:
    """Mirror of search.expand.expanded_bm25: per query term the
    thesaurus top-n neighbor terms (thesaurus_sql's pinned profile /
    Dice / (sim DESC, term ASC) cut), UNION-deduplicated with the
    original terms, then oracles.bm25_topk_sql's exact scoring body.
    tf/dl/gs are rebuilt from the SAME pos CTE (identical tokens), dl as
    the token-array length (0 for empty docs — the A3 pin)."""
    from fastmorph_spark.constants import BM25_B, BM25_K1
    from fastmorph_spark.oracles import _positions_cte

    k1, b = BM25_K1, BM25_B
    terms = sorted(set(tokenize_py(query_text)))
    values = ", ".join("('" + t + "')" for t in terms)
    per_term, selects = [], [f"SELECT term FROM (VALUES {values}) vq(term)"]
    for i, t in enumerate(terms):
        per_term.append(f"""
tgt{i} AS (SELECT b, n FROM prof WHERE a = '{t}'),
tm{i} AS (SELECT mass::DOUBLE AS tmass FROM mass WHERE a = '{t}'),
sh{i} AS (
  SELECT p.a, sum(least(p.n, t.n))::BIGINT AS shared
  FROM prof p JOIN tgt{i} t USING (b)
  WHERE p.a <> '{t}'
  GROUP BY p.a
  HAVING sum(least(p.n, t.n)) >= {min_shared}
),
exp{i} AS (
  SELECT s.a AS term
  FROM sh{i} s JOIN mass m ON s.a = m.a CROSS JOIN tm{i}
  ORDER BY (2.0 * s.shared) / (tm{i}.tmass + m.mass::DOUBLE) DESC, s.a ASC
  LIMIT {n_expand}
)""")
        selects.append(f"SELECT term FROM exp{i}")
    q_union = " UNION ".join(selects)
    return f"""
WITH {_positions_cte().strip()},
op AS (
  SELECT p.term AS a, q.term AS b, count(*)::BIGINT AS n
  FROM pos p JOIN pos q
    ON p.doc_id = q.doc_id
   AND q.pos - p.pos >= 1 AND q.pos - p.pos <= {window}
  WHERE p.term <> q.term
  GROUP BY p.term, q.term
),
prof AS (
  SELECT a, b, sum(n)::BIGINT AS n FROM (
    SELECT a, b, n FROM op UNION ALL SELECT b AS a, a AS b, n FROM op
  ) GROUP BY a, b
),
mass AS (SELECT a, sum(n)::BIGINT AS mass FROM prof GROUP BY a),
{",".join(per_term)},
q AS ({q_union}),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM pos GROUP BY doc_id, term),
dl AS (SELECT doc_id, coalesce(len(toks), 0)::BIGINT AS dl FROM tokarr),
gs AS (SELECT count(*)::BIGINT AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
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


def parallel_search_sql(slots: list, dists: list, match_len: int,
                        width: int, mod: int, offset: int) -> str:
    """Mirror of search.parallel.parallel_search over the registry's
    deterministic parallel fixture: the SOURCE side is the ``doc_id %
    mod = 0`` slice of documents, the aligned target segment is the
    reversed token stream with each token prefixed ``tr_`` at ``doc_id
    + offset`` (both engines derive it from the same pinned tokenizer,
    the slot_case fixture convention), and the alignment relation is
    (pair_id = src doc_id, src_id, tgt_id = src + offset).

    The node query (slot_search_sql) runs over the SOURCE side only —
    the ``pos`` CTE filters before tokenizing, matching the Spark path
    whose postings are built from the source frame; a term present only
    in target segments (every ``tr_``-prefixed form) is unmatchable by
    construction, which the tests pin.  array_to_string over an empty
    list is NULL in DuckDB but '' in Spark's concat_ws — every joined
    string is coalesced."""
    from fastmorph_spark.oracles import TOK_CS, slot_search_sql

    intro = f"""docs AS (SELECT doc_id, text FROM documents WHERE doc_id % {mod} = 0),
tokarr AS (SELECT doc_id, {TOK.format(col="text")} AS toks, {TOK_CS.format(col="text")} AS toks_cs FROM docs),
pos AS (
  SELECT doc_id, unnest(toks) AS term, unnest(toks_cs) AS term_cs,
         unnest(range(len(toks)))::INT AS pos
  FROM tokarr
)"""
    inner = slot_search_sql(slots, dists, pos_cte=intro).strip()
    return f"""
WITH m AS ({inner}),
occ AS (SELECT doc_id, unnest(string_split(match_starts, ','))::INT AS pos FROM m),
tk AS (SELECT doc_id, {TOK.format(col="text")} AS toks FROM documents WHERE doc_id % {mod} = 0),
j AS (SELECT occ.doc_id, occ.pos, tk.toks FROM occ JOIN tk ON occ.doc_id = tk.doc_id),
tgt AS (
  SELECT doc_id AS pair_id, doc_id + {offset} AS tgt_id,
         coalesce(array_to_string(list_transform(list_reverse(toks), x -> 'tr_' || x), ' '), '') AS tgt_text
  FROM tk
)
SELECT tgt.pair_id, j.doc_id, j.pos::BIGINT AS pos,
       coalesce(array_to_string(j.toks[greatest(j.pos + 1 - {width}, 1):j.pos], ' '), '') AS left_ctx,
       array_to_string(j.toks[j.pos + 1:j.pos + {match_len}], ' ') AS keyword,
       coalesce(array_to_string(
         j.toks[j.pos + 1 + {match_len}:least(j.pos + {match_len} + {width}, len(j.toks))], ' '
       ), '') AS right_ctx,
       tgt.tgt_id, tgt.tgt_text
FROM j JOIN tgt ON j.doc_id = tgt.pair_id
ORDER BY j.doc_id, j.pos
"""
