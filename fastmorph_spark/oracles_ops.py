"""DuckDB oracle SQL for the training-data operators (ops/*).

Mirrors fastmorph_spark.ops semantics exactly: same tokenizer fragment,
same md5-based hash families, same rounding, same tie-breaks.
"""

from __future__ import annotations

from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.oracles import TOK
from fastmorph_spark.ops.text import LANG_STOPWORDS

R = SCORE_DECIMALS

_TOKS = TOK.format(col="text")


def _shingles_cte(n: int) -> str:
    """docs -> (doc_id, shingle) distinct word n-grams."""
    return f"""
docs AS (SELECT doc_id, text FROM documents),
tokarr AS (SELECT doc_id, {_TOKS} AS t FROM docs),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(len(t) - {n} + 1), i -> array_to_string(t[i+1:i+{n}], ' '))
  )) AS shingle
  FROM tokarr WHERE len(t) >= {n}
)"""


def exact_duplicates_sql(src: str = "documents") -> str:
    """Mirror of ops.dedup.exact_duplicates: one bounded row per group
    (group_rep = min doc_id), no per-group arrays. ``src`` lets the
    registry substitute a derived corpus (e.g. the deterministic
    dup-augmented one) so the check is non-vacuous at the driver's sf."""
    return f"""
SELECT sha256(text) AS content_sha256,
       count(*)::BIGINT AS dup_count,
       min(doc_id)::BIGINT AS group_rep
FROM {src} AS documents
GROUP BY sha256(text)
HAVING count(*) > 1
"""


def token_count_sql() -> str:
    return f"""
SELECT doc_id,
       len({_TOKS})::BIGINT AS n_tokens,
       len(list_distinct({_TOKS}))::BIGINT AS n_distinct,
       length(text)::BIGINT AS n_chars_engine
FROM documents
"""


def quality_score_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    return f"""
WITH base AS (
  SELECT doc_id,
         {_TOKS} AS t,
         length(text)::DOUBLE AS n_chars,
         length(regexp_replace(text, '[^a-zA-Z0-9_]', '', 'g'))::DOUBLE AS alpha_chars
  FROM documents
),
feat AS (
  SELECT doc_id,
         len(t)::DOUBLE AS n_tok,
         alpha_chars, n_chars,
         len(list_filter(t, x -> list_contains([{stop}], x)))::DOUBLE AS n_stop,
         len(list_distinct(t))::DOUBLE AS n_dist
  FROM base
)
SELECT doc_id,
       round(CASE WHEN n_tok > 0 THEN alpha_chars / n_tok ELSE 0.0 END, {R}) AS mean_token_len,
       round(CASE WHEN n_chars > 0 THEN alpha_chars / n_chars ELSE 0.0 END, {R}) AS alpha_ratio,
       round(CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END, {R}) AS stopword_ratio,
       round(CASE WHEN n_tok > 0 THEN n_dist / n_tok ELSE 0.0 END, {R}) AS distinct_ratio,
       round((least(CASE WHEN n_tok > 0 THEN alpha_chars / n_tok ELSE 0.0 END / 8.0, 1.0)
              + CASE WHEN n_chars > 0 THEN alpha_chars / n_chars ELSE 0.0 END
              + CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END
              + CASE WHEN n_tok > 0 THEN n_dist / n_tok ELSE 0.0 END) / 4.0, {R}) AS quality
FROM feat
"""


def lang_id_sql() -> str:
    langs = sorted(LANG_STOPWORDS)
    vote_cols = []
    for lang in langs:
        stop = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        vote_cols.append(
            f"len(list_filter(t, x -> list_contains([{stop}], x)))::BIGINT AS v_{lang}"
        )
    votes_sql = ",\n         ".join(vote_cols)
    unions = " UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS lang, v_{lang} AS v FROM votes" for lang in langs
    )
    return f"""
WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
votes AS (
  SELECT doc_id,
         {votes_sql}
  FROM base
),
long_v AS ({unions}),
ranked AS (
  SELECT doc_id, lang, v,
         row_number() OVER (PARTITION BY doc_id ORDER BY v DESC, lang ASC) AS rn
  FROM long_v
)
SELECT doc_id,
       CASE WHEN v > 0 THEN lang ELSE 'und' END AS lang_pred,
       v AS votes
FROM ranked WHERE rn = 1
"""


def fingerprint_sql(n: int = 5, keep: int = 4) -> str:
    return f"""
WITH docs AS (SELECT doc_id, text FROM documents),
tokarr AS (SELECT doc_id, {_TOKS} AS t FROM docs),
h AS (
  SELECT doc_id,
         list_sort(list_distinct(
           list_transform(range(len(t) - {n} + 1),
                          i -> md5(array_to_string(t[i+1:i+{n}], ' ')))
         )) AS hs
  FROM tokarr WHERE len(t) >= {n}
)
SELECT doc_id, array_to_string(hs[1:{keep}], '|') AS fingerprint FROM h
"""


def exact_duplicate_members_sql(src: str = "documents") -> str:
    """Mirror of ops.dedup.exact_duplicate_members: groups (bounded rows)
    hash-joined back to the corpus for exploded membership."""
    return f"""
WITH g AS (
  SELECT sha256(text) AS content_sha256, min(doc_id)::BIGINT AS group_rep
  FROM {src} AS documents GROUP BY sha256(text) HAVING count(*) > 1
)
SELECT d.doc_id::BIGINT AS doc_id, g.content_sha256, g.group_rep
FROM {src} AS d JOIN g ON sha256(d.text) = g.content_sha256
"""


def ngram_jaccard_pairs_sql(n: int = 3, threshold: float = 0.8,
                            shingle_df_cap: int | None = 5000) -> str:
    cap_cte = ""
    src = "sh"
    if shingle_df_cap is not None:
        cap_cte = f"""
shc AS (
  SELECT sh.doc_id, sh.shingle FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {shingle_df_cap}) ok
  USING (shingle)
),"""
        src = "shc"
    return f"""
WITH {_shingles_cte(n)},{cap_cte}
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM {src} GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
  FROM {src} a JOIN {src} b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common), {R}) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) >= {threshold}
"""


def minhash_lsh_pairs_sql(n: int = 3, num_hashes: int = 16, bands: int = 4,
                          threshold: float = 0.5) -> str:
    r = num_hashes // bands
    min_cols = ",\n         ".join(
        f"min(md5('{i}_' || shingle)) AS h{i}" for i in range(num_hashes)
    )
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, ".format(b=bi)
        + " || '|' || ".join(f"h{bi * r + j}" for j in range(r))
        + " AS key FROM sigs"
        for bi in range(bands)
    )
    return f"""
WITH {_shingles_cte(n)},
sigs AS (
  SELECT doc_id,
         {min_cols}
  FROM sh GROUP BY doc_id
),
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS n_common
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       round(n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common), {R}) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) >= {threshold}
"""


def simhash_sql(n: int = 2, bits: int = 60) -> str:
    votes = ",\n         ".join(
        f"sum(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    total = " + ".join(f"(CASE WHEN v{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(bits))
    return f"""
WITH {_shingles_cte(n)},
hh AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM hh GROUP BY doc_id
)
SELECT doc_id, ({total})::BIGINT AS simhash FROM votes
"""


def simhash_neardup_sql(n: int = 2, max_hamming: int = 8) -> str:
    """Brute-force pairs within the Hamming radius — the banded Spark path
    is exhaustive by the pigeonhole argument, so results must be equal."""
    inner = simhash_sql(n).strip()
    return f"""
WITH sims AS ({inner})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def cosine_neardup_sql(threshold: float) -> str:
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), {R}) AS cos
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e)
      / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= {threshold}
"""


def _plane_lit(plane) -> str:
    return "[" + ", ".join(repr(float(x)) for x in plane) + "]::DOUBLE[]"


def _band_key_sql(planes, bi: int, r: int, vec: str = "e") -> str:
    terms = []
    for j in range(r):
        p = planes[bi * r + j]
        terms.append(
            f"(CASE WHEN list_dot_product({vec}, {_plane_lit(p)}) >= 0 THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(terms)


def cosine_neardup_banded_sql(threshold: float, bands: int, planes_per_band: int,
                              planes) -> str:
    """Mirror of ops.similarity.cosine_neardup_pairs: same banded LSH
    candidate generation (plane literals rendered from the same
    deterministic md5 family), same exact-cosine verify."""
    band_rows = " UNION ALL ".join(
        f"SELECT vec_id, e, {bi} AS band, ({_band_key_sql(planes, bi, planes_per_band)}) AS key FROM v"
        for bi in range(bands)
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
bk AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
),
vv AS (SELECT vec_id, e FROM v)
SELECT c.vec_a, c.vec_b,
       round(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), {R}) AS cos
FROM cand c JOIN vv a ON a.vec_id = c.vec_a JOIN vv b ON b.vec_id = c.vec_b
WHERE list_dot_product(a.e, b.e)
      / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= {threshold}
"""


def _bucket_sql(planes, vec: str = "e") -> str:
    terms = [
        f"(CASE WHEN list_dot_product({vec}, {_plane_lit(planes[p])}) >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(len(planes))
    ]
    return " + ".join(terms)


def lsh_topk_sql(query_vec: list[float], k: int, planes, probes: list[int]) -> str:
    """Mirror of ops.similarity.lsh_bucketed_topk: same plane literals,
    same multi-probe bucket set, exact top-k within it."""
    qs = ", ".join(repr(float(x)) for x in query_vec)
    inlist = ", ".join(str(b) for b in probes)
    return f"""
WITH q AS (SELECT [{qs}]::DOUBLE[] AS qv),
v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
b AS (SELECT vec_id, e, ({_bucket_sql(planes)}) AS bucket FROM v),
scored AS (
  SELECT vec_id,
         list_dot_product(e, qv) / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qv, qv))) AS cos
  FROM b, q WHERE bucket IN ({inlist})
)
SELECT row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank,
       vec_id, round(cos, {R}) AS cos
FROM scored
ORDER BY cos DESC, vec_id ASC
LIMIT {k}
"""


def lsh_recall_sql(query_vec: list[float], k: int, planes, probes: list[int]) -> str:
    """recall@k of the multi-probe LSH top-k vs the exact top-k."""
    exact = cosine_topk_sql(query_vec, k).strip()
    approx = lsh_topk_sql(query_vec, k, planes, probes).strip()
    return f"""
WITH ex AS ({exact}),
ap AS ({approx}),
hits AS (SELECT ex.vec_id FROM ex JOIN ap ON ex.vec_id = ap.vec_id)
SELECT {k}::BIGINT AS k, count(*)::BIGINT AS n_hits,
       round(count(*) / {float(k)}, {R}) AS recall
FROM hits
"""


def cosine_topk_sql(query_vec: list[float], k: int = 10) -> str:
    qs = ", ".join(repr(float(x)) for x in query_vec)
    return f"""
WITH q AS (SELECT [{qs}]::DOUBLE[] AS qv),
scored AS (
  SELECT vec_id,
         list_dot_product(embedding::DOUBLE[], qv)
           / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
              * sqrt(list_dot_product(qv, qv))) AS cos
  FROM embeddings, q
)
SELECT row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank,
       vec_id, round(cos, {R}) AS cos
FROM scored
ORDER BY cos DESC, vec_id ASC
LIMIT {k}
"""


def _components_ctes(n: int, num_hashes: int, bands: int, threshold: float) -> str:
    """CTE chain (after WITH RECURSIVE): MinHash-LSH pairs -> symmetrized
    edges -> transitive closure `reach(a, b)` — the recursive fixture-scale
    twin of the engine's iterative min-label propagation."""
    inner = minhash_lsh_pairs_sql(n, num_hashes, bands, threshold).strip()
    return f"""pairs AS ({inner}),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
)"""


def dup_groups_sql(n: int = 3, num_hashes: int = 16, bands: int = 4,
                   threshold: float = 0.5) -> str:
    """Mirror of ops.dedup.dup_groups over minhash_lsh_pairs: connected
    components as min-reachable doc_id."""
    return f"""
WITH RECURSIVE {_components_ctes(n, num_hashes, bands, threshold)}
SELECT a AS doc_id, least(a, min(b))::BIGINT AS group_rep
FROM reach GROUP BY a ORDER BY doc_id
"""


def drop_list_sql(n: int = 3, num_hashes: int = 16, bands: int = 4,
                  threshold: float = 0.5) -> str:
    """Mirror of ops.dedup.drop_list: exact-dup drops (keep min doc_id per
    sha256 group) + near-dup component drops (keep group_rep), 'exact'
    taking precedence."""
    return f"""
WITH RECURSIVE {_components_ctes(n, num_hashes, bands, threshold)},
comp AS (
  SELECT a AS doc_id, least(a, min(b))::BIGINT AS group_rep
  FROM reach GROUP BY a
),
ex_drop AS (
  SELECT doc_id FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY sha256(text)) AS keep,
           count(*) OVER (PARTITION BY sha256(text)) AS dc
    FROM documents
  ) WHERE dc > 1 AND doc_id <> keep
),
near_drop AS (
  SELECT doc_id FROM comp WHERE doc_id <> group_rep
)
SELECT doc_id, 'exact' AS reason FROM ex_drop
UNION ALL
SELECT doc_id, 'near' AS reason FROM near_drop
WHERE doc_id NOT IN (SELECT doc_id FROM ex_drop)
ORDER BY doc_id
"""


def sample_hash_sql(rate: float) -> str:
    """Mirror of ops.text.sample_hash."""
    cut = int(rate * (1 << 32))
    return f"""
SELECT doc_id FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT < {cut}
ORDER BY doc_id
"""


def pack_shards_sql(budget_tokens: int) -> str:
    """Mirror of ops.text.pack_shards (the window form — the engine's
    two-phase cumsum computes the identical exclusive prefix sum)."""
    return f"""
WITH t AS (SELECT doc_id, len({_TOKS})::BIGINT AS n FROM documents)
SELECT doc_id, n AS n_tokens,
       floor((sum(n) OVER (ORDER BY doc_id) - n) / {budget_tokens})::BIGINT AS shard_id
FROM t ORDER BY doc_id
"""


def benchmark_contamination_sql(n: int = 8, min_hits: int = 1,
                                corpus_where: str = "TRUE",
                                bench_where: str = "TRUE") -> str:
    """Mirror of ops.decontam.benchmark_contamination over a corpus/
    benchmark split of the documents table (the driver query splits on
    doc_id % 37 so the check is self-contained and deterministic)."""
    sh = (f"SELECT doc_id, unnest(list_distinct(list_transform("
          f"range(len(t) - {n} + 1), "
          f"i -> array_to_string(t[i+1:i+{n}], ' ')))) AS shingle "
          f"FROM tok{{side}} WHERE len(t) >= {n}")
    return f"""
WITH tokc AS (SELECT doc_id, {_TOKS} AS t FROM documents WHERE {corpus_where}),
tokb AS (SELECT doc_id, {_TOKS} AS t FROM documents WHERE {bench_where}),
csh AS ({sh.format(side="c")}),
bsh AS (SELECT DISTINCT shingle FROM ({sh.format(side="b")})),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_shingles FROM csh GROUP BY doc_id),
hits AS (
  SELECT doc_id, count(*)::BIGINT AS n_contaminated
  FROM csh SEMI JOIN bsh USING (shingle)
  GROUP BY doc_id HAVING count(*) >= {min_hits}
)
SELECT hits.doc_id, sizes.n_shingles, hits.n_contaminated,
       round(hits.n_contaminated::DOUBLE / sizes.n_shingles, {R}) AS overlap_frac
FROM hits JOIN sizes ON hits.doc_id = sizes.doc_id
"""


def ngram_freq_sql(n: int = 2, k: int = 100, min_count: int = 2) -> str:
    """Mirror of ops.text.ngram_freq (occurrence counts, not
    distinct-per-doc; (count DESC, ngram ASC) total order)."""
    return f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
g AS (
  SELECT doc_id, unnest(list_transform(range(len(t) - {n} + 1),
                 i -> array_to_string(t[i+1:i+{n}], ' '))) AS ngram
  FROM tok WHERE len(t) >= {n}
),
agg AS (
  SELECT ngram, count(*)::BIGINT AS count, count(DISTINCT doc_id)::BIGINT AS df
  FROM g GROUP BY ngram HAVING count(*) >= {min_count}
)
SELECT row_number() OVER (ORDER BY count DESC, ngram)::BIGINT AS rank,
       ngram, count, df
FROM agg ORDER BY count DESC, ngram LIMIT {k}
"""


def pipeline_drop_list_sql(dedup_n: int = 3, num_hashes: int = 16,
                           bands: int = 4, threshold: float = 0.5,
                           contam_n: int = 8, min_frac: float = 0.05,
                           bench_where: str = "TRUE",
                           span_tokens: int | None = None) -> str:
    """Mirror of ops.decontam.pipeline_drop_list: dedup drop list union
    contamination drops (>= min_frac vs the bench_where slice), dedup
    reasons taking precedence; ``span_tokens`` adds the doc-level
    'span_dup' rollup (weakest precedence) of the span drop list."""
    dd = drop_list_sql(dedup_n, num_hashes, bands, threshold).strip()
    c = benchmark_contamination_sql(contam_n, 1, "TRUE", bench_where).strip()
    base = f"""
WITH dd AS ({dd}),
c AS ({c}),
base AS (
  SELECT doc_id, reason FROM dd
  UNION ALL
  SELECT c.doc_id, 'contaminated' AS reason FROM c
  WHERE c.overlap_frac >= {min_frac}
    AND c.doc_id NOT IN (SELECT doc_id FROM dd)
)"""
    if span_tokens is None:
        return base + "\nSELECT doc_id, reason FROM base ORDER BY doc_id\n"
    sp = span_drop_list_sql(span_tokens).strip()
    return base + f""",
sp AS (SELECT DISTINCT doc_id FROM ({sp}) t)
SELECT doc_id, reason FROM base
UNION ALL
SELECT sp.doc_id, 'span_dup' AS reason FROM sp
WHERE sp.doc_id NOT IN (SELECT doc_id FROM base)
ORDER BY doc_id
"""


# ---- sub-document (span-level) dedup (VERDICT r04 #7) -----------------


def _spans_cte(span_tokens: int, src: str = "documents") -> str:
    """docs -> (doc_id, span_idx, span_key): fixed token windows keyed by
    md5 of the space-joined span text — mirrors ops.dedup.doc_spans
    (stride = width, trailing partial dropped, same md5-family key)."""
    w = span_tokens
    return f"""
tokarr AS (SELECT doc_id, {_TOKS} AS t FROM {src} AS documents),
spans AS (
  SELECT doc_id,
         unnest(range(len(t) // {w}))::BIGINT AS span_idx,
         unnest(list_transform(range(len(t) // {w}),
                i -> md5(array_to_string(t[i*{w}+1:i*{w}+{w}], ' ')))) AS span_key
  FROM tokarr WHERE len(t) >= {w}
)"""


def span_duplicates_sql(span_tokens: int, src: str = "documents") -> str:
    """Mirror of ops.dedup.span_duplicates."""
    return f"""
WITH {_spans_cte(span_tokens, src)},
per AS (
  SELECT span_key, count(DISTINCT doc_id)::BIGINT AS n_docs
  FROM spans GROUP BY span_key HAVING count(DISTINCT doc_id) >= 2
)
SELECT s.doc_id, s.span_idx, s.span_key, per.n_docs
FROM spans s JOIN per USING (span_key)
ORDER BY doc_id, span_idx
"""


def span_drop_list_sql(span_tokens: int, src: str = "documents") -> str:
    """Mirror of ops.dedup.span_drop_list (canonical doc = min doc_id)."""
    return f"""
WITH {_spans_cte(span_tokens, src)},
per AS (
  SELECT span_key, count(DISTINCT doc_id)::BIGINT AS n_docs,
         min(doc_id) AS span_rep
  FROM spans GROUP BY span_key HAVING count(DISTINCT doc_id) >= 2
)
SELECT s.doc_id, s.span_idx, 'span_dup' AS reason
FROM spans s JOIN per USING (span_key)
WHERE s.doc_id <> per.span_rep
ORDER BY doc_id, span_idx
"""


# ---- pinned deterministic BPE token counts (VERDICT r04 #8) ------------


def _bpe_chain_sql(var: str) -> str:
    """The pinned merge chain as nested replace() calls over ``var`` —
    generated from the SAME ops.text.BPE_MERGES table the engine uses
    (two passes per rule, space-wrapped exact-symbol semantics)."""
    from fastmorph_spark.ops.text import BPE_MERGES

    s = var
    for a, b in BPE_MERGES:
        pat, rep = f"' {a} {b} '", f"' {a}{b} '"
        s = f"replace(replace({s}, {pat}, {rep}), {pat}, {rep})"
    return s


def token_count_bpe_sql(src: str = "documents") -> str:
    """Mirror of ops.text.token_count_bpe."""
    chain = _bpe_chain_sql("s")
    return f"""
WITH tokarr AS (SELECT doc_id, {_TOKS} AS t FROM {src} AS documents),
spaced AS (
  SELECT doc_id, t,
         ' ' || regexp_replace(array_to_string(t, '|'), '(.)', '\\1 ', 'g') AS s
  FROM tokarr
)
SELECT doc_id,
       len(t)::BIGINT AS n_tokens,
       CASE WHEN len(t) = 0 THEN 0
            ELSE len(list_filter(string_split(trim({chain}), ' '),
                                 x -> x <> '|'))
       END::BIGINT AS n_bpe
FROM spaced
ORDER BY doc_id
"""


def pack_shards_bpe_sql(budget_tokens: int) -> str:
    """pack_shards over BPE counts (counts= integration): identical
    exclusive-prefix-sum semantics, budget unit = n_bpe."""
    bpe = token_count_bpe_sql().strip()
    return f"""
WITH c AS ({bpe})
SELECT doc_id, n_bpe AS n_tokens,
       floor((sum(n_bpe) OVER (ORDER BY doc_id) - n_bpe) / {budget_tokens})::BIGINT AS shard_id
FROM c ORDER BY doc_id
"""


# ---- repetition + PII quality filters (ops/quality.py) -----------------


def line_repetition_sql(src: str = "documents") -> str:
    """Mirror of ops.quality.line_repetition: non-empty newline-split
    lines; dup fractions over occurrence counts and character mass;
    docs with zero non-empty lines emit no row. ``src`` lets the
    registry substitute the deterministically line-structured derived
    corpus (the dedup-augmentation discipline: the raw fixture has no
    newlines, so the raw query would be vacuous)."""
    return f"""
WITH lines AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, chr(10)),
                            l -> length(l) > 0)) AS line
  FROM {src} AS documents
),
c AS (
  SELECT doc_id, line, count(*)::BIGINT AS cnt,
         length(line)::BIGINT AS chars
  FROM lines GROUP BY doc_id, line
),
agg AS (
  SELECT doc_id,
         sum(cnt)::BIGINT AS n_lines,
         count(*)::BIGINT AS n_distinct_lines,
         sum((cnt - 1) * chars) AS dup_chars,
         sum(cnt * chars) AS all_chars
  FROM c GROUP BY doc_id
)
SELECT doc_id, n_lines, n_distinct_lines,
       round((n_lines - n_distinct_lines)::DOUBLE / n_lines, {R}) AS dup_line_frac,
       round(dup_chars::DOUBLE / all_chars, {R}) AS dup_line_char_frac
FROM agg ORDER BY doc_id
"""


def top_ngram_repetition_sql(ns: tuple[int, ...] = (2, 3),
                             src: str = "documents") -> str:
    """Mirror of ops.quality.top_ngram_repetition: per (doc, n) the
    (count DESC, ngram ASC) winner and its character-mass fraction of
    all n-gram occurrences; docs shorter than n tokens contribute no
    row for that n."""
    branches = " UNION ALL ".join(
        f"SELECT doc_id, {n} AS n, "
        f"unnest(list_transform(range(len(t) - {n} + 1), "
        f"i -> array_to_string(t[i+1:i+{n}], ' '))) AS ngram "
        f"FROM tok WHERE len(t) >= {n}"
        for n in ns
    )
    return f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM {src} AS documents),
g AS ({branches}),
c AS (
  SELECT doc_id, n, ngram, count(*)::BIGINT AS cnt
  FROM g GROUP BY doc_id, n, ngram
),
r AS (
  SELECT doc_id, n, ngram, cnt,
         row_number() OVER (PARTITION BY doc_id, n
                            ORDER BY cnt DESC, ngram) AS rn,
         sum(cnt * length(ngram)) OVER (PARTITION BY doc_id, n) AS all_chars
  FROM c
)
SELECT doc_id, n::INT AS n, ngram AS top_ngram, cnt AS top_count,
       round((cnt * length(ngram))::DOUBLE / all_chars, {R}) AS top_char_frac
FROM r WHERE rn = 1 ORDER BY doc_id, n
"""


def pii_profile_sql(src: str = "documents") -> str:
    """Mirror of ops.quality.pii_profile: pinned patterns (identical
    Java-regex/RE2 semantics by construction: classes + bounded greedy
    quantifiers only), counts on the original text, sha256 of the
    PII_SCRUB-ordered replace-all chain."""
    from fastmorph_spark.ops.quality import PII_EMAIL, PII_IPV4, PII_PHONE

    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(text, "
        f"'{PII_EMAIL}', '<EMAIL>', 'g'), "
        f"'{PII_PHONE}', '<PHONE>', 'g'), "
        f"'{PII_IPV4}', '<IP>', 'g')"
    )
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{PII_EMAIL}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, '{PII_PHONE}'))::BIGINT AS n_phones,
       len(regexp_extract_all(text, '{PII_IPV4}'))::BIGINT AS n_ipv4,
       sha256({scrub}) AS scrub_sha256
FROM {src} AS documents ORDER BY doc_id
"""


def stratified_sample_sql(fractions: dict[str, float],
                          group_col: str = "lang") -> str:
    """Mirror of ops.text.stratified_sample: per-group md5 keep
    thresholds compiled to a CASE chain; groups absent from the map get
    a NULL threshold and drop (NULL comparison is false in both
    engines)."""
    whens = " ".join(
        f"WHEN {group_col} = '{g}' THEN {int(fractions[g] * (1 << 32))}"
        for g in sorted(fractions)
    )
    return f"""
SELECT doc_id, {group_col} AS "group" FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
      < (CASE {whens} ELSE NULL END)
ORDER BY doc_id
"""


def unigram_ppl_sql() -> str:
    """Mirror of ops.quality.unigram_ppl. The inner fold list is built
    with ORDER BY term and summed sequentially (list_sum folds left),
    matching Spark's sort_array + aggregate left fold — same doubles,
    same order, bit-equal before rounding."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS c FROM tok GROUP BY doc_id, term
),
cf AS (SELECT term, sum(c)::BIGINT AS cf FROM tf GROUP BY term),
tot AS (SELECT sum(cf)::DOUBLE AS total, count(*)::DOUBLE AS v FROM cf),
per AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens,
         list_sum(list(c::DOUBLE * ln(cf + 1) ORDER BY term)) AS s
  FROM tf JOIN cf USING (term)
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round((n_tokens::DOUBLE * ln(total + v) - s) / n_tokens::DOUBLE,
             {SCORE_DECIMALS}) AS avg_nll,
       round(exp((n_tokens::DOUBLE * ln(total + v) - s)
                 / n_tokens::DOUBLE), {SCORE_DECIMALS}) AS ppl
FROM per CROSS JOIN tot
ORDER BY doc_id
"""


def _kmeans_ctes(k: int, iters: int) -> tuple[str, str]:
    """Shared CTE chain for the pinned k-means trace (ops/clustering.py):
    md5-ordered init, per-iteration (round(dist) argmin -> rounded
    per-component mean), empty clusters dropping out. Returns (ctes,
    final_assignment_cte_name). DuckDB explodes vectors once (ev) and
    computes distances by idx-join + sum — summation order differs from
    Spark's index-ordered fold, which is exactly what rounding both
    engines' dists/centroids to SCORE_DECIMALS absorbs."""
    parts = [f"""
emb AS (SELECT vec_id, embedding FROM embeddings),
ev AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
         unnest(embedding)::DOUBLE AS val
  FROM emb
),
init AS (
  SELECT vec_id,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS cluster
  FROM emb
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {k}
),
c0 AS (
  SELECT i.cluster, ev.idx, ev.val FROM init i JOIN ev USING (vec_id)
)"""]
    prev = "c0"
    for t in range(1, iters + 1):
        parts.append(f"""
d{t} AS (
  SELECT ev.vec_id, c.cluster,
         round(sum((ev.val - c.val) * (ev.val - c.val)), {R}) AS dist
  FROM ev JOIN {prev} c USING (idx)
  GROUP BY ev.vec_id, c.cluster
),
a{t} AS (
  SELECT vec_id, cluster, dist FROM d{t}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
),
c{t} AS (
  SELECT a.cluster, ev.idx, round(avg(ev.val), {R}) AS val
  FROM a{t} a JOIN ev USING (vec_id)
  GROUP BY a.cluster, ev.idx
)""")
        prev = f"c{t}"
    # final assignment against the LAST rounded centroids
    parts.append(f"""
dfin AS (
  SELECT ev.vec_id, c.cluster,
         round(sum((ev.val - c.val) * (ev.val - c.val)), {R}) AS dist
  FROM ev JOIN {prev} c USING (idx)
  GROUP BY ev.vec_id, c.cluster
),
afin AS (
  SELECT vec_id, cluster, dist FROM dfin
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
)""")
    return ",".join(parts), "afin"


def kmeans_assign_sql(k: int = 4, iters: int = 2) -> str:
    """Mirror of ops.clustering.kmeans_assign."""
    ctes, fin = _kmeans_ctes(k, iters)
    return f"""
WITH {ctes}
SELECT vec_id, cluster::BIGINT AS cluster, dist FROM {fin}
"""


def cluster_sample_sql(k: int = 4, iters: int = 2, per_cluster: int = 25) -> str:
    """Mirror of ops.clustering.cluster_sample — the single-phase rank
    (the Spark side's salted two-phase cut is result-identical)."""
    ctes, fin = _kmeans_ctes(k, iters)
    return f"""
WITH {ctes}
SELECT vec_id, cluster::BIGINT AS cluster FROM {fin}
QUALIFY row_number() OVER (
  PARTITION BY cluster ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
) <= {per_cluster}
"""


def c4_clean_sql(src: str = "documents") -> str:
    """Mirror of ops.quality.c4_clean: non-empty newline lines; the
    pinned C4 keep rule (terminal punctuation, >= 5 whitespace-words,
    no javascript/lorem-ipsum/brace marker); evidence counts + sha256
    of the kept lines rejoined with newlines — the oracle verifies the
    CLEANED BYTES. ``src`` lets the registry substitute the
    deterministically line-structured derived corpus (raw fixture text
    has no newlines)."""
    keep = (
        "regexp_matches(trim(l), '[.!?\"]$') "
        "AND len(list_filter(string_split(trim(l), ' '), x -> x <> '')) >= 5 "
        "AND NOT contains(lower(trim(l)), 'javascript') "
        "AND NOT contains(lower(trim(l)), 'lorem ipsum') "
        "AND NOT contains(lower(trim(l)), '{')"
    )
    return f"""
WITH lines AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), l -> length(l) > 0) AS ln
  FROM {src} AS documents
),
k AS (
  SELECT doc_id, ln, list_filter(ln, l -> {keep}) AS kept FROM lines
)
SELECT doc_id,
       len(ln)::BIGINT AS n_lines,
       len(kept)::BIGINT AS n_kept,
       round(CASE WHEN len(ln) > 0
                  THEN len(kept)::DOUBLE / len(ln) ELSE 0.0 END, {R})
         AS kept_frac,
       sha256(coalesce(array_to_string(kept, chr(10)), '')) AS clean_sha256
FROM k ORDER BY doc_id
"""


# ---------------- repo dependency graph (ops/graph.py twins) ----------------

_IMPORT_RE = "(?m)^import ([a-z0-9_]+)$"
_DECL_RE = "(?m)^# module ([a-z0-9_]+)$"


def _dep_edges_ctes(corpus_sql: str) -> str:
    """Shared CTE chain corpus -> parsed imports -> ownership -> weighted
    edges; RE2 (?m)-anchored patterns ≡ Java MULTILINE on this content.
    ``corpus_sql`` is the registry's dep_corpus_sql() (repo, content)."""
    return f"""c AS ({corpus_sql}),
imp AS (
  SELECT repo AS src_repo,
         unnest(regexp_extract_all(content, '{_IMPORT_RE}', 1)) AS module
  FROM c
),
decl AS (
  SELECT unnest(regexp_extract_all(content, '{_DECL_RE}', 1)) AS module, repo
  FROM c
),
own AS (SELECT module, min(repo) AS owner_repo FROM decl GROUP BY module),
e AS (
  SELECT src_repo, owner_repo AS dst_repo, count(*)::BIGINT AS n_imports
  FROM imp JOIN own USING (module)
  WHERE src_repo <> owner_repo
  GROUP BY src_repo, owner_repo
)"""


def import_edges_sql(corpus_sql: str) -> str:
    return f"""
WITH {_dep_edges_ctes(corpus_sql)}
SELECT src_repo, dst_repo, n_imports FROM e ORDER BY src_repo, dst_repo
"""


def import_degree_sql(corpus_sql: str) -> str:
    return f"""
WITH {_dep_edges_ctes(corpus_sql)},
nodes AS (
  SELECT DISTINCT repo
  FROM (SELECT src_repo AS repo FROM e UNION ALL SELECT dst_repo FROM e)
),
o AS (SELECT src_repo AS repo, count(*)::BIGINT AS fan_out,
             sum(n_imports)::BIGINT AS imports_out FROM e GROUP BY 1),
i AS (SELECT dst_repo AS repo, count(*)::BIGINT AS fan_in,
             sum(n_imports)::BIGINT AS imports_in FROM e GROUP BY 1)
SELECT nodes.repo,
       coalesce(fan_in, 0)::BIGINT AS fan_in,
       coalesce(fan_out, 0)::BIGINT AS fan_out,
       coalesce(imports_in, 0)::BIGINT AS imports_in,
       coalesce(imports_out, 0)::BIGINT AS imports_out
FROM nodes LEFT JOIN o USING (repo) LEFT JOIN i USING (repo)
ORDER BY repo
"""


def pagerank_sql(corpus_sql: str, iters: int = 3, damping: float = 0.85,
                 decimals: int = 6) -> str:
    """ops/graph.py::pagerank pinned semantics, iterations UNROLLED as
    chained CTEs. Constants are Python-computed and repr-inlined so the
    float literals match the Spark side bit-for-bit ((1-d) in DuckDB
    would be DECIMAL 0.15; Python 1.0-0.85 is 0.15000000000000002)."""
    base = f"""{_dep_edges_ctes(corpus_sql)},
nodes AS (
  SELECT DISTINCT repo
  FROM (SELECT src_repo AS repo FROM e UNION ALL SELECT dst_repo FROM e)
),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
ow AS (SELECT src_repo, sum(n_imports)::DOUBLE AS out_w FROM e GROUP BY 1),
it0 AS (SELECT repo, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn)"""
    its = [base]
    for k in range(1, iters + 1):
        prev = f"it{k - 1}"
        its.append(f"""it{k} AS (
  SELECT nodes.repo,
         {(1.0 - damping)!r} / nn.n
           + {damping!r} * (coalesce(cagg.c, 0.0) + dg.dang / nn.n) AS pr
  FROM nodes
  CROSS JOIN nn
  CROSS JOIN (SELECT coalesce(sum(pr), 0.0) AS dang FROM {prev}
              WHERE repo NOT IN (SELECT src_repo FROM ow)) dg
  LEFT JOIN (SELECT e.dst_repo, sum(p.pr * e.n_imports / ow.out_w) AS c
             FROM e JOIN {prev} p ON e.src_repo = p.repo
             JOIN ow ON e.src_repo = ow.src_repo
             GROUP BY e.dst_repo) cagg ON nodes.repo = cagg.dst_repo
)""")
    joined = ",\n".join(its)
    return (f"\nWITH {joined}\n"
            f"SELECT repo, round(pr, {decimals}) AS pr "
            f"FROM it{iters} ORDER BY repo\n")


def dependents_closure_sql(corpus_sql: str, seed: str, hops: int = 3) -> str:
    """ops/graph.py::dependents_closure (direction="in") with the BFS
    layers UNROLLED: layer h = distinct importers of layer h-1, minus
    the seed and every earlier layer."""
    ctes = [f"""s1 AS (
  SELECT DISTINCT src_repo AS repo FROM e
  WHERE dst_repo = '{seed}' AND src_repo <> '{seed}'
),
h1 AS (SELECT repo, 1 AS hops FROM s1)"""]
    for h in range(2, hops + 1):
        earlier = " UNION ALL ".join(f"SELECT repo FROM h{i}" for i in range(1, h))
        ctes.append(f"""s{h} AS (
  SELECT DISTINCT e.src_repo AS repo
  FROM e JOIN h{h - 1} ON e.dst_repo = h{h - 1}.repo
  WHERE e.src_repo <> '{seed}'
),
h{h} AS (SELECT repo, {h} AS hops FROM s{h}
         WHERE repo NOT IN ({earlier}))""")
    layers = " UNION ALL ".join(f"SELECT * FROM h{i}" for i in range(1, hops + 1))
    joined = ",\n".join(ctes)
    return (f"\nWITH {_dep_edges_ctes(corpus_sql)},\n{joined}\n"
            f"SELECT repo, hops FROM ({layers}) ORDER BY hops, repo\n")
