"""Repetition + PII quality filters (ops/quality.py): pinned semantics
on crafted micro-corpora, determinism under repartition, and the
augmented-corpus driver paths vs their DuckDB oracles."""

from __future__ import annotations

import pytest

from fastmorph_spark.ops.quality import (
    line_repetition,
    pii_profile,
    top_ngram_repetition,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---- line_repetition -----------------------------------------------------


def test_line_repetition_known_fractions(spark):
    # 4 lines, "aa bb" twice: dup_line_frac = 1/4; dup char mass = 5,
    # total char mass = 5+5+4+2 = 16 -> dup_line_char_frac = 5/16
    df = _docs(spark, [(1, "aa bb\ncc d\naa bb\nzz")])
    row = line_repetition(df).collect()[0]
    assert row["n_lines"] == 4
    assert row["n_distinct_lines"] == 3
    assert row["dup_line_frac"] == pytest.approx(0.25)
    assert row["dup_line_char_frac"] == pytest.approx(0.3125)


def test_line_repetition_all_unique_and_empty_lines(spark):
    # empty segments ("\n\n") are dropped before counting; a doc with
    # no non-empty lines emits NO row
    df = _docs(spark, [(1, "aa\n\nbb\n"), (2, "\n\n"), (3, "")])
    rows = {r["doc_id"]: r for r in line_repetition(df).collect()}
    assert set(rows) == {1}
    assert rows[1]["n_lines"] == 2
    assert rows[1]["dup_line_frac"] == 0.0
    assert rows[1]["dup_line_char_frac"] == 0.0


def test_line_repetition_fully_duplicated(spark):
    df = _docs(spark, [(7, "x y\nx y\nx y")])
    row = line_repetition(df).collect()[0]
    assert row["n_lines"] == 3 and row["n_distinct_lines"] == 1
    assert row["dup_line_frac"] == pytest.approx(round(2 / 3, 6), abs=1e-6)
    assert row["dup_line_char_frac"] == pytest.approx(round(2 / 3, 6), abs=1e-6)


# ---- top_ngram_repetition --------------------------------------------------


def test_top_ngram_counts_and_tiebreak(spark):
    # "a b a b a" -> 2-grams: "a b" x2, "b a" x2 -> tie broken by
    # ngram ASC => "a b"; char mass: top 2*3=6 over total 4*3=12
    df = _docs(spark, [(1, "a b a b a")])
    rows = {r["n"]: r for r in top_ngram_repetition(df, ns=(2, 3)).collect()}
    assert rows[2]["top_ngram"] == "a b" and rows[2]["top_count"] == 2
    assert rows[2]["top_char_frac"] == pytest.approx(0.5)
    # 3-grams: "a b a" x2 > "b a b" x1
    assert rows[3]["top_ngram"] == "a b a" and rows[3]["top_count"] == 2


def test_top_ngram_short_doc_skips_n(spark):
    # 2 tokens: contributes the n=2 row only; 1 token: no rows at all
    df = _docs(spark, [(1, "aa bb"), (2, "solo")])
    rows = top_ngram_repetition(df, ns=(2, 3)).collect()
    assert {(r["doc_id"], r["n"]) for r in rows} == {(1, 2)}
    assert rows[0]["top_char_frac"] == pytest.approx(1.0)


def test_top_ngram_repartition_deterministic(spark):
    import fastmorph_spark.sources as sources

    docs = sources.read_documents(spark, "/root/testdata/sf0.001")
    a = sorted(map(tuple, top_ngram_repetition(docs, ns=(2,)).collect()))
    b = sorted(map(tuple,
                   top_ngram_repetition(docs.repartition(13), ns=(2,)).collect()))
    assert a == b


# ---- pii_profile -----------------------------------------------------------


def test_pii_counts_and_scrub(spark):
    from pyspark.sql import functions as F

    from fastmorph_spark.ops.quality import pii_scrub_expr

    df = _docs(spark, [
        (1, "mail me at bob.smith+x@corp-lab.example.org or call +1-555-0147"),
        (2, "hosts 10.0.0.1 and 192.168.4.250 plus version 1.2 text"),
        (3, "no pii here just words"),
    ])
    rows = {r["doc_id"]: r for r in pii_profile(df).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_phones"], rows[1]["n_ipv4"]) == (1, 1, 0)
    # "version 1.2" must NOT count as IPv4 (needs 4 dotted groups)
    assert (rows[2]["n_emails"], rows[2]["n_phones"], rows[2]["n_ipv4"]) == (0, 0, 2)
    assert (rows[3]["n_emails"], rows[3]["n_phones"], rows[3]["n_ipv4"]) == (0, 0, 0)
    scrubbed = df.select("doc_id", pii_scrub_expr("text").alias("s")).collect()
    s = {r["doc_id"]: r["s"] for r in scrubbed}
    assert s[1] == "mail me at <EMAIL> or call <PHONE>"
    assert s[2] == "hosts <IP> and <IP> plus version 1.2 text"
    assert s[3] == "no pii here just words"


def test_pii_scrub_hash_matches_plain_sha_when_clean(spark):
    from pyspark.sql import functions as F

    df = _docs(spark, [(9, "clean text")])
    got = pii_profile(df).collect()[0]["scrub_sha256"]
    want = df.select(F.sha2("text", 256).alias("h")).collect()[0]["h"]
    assert got == want


# ---- augmented driver paths vs DuckDB --------------------------------------


def test_quality_keys_vs_oracle(spark, duck):
    """The three registry keys hash-match their DuckDB oracles at
    sf0.001 (the driver re-checks at sf0.01)."""
    from tests.conftest import SF0001, assert_frames_match, register_views

    from fastmorph_spark.registry import oracle_sqls, queries

    register_views(duck, SF0001)
    q, o = queries(), oracle_sqls()
    for key in ("repetition_lines", "repetition_ngrams", "pii_profile",
                "unigram_ppl", "c4_clean"):
        assert_frames_match(q[key](spark, SF0001), duck.sql(o[key]))


# ---- c4_clean ------------------------------------------------------------


def test_c4_keep_rule_cases(spark):
    """Each pinned drop reason in isolation, plus a line passing all."""
    import hashlib

    from fastmorph_spark.ops.quality import c4_clean

    good = "this sentence has five good words."
    rows = [
        (0, good),                                      # kept
        (1, "this sentence has five good words"),       # no terminal punct
        (2, "too short line."),                         # < 5 words
        (3, "please enable javascript to view content."),  # policy term
        (4, "Lorem Ipsum dolor sit amet filler text."),  # policy term (ci)
        (5, "return value maps { key } from here."),     # brace
        (6, "  " + good + "  "),                         # trim then keep
        (7, good + "\n" + "nope"),                       # one of two kept
        (8, ""),                                         # zero lines
    ]
    got = {r["doc_id"]: r.asDict()
           for r in c4_clean(_docs(spark, rows)).collect()}
    assert [got[i]["n_kept"] for i in range(9)] == [1, 0, 0, 0, 0, 0, 1, 1, 0]
    assert got[7]["n_lines"] == 2 and got[7]["kept_frac"] == 0.5
    # cleaned BYTES: doc 0's sha is sha256 of the kept line itself
    assert got[0]["clean_sha256"] == hashlib.sha256(good.encode()).hexdigest()
    # trim affects the RULE, not the bytes: doc 6 keeps its padded line
    assert got[6]["clean_sha256"] == \
        hashlib.sha256(("  " + good + "  ").encode()).hexdigest()
    # zero lines and zero kept both produce the empty sha
    empty_sha = hashlib.sha256(b"").hexdigest()
    assert got[8]["n_lines"] == 0 and got[8]["clean_sha256"] == empty_sha
    assert got[1]["clean_sha256"] == empty_sha


def test_c4_planted_lines_always_dropped(spark):
    """The registry's augmented corpus plants three drop-reason lines;
    every planted line must be dropped, so for an all-kept-base doc
    kept == base parity count."""
    from fastmorph_spark.registry import _c4_aug_docs
    from fastmorph_spark.ops.quality import c4_clean
    from tests.conftest import SF0001

    aug = _c4_aug_docs(spark, SF0001)
    got = {r["doc_id"]: r for r in c4_clean(aug).collect()}
    # doc 60 hits all three plant conditions (60 % 4 == 60 % 5 == 60 % 6 == 0)
    base = aug.filter("doc_id = 60").collect()[0]["text"].split("\n")
    assert got[60]["n_lines"] == len(base)
    planted = {"terse line.",
               "this javascript widget loads quickly today.",
               "return value maps { key } now."}
    keepable = [l for l in base if l not in planted]
    assert got[60]["n_kept"] <= len(keepable)


def test_unigram_ppl_python_oracle(spark):
    """Exhaustive float64 recompute on a tiny constructed corpus, plus
    the quality-signal property: the doc made of corpus-rare tokens
    scores HIGHER perplexity than the doc of corpus-common tokens, and
    an empty doc produces no row."""
    import math

    from fastmorph_spark.ops.quality import unigram_ppl
    from fastmorph_spark.tokenize import tokenize_py

    texts = ["the the the fast join", "the fast join scan",
             "zq xv qj zq", "", "the the fast"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_ppl(df).collect()}
    cf: dict[str, int] = {}
    docs_toks = [tokenize_py(t) for t in texts]
    for toks in docs_toks:
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
    total, v = float(sum(cf.values())), float(len(cf))
    assert set(got) == {0, 1, 2, 4}  # doc 3 empty -> no row
    for i, toks in enumerate(docs_toks):
        if not toks:
            continue
        per: dict[str, int] = {}
        for t in toks:
            per[t] = per.get(t, 0) + 1
        s = 0.0
        for t in sorted(per):  # the pinned term-ASC left fold
            s += float(per[t]) * math.log(cf[t] + 1)
        n = float(len(toks))
        nll = (n * math.log(total + v) - s) / n
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["avg_nll"] == pytest.approx(nll, abs=1e-6)
        assert got[i]["ppl"] == pytest.approx(math.exp(nll), abs=1e-4)
    # rare-token doc 2 is the most perplexing; common-token doc 0 least
    assert got[2]["ppl"] == max(r["ppl"] for r in got.values())
    assert got[0]["ppl"] < got[2]["ppl"]


def test_unigram_ppl_repartition_deterministic(spark):
    from tests.conftest import SF0001

    from fastmorph_spark.ops.quality import unigram_ppl
    from fastmorph_spark.sources import read_documents

    docs = read_documents(spark, SF0001)
    a = unigram_ppl(docs).collect()
    b = unigram_ppl(docs.repartition(17)).collect()
    assert a == b
