"""Training-data ops: dedup / similarity / text analysis / multimodal."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fastmorph_spark.ops import dedup, multimodal, similarity, text
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    """Fixture corpus + synthesized exact dups + a near-dup (one token
    changed) — deterministic."""
    base = spark.read.parquet(f"{SF0001}/documents.parquet").select("doc_id", "text")
    extra = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [10001, 10002, 10003],
            "text": [None, None, None],
        }).astype({"doc_id": "int64"}),
        "doc_id long, text string",
    )
    r = base.orderBy("doc_id").limit(2).collect()
    t0, t1 = r[0]["text"], r[1]["text"]
    near = t1.replace(t1.split()[0], "zzznear", 1)
    extra = spark.createDataFrame(
        [(10001, t0), (10002, t0), (10003, near)], "doc_id long, text string"
    )
    return base.unionByName(extra), r[0]["doc_id"], r[1]["doc_id"]


def test_exact_duplicates(spark, docs_with_dups):
    df, d0, _ = docs_with_dups
    groups = {r["group_rep"]: r["dup_count"] for r in dedup.exact_duplicates(df).collect()}
    assert groups[d0] == 3
    members = {(r["doc_id"], r["group_rep"])
               for r in dedup.exact_duplicate_members(df).collect()}
    assert {(d0, d0), (10001, d0), (10002, d0)} <= members


def test_exact_duplicates_bounded_on_huge_group(spark):
    """A 10^5-way duplicate group must stay ONE scalar row (no per-group
    array) and its membership must distribute — VERDICT r03 #6."""
    df = spark.range(100_000).select(
        F.col("id").alias("doc_id"), F.lit("same text every row").alias("text")
    )
    rows = dedup.exact_duplicates(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["dup_count"] == 100_000 and r["group_rep"] == 0
    assert set(r.asDict()) == {"content_sha256", "dup_count", "group_rep"}
    drops = dedup.exact_duplicate_members(df) \
        .filter(F.col("doc_id") != F.col("group_rep")).count()
    assert drops == 99_999


def test_ngram_jaccard_finds_neardup(spark, docs_with_dups):
    df, d0, d1 = docs_with_dups
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()}
    # exact dups: jaccard 1.0
    assert pairs[(d0, 10001)] == 1.0
    assert pairs[(10001, 10002)] == 1.0
    # near-dup (one token changed) is found with high-but-<1 jaccard
    assert (d1, 10003) in pairs and 0.5 <= pairs[(d1, 10003)] < 1.0


def test_minhash_lsh_recall_on_neardups(spark, docs_with_dups):
    """LSH candidates must cover every pair the exhaustive jaccard finds
    at the threshold (banding params chosen for recall at tau=0.5)."""
    df, *_ = docs_with_dups
    exact = {(r["doc_a"], r["doc_b"]) for r in dedup.ngram_jaccard_pairs(df, 3, 0.5).collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_lsh_pairs(df, 3, 16, 4, 0.5).collect()}
    assert lsh == exact


def test_simhash_hamming_small_for_neardup(spark, docs_with_dups):
    df, d0, d1 = docs_with_dups
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df, n=2).collect()}
    assert sh[d0] == sh[10001] == sh[10002]  # identical docs -> identical simhash
    ham = bin(sh[d1] ^ sh[10003]).count("1")
    assert ham <= 12  # near-dup -> small Hamming distance
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_neardup_pairs(df, max_hamming=12, n=2).collect()}
    assert pairs[(d0, 10001)] == 0
    assert (d1, 10003) in pairs


def test_simhash_banding_is_exhaustive(spark, docs_with_dups):
    """Banded candidate generation == brute force (pigeonhole)."""
    df, *_ = docs_with_dups
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df, n=2).collect()}
    ids = sorted(sh)
    brute = {
        (a, b): bin(sh[a] ^ sh[b]).count("1")
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin(sh[a] ^ sh[b]).count("1") <= 8
    }
    banded = {(r["doc_a"], r["doc_b"]): r["hamming"]
              for r in dedup.simhash_neardup_pairs(df, max_hamming=8, n=2).collect()}
    assert banded == brute


def test_cosine_topk_exact_vs_arrow(spark):
    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    a = similarity.cosine_topk(emb, [float(x) for x in q], k=10).collect()
    b = similarity.cosine_topk_arrow(emb, [float(x) for x in q], k=10).collect()
    assert [(r["rank"], r["vec_id"], r["cos"]) for r in a] == \
           [(r["rank"], r["vec_id"], r["cos"]) for r in b]
    assert a[0]["vec_id"] == 3 and abs(a[0]["cos"] - 1.0) < 1e-6  # self-match first


def test_cosine_topk_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = m[list(ids).index(7)]
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))[:10]
    exp = list(ids[order])
    got = [r["vec_id"] for r in similarity.cosine_topk(emb, list(q), k=10).collect()]
    assert got == exp


def test_lsh_bucketed_topk_self_recall(spark):
    """The query vector's own bucket must contain the query vector —
    top-1 of the bucketed search vs itself is exact."""
    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 11).first()["embedding"]]
    got = similarity.lsh_bucketed_topk(emb, q, k=5, n_planes=6).collect()
    assert got and got[0]["vec_id"] == 11


def test_text_ops_basic(spark):
    df = spark.createDataFrame(
        [(0, "The the THE cat."), (1, ""), (2, "le la de et un une est les oui")],
        "doc_id long, text string",
    )
    tc = {r["doc_id"]: (r["n_tokens"], r["n_distinct"]) for r in text.token_count(df).collect()}
    assert tc[0] == (4, 2) and tc[1] == (0, 0)
    li = {r["doc_id"]: r["lang_pred"] for r in text.lang_id(df).collect()}
    assert li[0] == "en" and li[1] == "und" and li[2] == "fr"
    qs = {r["doc_id"]: r["quality"] for r in text.quality_score(df).collect()}
    assert qs[1] == 0.0 and 0 < qs[0] <= 1.0


def test_fingerprint_stability(spark):
    """Fingerprint survives a tail edit (winnowing keeps smallest hashes)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    df = spark.createDataFrame(
        [(0, base + " tailword"), (1, base + " othertail"), (2, "x y z w v u t s")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: set(r["fingerprint"].split("|")) for r in text.fingerprint(df, n=5, keep=4).collect()}
    # a local tail edit keeps most of the smallest shingle hashes
    assert len(fp[0] & fp[1]) >= 3
    # unrelated docs share nothing
    assert not (fp[0] & fp[2])
    # identical input -> identical fingerprint (determinism)
    again = {r["doc_id"]: set(r["fingerprint"].split("|")) for r in text.fingerprint(df, n=5, keep=4).collect()}
    assert again == fp


def test_multimodal_plumbing(spark):
    media = multimodal.synth_media(spark, 30)
    feats = multimodal.extract_features(media, decode="fake", dim=16).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feat"]) == 16 and all(0.0 <= x <= 1.0 for x in r["feat"])
        assert r["n_bytes"] > 0 and len(r["sha256"]) == 64
    # deterministic: same media id -> same features
    again = multimodal.extract_features(media, decode="fake", dim=16).collect()
    assert sorted((r["media_id"], tuple(r["feat"])) for r in feats) == \
           sorted((r["media_id"], tuple(r["feat"])) for r in again)
    # real decode is an explicit stub
    with pytest.raises(Exception) as ei:
        multimodal.extract_features(media, decode="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)
    # frame sampling plan: JVM-only, right cardinality
    plan = multimodal.frame_sample_plan(media, every_ms=500)
    one = media.filter("kind = 'video'").first()
    n = plan.filter(F.col("media_id") == one["media_id"]).count()
    assert n == len(range(0, max(one["duration_ms"] - 1, 0) + 1, 500))


def test_simhash_combination_banding_candidates_linear(spark):
    """Manku-style combination banding: candidate count must stay ~linear
    in N on a Zipf-ish corpus (the round-1 narrow bands were ~N²/128).
    We assert the candidate:pair ratio shrinks as N doubles."""
    import itertools

    from pyspark.sql import functions as F

    from fastmorph_spark.ops.dedup import SIMHASH_BITS, simhash

    def corpus(n):
        # decorrelated pseudo-random docs (large vocab, hash-mixed): most
        # pairs are genuinely dissimilar, so a scale-safe candidate
        # generator must produce ~linear candidates; data that is ITSELF
        # quadratically similar would make any complete scheme quadratic
        rows = [
            (i, " ".join(f"t{(i * 1000003 + j * 7919 + (i * j) % 97) % 5000}" for j in range(30)))
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def candidate_count(df, k=3, m=6):
        sh = simhash(df, 2)
        base, rem = divmod(SIMHASH_BITS, m)
        widths = [base + (1 if i < rem else 0) for i in range(m)]
        offsets = [sum(widths[:i]) for i in range(m)]
        vals = [
            (F.shiftright(F.col("simhash"), offsets[i]) % F.lit(2 ** widths[i]))
            for i in range(m)
        ]
        combos = list(itertools.combinations(range(m), m - k))
        cols = F.array(*[
            F.struct(F.lit(ci).alias("combo"),
                     F.concat_ws("_", *[vals[i].cast("string") for i in c]).alias("key"))
            for ci, c in enumerate(combos)
        ])
        bk = sh.select("doc_id", F.explode(cols).alias("b")) \
            .select("doc_id", F.col("b.combo").alias("combo"), F.col("b.key").alias("key"))
        a, b = bk.alias("a"), bk.alias("b")
        return (
            a.join(b, (F.col("a.combo") == F.col("b.combo")) & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id"), F.col("b.doc_id")).distinct().count()
        )

    c200 = candidate_count(corpus(200))
    c400 = candidate_count(corpus(400))
    # quadratic banding would give c400 ~= 4*c200; combination keys must do
    # clearly better than 3x growth on this vocabulary
    assert c400 < 3.0 * max(c200, 1), (c200, c400)


def test_dup_groups_transitive_chain(spark):
    """Min-label propagation must cross multi-hop chains (diameter > 1:
    several iterations) and keep separate components apart."""
    from pyspark.sql import functions as F

    from fastmorph_spark.ops.dedup import dup_groups

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),      # chain -> component rep 1
         (10, 11),                             # pair  -> rep 10
         (21, 20)],                            # order-insensitive
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["group_rep"] for r in dup_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_dup_groups_long_chain_checkpoint_rounds(spark):
    """Diameter-12 chain: forces > CHECKPOINT_EVERY propagation rounds,
    so the r06 lineage-truncation branch (localCheckpoint every 4th
    round) executes — the converged labels must be identical to the
    all-persist path, and the plan must stay analyzable (this test hangs
    for minutes if the exponential-plan regression comes back)."""
    from fastmorph_spark.ops.dedup import dup_groups

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)] + [(300, 301)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["group_rep"] for r in dup_groups(pairs).collect()}
    want = {i: 100 for i in range(100, 113)}
    want.update({300: 300, 301: 300})
    assert got == want


def test_drop_list_exact_precedence(spark):
    """Byte-identical docs are also near-dups; drop_list must label them
    'exact' and the merely-similar ones 'near', keeping one rep each."""
    from fastmorph_spark.ops.dedup import drop_list

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [
        (0, base),
        (1, base),                        # exact dup of 0
        (2, base + " iota"),              # near dup of 0/1
        (3, "totally different words entirely unrelated content here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["doc_id"], r["reason"]) for r in drop_list(docs, n=3, threshold=0.5).collect()]
    assert got == [(1, "exact"), (2, "near")]


def test_pack_shards_invariants(spark):
    """Shard assignment: nondecreasing in doc order, every shard except
    possibly per-doc overflows stays <= budget, and the result is
    independent of the bucketing width (two-phase cumsum correctness)."""
    from fastmorph_spark.ops.text import pack_shards
    from fastmorph_spark.sources import read_documents
    from tests.conftest import SF0001

    docs = read_documents(spark, SF0001)
    budget = 500
    rows = pack_shards(docs, budget_tokens=budget).collect()
    assert len(rows) == docs.count()
    shard_ids = [r["shard_id"] for r in rows]
    assert shard_ids == sorted(shard_ids)
    from collections import defaultdict

    totals = defaultdict(int)
    for r in rows:
        totals[r["shard_id"]] += r["n_tokens"]
    for sid, tot in totals.items():
        # a shard only exceeds the budget by (at most) its LAST doc's spill
        assert tot < budget + max(r["n_tokens"] for r in rows), sid

    alt = pack_shards(docs, budget_tokens=budget, n_buckets=7).collect()
    assert [(r["doc_id"], r["shard_id"]) for r in alt] == \
           [(r["doc_id"], r["shard_id"]) for r in rows]


def test_sample_hash_nested_and_deterministic(spark):
    """sample(5%) ⊆ sample(10%); repartitioning must not change the set."""
    from fastmorph_spark.ops.text import sample_hash
    from fastmorph_spark.sources import read_documents
    from tests.conftest import SF0001

    docs = read_documents(spark, SF0001)
    s10 = {r["doc_id"] for r in sample_hash(docs, 0.10).collect()}
    s5 = {r["doc_id"] for r in sample_hash(docs, 0.05).collect()}
    assert s5 <= s10 and 0 < len(s5) < len(s10) < 500
    again = {r["doc_id"] for r in sample_hash(docs.repartition(13), 0.10).collect()}
    assert again == s10


def test_benchmark_contamination_semantics(spark):
    """Hand-computed contamination: corpus doc sharing a 3-gram with the
    benchmark is flagged with the exact overlap fraction; clean docs and
    sub-n docs never appear."""
    from fastmorph_spark.ops import decontam

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # shares shingles
            (2, "completely different words entirely here now"),  # clean
            (3, "too short"),  # < n tokens: no shingles
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox leaps")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in
            decontam.benchmark_contamination(corpus, bench, n=3).collect()}
    # doc 1: distinct 3-gram shingles = 7 ("the quick brown" ... "the lazy dog");
    # benchmark contributes {"quick brown fox", "brown fox leaps"}; overlap = 1
    assert set(rows) == {1}
    assert rows[1]["n_shingles"] == 7
    assert rows[1]["n_contaminated"] == 1
    assert abs(rows[1]["overlap_frac"] - round(1 / 7, 6)) < 1e-9


def test_benchmark_contamination_builder_is_lazy_and_handles_long_docs(spark):
    """ADVICE r04 #1 (closed r06): the default gate must run ZERO driver
    jobs at build time (the old row-count probe was an eager job inside
    a lazy builder), and a long-document benchmark — few rows, many
    bytes, the case the row-count proxy mis-gated — must produce the
    same report on the default (AQE-decided) path as with broadcast
    explicitly forced off."""
    from fastmorph_spark.ops import decontam

    corpus = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(200))),
         (2, "completely different words entirely here now again")],
        "doc_id long, text string",
    )
    # 3 rows, each ~4000 tokens: tiny row count, disproportionate bytes
    long_bench = spark.createDataFrame(
        [(j, " ".join(f"w{(i + j) % 500}" for i in range(4000)))
         for j in range(3)],
        "doc_id long, text string",
    )
    sc = spark.sparkContext
    sc.setJobGroup("decontam-lazy-gate", "builder laziness probe")
    report = decontam.benchmark_contamination(corpus, long_bench, n=3)
    jobs = sc.statusTracker().getJobIdsForGroup("decontam-lazy-gate")
    sc.setJobGroup(None, None)
    assert list(jobs) == [], f"builder ran driver jobs: {jobs}"
    got = sorted(tuple(r) for r in report.collect())
    want = sorted(tuple(r) for r in decontam.benchmark_contamination(
        corpus, long_bench, n=3, broadcast=False).collect())
    assert got == want and got  # non-vacuous: doc 1 overlaps w-i shingles


def test_benchmark_contamination_self_is_total(spark):
    """A doc checked against itself is 100% contaminated — the invariant
    a decontam pass relies on to catch verbatim eval leaks."""
    from fastmorph_spark.ops import decontam

    doc = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    r = decontam.benchmark_contamination(doc, doc, n=3).collect()
    assert len(r) == 1 and r[0]["overlap_frac"] == 1.0


def test_ngram_freq_counts_occurrences(spark):
    """Frequency list counts EVERY occurrence (not distinct-per-doc),
    df counts docs, ties break on ngram ASC, rank is 1-based dense."""
    from fastmorph_spark.ops.text import ngram_freq

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # "a b" x3, "b a" x2
            (2, "a b c"),         # "a b" x1, "b c" x1
            (3, "x"),             # < n tokens: contributes nothing
        ],
        "doc_id long, text string",
    )
    rows = [tuple(r) for r in ngram_freq(df, n=2, k=10, min_count=1).collect()]
    assert rows == [
        (1, "a b", 4, 2),
        (2, "b a", 2, 1),
        (3, "b c", 1, 1),
    ]
    # min_count prunes the tail
    assert [r["ngram"] for r in ngram_freq(df, n=2, k=10, min_count=2).collect()] \
        == ["a b", "b a"]


def test_new_ops_plan_shapes(spark):
    """Plan pins for the round-4 operators (the 100x-scale shapes):
    ngram_freq's top-k fuses to TakeOrderedAndProject (shard-local top-k,
    driver k-merge) with the rank window only AFTER the <= k limit;
    kwic's physical plan has NO Window operator at all; decontam's
    benchmark side broadcast-gates into a LeftSemi broadcast join."""
    from pyspark.sql import functions as F

    from fastmorph_spark.ops.decontam import benchmark_contamination
    from fastmorph_spark.ops.text import ngram_freq
    from fastmorph_spark.search.engine import kwic

    docs = spark.read.parquet(f"{SF0001}/documents.parquet") \
        .select("doc_id", "text")

    nf = ngram_freq(docs, 2, 50, 1)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in nf

    matches = spark.createDataFrame(
        [(1, 1, "0")], "doc_id long, n_matches long, match_starts string"
    )
    kp = kwic(docs, matches, 1, 3)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in kp  # nothing funnels through one reducer

    corpus = docs.filter(F.col("doc_id") % 37 != 0)
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    dp = benchmark_contamination(corpus, bench, n=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in dp and "BroadcastHashJoin" in dp


def test_pipeline_drop_list_precedence(spark):
    """Composed hygiene decision: exact dup > near dup > contaminated;
    verbatim eval leaks (benchmark docs inside the corpus) self-
    contaminate and are dropped; each doc listed at most once."""
    from fastmorph_spark.cache import CacheScope
    from fastmorph_spark.ops.decontam import pipeline_drop_list

    base = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [
            (1, base),                       # kept: rep of exact group
            (2, base),                       # dropped: exact
            (3, "totally unrelated words here in this document now"),
            (4, "the benchmark question text appears verbatim right here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the benchmark question text appears verbatim right here")],
        "doc_id long, text string",
    )
    with CacheScope() as scope:
        got = {r["doc_id"]: r["reason"]
               for r in pipeline_drop_list(
                   corpus, bench, contam_n=3, min_frac=0.2, scope=scope
               ).collect()}
    assert got == {2: "exact", 4: "contaminated"}


# ---- span-level (sub-document) dedup (VERDICT r04 #7) ------------------


def _span_corpus(spark):
    # 12 tokens each; docs 1 & 2 share span 0 verbatim (w1..w4), doc 3 is
    # clean, doc 4 embeds doc 1's SECOND span as its FIRST span
    d1 = "w1 w2 w3 w4 a1 a2 a3 a4 b1 b2 b3 b4"
    d2 = "w1 w2 w3 w4 c1 c2 c3 c4 d1 d2 d3 d4"
    d3 = "x1 x2 x3 x4 x5 x6 x7 x8 x9 xa xb xc"
    d4 = "a1 a2 a3 a4 y1 y2 y3 y4 y5 y6 y7 y8"
    return spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3), (4, d4)], "doc_id long, text string")


def test_span_duplicates_cross_doc(spark):
    got = [(r["doc_id"], r["span_idx"], r["n_docs"])
           for r in dedup.span_duplicates(_span_corpus(spark), 4).collect()]
    # span 'w1..w4' in docs 1+2 (idx 0 both); span 'a1..a4' in doc 1
    # (idx 1) and doc 4 (idx 0); doc 3 never appears
    assert got == [(1, 0, 2), (1, 1, 2), (2, 0, 2), (4, 0, 2)]


def test_span_drop_list_keeps_canonical(spark):
    got = [(r["doc_id"], r["span_idx"], r["reason"])
           for r in dedup.span_drop_list(_span_corpus(spark), 4).collect()]
    # min doc_id owns each span group: doc 1 keeps both; 2 and 4 drop
    assert got == [(2, 0, "span_dup"), (4, 0, "span_dup")]


def test_doc_spans_tile_and_drop_tail(spark):
    # 10 tokens at width 4 -> spans 0,1 only (trailing 2 tokens dropped);
    # 3 tokens -> no spans at all
    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 ta"), (2, "s1 s2 s3")],
        "doc_id long, text string")
    got = [(r["doc_id"], r["span_idx"]) for r in dedup.doc_spans(df, 4).collect()]
    assert got == [(1, 0), (1, 1)]


def test_pipeline_drop_list_span_integration(spark):
    """span_tokens=W: a doc embedding another's span — but neither an
    exact/near dup nor contaminated — lands on the list as 'span_dup';
    stronger reasons still win for docs that have them."""
    from fastmorph_spark.cache import CacheScope
    from fastmorph_spark.ops.decontam import pipeline_drop_list

    corpus = _span_corpus(spark)
    bench = spark.createDataFrame(
        [(100, "zz1 zz2 zz3 zz4 zz5 zz6")], "doc_id long, text string")
    with CacheScope() as scope:
        got = {r["doc_id"]: r["reason"]
               for r in pipeline_drop_list(
                   corpus, bench, contam_n=3, min_frac=0.2,
                   span_tokens=4, scope=scope).collect()}
    # docs 2 and 4 share spans with canonical doc 1; not dups, not
    # contaminated -> span_dup. Docs 1 and 3 kept.
    assert got == {2: "span_dup", 4: "span_dup"}


# ---- pinned deterministic BPE (VERDICT r04 #8) --------------------------


def test_bpe_reference_segmentations():
    """Pinned outcomes of the merge table (any change to BPE_MERGES or
    the pass semantics must show up here first)."""
    enc = text.bpe_encode_py
    assert enc("the") == ["the"]
    assert enc("hash") == ["hash"]
    assert enc("join") == ["join"]
    assert enc("fast") == ["fast"]
    assert enc("data") == ["data"]
    assert enc("merge") == ["merge"]
    assert enc("order") == ["order"]
    assert enc("sort") == ["sort"]
    assert enc("key") == ["key"]
    assert enc("scan") == ["scan"]
    assert enc("") == []
    # adjacency: two (t,h) sites sharing a boundary space need pass 2
    assert enc("thth") == ["th", "th"]
    # exact-symbol discipline: 'or'+'t' must NOT false-match rule (r,t)
    # or bleed across symbols — 'sort' goes through (o,r),(s,or),(sor,t)
    assert enc("sorting") == ["sort", "in", "g"]


def test_bpe_three_engine_identity(spark, duck):
    """n_bpe identical across the Python reference, the Catalyst
    expression chain, and the DuckDB oracle SQL — including empty docs,
    punctuation-only docs, and adjacency-heavy words."""
    from fastmorph_spark.oracles_ops import token_count_bpe_sql
    from fastmorph_spark.tokenize import tokenize_py

    texts = [
        "the fast hash join order by key",
        "thth ththth sorting data merge scan",
        "", "!!! ---", "a", "aaaa bbbb the the the",
    ]

    def py_count(s):
        return sum(len(text.bpe_encode_py(w)) for w in tokenize_py(s))

    exp = [py_count(s) for s in texts]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got_spark = [r["n_bpe"] for r in
                 text.token_count_bpe(df).orderBy("doc_id").collect()]
    assert got_spark == exp

    duck.execute("CREATE OR REPLACE TABLE _bpe_docs AS SELECT * FROM (VALUES "
                 + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
                 + ") v(doc_id, text)")
    got_duck = [r[2] for r in duck.execute(
        token_count_bpe_sql(src="_bpe_docs")).fetchall()]
    assert got_duck == exp
    # compression is real on corpus vocabulary, not a char count
    assert got_spark[0] < sum(len(w) for w in texts[0].split())


def test_pack_shards_counts_frame_and_expr_agree(spark):
    """counts= as a (doc_id, n) frame and as a Column expression produce
    the same shards as each other; a missing doc packs at 0."""
    docs = spark.createDataFrame(
        [(i, "the fast hash join " * (i % 3 + 1)) for i in range(40)],
        "doc_id long, text string")
    via_expr = text.pack_shards(docs, 10, counts=text.bpe_count_expr("text"))
    cnt_frame = text.token_count_bpe(docs).select("doc_id", "n_bpe")
    via_frame = text.pack_shards(docs, 10, counts=cnt_frame)
    assert [tuple(r) for r in via_expr.collect()] == \
           [tuple(r) for r in via_frame.collect()]
    # missing doc -> 0 tokens (shares its predecessor's running total)
    partial = text.pack_shards(docs, 10, counts=cnt_frame.filter("doc_id < 20"))
    rows = {r["doc_id"]: r["n_tokens"] for r in partial.collect()}
    assert rows[25] == 0 and len(rows) == 40
