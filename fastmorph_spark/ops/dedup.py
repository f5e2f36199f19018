"""Deduplication operators over the documents corpus.

Four families, each Spark-first and oracle-checkable:

- exact_duplicates:   sha256 hash-groupBy (one shuffle, map-side partial)
- ngram_jaccard_pairs: n-gram shingle sets -> inverted shingle join ->
                      per-pair intersection counts -> Jaccard (the join
                      enumerates only CO-SHINGLED pairs, never the n²)
- minhash_lsh_pairs:  MinHash signatures banded into LSH buckets; bucket
                      join proposes candidates, exact Jaccard verifies.
                      Hash family = md5(i || '_' || shingle) — engine-
                      agnostic (identical strings in Spark and DuckDB),
                      deterministic, no RNG.
- simhash64:          64-bit SimHash fingerprint per doc from md5 bits of
                      shingles (near-dup = small Hamming distance).

Scale notes: every operator is shuffle-bounded by the shingle/bucket
join, never by pairwise comparison; hot shingles (stop-phrases) can be
df-capped before the join (shingle_df_cap) exactly like hot terms in the
index build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastmorph_spark.tokenize import tokenize_expr


def _shingles(df: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle)."""
    from fastmorph_spark.index.build import ensure_parallelism

    toks = tokenize_expr(text_col)
    # widen a narrower-than-cores scan BEFORE tokenize+explode (guide
    # §2.5): the single-split fixture otherwise computes every shingle —
    # and each downstream per-shingle md5 — on one task; no-op at scale,
    # and repartitioning the compact doc rows beats shuffling the
    # exploded shingle rows
    df = ensure_parallelism(df.select(F.col(id_col).alias("doc_id"),
                                      F.col(text_col)), "doc_id")
    out = df.select(F.col("doc_id"), toks.alias("t"))
    out = out.withColumn("n_tok", F.size("t")).filter(F.col("n_tok") >= n)
    idx = F.sequence(F.lit(0), F.col("n_tok") - n)
    shingle = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, n))
    )
    return out.select("doc_id", F.explode(F.array_distinct(shingle)).alias("shingle"))


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical docs: (content_sha256, dup_count,
    group_rep), group_rep = smallest doc_id of the group (the canonical
    doc a pipeline keeps). One row per group with SCALAR columns only —
    a degenerate corpus-wide duplicate (10^6+ identical docs) stays one
    bounded row, never a giant collect_list array (VERDICT r03 #6).
    Membership rows come from exact_duplicate_members."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("content_sha256"))
        .groupBy("content_sha256")
        .agg(
            F.count("*").cast("long").alias("dup_count"),
            # no cast: id_col is generic (string ids must survive — a
            # long cast would NULL them and silently empty drop_list)
            F.min("doc_id").alias("group_rep"),
        )
        .filter(F.col("dup_count") > 1)
    )


def exact_duplicate_members(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exploded membership of exact-dup groups: (doc_id, content_sha256,
    group_rep) — one row per duplicated doc. The groups frame (one bounded
    row per group) joins back to the hashed corpus on content_sha256: a
    key-partitioned shuffle join, no per-group arrays anywhere, so a
    10^6-way duplicate group distributes across tasks instead of building
    one giant row."""
    hashed = df.select(
        F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("content_sha256")
    )
    groups = exact_duplicates(df, text_col, id_col).select("content_sha256", "group_rep")
    return hashed.join(groups, "content_sha256").select("doc_id", "content_sha256", "group_rep")


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_df_cap: int | None = 5000,
) -> DataFrame:
    """Doc pairs (a < b) with n-gram Jaccard >= threshold.

    Inverted-shingle self-join: pairs sharing >=1 shingle get their
    intersection counted in one aggregation; set sizes come from a
    broadcast-joined per-doc count. No n² comparison; a pair is compared
    once per SHARED shingle (the aggregation dedupes).

    ``shingle_df_cap`` is ON by default: one corpus-wide boilerplate
    shingle shared by 10^6 docs would alone create ~10^12 candidate rows,
    so shingles with df > cap are dropped from BOTH the join and the set
    sizes (a near-ubiquitous shingle carries ~no similarity signal; the
    oracle mirrors the cap, so the defined semantics stay exact). Pass
    None to disable."""
    sh = _shingles(df, n, text_col, id_col)
    if shingle_df_cap is not None:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > shingle_df_cap).select("shingle")
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sh_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("sh_a") + F.col("sh_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig: array<string>) — sig[i] = min over shingles of
    md5(i || '_' || shingle). String-min MinHash: deterministic, identical
    in any engine with md5, no RNG, no integer-hash mismatch risk."""
    sh = _shingles(df, n, text_col, id_col)
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}_"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select("doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope=None,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified with EXACT Jaccard.

    bands of rows r = num_hashes/bands; a pair lands in a bucket iff one
    band's rows all match (P ≈ 1-(1-j^r)^bands). Exact verification keeps
    the output deterministic and threshold-exact — LSH only prunes.
    """
    rows_per_band = num_hashes // bands
    # the shingle table feeds FOUR subtrees (signatures, set sizes, and
    # both sides of the exact verify) — persist it or tokenize+shingle
    # the corpus four times (MEMORY_AND_DISK: spills, never recomputes).
    # Cache lifetime: backs the returned lazy plan — pass scope= to free
    # on scope close (VERDICT r03 #7), else the CALLER owns it
    # (clearCache() between pipeline stages in long-lived sessions)
    from fastmorph_spark.cache import pin

    sh = pin(_shingles(df, n, text_col, id_col), scope)
    # ONE per-doc aggregation for signatures AND set sizes (optimization
    # r06, guide §2.3 "aggregate before you shuffle"): the old plan ran
    # two separate groupBy(doc_id) passes over the shingle table (one for
    # the 16 mins, one for count) — same key, same shuffle, fused here.
    # Pinned: it feeds the bucket explode (both self-join sides — a
    # broadcast build is never exchange-reused with the probe side, so
    # without the pin the 16-way md5 agg runs TWICE) and both size joins.
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}_"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    per_doc = pin(
        sh.groupBy("doc_id").agg(*mins, F.count("*").cast("long").alias("n_sh")),
        scope,
    )
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws("|", *[F.col(f"h{bi * rows_per_band + r}") for r in range(rows_per_band)]).alias("key"),
        )
        for bi in range(bands)
    ]
    # carry the set size on the bucket rows (8 bytes/row) so the final
    # Jaccard needs NO size joins — the candidate pair arrives with both
    # sizes attached (the simhash_candidates carry pattern; optimization
    # r06, guide §2.3 "shuffle keys and metadata instead of payloads":
    # two whole join stages — and their exchanges — disappear)
    buckets = per_doc.select(
        "doc_id", "n_sh", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", "n_sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = pin(
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                F.col("a.n_sh").alias("sh_a"), F.col("b.n_sh").alias("sh_b"))
        .distinct(),
        scope,
    )
    # exact verify: intersection of shingle sets for candidates only.
    # Semi-join-reduce the second join's big side first (guide §3.2): only
    # shingles of docs that actually appear as a candidate's b-side cross
    # the (doc_b, shingle) exchange — the full shingle table never
    # shuffles twice. cand is pinned above: it feeds this semi-join and
    # the verify probe, and recomputing it would repeat the LSH self-join.
    sh_b = sh.join(cand.select(F.col("doc_b").alias("doc_id")).distinct(),
                   "doc_id", "left_semi").withColumnRenamed("doc_id", "doc_b")
    inter = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b", "sh_a", "sh_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("sh_a") + F.col("sh_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits a signed 64-bit long in
                   # Spark AND DuckDB (engine-agnostic oracle arithmetic)


def simhash(df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash: long) — 60-bit SimHash over n-gram shingles.

    Bit b of md5(shingle) votes +1/-1; the fingerprint sets bit b iff the
    vote sum is positive. Pure column expressions (conv + shiftright), no
    UDF, codegen'd end to end. Near-duplicates differ in few bits
    (Hamming distance)."""
    sh = _shingles(df, n, text_col, id_col)
    h = F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
    sh = sh.withColumn("h", h)
    votes = [
        F.sum(
            F.when((F.shiftright(F.col("h"), b) % 2) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = sh.groupBy("doc_id").agg(*votes)
    total = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        total = total + F.when(F.col(f"v{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0))
    return agg.select("doc_id", total.alias("simhash"))


def simhash_neardup_pairs(df: DataFrame, max_hamming: int = 8, n: int = 2,
                          text_col: str = "text", id_col: str = "doc_id",
                          n_bands: int | None = None) -> DataFrame:
    """Pairs (a < b) whose SimHashes differ in <= max_hamming bits.

    Candidate generation = Manku-style COMBINATION banding (the block-
    permutation scheme from the Google near-dup paper): split the
    fingerprint into m bands; a pair within Hamming radius k differs in at
    most k bands, so it agrees exactly on SOME (m-k)-band combination —
    the C(m, k) combination keys propose all true pairs (pigeonhole,
    exhaustive) and bit_count verifies exactly.

    Key width matters at scale: the naive 1-band key (m = k+1) is only
    ~60/(k+1) bits — ~128 buckets per band at k=8, i.e. ~N²/128 candidates.
    Combination keys are (m-k)·60/m bits wide: with the default m = k+3
    each key is ~3·60/m bits (e.g. k=3 -> m=6 -> 30-bit keys -> candidate
    count ~C(6,3)·N²/2^30, linear in N up to ~10^8 docs per shard; raise
    n_bands for wider keys at the cost of more combinations)."""
    import itertools

    k = max_hamming
    m = n_bands if n_bands is not None else k + 3
    assert m > k, "need more bands than the Hamming radius"
    base, rem = divmod(SIMHASH_BITS, m)
    widths = [base + (1 if i < rem else 0) for i in range(m)]
    offsets = [sum(widths[:i]) for i in range(m)]
    band_val = [
        (F.shiftright(F.col("simhash"), offsets[i]) % F.lit(2 ** widths[i]))
        for i in range(m)
    ]
    combos = list(itertools.combinations(range(m), m - k))
    # codegen shape: the m band values are computed ONCE into an array
    # column and the C(m, m-k) combinations are a literal-only array of
    # index lists, with the key assembled by a transform/element_at HOF.
    # Inlining the band expressions into every combination struct (the
    # naive form) emits C(m,k)*(m-k) shift/mod/concat expression trees
    # into one generated method — at k=8 (m=11, 165 combos) that breaks
    # Janino's 64 KB method limit and drops the whole banding stage to
    # interpreted execution.
    bands = F.array(*[band_val[i].cast("string") for i in range(m)])
    combo_idx = F.array(*[
        F.struct(
            F.lit(ci).alias("combo"),
            F.array(*[F.lit(int(i)) for i in c]).alias("idx"),
        )
        for ci, c in enumerate(combos)
    ])
    sh = simhash(df, n, text_col, id_col)
    key = F.concat_ws("_", F.transform(
        F.col("b.idx"), lambda i: F.element_at(F.col("_bands"), i + 1)
    ))
    bk = sh.select("doc_id", "simhash", bands.alias("_bands"),
                   F.explode(combo_idx).alias("b")) \
        .select("doc_id", "simhash", F.col("b.combo").alias("combo"), key.alias("key"))
    a, b = bk.alias("a"), bk.alias("b")
    cand = (
        a.join(b, (F.col("a.combo") == F.col("b.combo")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", hamming.cast("int")) \
        .filter(F.col("hamming") <= max_hamming) \
        .select("doc_a", "doc_b", "hamming")


def dup_groups(pairs: DataFrame, scope=None) -> DataFrame:
    """Connected components over a near-dup pair list -> (doc_id,
    group_rep) for every doc that appears in a pair, group_rep = the
    smallest doc_id reachable (the canonical representative a training
    pipeline keeps; everything else is dropped).

    Iterative min-label propagation — the standard distributed CC shape:
    each round joins current labels across the (symmetrized, persisted)
    edge list and keeps the elementwise min; rounds = O(component
    diameter), which for near-dup graphs is tiny (dup clusters are dense).
    Every step is a key-partitioned join/agg — no driver-side graph, no
    assumption the component fits anywhere."""
    from fastmorph_spark.cache import adopt, local_checkpoint

    edges = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    # Lineage truncation at the base (optimization r06, guide §3.3/§7.3):
    # the edge list embeds the WHOLE upstream pair-mining DAG (for the
    # minhash pipeline: ~1700 plan nodes at sf0.01), and the loop embeds
    # it again every round on top of `labels` being referenced twice —
    # measured ~5 s of pure Catalyst re-analysis PER ROUND and a 7000+
    # Exchange static plan for the returned frame. localCheckpoint cuts
    # the base to one LogicalRDD node so each round's plan is a handful
    # of operators; block lifetime follows `scope` (cache.local_checkpoint).
    edges = local_checkpoint(
        edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct(),
        scope,
    )
    labels = edges.select("a").distinct().withColumn("label", F.col("a"))
    # Long-diameter guard: `labels` is still referenced twice per round,
    # so the plan doubles per iteration off the (now tiny) base — every
    # CHECKPOINT_EVERY rounds the round result is checkpointed too,
    # capping the plan at <= 2^CHECKPOINT_EVERY x base (the same
    # superstep discipline as ops/graph.py pagerank). Near-dup graphs
    # converge in 2-3 rounds and never reach it.
    CHECKPOINT_EVERY = 4
    rounds = 0
    labels_cached = False  # round-0 labels is an unpersisted plan
    while True:
        nbr = (
            edges.join(labels.withColumnRenamed("a", "b"), "b")
            .groupBy("a").agg(F.min("label").alias("nl"))
        )
        new = (
            labels.join(nbr, "a", "left")
            .select("a", F.least("label", F.coalesce("nl", "label")).alias("label"))
        )
        rounds += 1
        if rounds % CHECKPOINT_EVERY == 0:
            new = local_checkpoint(new, scope)
            new_cached = False
        else:
            new = new.persist()
            new_cached = True
        changed = (
            new.join(labels.withColumnRenamed("label", "old"), "a")
            .filter(F.col("label") != F.col("old")).count()
        )
        if labels_cached:
            labels.unpersist()
        labels, labels_cached = new, new_cached
        if changed == 0:
            break
    # the converged labels stay persisted: they back the returned plan and
    # their lineage is the remaining round chain — unpersisting here would
    # re-run it at the caller's first action. Pass scope= to free them on
    # scope close (VERDICT r03 #7), else the caller owns the cache
    # (clearCache() in long-lived sessions — ADVICE r02). When the last
    # round landed on a checkpoint, re-pin the (tiny, converged,
    # lineage-free) frame so the scope contract still has a handle.
    if not labels_cached:
        labels = labels.persist()
    adopt(labels, scope)
    return labels.select(
        F.col("a").alias("doc_id"), F.col("label").alias("group_rep")
    ).orderBy("doc_id")


def drop_list(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope=None,
) -> DataFrame:
    """The end-to-end dedup DECISION a training pipeline consumes:
    (doc_id, reason) for every doc to DROP — exact duplicates keep the
    smallest doc_id of each sha256 group (reason 'exact'); near-dup
    components (MinHash-LSH pairs -> connected components) keep their
    group_rep (reason 'near'); 'exact' wins when both apply. Everything
    not listed is kept."""
    ex_drop = exact_duplicate_members(df, text_col, id_col) \
        .filter(F.col("doc_id") != F.col("group_rep")).select("doc_id")
    pairs = minhash_lsh_pairs(df, n, num_hashes, bands, threshold, text_col,
                              id_col, scope=scope)
    near_drop = dup_groups(pairs, scope=scope) \
        .filter(F.col("doc_id") != F.col("group_rep")).select("doc_id")
    return (
        ex_drop.select("doc_id", F.lit("exact").alias("reason"))
        .unionByName(
            near_drop.join(ex_drop, "doc_id", "left_anti")
            .select("doc_id", F.lit("near").alias("reason"))
        )
        .orderBy("doc_id")
    )


# ---- sub-document (span-level) dedup (VERDICT r04 #7) -----------------

SPAN_TOKENS = 8  # tokens per span window (fixture default; prod ~50-200)


def doc_spans(df: DataFrame, span_tokens: int = SPAN_TOKENS,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, span_idx, span_key): fixed token windows (stride = width,
    trailing partial window dropped), keyed by md5 of the space-joined
    span text. Fixed windows — not shingles — because the DEDUP unit must
    tile the doc: every token belongs to exactly one span, so a drop list
    at span granularity is a partition of the doc, and the explode is
    n_tokens/W rows per doc instead of n_tokens. Pure Catalyst (tokenize
    expression twin + transform/slice HOFs), zero Python."""
    toks = tokenize_expr(text_col)
    out = df.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    out = out.withColumn("n_span",
                         (F.size("t") / span_tokens).cast("int")) \
             .filter(F.col("n_span") >= 1)
    span = F.transform(
        F.sequence(F.lit(0), F.col("n_span") - 1),
        lambda i: F.md5(F.concat_ws(
            " ", F.slice(F.col("t"), i * span_tokens + 1, span_tokens))),
    )
    return out.select(
        "doc_id", F.posexplode(span).alias("span_idx", "span_key")
    ).withColumn("span_idx", F.col("span_idx").cast("long"))


def span_duplicates(df: DataFrame, span_tokens: int = SPAN_TOKENS,
                    text_col: str = "text", id_col: str = "doc_id",
                    scope=None) -> DataFrame:
    """Cross-document span-level duplication report: one row per span
    INSTANCE whose content occurs in >= 2 distinct docs —
    (doc_id, span_idx, span_key, n_docs), the evidence a sub-document
    dedup/decontam policy consumes (a doc embedding one verbatim
    paragraph of another is droppable at span granularity).

    Scale shape: one explode (n_tokens/W rows), ONE groupBy(span_key)
    with map-side partials, one key-partitioned join back — the dedup
    envelope, never pairwise. A pathological span shared by 10^6 docs is
    one group row; its join fan-out is the honest report size. The spans
    frame feeds BOTH the agg and the join-back (plan audit shows two
    Generates otherwise) — pass ``scope`` to pin it and tokenize the
    corpus once; with scope=None the recompute is accepted (the pin
    would outlive the call, cache.py contract)."""
    spans = doc_spans(df, span_tokens, text_col, id_col)
    if scope is not None:
        spans = scope.pin(spans)
    per = (
        spans.groupBy("span_key")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )
    return (
        spans.join(per, "span_key")
        .select("doc_id", "span_idx", "span_key", "n_docs")
        .orderBy("doc_id", "span_idx")
    )


def span_drop_list(df: DataFrame, span_tokens: int = SPAN_TOKENS,
                   text_col: str = "text", id_col: str = "doc_id",
                   scope=None) -> DataFrame:
    """The span-granular drop DECISION: (doc_id, span_idx, reason
    'span_dup') for every duplicated-span instance NOT owned by the
    group's canonical doc (min doc_id holding the span — group_rep
    semantics, matching exact/near dedup). The canonical doc keeps its
    copy; every other doc drops that span. ``scope`` as in
    span_duplicates (pin the twice-read spans frame)."""
    spans = doc_spans(df, span_tokens, text_col, id_col)
    if scope is not None:
        spans = scope.pin(spans)
    per = (
        spans.groupBy("span_key")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"),
             F.min("doc_id").alias("span_rep"))
        .filter(F.col("n_docs") >= 2)
    )
    return (
        spans.join(per, "span_key")
        .filter(F.col("doc_id") != F.col("span_rep"))
        .select("doc_id", "span_idx", F.lit("span_dup").alias("reason"))
        .orderBy("doc_id", "span_idx")
    )
