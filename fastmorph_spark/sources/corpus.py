"""S1/S2 — corpus sources: Iceberg (preferred) / parquet (fallback), the
driver fixture adapter, and the deterministic synthetic skewed corpus.

Contract input shape (BASELINE.json input_hint):
    (repo:string, path:string, commit:string, lang:string, content:string)

The reference (fastmorph) bulk-loads a MySQL corpus into RAM at startup
[PK-high, SURVEY.md §3.1]; our analog is a declarative scan that Catalyst
prunes/pushes into — at 100 TB the scan never materializes unused columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")


def read_corpus(spark: SparkSession, table_or_path: str) -> DataFrame:
    """Read the source-code corpus. Iceberg table name when the catalog has
    it; any path falls back to parquet (this sandbox ships no Iceberg jars —
    verified; the format is isolated to this one function on purpose)."""
    if "/" not in table_or_path:
        try:
            return spark.read.table(table_or_path).select(*CORPUS_COLUMNS)
        except Exception:
            pass
    return spark.read.parquet(table_or_path).select(*CORPUS_COLUMNS)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver fixture table (TESTDATA.md): {sf_dir}/{name}.parquet."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def documents_as_corpus(documents: DataFrame) -> DataFrame:
    """Adapt the driver `documents` fixture to the contract corpus schema
    (FIXTURES.md §1): deterministic and invertible on doc_id."""
    return documents.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.substring(F.sha2(F.col("text"), 256), 1, 12).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def with_doc_ids(corpus: DataFrame) -> DataFrame:
    """Assign deterministic dense doc_ids = rank over sorted
    (repo, path, commit), computed in TWO distributed phases — never a
    global unpartitioned row_number (a single-reducer sort at 10^12 rows).

    Phase 1: rank WITHIN each repo (window partitioned by repo — 10^6+
    independent groups, fully distributed; skew bounded by the largest
    repo). Phase 2: per-repo row counts -> exclusive prefix sums ordered
    by repo (one task over |repos| rows, not |docs| rows) -> joined back
    on repo (co-partitioned with phase 1's shuffle key).

    doc_id = offset(repo) + rank_within_repo - 1 == the global sorted rank,
    independent of input partitioning (determinism rule, SURVEY.md §1.3).
    NOT monotonically_increasing_id. Corpora already carrying a unique
    `doc_id` keep it as-is.
    """
    if "doc_id" in corpus.columns:
        return corpus
    w_repo = Window.partitionBy("repo").orderBy("path", "commit")
    local = corpus.withColumn("_r", F.row_number().over(w_repo).cast("long"))
    counts = corpus.groupBy("repo").agg(F.count("*").alias("_c"))
    w_cum = Window.orderBy("repo").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "repo", F.coalesce(F.sum("_c").over(w_cum), F.lit(0)).cast("long").alias("_off")
    )
    return (
        local.join(offsets, "repo")
        .withColumn("doc_id", F.col("_off") + F.col("_r") - 1)
        .drop("_r", "_off")
    )


def synth_corpus(spark: SparkSession, n_docs: int, n_repos: int = 50,
                 vocab_size: int = 5000, zipf_steps: int = 32) -> DataFrame:
    """Deterministic skewed synthetic corpus in the contract shape
    (FIXTURES.md §3). Pure function of the row index — identical content at
    any partitioning/parallelism, no RNG state, no external data.

    Token stream: for doc i, position j, the term rank is derived from
    xxhash64(i*1e6+j) folded through a Zipf-ish staircase: half of all
    positions land in the top ``zipf_steps`` ranks (guaranteed hot terms,
    df ~= N, exercising the salting path), the rest spread over the full
    vocabulary. Doc length = 50 + (xxhash64(i) mod 400).

    Built from spark.range + column expressions only -> generation is
    itself distributed and Catalyst-codegen'd (no Python).
    """
    docs = spark.range(n_docs).select(F.col("id").alias("i"))
    h = F.abs(F.xxhash64(F.col("i")))
    docs = docs.withColumn("doc_len", (F.lit(50) + h % 400).cast("int"))
    # one row per token position
    tok = docs.select("i", "doc_len", F.explode(F.sequence(F.lit(0), F.col("doc_len") - 1)).alias("j"))
    ph = F.abs(F.xxhash64(F.col("i") * 1000003 + F.col("j")))
    # staircase: even draws -> hot head ranks, odd draws -> uniform tail
    rank = F.when(ph % 2 == 0, (ph / 2).cast("long") % zipf_steps) \
            .otherwise((ph / 2).cast("long") % vocab_size)
    tok = tok.withColumn("term", F.concat(F.lit("t"), rank.cast("string")))
    content = (
        tok.groupBy("i")
        .agg(F.concat_ws(" ", F.sort_array(F.collect_list(F.struct("j", "term")))["term"]).alias("_c"))
    )
    # sort_array on struct(j, term) orders by j -> positions preserved
    return content.select(
        F.concat(F.lit("repo-"), (F.col("i") % n_repos).cast("string")).alias("repo"),
        F.concat(F.lit("src/m"), (F.col("i") % 97).cast("string"), F.lit("/f"),
                 F.col("i").cast("string"), F.lit(".py")).alias("path"),
        F.substring(F.sha2(F.concat(F.lit("c"), F.col("i").cast("string")), 256), 1, 40).alias("commit"),
        F.element_at(F.array(*[F.lit(x) for x in ("py", "java", "c", "go", "scala")]),
                     (F.col("i") % 5 + 1).cast("int")).alias("lang"),
        F.col("_c").alias("content"),
        F.col("i").alias("doc_id"),
    )
