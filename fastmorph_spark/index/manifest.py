"""M4 — S4/J6: resumable index builds with per-partition lineage+counters.

BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics ... counters (terms, postings, bytes) recorded per
partition".

Protocol (two-phase; see SURVEY.md §3.2):

Phase 0 (corpus stats, checkpointed as partition_id = -1): docs registry
(sha256 + doc_len), doc_lens projection, and the 1-row global stats.
These must be pinned before any partition packs, because impact
normalization depends on the FINAL avgdl (SURVEY.md §7 hard parts).
doc_len comes from regexp_count (tokenizer-parity-tested), so phase 0
never tokenizes.

Phase 1 (per-partition checkpoints): each batch b reads ONLY its doc-id
range of the corpus (filter pushed to the scan; with a doc_id-sorted
corpus layout this is min/max row-group pruning), tokenizes it
partition-locally (postings carry dl — no doc_lens join), packs via the
salted (pack_bucket, doc_shard) repartition — the ONLY shuffle — and
writes postings/batch=b/term_bucket=j/, then appends ONE manifest row.
A crash between data write and manifest append is safe: an unrecorded
batch re-runs and overwrites its directory (content is deterministic).
Earlier designs materialized logical postings corpus-wide in phase 0;
that cost a full extra write+read of the largest intermediate (~30% of
build wall) to avoid re-tokenizing crashed batches — but tokenization is
partition-local and cheap, so re-tokenizing ONE batch on resume is the
better trade at every scale.

Resume = left_anti join of batch ids against manifest rows with
status='done' AND the same lineage signature. AQE cannot disturb this:
the checkpoint key is the deterministic doc-id range, not
spark_partition_id().

Finalize (idempotent): the FULL dictionary (df, cf, max_score) derives
from packed block metadata alone (blocks partition each term's postings
exactly) — one pass over ~|postings|/block_size block rows, no second
tokenization.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastmorph_spark.constants import BLOCK_SIZE, DOC_SHARD_SIZE
from fastmorph_spark.index.build import build_docs, build_postings, global_stats
from fastmorph_spark.index.pack import dictionary_from_packed, pack_postings

MANIFEST_SCHEMA = (
    "partition_id int, status string, n_terms long, n_postings long, "
    "n_blocks long, bytes_written long, input_snapshot string, "
    "attempt int, wall_ms long, finished_at string"
)


def _snapshot(input_path: str, doc_shard_size: int, block_size: int, n_batches: int) -> str:
    """Lineage signature: a resumed run must match the original input and
    layout parameters exactly, or completed work is not reusable."""
    return json.dumps(
        {"input": input_path, "doc_shard_size": doc_shard_size,
         "block_size": block_size, "n_batches": n_batches},
        sort_keys=True,
    )


def read_manifest(spark: SparkSession, out_path: str) -> DataFrame:
    try:
        return spark.read.parquet(f"{out_path}/manifest")
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


# pyarrow types matching MANIFEST_SCHEMA (Spark int->int32, long->int64)
_MANIFEST_FIELDS = [
    ("partition_id", "int32"), ("status", "string"), ("n_terms", "int64"),
    ("n_postings", "int64"), ("n_blocks", "int64"), ("bytes_written", "int64"),
    ("input_snapshot", "string"), ("attempt", "int32"), ("wall_ms", "int64"),
    ("finished_at", "string"),
]

_manifest_lock = __import__("threading").Lock()


def _append_manifest(spark: SparkSession, out_path: str, row: tuple) -> None:
    """Commit ONE manifest row.

    Must be safe under concurrent driver threads (the dictionary job and the
    phase-1 batch loop both checkpoint). A Spark `append` write is NOT: two
    simultaneous jobs share the same FileOutputCommitter `_temporary/0`
    under {out}/manifest, and whichever commits first deletes it out from
    under the other (observed as FileNotFoundException mid-suite). A 1-row
    commit also doesn't need a Spark job at all — write the parquet file
    driver-side via pyarrow with a unique name, then atomically rename into
    place. Falls back to a lock-serialized Spark write for non-local paths
    (hdfs://, s3a://) where the driver can't write directly.
    """
    import re

    path = f"{out_path}/manifest"
    if re.match(r"^[a-z][a-z0-9+.-]*://", path) and not path.startswith("file://"):
        with _manifest_lock:
            spark.createDataFrame([row], MANIFEST_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(path)
        return

    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    local = path[len("file://"):] if path.startswith("file://") else path
    os.makedirs(local, exist_ok=True)
    schema = pa.schema([(n, getattr(pa, t)()) for n, t in _MANIFEST_FIELDS])
    tbl = pa.Table.from_arrays(
        [pa.array([v], type=f.type) for v, f in zip(row, schema)], schema=schema
    )
    name = f"part-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(local, f".{name}.tmp")
    pq.write_table(tbl, tmp)
    os.rename(tmp, os.path.join(local, name))


def _done_ids(spark: SparkSession, out_path: str, snapshot: str) -> set[int]:
    rows = (
        read_manifest(spark, out_path)
        .filter(
            (F.col("status").isin("done", "phase0_done", "dict_done"))
            & (F.col("input_snapshot") == snapshot)
        )
        .select("partition_id")
        .collect()
    )
    return {r["partition_id"] for r in rows}


def pending_batches(spark: SparkSession, out_path: str, n_batches: int, snapshot: str) -> list[int]:
    """J6 — all batches ∖ done batches (matching lineage)."""
    done = _done_ids(spark, out_path, snapshot)
    return [b for b in range(n_batches) if b not in done]


def _now() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def build_index_resumable(
    spark: SparkSession,
    documents: DataFrame,
    out_path: str,
    input_path: str = "",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_batches: int = 8,
    doc_shard_size: int = DOC_SHARD_SIZE,
    block_size: int = BLOCK_SIZE,
    max_batches_this_run: int | None = None,
    attempt: int = 1,
) -> dict:
    """Resumable build. Returns {'batches_run': [...], 'complete': bool,
    'counters': {...}}.

    `max_batches_this_run` exists for kill/resume testing: process only
    that many pending batches, then stop (simulating a crash AFTER some
    checkpoints landed).
    """
    snapshot = _snapshot(input_path, doc_shard_size, block_size, n_batches)

    # ---------------- phase 0: tokenize once, pin global artifacts
    import os
    import sys

    profile = os.environ.get("FM_PROFILE") == "1"

    def _p(tag: str, t: float) -> None:
        if profile:
            print(f"FM_PROFILE phase0.{tag} {time.perf_counter() - t:.2f}s", file=sys.stderr)

    if -1 not in _done_ids(spark, out_path, snapshot):
        t0 = time.perf_counter()
        ts = time.perf_counter()
        # doc_len == token count via regexp_count (tokenizer-parity
        # tested + Σtf==doc_len invariant-tested) — no tokenization here
        build_docs(documents, id_col=id_col).write.mode("overwrite").parquet(f"{out_path}/docs")
        docs_reg = spark.read.parquet(f"{out_path}/docs")
        docs_reg.select("doc_id", F.col("doc_len").alias("dl")) \
            .write.mode("overwrite").parquet(f"{out_path}/doc_lens")
        global_stats(spark.read.parquet(f"{out_path}/doc_lens")) \
            .write.mode("overwrite").parquet(f"{out_path}/stats")
        _p("docs_doclens_stats", ts)
        _append_manifest(spark, out_path, (
            -1, "phase0_done", 0, 0, 0, 0,
            snapshot, attempt, int((time.perf_counter() - t0) * 1000), _now(),
        ))

    stats = spark.read.parquet(f"{out_path}/stats")
    ts = time.perf_counter()
    max_doc = documents.agg(F.max(id_col).alias("m")).collect()[0]["m"] or 0
    _p("max_doc", ts)
    batch_width = (max_doc // n_batches) + 1

    # ---------------- phase 1: per-batch tokenize+pack with checkpoints
    todo = pending_batches(spark, out_path, n_batches, snapshot)
    if max_batches_this_run is not None:
        todo = todo[:max_batches_this_run]

    ran: list[int] = []
    for b in todo:
        t0 = time.perf_counter()
        slice_df = documents.filter(
            (F.col(id_col) >= b * batch_width) & (F.col(id_col) < (b + 1) * batch_width)
        )
        batch_postings = build_postings(slice_df, text_col=text_col, id_col=id_col)
        packed = pack_postings(batch_postings, None, stats, doc_shard_size, block_size)
        # counters ride along the write job itself (CollectMetrics): no
        # persist (memory pin) and no second pass over the binary payloads
        from pyspark.sql import Observation

        obs = Observation(f"pack_batch_{b}")
        packed = packed.observe(
            obs,
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_postings"),
            F.count(F.lit(1)).alias("n_blocks"),
            F.coalesce(
                F.sum(F.length("doc_gaps") + F.length("tfs") + F.length("dls") + F.length("positions")),
                F.lit(0),
            ).alias("bytes_written"),
        )
        # co-locate each term_bucket in one task before partitionBy:
        # otherwise every reduce task writes a file into every bucket
        # dir (tasks × buckets tiny files)
        from fastmorph_spark.constants import N_TERM_BUCKETS

        packed.repartition(N_TERM_BUCKETS, "term_bucket") \
            .write.partitionBy("term_bucket").mode("overwrite").parquet(
                f"{out_path}/postings/batch={b}"
            )
        c = obs.get
        # exact distinct terms (observe can't do DISTINCT): column-pruned
        # scan of just-written dictionary-encoded `term` column — cheap
        n_terms = (
            spark.read.parquet(f"{out_path}/postings/batch={b}")
            .agg(F.countDistinct("term").alias("t")).collect()[0]["t"]
        )
        _append_manifest(spark, out_path, (
            b, "done", n_terms, c["n_postings"], c["n_blocks"],
            c["bytes_written"], snapshot, attempt,
            int((time.perf_counter() - t0) * 1000), _now(),
        ))
        ran.append(b)

    # ---------------- finalize (idempotent): dictionary from block metadata
    # ONE manifest read serves the remaining-check AND the counters
    # (driver-side job launches are the serial floor at small scale)
    mrows = read_manifest(spark, out_path).filter(F.col("input_snapshot") == snapshot).collect()
    done = {r["partition_id"] for r in mrows if r["status"] in ("done", "phase0_done")}
    remaining = [b for b in range(n_batches) if b not in done]
    if not remaining:
        packed_all = spark.read.parquet(f"{out_path}/postings")
        dictionary_from_packed(packed_all, stats).write.mode("overwrite").parquet(
            f"{out_path}/dictionary"
        )

    # latest attempt wins per partition (a batch never double-counts)
    by_part: dict[int, dict] = {}
    for r in mrows:
        if r["status"] == "done":
            prev = by_part.get(r["partition_id"])
            if prev is None or r["attempt"] > prev["attempt"]:
                by_part[r["partition_id"]] = r
    drows = list(by_part.values())
    counters = {
        "n_postings": sum(r["n_postings"] for r in drows),
        "n_blocks": sum(r["n_blocks"] for r in drows),
        "payload_bytes": sum(r["bytes_written"] for r in drows),
        "batches_done": len(drows),
    }
    return {"batches_run": ran, "complete": not remaining, "counters": counters}
