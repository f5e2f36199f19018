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
from fastmorph_spark.index.build import build_docs, build_postings
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


def _resolved_scheme(spark: SparkSession | None, path: str) -> str:
    """The filesystem scheme `path` RESOLVES to on this deployment.

    An explicit URI scheme wins; a schemeless path resolves against
    Hadoop's fs.defaultFS — exactly as Spark's readers/writers do. The
    driver-local pyarrow/os fast paths below must only fire when the
    resolved scheme is file://: on a cluster whose defaultFS is HDFS/S3 a
    schemeless out_path means Spark writes postings/docs to the default
    FS, and writing the manifest/stats to the DRIVER'S LOCAL DISK would
    split-brain the index (resume re-runs everything, queries read stale
    stats) — ADVICE r02 (medium)."""
    import re

    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", path)
    if m:
        return m.group(1).lower()
    if spark is not None:
        try:
            default = spark.sparkContext._jsc.hadoopConfiguration().get(
                "fs.defaultFS", "file:///"
            ) or "file:///"
        except Exception:  # non-JVM test doubles
            default = "file:///"
        m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", default)
        if m:
            return m.group(1).lower()
    return "file"


def _is_driver_local(spark: SparkSession | None, path: str) -> bool:
    return _resolved_scheme(spark, path) == "file"


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
    place. Falls back to a lock-serialized Spark write for paths that
    RESOLVE to a non-local filesystem (explicit hdfs://, s3a://, or a
    schemeless path under a remote fs.defaultFS — see _resolved_scheme).
    """
    path = f"{out_path}/manifest"
    if not _is_driver_local(spark, path):
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


def _write_stats(out_path: str, n_docs: int, avgdl: float, spark: SparkSession | None = None) -> None:
    """1-row stats parquet, written driver-side (pyarrow for local paths,
    a 1-row Spark write for remote filesystems; the values came from
    observed metrics — no extra corpus pass either way)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{out_path}/stats"
    if not _is_driver_local(spark, path):
        spark.createDataFrame([(n_docs, avgdl)], "n_docs long, avgdl double") \
            .coalesce(1).write.mode("overwrite").parquet(path)
        return
    local = path[len("file://"):] if path.startswith("file://") else path
    os.makedirs(local, exist_ok=True)
    for f in os.listdir(local):
        if f.endswith(".parquet"):
            os.remove(os.path.join(local, f))
    tbl = pa.Table.from_arrays(
        [pa.array([n_docs], type=pa.int64()), pa.array([avgdl], type=pa.float64())],
        names=["n_docs", "avgdl"],
    )
    pq.write_table(tbl, os.path.join(local, "part-stats.parquet"))


def _manifest_rows(spark: SparkSession, out_path: str) -> list[dict]:
    """All manifest rows as plain dicts — driver-side pyarrow for local
    paths (no Spark job: manifest reads sit on the serial critical path),
    Spark collect otherwise."""
    path = f"{out_path}/manifest"
    if not _is_driver_local(spark, path):
        return [r.asDict() for r in read_manifest(spark, out_path).collect()]
    import os

    local = path[len("file://"):] if path.startswith("file://") else path
    if not os.path.isdir(local):
        return []
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        return pq.read_table(local).to_pylist()
    except FileNotFoundError:
        return []  # genuinely absent: no checkpoints yet
    except pa.ArrowInvalid as e:
        # ignore ONLY the empty-directory case (no parquet files yet);
        # a corrupt/partially-written manifest must SURFACE — silently
        # returning [] would discard every checkpoint and re-run the
        # whole build (ADVICE r02)
        if "no files" in str(e).lower() or "empty" in str(e).lower():
            return []
        raise


def _refuse_if_flattened(spark: SparkSession, out_path: str) -> None:
    """Structural twin of the manifest 'compacting'/'compacted' guard:
    a flattened postings layout (term_bucket=* children, no batch=*)
    means compaction ran even if its manifest rows were lost — appending
    batch=N dirs would mix hive layouts. Driver-local paths only (remote
    filesystems can't be compacted by compact_postings anyway)."""
    import os

    path = f"{out_path}/postings"
    if not _is_driver_local(spark, path):
        return
    local = path[len("file://"):] if path.startswith("file://") else path
    if not os.path.isdir(local):
        return
    children = os.listdir(local)
    if any(c.startswith("term_bucket=") for c in children) and \
            not any(c.startswith("batch=") for c in children):
        raise ValueError(
            f"{out_path}/postings holds a flattened term_bucket=J layout "
            "(compacted, even though no manifest row says so); resumable "
            "batch writes into it would mix hive layouts. Build into a "
            "fresh out_path."
        )


def _done_ids(spark: SparkSession, out_path: str, snapshot: str) -> set[int]:
    return {
        r["partition_id"]
        for r in _manifest_rows(spark, out_path)
        if r["status"] in ("done", "phase0_done", "dict_done")
        and r["input_snapshot"] == snapshot
    }


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
    tokenizer: str = "ascii",
) -> dict:
    """Resumable build. Returns {'batches_run': [...], 'complete': bool,
    'counters': {...}}. ``tokenizer="uni"`` builds over the Unicode twin
    (threads into build_docs/build_postings; pack/query are agnostic).

    `max_batches_this_run` exists for kill/resume testing: process only
    that many pending batches, then stop (simulating a crash AFTER some
    checkpoints landed).
    """
    snapshot = _snapshot(input_path, doc_shard_size, block_size, n_batches)

    # a compacted index has flattened postings/term_bucket=J dirs; writing
    # postings/batch=N next to them would mix hive layouts and break
    # spark.read.parquet discovery (ADVICE r02) — compaction journals an
    # INTENT row before the swap and a completion row after (ADVICE r03
    # #1), so refuse on either. Belt-and-braces: also detect the
    # flattened layout STRUCTURALLY (postings/ holding term_bucket=*
    # children with no batch=*), which catches a compacted tree whose
    # manifest was lost or written by an older build.
    if any(r["status"] in ("compacting", "compacted")
           for r in _manifest_rows(spark, out_path)):
        raise ValueError(
            f"{out_path} holds (or is mid-swap to) a COMPACTED postings "
            "layout (manifest row status='compacting'/'compacted'); "
            "resumable batch writes into it would mix batch=N and "
            "term_bucket=J hive layouts. Build into a fresh out_path and "
            "compact after."
        )
    _refuse_if_flattened(spark, out_path)

    # per-step wall timings, returned in the result (and surfaced in the
    # bench report) — the scaling gate's diagnosis tool
    timings: dict[str, float] = {}

    def _p(tag: str, t: float) -> None:
        timings[tag] = round(time.perf_counter() - t, 3)

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(4)
    side_futures = []

    if -1 not in _done_ids(spark, out_path, snapshot):
        t0 = time.perf_counter()
        ts = time.perf_counter()
        # ONE corpus scan: the docs-registry write (sha256 + doc_len via
        # regexp_count — tokenizer-parity tested + Σtf==doc_len invariant-
        # tested, no tokenization) carries stats (n_docs, avgdl) AND
        # max_doc as observed metrics — no separate stats/max_doc jobs.
        # Stats must be pinned before any pack (impacts bake in the FINAL
        # avgdl). The phase-0 heavy work is deliberately NOT overlapped
        # with phase 1: sharing task slots with the pack inflated the
        # short 4N-core run's critical path (measured +35% pack wall)
        # while barely helping the N-core run.
        from pyspark.sql import Observation

        obs0 = Observation("phase0_stats")
        # coalesce: merge the many small scan splits into ~2 tasks/core —
        # same scan parallelism in waves, ~6x fewer output files to commit
        n_out = max(spark.sparkContext.defaultParallelism * 2, 16)
        build_docs(documents, id_col=id_col, tokenizer=tokenizer).coalesce(n_out).observe(
            obs0,
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.avg("doc_len").alias("avgdl"),
            F.max("doc_id").alias("max_doc"),
        ).write.mode("overwrite").parquet(f"{out_path}/docs")
        s0 = obs0.get
        _write_stats(out_path, int(s0["n_docs"]), float(s0["avgdl"] or 0.0), spark)
        max_doc = int(s0["max_doc"] or 0)
        _p("docs_stats", ts)

        # doc_lens is a tiny projection of docs consumed only by queries —
        # write it on a driver thread overlapping phase 1
        def _write_doc_lens():
            tsl = time.perf_counter()
            spark.read.parquet(f"{out_path}/docs") \
                .select("doc_id", F.col("doc_len").alias("dl")) \
                .write.mode("overwrite").parquet(f"{out_path}/doc_lens")
            _p("doc_lens_write", tsl)
            _append_manifest(spark, out_path, (
                -1, "phase0_done", 0, 0, 0, 0,
                snapshot, attempt, int((time.perf_counter() - t0) * 1000), _now(),
            ))

        side_futures.append(pool.submit(_write_doc_lens))
    else:
        ts = time.perf_counter()
        max_doc = documents.agg(F.max(id_col).alias("m")).collect()[0]["m"] or 0
        _p("max_doc", ts)

    stats = spark.read.parquet(f"{out_path}/stats")
    batch_width = (max_doc // n_batches) + 1

    # ---------------- phase 1: per-batch tokenize+pack with checkpoints
    pending_all = pending_batches(spark, out_path, n_batches, snapshot)
    todo = pending_all
    if max_batches_this_run is not None:
        todo = todo[:max_batches_this_run]

    ran: list[int] = []
    for b in todo:
        t0 = time.perf_counter()
        slice_df = documents.filter(
            (F.col(id_col) >= b * batch_width) & (F.col(id_col) < (b + 1) * batch_width)
        )
        batch_postings = build_postings(slice_df, text_col=text_col, id_col=id_col,
                                        positions_vb=True, tokenizer=tokenizer)
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
        # no repartition needed: each pack task holds exactly one
        # pack_bucket == one term_bucket (see pack_postings), so the
        # partitioned write makes one file in one directory per task
        ts = time.perf_counter()
        packed.write.partitionBy("term_bucket").mode("overwrite").parquet(
            f"{out_path}/postings/batch={b}"
        )
        c = obs.get
        _p(f"batch{b}_pack_write", ts)

        # exact distinct terms (observe can't do DISTINCT): column-pruned
        # scan of the just-written dictionary-encoded `term` column, on a
        # driver THREAD so the checkpoint commit overlaps the next batch
        # (crash before the append just re-runs this batch — safe)
        def _commit_batch(b=b, c=c, t0=t0):
            ts = time.perf_counter()
            bpath = f"{out_path}/postings/batch={b}"
            if not _is_driver_local(spark, bpath):
                n_terms = (
                    spark.read.parquet(bpath)
                    .agg(F.countDistinct("term").alias("t")).collect()[0]["t"]
                )
            else:
                # local layout: the term column of one batch is a few 10s of
                # MB — a driver-side pyarrow read skips ~512 Spark
                # file-open/footer roundtrips (~4s of fixed cost per batch)
                import pyarrow.dataset as pads

                local = bpath[len("file://"):] if bpath.startswith("file://") else bpath
                ds = pads.dataset(local, format="parquet", partitioning="hive")
                tbl = ds.to_table(columns=["term"])
                import pyarrow.compute as pc

                n_terms = len(pc.unique(tbl["term"]))
            _p(f"batch{b}_nterms", ts)
            _append_manifest(spark, out_path, (
                b, "done", n_terms, c["n_postings"], c["n_blocks"],
                c["bytes_written"], snapshot, attempt,
                int((time.perf_counter() - t0) * 1000), _now(),
            ))

        side_futures.append(pool.submit(_commit_batch))
        ran.append(b)

    # ---------------- finalize (idempotent): dictionary from block metadata
    # completeness is known driver-side (todo was ALL pending batches at
    # entry; `ran` is what this run finished), so the dictionary job can
    # start WHILE the last batch's n_terms commit thread still runs —
    # both are independent Spark jobs
    ts = time.perf_counter()
    remaining = [b for b in pending_all if b not in ran]
    if not remaining:
        packed_all = spark.read.parquet(f"{out_path}/postings")
        dictionary_from_packed(packed_all, stats).write.mode("overwrite").parquet(
            f"{out_path}/dictionary"
        )
    _p("finalize_dictionary", ts)

    # now join the overlapped side jobs (docs registry + batch commits)
    # and aggregate counters from the manifest (driver-side read)
    for f in side_futures:
        f.result()
    pool.shutdown()
    mrows = [r for r in _manifest_rows(spark, out_path) if r["input_snapshot"] == snapshot]

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
    return {"batches_run": ran, "complete": not remaining, "counters": counters,
            "timings": timings}
