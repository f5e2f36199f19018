"""S3 — index sink/scan: the on-disk physical index.

Layout ({path}/...):
  docs/        doc registry (doc_id, repo?, path?, commit?, lang?,
               content_sha256, doc_len)
  doc_lens/    (doc_id, dl)
  dictionary/  (term, df, cf, max_score)
  stats/       (n_docs, avgdl) — single row
  postings/    packed blocks, partitionBy(term_bucket) -> query-time
               FILE pruning on term hash; parquet min/max on `term`
               row-group-prunes within files; the `positions` column is
               only read by phrase/proximity queries (column pruning)

The reference keeps everything in RAM with no persistence [PK-med,
SURVEY.md §2.1 S3]; persistence + partition pruning is the Spark-native
replacement for its startup bulk load.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastmorph_spark.constants import BLOCK_SIZE, DOC_SHARD_SIZE
from fastmorph_spark.index.build import (
    build_docs,
    build_postings,
    global_stats,
)
from fastmorph_spark.index.pack import pack_postings


@dataclass
class Index:
    docs: DataFrame
    doc_lens: DataFrame
    dictionary: DataFrame
    stats: DataFrame
    postings: DataFrame  # packed blocks
    # case-preserving twin (per-slot case-SENSITIVE match, P5): packed
    # blocks + dictionary over the case-preserving tokenization. Token
    # boundaries are identical to the folded tokenization under the ASCII
    # contract (constants.TOKEN_PATTERN_CS), so positions — and therefore
    # doc_shard values — share one space with the folded twin, and
    # cross-twin doc-range pruning (search/packed.py) is sound. None when
    # the index was built without case_sensitive=True.
    postings_cs: DataFrame | None = None
    dictionary_cs: DataFrame | None = None
    # live tombstone set (doc_id rows) — docs deleted since the last
    # purge. Query paths exclude them immediately; BM25 stats stay at
    # pre-delete values until purge_tombstones (Lucene delete semantics,
    # index/tombstones.py). None = no live deletes.
    tombstones: DataFrame | None = None
    _stats_row: dict | None = None
    _tomb_ids = None  # memoized numpy mirror (tombstones.tombstone_ids)
    _tomb_bc = None   # memoized sc.broadcast of _tomb_ids (one per Index)

    def stats_row(self) -> dict:
        """(n_docs, avgdl) memoized — one driver round-trip per Index."""
        if self._stats_row is None:
            self._stats_row = self.stats.collect()[0].asDict()
        return self._stats_row

    @property
    def n_docs(self) -> int:
        return int(self.stats_row()["n_docs"])


def build_index_frames(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_shard_size: int = DOC_SHARD_SIZE,
    block_size: int = BLOCK_SIZE,
    pack_partitions: int | None = None,
    case_sensitive: bool = False,
    tokenizer: str = "ascii",
) -> Index:
    """Corpus -> all index DataFrames (lazy, unwritten).

    ``tokenizer="uni"`` builds the whole physical index (postings,
    dictionary, stats, impacts) over the Unicode tokenization — the
    non-Latin-corpus path (VERDICT r04 #1). The packed layout, WAND
    kernel, and slot decode are tokenizer-agnostic (they see terms as
    opaque strings and positions as ints), so everything downstream
    works unchanged — including the case-SENSITIVE twin (shared-boundary
    contract below).

    ``case_sensitive=True`` additionally packs the case-PRESERVING twin
    (VERDICT r03 #1): a second build_postings(fold_case=False) +
    pack_postings pass sharing the folded twin's stats (token boundaries —
    hence dl, n_docs, avgdl, doc_shard — are identical under the ASCII
    contract), so a {"case": True} slot at 100 TB reads pruned cs blocks
    instead of re-tokenizing the corpus. The cs dictionary derives from cs
    block metadata alone (dictionary_from_packed — no extra logical pass).
    """
    # uni + case_sensitive is supported (round 5, final): the uni cs twin
    # splits on the same \w+ boundaries without folding, so positions —
    # hence dl, doc_shard, stats — are shared wherever lower() is
    # boundary-preserving (1:1 case mappings: ASCII, Cyrillic — the
    # contract classes; caveat at tokenize.tokenize_py_uni_cs).
    if tokenizer == "code" and case_sensitive:
        raise NotImplementedError(
            "no case-sensitive twin for the code tokenizer: the boundary-"
            "insertion passes are case-DRIVEN, so a case-preserving "
            "tokenization cannot share the folded twin's position space"
        )
    from fastmorph_spark.index.build import doc_len_count
    from fastmorph_spark.index.pack import dictionary_from_packed

    docs = build_docs(documents, id_col=id_col, tokenizer=tokenizer)
    # slim pre-encoded variant: dictionary/doc_lens need only (term, tf,
    # doc_id), and the pack shuffle carries bytes instead of int arrays
    postings = build_postings(documents, text_col=text_col, id_col=id_col,
                              positions_vb=True, tokenizer=tokenizer)
    # ONE tokenize pass for the whole build (optimization r06, guide §1.2
    # step 1 / §2.4): doc_lens comes from a pure-JVM regexp_count scan
    # (token-count parity with the kernel is pinned by tests), the
    # dictionary from packed block METADATA (blocks partition each term's
    # postings exactly, so df/cf/max_impact are exact) — so the postings
    # kernel feeds ONLY the pack shuffle. Before: the build tokenized the
    # corpus 3x (doc_lens groupBy, dictionary groupBy, pack) + a 4th pass
    # for the eager avgdl collect.
    doc_lens = documents.select(
        F.col(id_col).alias("doc_id"),
        doc_len_count(text_col, tokenizer).alias("dl"),
    )
    stats = global_stats(doc_lens)
    # collect the 1-row stats ONCE (cheap scan — no tokenize, no shuffle);
    # pack + every query-time stats_row() reuse it driver-side
    srow = stats.collect()[0].asDict()
    packed = pack_postings(postings, None, stats, doc_shard_size, block_size,
                           n_partitions=pack_partitions, avgdl=float(srow["avgdl"]))
    dict_final = dictionary_from_packed(packed, stats)
    packed_cs = dict_cs = None
    if case_sensitive:
        postings_cs = build_postings(documents, text_col=text_col, id_col=id_col,
                                     fold_case=False, positions_vb=True,
                                     tokenizer=tokenizer)
        packed_cs = pack_postings(postings_cs, None, stats, doc_shard_size,
                                  block_size, n_partitions=pack_partitions,
                                  avgdl=float(srow["avgdl"]))
        dict_cs = dictionary_from_packed(packed_cs, stats)
    idx = Index(docs=docs, doc_lens=doc_lens, dictionary=dict_final, stats=stats,
                postings=packed, postings_cs=packed_cs, dictionary_cs=dict_cs)
    idx._stats_row = srow
    return idx


def build_lang_indexes(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    doc_shard_size: int = DOC_SHARD_SIZE,
    block_size: int = BLOCK_SIZE,
    pack_partitions: int | None = None,
    case_sensitive: bool = False,
) -> dict[str, "Index"]:
    """One Index per subcorpus language — the scale answer to filtered
    BM25. Subcorpus semantics recompute N/avgdl/df over the FILTERED set
    (SURVEY.md §4), so a lang-filtered query cannot reuse corpus-global
    impacts; a per-lang index bakes the right stats in and the query-time
    filter becomes an index CHOICE — at rest via write_lang_indexes /
    read_lang_indexes ({path}/lang=<v>/, a directory pick). Keeps the
    lang-filtered path off the full-corpus re-aggregation that made it
    the latency tail (BENCH/query_latency.json round 1)."""
    langs = [r[0] for r in documents.select(lang_col).distinct().collect()]
    return {
        lang: build_index_frames(
            documents.filter(F.col(lang_col) == lang), text_col, id_col,
            doc_shard_size, block_size, pack_partitions=pack_partitions,
            case_sensitive=case_sensitive,
        )
        for lang in sorted(langs)
    }


def _delete_dir(spark: SparkSession, path: str) -> None:
    """Recursive delete via the Hadoop FileSystem API — scheme-agnostic
    (file://, hdfs://, s3a://), silent no-op when the path is absent."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    if fs.exists(p):
        fs.delete(p, True)


def write_index(
    spark: SparkSession,
    documents: DataFrame,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_shard_size: int = DOC_SHARD_SIZE,
    block_size: int = BLOCK_SIZE,
    mode: str = "overwrite",
    case_sensitive: bool = False,
    tokenizer: str = "ascii",
) -> dict:
    """Build + persist the index; returns build counters.

    The packed postings are cached before the two consumers (postings
    write + dictionary max_score) so packing runs once.
    ``case_sensitive=True`` persists the case-preserving twin under
    postings_cs/ + dictionary_cs/ (read_index auto-discovers them).
    ``tokenizer="uni"`` persists a Unicode-twin index (non-Latin corpora
    — the reference's own class); queries against it pass the same
    tokenizer to search_wand / fold slot literals via Python lower().
    """
    idx = build_index_frames(documents, text_col, id_col, doc_shard_size, block_size,
                             case_sensitive=case_sensitive, tokenizer=tokenizer)
    idx.postings.persist()
    try:
        # each pack task holds one term_bucket (see pack_postings) — the
        # partitioned write needs no repartition
        idx.postings.write.partitionBy("term_bucket").mode(mode).parquet(f"{out_path}/postings")
        idx.dictionary.write.mode(mode).parquet(f"{out_path}/dictionary")
        idx.docs.write.mode(mode).parquet(f"{out_path}/docs")
        idx.doc_lens.write.mode(mode).parquet(f"{out_path}/doc_lens")
        idx.stats.write.mode(mode).parquet(f"{out_path}/stats")
        if idx.postings_cs is not None:
            idx.postings_cs.persist()
            idx.postings_cs.write.partitionBy("term_bucket").mode(mode) \
                .parquet(f"{out_path}/postings_cs")
            idx.dictionary_cs.write.mode(mode).parquet(f"{out_path}/dictionary_cs")
            idx.postings_cs.unpersist()
        elif mode == "overwrite":
            # an earlier case_sensitive=True write may have left a cs twin
            # here; overwriting only the folded dirs would silently pair
            # THIS corpus's folded index with the OLD corpus's cs twin in
            # read_index — delete the stale twin (Hadoop FS: works on any
            # scheme, no-op when absent)
            _delete_dir(spark, f"{out_path}/postings_cs")
            _delete_dir(spark, f"{out_path}/dictionary_cs")
        counters = idx.postings.agg(
            F.count("*").alias("n_blocks"),
            F.sum("n_docs").alias("n_postings"),
            F.countDistinct("term").alias("n_terms"),
            (F.sum(F.length("doc_gaps")) + F.sum(F.length("tfs")) + F.sum(F.length("dls")) + F.sum(F.length("positions"))).alias("payload_bytes"),
        ).collect()[0].asDict()
    finally:
        idx.postings.unpersist()
    return counters


def _strip_file_scheme(p: str) -> str:
    return p[len("file://"):] if p.startswith("file://") else p


def recover_postings(index_path: str, spark: SparkSession | None = None) -> bool:
    """Crash recovery for the compaction swap: if a crash hit between the
    two renames in compact_postings, the index has `.<subdir>-old` but no
    `<subdir>/` — restore the pre-compaction directory (postings and, when
    present, the postings_cs twin). Idempotent; returns True when any
    recovery happened. Called by read_index and compact_postings (ADVICE
    r02: the swap is two renames, not atomic — this closes the window).
    Runs through the Hadoop FS API when a session is available (scheme-
    agnostic, VERDICT r04 #4); pure-os fallback otherwise."""
    import os

    from fastmorph_spark.index.fs import fs_exists, fs_is_dir, fs_rename

    spark = spark or SparkSession.getActiveSession()
    recovered = False
    # registry tables are covered too: purge_tombstones' _swap_write and
    # compact_postings' merged-layout normalization use the SAME
    # tmp->rename swap on docs/doc_lens/stats/dictionary/tombstones, so
    # the same between-renames crash window applies to them
    for subdir in ("postings", "postings_cs", "docs", "doc_lens", "stats",
                   "dictionary", "dictionary_cs", "tombstones"):
        cur = f"{index_path}/{subdir}"
        old = f"{index_path}/.{subdir}-old"
        if spark is not None:
            if not fs_exists(spark, cur) and fs_is_dir(spark, old):
                try:
                    fs_rename(spark, old, cur)
                except OSError:
                    # concurrent-recovery race (ADVICE r03 #3): the loser's
                    # rename fails benignly iff the winner restored the dir
                    if fs_exists(spark, cur):
                        continue
                    raise
                recovered = True
            continue
        local = _strip_file_scheme(cur)
        local_old = _strip_file_scheme(old)
        if not os.path.exists(local) and os.path.isdir(local_old):
            try:
                os.rename(local_old, local)
            except OSError:
                # same race as above, os flavor
                if os.path.exists(local):
                    continue
                raise
            recovered = True
    return recovered


def read_index(spark: SparkSession, path: str) -> Index:
    from fastmorph_spark.index.fs import fs_is_dir
    from fastmorph_spark.index.merge import (
        MERGE_JOURNAL,
        apply_shard_bases,
        load_shard_bases,
        recover_merge,
        strip_side,
    )

    # a crashed at-rest merge rolls FORWARD here (journal only exists
    # once completing the moves is always sound — index/merge.py)
    if fs_is_dir(spark, f"{path}/{MERGE_JOURNAL}"):
        recover_merge(spark, path)
    recover_postings(path, spark)
    postings = spark.read.parquet(f"{path}/postings")
    if "side" in postings.columns:
        # at-rest merged layout: the shard namespacing recorded by
        # merge_index_dirs is applied lazily — this read IS the
        # frame-level merge (index/merge.py exactness argument)
        bases = load_shard_bases(spark, path)
        if bases is None:
            raise RuntimeError(
                f"{path}/postings has a side= layer but no shard_bases "
                "table — at-rest merge metadata is missing"
            )
        postings = apply_shard_bases(postings, bases)
    else:
        bases = None
    postings_cs = dictionary_cs = None
    # cs-twin discovery through the Hadoop FS API — uniform across
    # schemes (a missing optional twin is not an error)
    if fs_is_dir(spark, f"{path}/postings_cs"):
        postings_cs = spark.read.parquet(f"{path}/postings_cs")
        # decide namespacing from the cs frame's OWN columns, not the
        # folded twin's (ADVICE r05 #1): compact_postings processes the
        # two directories in sequence, so a crash between them leaves one
        # compacted (bases baked in, no side column) and the other still
        # side-layered — keying on `bases` from the folded read would
        # either skip the shift (colliding doc_shards, silently wrong
        # case-sensitive results) or double-apply it. Each frame is
        # shifted iff it still carries the side layer.
        if "side" in postings_cs.columns:
            cs_bases = bases if bases is not None else load_shard_bases(spark, path)
            if cs_bases is None:
                raise RuntimeError(
                    f"{path}/postings_cs has a side= layer but no "
                    "shard_bases table — at-rest merge metadata is missing"
                )
            postings_cs = apply_shard_bases(postings_cs, cs_bases)
        dictionary_cs = spark.read.parquet(f"{path}/dictionary_cs")
    from fastmorph_spark.index.tombstones import read_tombstones

    tomb = read_tombstones(spark, path)
    return Index(
        docs=strip_side(spark.read.parquet(f"{path}/docs")),
        doc_lens=strip_side(spark.read.parquet(f"{path}/doc_lens")),
        dictionary=spark.read.parquet(f"{path}/dictionary"),
        stats=spark.read.parquet(f"{path}/stats"),
        postings=postings,
        postings_cs=postings_cs,
        dictionary_cs=dictionary_cs,
        tombstones=tomb,
    )


def compact_postings(spark: SparkSession, index_path: str) -> dict:
    """Compact a multi-batch postings layout (postings/batch=N/term_bucket=B/
    part-*.parquet) into one file set per term_bucket — the small-files
    answer for long-lived resumable builds: B batches x 64 buckets x W
    writers leaves O(B·64·W) files; queries then pay a file-open + footer
    per file per touched bucket. Compaction rewrites rows UNCHANGED (blocks
    are self-contained — no re-encode, no re-sort needed; the WAND kernel
    orders blocks itself) into exactly one task per bucket, then swaps the
    directory in: write to .compact-tmp, VALIDATE the rewritten row count,
    rename old out, rename in. The two renames are not one atomic op; the
    crash window between them is closed by recover_postings (read_index
    runs it), and the swap is journaled in the manifest (status='compacted',
    partition_id=-2) so a later resumable batch run REFUSES to append
    batch=N dirs into the flattened layout (mixed hive layouts break
    parquet discovery — ADVICE r02).

    Scheme-agnostic (VERDICT r04 #4): every directory operation routes
    through the Hadoop FileSystem API (index/fs.py), so the same swap
    protocol runs on file://, hdfs://, or any resolved fs.defaultFS. The
    rename pair is atomic per-op on HDFS/local; on object stores without
    atomic rename the journaled intent + recover_postings still bound the
    crash window (fs.py module notes).

    Returns {files_before, files_after, rows}."""
    from fastmorph_spark.index.fs import (
        fs_count_files,
        fs_delete,
        fs_is_dir,
        fs_rename,
    )
    from fastmorph_spark.index.manifest import _append_manifest, _now

    recover_postings(index_path, spark)

    def _compact_dir(subdir: str) -> dict:
        src = f"{index_path}/{subdir}"
        before = fs_count_files(spark, src)
        df = spark.read.parquet(src)
        if "batch" in df.columns:  # hive-discovered batch=N dirs: incidental
            df = df.drop("batch")
        if "side" in df.columns:
            # at-rest merged layout (index/merge.py): materialize the
            # lazily-applied shard namespacing so the compacted tree is a
            # plain index again (and re-mergeable)
            from fastmorph_spark.index.merge import (
                apply_shard_bases,
                load_shard_bases,
            )

            bases = load_shard_bases(spark, index_path)
            if bases is None:
                raise RuntimeError(
                    f"{src} has a side= layer but no shard_bases table"
                )
            df = apply_shard_bases(df, bases)
        rows = df.count()
        tmp = f"{index_path}/.{subdir}-compact-tmp"
        fs_delete(spark, tmp)  # stale tmp from a crashed prior attempt
        from fastmorph_spark.constants import N_TERM_BUCKETS

        df.repartition(N_TERM_BUCKETS, "term_bucket") \
            .write.partitionBy("term_bucket").mode("overwrite").parquet(tmp)
        rows_tmp = spark.read.parquet(tmp).count()
        if rows_tmp != rows:
            fs_delete(spark, tmp)
            raise RuntimeError(
                f"compaction validation failed on {subdir}: rewrote {rows_tmp} "
                f"rows, expected {rows}; original left untouched"
            )
        old = f"{index_path}/.{subdir}-old"
        fs_delete(spark, old)
        # journal the INTENT row BEFORE the swap (ADVICE r03 #1): a crash
        # between the second rename and a post-swap journal would leave a
        # fully flattened term_bucket=J layout with no manifest marker, so
        # build_index_resumable would happily append batch=N dirs into it —
        # the exact mixed-hive-layout corruption the guard exists to
        # prevent. The guard refuses on 'compacting' AND 'compacted'; a
        # crash after this row but before the swap merely makes the
        # refusal conservative (the batch layout is still intact and
        # readable).
        _append_manifest(spark, index_path, (
            -2, "compacting", 0, rows, 0, 0, f"compaction:{subdir}", 1, 0, _now(),
        ))
        fs_rename(spark, src, old)
        fs_rename(spark, tmp, src)  # crash between these renames -> recover_postings
        _append_manifest(spark, index_path, (
            -2, "compacted", 0, rows, 0, 0, f"compaction:{subdir}", 1, 0, _now(),
        ))
        fs_delete(spark, old)
        return {"files_before": before, "files_after": fs_count_files(spark, src),
                "rows": rows}

    out = _compact_dir("postings")
    # the case-preserving twin (batch case_sensitive=True builds or
    # streamed cs ingest) accumulates small files the same way — compact
    # it in the same call so the two layouts never diverge
    if fs_is_dir(spark, f"{index_path}/postings_cs"):
        out["cs"] = _compact_dir("postings_cs")
    # at-rest merge normalization: shards are materialized in both trees
    # now, so the bases table goes; the moved registry tables lose their
    # incidental side= layer the same swap-protected way (cheap — they
    # are slim relative to postings), leaving a plain, RE-MERGEABLE index
    from fastmorph_spark.index.merge import SHARD_BASES, strip_side

    if fs_is_dir(spark, f"{index_path}/{SHARD_BASES}"):
        for subdir in ("docs", "doc_lens", "tombstones"):
            src = f"{index_path}/{subdir}"
            if not fs_is_dir(spark, src):
                continue
            df = strip_side(spark.read.parquet(src))
            tmp = f"{index_path}/.{subdir}-compact-tmp"
            fs_delete(spark, tmp)
            df.write.mode("overwrite").parquet(tmp)
            old = f"{index_path}/.{subdir}-old"
            fs_delete(spark, old)
            fs_rename(spark, src, old)
            fs_rename(spark, tmp, src)
            fs_delete(spark, old)
        fs_delete(spark, f"{index_path}/{SHARD_BASES}")
    return out


def write_lang_indexes(
    spark: SparkSession,
    documents: DataFrame,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    doc_shard_size: int = DOC_SHARD_SIZE,
    block_size: int = BLOCK_SIZE,
    case_sensitive: bool = False,
    tokenizer: str = "ascii",
) -> dict[str, dict]:
    """Persist one full index per language under {out_path}/lang=<v>/ —
    the at-rest form of build_lang_indexes: a lang-filtered query becomes
    a DIRECTORY choice (no corpus-wide scan, no runtime filter), each
    sub-index carries its own subcorpus-correct stats/impacts. Returns
    per-lang build counters. ``tokenizer`` may pick the Unicode twin per
    tree (a mixed-script corpus routes non-Latin langs to uni indexes)."""
    langs = sorted(
        r[0] for r in documents.select(lang_col).distinct().collect() if r[0] is not None
    )
    return {
        lang: write_index(
            spark, documents.filter(F.col(lang_col) == lang),
            f"{out_path}/lang={lang}", text_col, id_col, doc_shard_size, block_size,
            case_sensitive=case_sensitive, tokenizer=tokenizer,
        )
        for lang in langs
    }


def read_lang_indexes(spark: SparkSession, path: str) -> dict[str, "Index"]:
    """Discover and open the per-lang indexes written by write_lang_indexes."""
    import os

    local = path[len("file://"):] if path.startswith("file://") else path
    out = {}
    for d in sorted(os.listdir(local)):
        if d.startswith("lang="):
            out[d[len("lang="):]] = read_index(spark, f"{path}/{d}")
    return out
