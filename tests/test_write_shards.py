"""jobs/write_shards.py end-to-end: the training-shard writer as a real
subprocess (its own JVM — the deployment shape). Pins: the written shard
assignment equals ops.text.pack_shards computed in-process over the
POST-drop corpus (budgeting reflects what a trainer actually gets), the
drop list is honored, the layout is one `shard_id=N/` directory per
shard, and jsonl files hold doc_id-ascending lines (a trainer streaming
files in name order reads corpus order)."""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import pytest

from fastmorph_spark.ops.text import pack_shards
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET = 500


@pytest.fixture(scope="module")
def written(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("shards")
    drop_path = str(tmp / "drop")
    out_pq = str(tmp / "out_pq")
    out_jl = str(tmp / "out_jl")
    docs = read_documents(spark, SF0001)
    from pyspark.sql import functions as F

    docs.filter(F.col("doc_id") % 10 == 0) \
        .select("doc_id", F.lit("exact").alias("reason")) \
        .write.mode("overwrite").parquet(drop_path)

    def run(out, fmt):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "write_shards.py"),
             "--docs", f"docs:{SF0001}", "--out", out,
             "--budget", str(BUDGET), "--drop", drop_path,
             "--format", fmt],
            capture_output=True, text=True, timeout=420, cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    return run(out_pq, "parquet"), run(out_jl, "jsonl"), out_pq, out_jl


def _expected(spark):
    from pyspark.sql import functions as F

    docs = read_documents(spark, SF0001) \
        .filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    return {r["doc_id"]: (r["n_tokens"], r["shard_id"])
            for r in pack_shards(docs, BUDGET).collect()}


def test_parquet_shards_match_in_process(spark, written):
    summary, _, out_pq, _ = written
    want = _expected(spark)
    got = {r["doc_id"]: (r["n_tokens"], r["shard_id"])
           for r in spark.read.parquet(out_pq).collect()}
    assert got == want
    assert summary["n_docs"] == len(want)
    assert summary["n_dropped"] == 50  # doc_id % 10 == 0 at sf0.001
    assert summary["n_shards"] == len({s for _, s in want.values()})
    dirs = {os.path.basename(p)
            for p in glob.glob(os.path.join(out_pq, "shard_id=*"))}
    assert dirs == {f"shard_id={s}" for _, s in want.values()}


def test_jsonl_shards_sorted_within_files(spark, written):
    _, summary, _, out_jl = written
    want = _expected(spark)
    got = {}
    for d in glob.glob(os.path.join(out_jl, "shard_id=*")):
        sid = int(os.path.basename(d).split("=")[1])
        for f in sorted(glob.glob(os.path.join(d, "part-*"))):
            ids_in_file = []
            with open(f) as fh:
                for line in fh:
                    row = json.loads(line)
                    got[row["doc_id"]] = (row["n_tokens"], sid)
                    ids_in_file.append(row["doc_id"])
            assert ids_in_file == sorted(ids_in_file)
    assert got == want
    assert summary["n_shards"] == len({s for _, s in want.values()})


def test_c4_clean_flag(spark, tmp_path):
    """--c4-clean: shard text is the cleaned bytes (equals
    c4_clean_text applied in-process), budgets count the cleaned text,
    and fully-cleaned-away docs are dropped and counted."""
    from pyspark.sql import functions as F

    from fastmorph_spark.ops.quality import c4_clean_text
    from fastmorph_spark.registry import _c4_aug_docs

    sf_dir = str(tmp_path)
    out = str(tmp_path / "out")
    _c4_aug_docs(spark, SF0001).write.parquet(str(tmp_path / "documents.parquet"))

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "write_shards.py"),
         "--docs", f"docs:{sf_dir}", "--out", out,
         "--budget", str(BUDGET), "--c4-clean"],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])

    cleaned = spark.read.parquet(str(tmp_path / "documents.parquet")) \
        .withColumn("text", c4_clean_text("text")) \
        .filter(F.length("text") > 0)
    want_text = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    want_assign = {r["doc_id"]: (r["n_tokens"], r["shard_id"])
                   for r in pack_shards(cleaned.select("doc_id", "text"),
                                        BUDGET).collect()}
    got = {r["doc_id"]: (r["text"], r["n_tokens"], r["shard_id"])
           for r in spark.read.parquet(out).collect()}
    assert set(got) == set(want_text)
    for d, (text, n_tok, sid) in got.items():
        assert text == want_text[d]
        assert (n_tok, sid) == want_assign[d]
    assert summary["n_docs"] == len(want_text)
    assert summary["n_dropped"] == 500 - len(want_text)
    assert summary["n_dropped"] > 0, "augmented fixture must clean some docs away"


def test_contract_corpus_branch(spark, tmp_path):
    """--docs with a plain path reads the CONTRACT corpus shape
    (repo,path,commit,lang,content) and assigns the same deterministic
    doc_ids as jobs/build_index.py (with_doc_ids) — a drop list built
    against the indexed corpus addresses the same ids here."""
    from pyspark.sql import functions as F

    from fastmorph_spark.sources import documents_as_corpus, with_doc_ids
    from fastmorph_spark.sources import read_documents as _rd

    corpus_path = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    docs = _rd(spark, SF0001).limit(80)
    documents_as_corpus(docs).write.parquet(corpus_path)

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "write_shards.py"),
         "--docs", corpus_path, "--out", out, "--budget", str(BUDGET)],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_docs"] == 80

    want = {r["doc_id"]: r["content"]
            for r in with_doc_ids(spark.read.parquet(corpus_path)).collect()}
    got = {r["doc_id"]: r["text"]
           for r in spark.read.parquet(out).collect()}
    assert got == want
