"""jobs/export.py end-to-end: the concordance export sink as a real
subprocess. Pins: the concatenation of the output files in name order
equals the corpus-order KWIC lines from the in-process engine (global
total order via range partitioning — no global sort, no collect), both
formats parse, and a 'within s' CQL export is refused with a message."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from fastmorph_spark.index import build_dictionary, build_postings
from fastmorph_spark.index.io import write_index
from fastmorph_spark.search import engine
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CQL = '[word="fast"] []{0,3} "h*"'
SLOTS = [{"term": "fast"}, {"pattern": "h*"}]
DISTS = [(1, 4)]


@pytest.fixture(scope="module")
def ctx(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("export_cli")
    idx_path = str(tmp / "idx")
    docs = read_documents(spark, SF0001)
    write_index(spark, docs, idx_path, doc_shard_size=200, block_size=64)
    return docs, idx_path, tmp


def _run(args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "export.py"), *args],
        capture_output=True, text=True, timeout=420,
    )


def _concat_lines(out_dir):
    rows = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("part-"):
            continue
        with open(os.path.join(out_dir, name)) as f:
            rows.extend(line.rstrip("\n") for line in f if line.strip())
    return rows


def test_tsv_export_is_corpus_order_kwic(spark, ctx):
    docs, idx_path, tmp = ctx
    out_dir = str(tmp / "conc_tsv")
    proc = _run(["--index", idx_path, "--docs", f"docs:{SF0001}",
                 "--cql", CQL, "--format", "tsv", "--out", out_dir,
                 "--files", "4", "--cores", "4"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    matches = engine.slot_search(postings, dictionary, SLOTS, DISTS)
    want = [
        (str(r["doc_id"]), str(r["pos"]), r["left_ctx"], r["keyword"],
         r["right_ctx"])
        for r in engine.kwic(docs, matches, len(SLOTS), width=5)
        .orderBy("doc_id", "pos").collect()
    ]
    assert want, "fixture query must be non-vacuous"
    got = [tuple(line.split("\t")) for line in _concat_lines(out_dir)]
    # csv writer quotes empty strings; normalize the '""' form
    got = [tuple("" if c == '""' else c for c in r) for r in got]
    assert got == want
    assert summary["rows"] == len(want)


def test_jsonl_export_and_within_refusal(spark, ctx):
    _, idx_path, tmp = ctx
    out_dir = str(tmp / "conc_jsonl")
    proc = _run(["--index", idx_path, "--docs", f"docs:{SF0001}",
                 "--slots-json", json.dumps(
                     {"slots": SLOTS, "dists": [list(d) for d in DISTS]}),
                 "--format", "jsonl", "--out", out_dir, "--cores", "4"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [json.loads(line) for line in _concat_lines(out_dir)]
    assert rows and all({"doc_id", "pos", "keyword"} <= set(r) for r in rows)
    keys = [(r["doc_id"], r["pos"]) for r in rows]
    assert keys == sorted(keys)
    bad = _run(["--index", idx_path, "--docs", f"docs:{SF0001}",
                "--cql", '"fast" within s', "--out", str(tmp / "x")])
    assert bad.returncode != 0 and "within s" in (bad.stderr + bad.stdout)
