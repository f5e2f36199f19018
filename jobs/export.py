"""spark-submit entry point: export a query's full concordance as a sink.

Corpus portals export result concordances for offline analysis; the
reference serves bounded pages interactively, and batch export is the
companion lifecycle [PK-med]. This job runs ONE query (a CQL string or a
slots-form JSON) over an at-rest packed index and writes EVERY match as
KWIC lines — a real distributed write, not a driver collect, so a
100 TB corpus's million-line concordance exports at cluster width.

  spark-submit --master local[8] --py-files dist/fts.zip jobs/export.py \
      --index /tmp/idx --docs docs:/root/testdata/sf0.001 \
      --cql '[word="fast"] []{0,3} "h*"' \
      --format tsv --out /tmp/conc [--width 5] [--files 8]

Determinism at scale (pinned): rows are range-partitioned by
(doc_id, pos) into ``--files`` output files and sorted within each, so
the files concatenated in lexicographic name order ARE the corpus-order
concordance — a global total order with NO global sort materialization
and no single-reducer funnel. ``--format tsv`` writes header-less
tab-separated (doc_id, pos, left_ctx, keyword, right_ctx) (token text
can't contain tabs — the tokenizer's alphabet has none); ``jsonl``
writes one JSON object per line. Prints a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--docs", required=True,
                    help="docs:<sf_dir> fixture or a corpus path")
    ap.add_argument("--cql", help="CQL-lite query string")
    ap.add_argument("--slots-json",
                    help='slots-form JSON: {"slots": [...], "dists": [...]}')
    ap.add_argument("--format", choices=("tsv", "jsonl"), default="tsv")
    ap.add_argument("--width", type=int, default=5)
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    if bool(args.cql) == bool(args.slots_json):
        ap.error("exactly one of --cql / --slots-json")

    from pyspark.sql import functions as F

    from fastmorph_spark.index.io import read_index
    from fastmorph_spark.search.engine import kwic
    from fastmorph_spark.search.packed import packed_slot_search
    from fastmorph_spark.session import get_spark
    from fastmorph_spark.sources import read_corpus, read_documents

    if args.cql:
        from fastmorph_spark.search.cql import parse_cql

        c = parse_cql(args.cql)
        if c["within_sentence"]:
            raise SystemExit("export: 'within s' queries are not exportable "
                             "as KWIC lines (sentence-scoped positions)")
        slots, dists = c["slots"], c["dists"]
    else:
        spec = json.loads(args.slots_json)
        slots = spec["slots"]
        dists = [tuple(d) for d in spec["dists"]]

    spark = get_spark(master=f"local[{args.cores}]",
                      shuffle_partitions=2 * args.cores,
                      app_name="fastmorph-export")
    spark.sparkContext.setLogLevel("ERROR")
    if args.docs.startswith("docs:"):
        docs = read_documents(spark, args.docs.split(":", 1)[1])
    else:
        docs = read_corpus(spark, args.docs)
    idx = read_index(spark, args.index)

    matches = packed_slot_search(idx, slots, dists)
    lines = kwic(docs, matches, len(slots), width=args.width)
    out = (
        lines.repartitionByRange(args.files, "doc_id", "pos")
        .sortWithinPartitions("doc_id", "pos")
    )
    if args.format == "tsv":
        (out.select(F.col("doc_id").cast("string"),
                    F.col("pos").cast("string"),
                    "left_ctx", "keyword", "right_ctx")
         .write.mode("overwrite").option("sep", "\t").csv(args.out))
    else:
        out.write.mode("overwrite").json(args.out)
    n = spark.read.format("csv" if args.format == "tsv" else "json") \
        .option("sep", "\t").load(args.out).count()
    files = sorted(f for f in os.listdir(args.out) if f.startswith("part-"))
    print(json.dumps({"rows": int(n), "files": len(files),
                      "format": args.format, "out": args.out}))


if __name__ == "__main__":
    main()
