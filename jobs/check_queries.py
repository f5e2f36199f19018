"""Local replica of the driver's correctness gate: run registry queries()
vs oracle_sqls() over a fixture dir and report rows/schema/value matches.

Usage: python jobs/check_queries.py [--sf /root/testdata/sf0.01] [keys...]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _hash_df(pdf) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(
        tuple(str(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    import duckdb

    from fastmorph_spark.registry import oracle_sqls, queries
    from fastmorph_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )
    qs, osq = queries(), oracle_sqls()
    keys = args.keys or list(qs)
    fails = 0
    for k in keys:
        try:
            s = qs[k](spark, args.sf).toPandas()
        except Exception as e:
            print(f"{k:28s} SPARK-ERROR {type(e).__name__}: {str(e)[:200]}")
            fails += 1
            continue
        if k not in osq:
            print(f"{k:28s} rows={len(s):6d} (no oracle)")
            continue
        try:
            o = con.sql(osq[k]).df()
        except Exception as e:
            print(f"{k:28s} ORACLE-ERROR {type(e).__name__}: {str(e)[:200]}")
            fails += 1
            continue
        rows_ok = len(s) == len(o)
        schema_ok = sorted(s.columns) == sorted(o.columns)
        hash_ok = rows_ok and schema_ok and _hash_df(s) == _hash_df(o)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{k:28s} {status}  rows={len(s)}/{len(o)} schema={schema_ok} hash={hash_ok}")
        if status == "FAIL" and rows_ok and schema_ok:
            print("  spark:", s.head(3).to_dict("records"))
            print("  oracle:", o.head(3).to_dict("records"))
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
