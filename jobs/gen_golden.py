"""Regenerate fixtures/golden_topk.json from the pure-Python oracle.

The golden file is DERIVED state: tests/test_queryset.py asserts it
re-derives bit-for-bit from tests/oracle_bm25.py on every run, and the
engine must match it on every query (the rank-identity metric). Run this
after adding specs to fixtures/queries.json.

Format per qid:
  bm25 mode  -> [{"rank", "doc_id", "score": repr(float)}]  (score as the
                full-precision repr string — JSON floats would round-trip
                through formatting)
  other      -> raw row list (tuples stored as JSON arrays)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fastmorph_spark.search.queryset import load_query_set, run_query_oracle  # noqa: E402
from tests.oracle_bm25 import load_oracle  # noqa: E402

SF_DIRS = {"sf0.001": "/root/testdata/sf0.001", "sf0.01": "/root/testdata/sf0.01"}


def main() -> None:
    specs = load_query_set(os.path.join(REPO, "fixtures/queries.json"))
    out: dict[str, dict] = {}
    for label, sf_dir in SF_DIRS.items():
        oracle = load_oracle(sf_dir)
        per = {}
        for spec in specs:
            got = run_query_oracle(spec, oracle)
            if spec["mode"] == "bm25":
                per[spec["qid"]] = [
                    {"rank": i + 1, "doc_id": d, "score": repr(s)}
                    for i, (d, s) in enumerate(got)
                ]
            else:
                per[spec["qid"]] = [list(g) if isinstance(g, tuple) else g for g in got]
        out[label] = per
        print(f"{label}: {len(per)} queries")
    path = os.path.join(REPO, "fixtures/golden_topk.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
