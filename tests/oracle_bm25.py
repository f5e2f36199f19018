"""Pure-Python exhaustive BM25 oracle (SURVEY.md §5.2).

This file operationalizes "the reference engine" of BASELINE.json's
north_rule (the fastmorph checkout is empty — SURVEY.md §0): a
deliberately simple, auditable, exhaustive scorer. No pruning, float64,
dict-of-lists postings, documented tie-breaking. The Spark engine must be
rank-identical to it on the reference query set.

Also usable standalone: python tests/oracle_bm25.py <sf_dir> "<query>"
"""

from __future__ import annotations

import math
import re
import sys
from collections import Counter, defaultdict

TOKEN_RE = re.compile(r"[a-z0-9_]+")
K1 = 1.2
B = 0.75


def tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall((text or "").lower())


class OracleIndex:
    """Exhaustive in-memory index over (doc_id -> text) pairs."""

    def __init__(self, docs: dict[int, str], langs: dict[int, str] | None = None):
        self.langs = langs or {}
        self._docs_src = dict(docs)
        self._init(docs)

    def filtered(self, lang: str) -> "OracleIndex":
        """Sub-index over the lang-filtered corpus (stats universe = the
        filtered docs — pinned subcorpus semantics)."""
        sub = {d: t for d, t in self._docs_src.items() if self.langs.get(d) == lang}
        return OracleIndex(sub, {d: lang for d in sub})

    def _init(self, docs: dict[int, str]):
        self.doc_ids = sorted(docs)
        self.tokens = {d: tokenize(t) for d, t in docs.items()}
        self.dl = {d: len(ts) for d, ts in self.tokens.items()}
        self.n_docs = len(self.doc_ids)
        self.avgdl = (sum(self.dl.values()) / self.n_docs) if self.n_docs else 0.0
        # postings: term -> {doc_id: [positions]}
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        for d in self.doc_ids:
            for pos, t in enumerate(self.tokens[d]):
                self.postings[t].setdefault(d, []).append(pos)

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score(self, terms: list[str], doc_id: int) -> float:
        tf_map = Counter(self.tokens[doc_id])
        s = 0.0
        for t in sorted(set(terms)):
            tf = tf_map.get(t, 0)
            if tf == 0:
                continue
            dl = self.dl[doc_id]
            # pinned parenthesization: idf * (impact) — must match every
            # engine path bit-for-bit (see bm25_score_col docstring)
            s += self.idf(t) * (tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl)))
        return s

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Exhaustive OR-mode top-k; ties (score DESC, doc_id ASC)."""
        terms = sorted(set(tokenize(query)))
        hit_docs = set()
        for t in terms:
            hit_docs.update(self.postings.get(t, {}))
        scored = [(d, self.score(terms, d)) for d in hit_docs]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def and_docs(self, query: str) -> list[int]:
        """Conjunctive: doc_ids containing ALL query terms."""
        terms = sorted(set(tokenize(query)))
        if not terms:
            return []
        sets = [set(self.postings.get(t, {})) for t in terms]
        out = set.intersection(*sets) if sets else set()
        return sorted(out)

    def phrase_docs(self, phrase: str) -> list[int]:
        """Docs containing the exact token sequence (adjacent positions)."""
        terms = tokenize(phrase)
        if not terms:
            return []
        out = []
        for d in self.and_docs(" ".join(sorted(set(terms)))):
            pos0 = self.postings[terms[0]].get(d, [])
            for p in pos0:
                if all(p + i in self.postings[t].get(d, []) for i, t in enumerate(terms[1:], 1)):
                    out.append(d)
                    break
        return sorted(out)

    def proximity_docs(self, t1: str, t2: str, dist_from: int, dist_to: int) -> list[int]:
        """fastmorph-style slot distance: docs where some occurrence of t2
        sits at (pos(t1)+dist_from .. pos(t1)+dist_to). [PK-high semantics]"""
        out = []
        both = set(self.postings.get(t1, {})) & set(self.postings.get(t2, {}))
        for d in sorted(both):
            p1s = self.postings[t1][d]
            p2s = set(self.postings[t2][d])
            if any((p1 + dd) in p2s for p1 in p1s for dd in range(dist_from, dist_to + 1)):
                out.append(d)
        return out


def load_documents(sf_dir: str) -> dict[int, str]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def load_oracle(sf_dir: str) -> OracleIndex:
    """OracleIndex with lang metadata (for filter_lang query specs)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    ids = t["doc_id"].to_pylist()
    return OracleIndex(
        dict(zip(ids, t["text"].to_pylist())),
        dict(zip(ids, t["lang"].to_pylist())),
    )


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    query = sys.argv[2] if len(sys.argv) > 2 else "fast hash join"
    idx = OracleIndex(load_documents(sf_dir))
    for rank, (d, s) in enumerate(idx.topk(query, 10), 1):
        print(f"{rank:2d}  doc={d:6d}  score={s:.9f}")
