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

    def __init__(self, docs: dict[int, str], langs: dict[int, str] | None = None,
                 sources: dict[int, str] | None = None):
        self.langs = langs or {}
        self.sources = sources or {}
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


def oracle_stem(t: str) -> str:
    """INDEPENDENT re-implementation of the pinned stem rules
    (fastmorph_spark/stem.py) — endswith/len checks instead of regexes, so
    the oracle double-checks the regex forms rather than importing them."""
    if len(t) >= 5 and t.endswith("ies"):
        return t[:-3] + "y"
    if len(t) >= 6 and t.endswith("ing"):
        return t[:-3]
    if len(t) >= 5 and t.endswith("ed"):
        return t[:-2]
    if len(t) >= 4 and t.endswith("s") and t[-2] not in "su":
        return t[:-1]
    return t


_ORACLE_KEYWORDS = {
    "agg", "filter", "from", "group", "hash", "join", "limit", "merge",
    "order", "scan", "select", "sort", "union", "where", "window",
}
_ORACLE_STOPWORDS = {"a", "an", "and", "at", "in", "is", "of", "on", "or", "the", "to"}


def oracle_tag(t: str) -> str:
    """INDEPENDENT re-implementation of the pinned token classifier
    (fastmorph_spark/tags.py) — str.isdigit + literal sets instead of the
    regex/isin forms, so the oracle double-checks them."""
    if t and all(c in "0123456789" for c in t):
        return "number"
    if t in _ORACLE_KEYWORDS:
        return "keyword"
    if t in _ORACLE_STOPWORDS:
        return "stopword"
    return "ident"


def levenshtein(a: str, b: str) -> int:
    """Plain unit-cost edit distance (the Spark/DuckDB builtin's twin)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _wildcard_re(pattern: str):
    return re.compile(
        pattern.lower().replace("?", "[a-z0-9_]").replace("*", "[a-z0-9_]*") + "$"
    )


# -- round-2 query modes, attached to OracleIndex below ---------------------


def _or_docs(self, query: str) -> list[tuple[int, int, int]]:
    """(doc_id, n_terms, total_tf) ordered (n DESC, tf DESC, id ASC)."""
    terms = sorted(set(tokenize(query)))
    agg: dict[int, list[int]] = {}
    for t in terms:
        for d, ps in self.postings.get(t, {}).items():
            cur = agg.setdefault(d, [0, 0])
            cur[0] += 1
            cur[1] += len(ps)
    return sorted(
        ((d, n, tf) for d, (n, tf) in agg.items()),
        key=lambda x: (-x[1], -x[2], x[0]),
    )


def _stem_docs(self, word: str) -> list[tuple[int, int]]:
    """(doc_id, total_tf) over tokens stemming to stem(word), id-ordered."""
    target = oracle_stem(word.lower())
    agg: dict[int, int] = defaultdict(int)
    for t, docs in self.postings.items():
        if oracle_stem(t) == target:
            for d, ps in docs.items():
                agg[d] += len(ps)
    return sorted(agg.items())


def _slot_docs(self, slots: list[dict], dists: list) -> list[tuple[int, int, str]]:
    """Brute-force multi-slot matcher: (doc_id, n_matches, match_starts)
    — mirror of engine.slot_search for case-folded slots."""
    def pred(s):
        if "term" in s:
            t = s["term"].lower()
            return lambda tok: tok == t
        if "stem" in s:
            target = oracle_stem(s["stem"].lower())
            return lambda tok: oracle_stem(tok) == target
        if "tag" in s:
            target = s["tag"]
            return lambda tok: oracle_tag(tok) == target
        if "fuzzy" in s:
            w = s["fuzzy"].lower()
            dmax = int(s.get("dist", 1))
            return lambda tok: (abs(len(tok) - len(w)) <= dmax
                                and levenshtein(tok, w) <= dmax)
        if "regex" in s:
            # Python re is a THIRD independent engine for the pinned
            # subset (search/regex.py): anchored whole-token, folded
            import re as _re

            rx = _re.compile("^(?:" + s["regex"].lower() + ")$")
            return lambda tok: bool(rx.match(tok))
        pat = _wildcard_re(s["pattern"])
        return lambda tok: bool(pat.match(tok))

    preds = [pred(s) for s in slots]
    out = []
    for d in self.doc_ids:
        toks = self.tokens[d]
        pos_lists = [[i for i, tok in enumerate(toks) if p(tok)] for p in preds]
        if any(not pl for pl in pos_lists):
            continue

        def chain(i: int, prev: int) -> bool:
            if i == len(slots):
                return True
            lo, hi = dists[i - 1]
            return any(prev + lo <= q <= prev + hi and chain(i + 1, q)
                       for q in pos_lists[i])

        starts = [p for p in pos_lists[0] if chain(1, p)]
        if starts:
            out.append((d, len(starts), ",".join(str(p) for p in sorted(starts))))
    return out


OracleIndex.or_docs = _or_docs
OracleIndex.stem_docs = _stem_docs
OracleIndex.slot_docs = _slot_docs


def load_documents(sf_dir: str) -> dict[int, str]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def load_oracle(sf_dir: str) -> OracleIndex:
    """OracleIndex with lang metadata (for filter_lang query specs)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "lang", "source"])
    ids = t["doc_id"].to_pylist()
    return OracleIndex(
        dict(zip(ids, t["text"].to_pylist())),
        dict(zip(ids, t["lang"].to_pylist())),
        dict(zip(ids, t["source"].to_pylist())),
    )


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    query = sys.argv[2] if len(sys.argv) > 2 else "fast hash join"
    idx = OracleIndex(load_documents(sf_dir))
    for rank, (d, s) in enumerate(idx.topk(query, 10), 1):
        print(f"{rank:2d}  doc={d:6d}  score={s:.9f}")
