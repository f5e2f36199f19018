"""JSON request/response protocol — the reference's serving surface.

fastmorph answers search requests as a JSON protocol: parse the slot
spec (words/lemmas/tags/wildcards/case/distances/subcorpus/pagination),
run the slot scan, serialize matched sentences + highlight positions +
total counts [PK-high, SURVEY.md §3.1 entry points 2 and 3]. This module
is that boundary re-expressed over the Spark engine: a validated request
dict in, a JSON-serializable response dict out. Transport (socket, HTTP,
queue) is the caller's business — the protocol layer is transport-free
by design, which is also what makes it testable.

Request shape (all engine capabilities reachable):

    {
      "slots": [
        {"word": "fast"},                # exact token (folded)
        {"word": "Fast", "case": true},  # case-SENSITIVE exact token
        {"pattern": "h*sh"},             # wildcard (* and ?)
        {"lemma": "running"},            # stem-folded match
        {"tag": "number"},               # token-class slot (tags.py)
        {"fuzzy": "fasst", "dist": 1},   # approximate (edit-distance)
        {"regex": "jo(in|b)s?"},         # whole-token regex on the
                                         #   pinned subset (search/regex)
      ],
      "dists": [[1, 4], ...],            # len(slots)-1 [lo, hi] ranges
      "skip": 0, "until": 20,            # pagination window (ranks)
      "width": 2,                        # context tokens per side
                                         #   (default 2 for snippets,
                                         #    5 for format="kwic")
      "lang": "en",                      # subcorpus filter (optional)
      "format": "snippets",              # or "kwic": aligned concordance
                                         #   columns instead of snippets
      "sort": "right",                   # kwic only: right-/left-sorted
                                         #   concordance page (flat lines,
                                         #   ranks of the SORTED order);
                                         #   "gdex" ranks by best-example
                                         #   score (adds score/min_cf)
      "facets": true,                    # optional: response gains
                                         #   per-lang/source match counts
      "filter": {                        # optional CONTEXT FILTER on the
        "slot": {"word": "join"},        #   result set (any slot spec):
        "window": [-5, 5],               #   keep matches that DO
        "mode": "positive",              #   ("positive") / do NOT
      },                                 #   ("negative") have it nearby
      "freq": "node",                    # optional: answer the FREQUENCY
      "k": 50,                           #   BREAKDOWN of the (filtered)
    }                                    #   concordance instead of a
                                         #   page: by node form or by a
                                         #   doc attribute (lang/source)

Response shape (one entry per page doc, occurrences nested in corpus
order — the sentences/highlights/totals surface):

    {"total_docs": N, "total_matches": M, "skip": s, "until": u,
     "results": [{"rank": r, "doc_id": d, "n_matches": m,
                  "matches": [{"pos": p, "hl_offset": h,
                               "snippet": "...", "running_total": t}]}]}

The response collect is bounded by `until` — the protocol layer never
materializes an unbounded result.

Nineteen further request forms share the boundary, all bounded by ``k`` /
``until`` / ``limit``: ranked top-k (``{"bm25": "query text", "k": 10}`` →
Block-Max WAND; add ``"expand": n`` for synonym query expansion — each
query term pulls its top-n thesaurus neighbors first, search/expand.py),
the collocation profile (``{"collocations": "term",
"window": 3, "min_count": 2, "k": 20}``; add ``"group_by": "stem"|
"tag"`` for the lemma-/class-grouped profile — rows then carry ``key``
instead of ``term``), frequency profiles
(``{"top_terms": n, "pattern": "s*"?}`` — dictionary metadata only),
the corpus-comparison keyness table (``{"keyness": "en", "min_count":
5, "k": 50}`` — G² + log-ratio over documents), the morphological
paradigm view (``{"paradigm": "joins"}`` — every dictionary form
sharing the stem), the TEXTUAL query form (``{"cql": '[word="fast"]
[]{0,2} [lemma="join"]'}`` — the CQL-lite dialect of search/cql.py,
compiled into the slots form with every slots-form option available;
``... within s`` answers sentence-scoped matches instead), the
index summary (``{"stats": true}`` — n_docs/avgdl/vocab/Σdf/Σcf from
metadata alone), the distributional thesaurus (``{"thesaurus": "word",
"window": 3, "min_shared": 2, "k": 20}`` — "similar words" over
co-occurrence profiles), and the word-sketch diff (``{"sketch_diff":
["a", "b"], "window": 3, "min_count": 2, "k": 20}`` — shared
collocates ranked by pmi_a − pmi_b, served off the packed index with
one union-envelope-bounded decode), the did-you-mean box
(``{"suggest": "fasst", "dist": 1, "k": 10}`` — dictionary terms near
the probe, (dist ASC, df DESC), metadata only), the positional
collocate profile (``{"offsets": "term", "window": 3, "min_count": 2,
"k": 5}`` — top collocates per signed offset, packed target-envelope
block skip), terminology extraction (``{"mwe": true, "min_count":
5, "k": 50}`` — corpus-wide adjacent-bigram logDice, a document-corpus
statistic like keyness), and similar-document retrieval
(``{"more_like": doc_id, "m": 10, "k": 10}`` — the source doc's top-m
TF-IDF terms as a BM25 disjunction off the packed index, source
excluded; search/mlt.py), grep line reporting (``{"grep": "term",
"limit": 100}`` — (doc_id, line_no, line) for lines holding the term as
a whole token, the code-search result unit; search/grep.py), the
symbol tab (``{"defs": true, "limit": 100}`` — ctags-style definition
lines (kind, symbol) off the same line scan), raw substring search
(``{"substring": "Response(x", "case": false}`` — containment, not
token match; trigram-accelerated when the server holds a trigram
sidecar, exact full-scan verify otherwise; search/substring.py), and
unanchored line regex (``{"regex": "parse(JSON|XML)"}`` — the ripgrep
contract on the pinned cross-engine subset, factor-trigram-accelerated
the same way), and symbol-boosted ranking (``{"symbol":
"parseJSONResponse", "k": 10}`` — docs DEFINING the identifier outrank
mentioners, BM25 order inside each stratum; the defs form also takes an
optional ``"symbol"`` filter for go-to-definition; search/symbols.py),
and the find-usages tab (``{"refs": true, "k": 50}`` — referenced
identifiers ranked by citing-doc count — or ``{"refs": "Ident"}`` for
one identifier's citing (doc, line) edges; search/history.py), and the
one-search-box form (``{"q": 'lang:py "exact phrase" term -noise',
"k": 10}`` — the unified query-string language of search/querylang.py:
repo:/path:/lang: filters, quoted phrases, -negation and BM25-ranked
bare terms in one string, answered off the document corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# engine slot spec key -> protocol key (the engine uses "term"/"stem";
# the protocol speaks the reference's vocabulary: word/lemma)
_SLOT_KEYS = {"word": "term", "pattern": "pattern", "lemma": "stem",
              "tag": "tag", "fuzzy": "fuzzy", "regex": "regex"}
_MAX_FUZZY_DIST = 2     # fuzzy slot edit-distance bound (expansion stays
                        # dictionary-bounded, but d>2 matches ~everything)
_MAX_SLOTS = 8          # fastmorph patterns are "up to ~5 slots" [PK]
_MAX_UNTIL = 10_000     # pagination window cap: the page is collected
_MAX_EXPAND = 10        # synonym-expansion neighbors per query term


class RequestError(ValueError):
    """Malformed search request; .message is safe to serialize back."""


def _parse_slot(s, label: str) -> dict:
    """Validate ONE protocol slot spec -> engine slot spec (shared by the
    slots list and the concordance filter's pattern)."""
    if not isinstance(s, dict):
        raise RequestError(f"{label} must be an object")
    kinds = [k for k in _SLOT_KEYS if k in s]
    if len(kinds) != 1:
        raise RequestError(
            f"{label} needs exactly one of {sorted(_SLOT_KEYS)}")
    kind = kinds[0]
    extra = set(s) - {kind, "case"} - ({"dist"} if kind == "fuzzy" else set())
    if extra:
        raise RequestError(f"{label} has unknown fields: {sorted(extra)}")
    if not isinstance(s[kind], str) or not s[kind]:
        raise RequestError(f"{label}: {kind} must be a non-empty string")
    out = {_SLOT_KEYS[kind]: s[kind]}
    if kind == "regex":
        # validate HERE so a bad pattern is a client-addressable
        # request error, not an executor-side exception
        from fastmorph_spark.search.regex import validate_regex

        try:
            validate_regex(s[kind].lower())
        except ValueError as e:
            raise RequestError(f"{label}: {e}") from None
    if kind == "fuzzy":
        d = s.get("dist", 1)
        if not isinstance(d, int) or isinstance(d, bool) \
                or not 1 <= d <= _MAX_FUZZY_DIST:
            raise RequestError(
                f"{label}: dist must be an integer in "
                f"[1, {_MAX_FUZZY_DIST}]")
        out["dist"] = d
    if s.get("case"):
        if kind != "word":
            raise RequestError(
                f"{label}: case flag applies to word slots only "
                f"({kind} slots are case-folded by definition)")
        out["case"] = True
    return out


def parse_request(req: dict) -> dict:
    """Validate + normalize a request dict into engine arguments.

    Raises RequestError with a client-addressable message on any
    malformed field — the serving boundary must reject bad input loudly,
    not produce an empty (or wrong) result.

    Twenty-one request forms behind one boundary (module docstring):
    slots (incl. format/sort/facets options), bm25, collocations,
    top_terms, keyness, paradigm, cql, stats, thesaurus, sketch_diff,
    suggest, offsets, mwe, more_like, grep, defs (optional symbol
    filter), substring, regex, symbol, refs, q (query-string
    language)."""
    if not isinstance(req, dict):
        raise RequestError("request must be a JSON object")
    forms = [f for f in ("slots", "bm25", "collocations", "top_terms",
                         "keyness", "paradigm", "cql", "stats",
                         "thesaurus", "sketch_diff", "suggest",
                         "offsets", "mwe", "more_like", "grep", "defs",
                         "substring", "regex", "symbol", "refs", "q")
             if f in req]
    if "defs" in forms and "symbol" in forms:
        forms.remove("symbol")  # "symbol" is an OPTION of the defs form
    if len(forms) > 1:
        raise RequestError(
            f"request must use exactly one form, got {sorted(forms)}")
    if "stats" in req:
        # corpus/index summary tab: one cheap metadata answer
        unknown = set(req) - {"stats", "lang"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        if req["stats"] is not True:
            raise RequestError("stats must be true")
        lang = req.get("lang")
        if lang is not None and (not isinstance(lang, str) or not lang):
            raise RequestError("lang must be a non-empty string")
        return {"stats": True, "lang": lang}
    def _limit_lang(r: dict) -> tuple[int, str | None]:
        limit = r.get("limit", 100)
        if not isinstance(limit, int) or isinstance(limit, bool) \
                or not 1 <= limit <= _MAX_UNTIL:
            raise RequestError(f"limit must be an integer in [1, {_MAX_UNTIL}]")
        lang = r.get("lang")
        if lang is not None and (not isinstance(lang, str) or not lang):
            raise RequestError("lang must be a non-empty string")
        return limit, lang

    if "q" in req:
        # unified query-string language (search/querylang.py grammar):
        # repo:/path:/lang: filters, "quoted phrases", -negation and
        # BM25-ranked bare terms in ONE string — the search-box form.
        # Grammar errors surface HERE (boundary), corpus-shape errors
        # (e.g. repo: over a corpus without a repo column) at execution.
        from fastmorph_spark.search.querylang import parse_query

        unknown = set(req) - {"q", "k"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        q = req["q"]
        if not isinstance(q, str) or not q.strip():
            raise RequestError("q must be a non-empty query string")
        try:
            parse_query(q)  # serving tokenizer is the ascii contract
        except ValueError as e:
            raise RequestError(f"q: {e}") from None
        k = req.get("k", 10)
        if not isinstance(k, int) or isinstance(k, bool) \
                or not 1 <= k <= _MAX_UNTIL:
            raise RequestError(f"k must be an integer in [1, {_MAX_UNTIL}]")
        return {"q": q, "k": k}
    if "grep" in req:
        # grep/ripgrep result unit over the served corpus: lines holding
        # the term as a whole token, with 1-based line numbers
        from fastmorph_spark.tokenize import tokenize_py

        unknown = set(req) - {"grep", "limit", "lang", "context"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        term = req["grep"]
        if not isinstance(term, str) or not term.strip():
            raise RequestError("grep must be a non-empty term")
        folded = tokenize_py(term)
        if len(folded) != 1:
            raise RequestError(
                f"grep term must fold to exactly one token, got {folded!r}")
        limit = req.get("limit", 100)
        if not isinstance(limit, int) or isinstance(limit, bool) \
                or not 1 <= limit <= _MAX_UNTIL:
            raise RequestError(f"limit must be an integer in [1, {_MAX_UNTIL}]")
        # grep -C: 0 (default) = match lines only; N = N context lines
        # either side, overlapping windows merged, matches flagged
        context = req.get("context", 0)
        if not isinstance(context, int) or isinstance(context, bool) \
                or not 0 <= context <= 100:
            raise RequestError("context must be an integer in [0, 100]")
        lang = req.get("lang")
        if lang is not None and (not isinstance(lang, str) or not lang):
            raise RequestError("lang must be a non-empty string")
        return {"grep": folded[0], "limit": limit, "lang": lang,
                "context": context}
    if "refs" in req:
        # find-usages tab (search/history.py): refs=true ranks referenced
        # identifiers by citing-doc count (k rows); refs="Ident" lists the
        # citing (doc, line) edges for one identifier (case-exact)
        import re as _re

        unknown = set(req) - {"refs", "limit", "lang", "k"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        v = req["refs"]
        if v is True:
            if "limit" in req:
                raise RequestError(
                    "limit applies to the single-identifier refs form; "
                    "use k for the ranking form")
            k = req.get("k", 50)
            if not isinstance(k, int) or isinstance(k, bool) \
                    or not 1 <= k <= _MAX_UNTIL:
                raise RequestError(f"k must be an integer in [1, {_MAX_UNTIL}]")
            lang = req.get("lang")
            if lang is not None and (not isinstance(lang, str) or not lang):
                raise RequestError("lang must be a non-empty string")
            return {"refs": True, "k": k, "lang": lang}
        if not isinstance(v, str) \
                or not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", v):
            raise RequestError(
                "refs must be true (ranking) or an identifier string")
        if "k" in req:
            raise RequestError("k applies to the refs=true ranking form")
        limit, lang = _limit_lang(req)
        return {"refs": v, "limit": limit, "lang": lang}
    if "defs" in req:
        # symbol tab: definition lines (def/class/function/func + name);
        # optional "symbol" narrows to one identifier (case-exact)
        unknown = set(req) - {"defs", "limit", "lang", "symbol"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        if req["defs"] is not True:
            raise RequestError("defs must be true")
        sym = req.get("symbol")
        if sym is not None and (not isinstance(sym, str) or not sym):
            raise RequestError("symbol must be a non-empty string")
        limit, lang = _limit_lang(req)
        return {"defs": True, "limit": limit, "lang": lang, "symbol": sym}
    if "symbol" in req:
        # symbol-boosted ranking: docs DEFINING the identifier outrank
        # mentioners (search/symbols.py)
        from fastmorph_spark.tokenize import tokenize_py

        unknown = set(req) - {"symbol", "k", "lang"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        sym = req["symbol"]
        if not isinstance(sym, str) or len(tokenize_py(sym)) != 1:
            raise RequestError(
                "symbol must be a string folding to exactly one token")
        k = req.get("k", 10)
        if not isinstance(k, int) or isinstance(k, bool) or not 1 <= k <= 1000:
            raise RequestError("k must be an integer in [1, 1000]")
        lang = req.get("lang")
        if lang is not None and (not isinstance(lang, str) or not lang):
            raise RequestError("lang must be a non-empty string")
        return {"symbol": sym, "k": k, "lang": lang}
    if "substring" in req:
        # raw substring containment over content (trigram-accelerated
        # when the server holds a trigram sidecar; exact either way)
        unknown = set(req) - {"substring", "case", "limit", "lang"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        q = req["substring"]
        if not isinstance(q, str) or not q:
            raise RequestError("substring must be a non-empty string")
        case = req.get("case", True)
        if not isinstance(case, bool):
            raise RequestError("case must be a boolean")
        limit, lang = _limit_lang(req)
        return {"substring": q, "case": case, "limit": limit, "lang": lang}
    if "regex" in req:
        # unanchored line regex (ripgrep contract) on the pinned
        # cross-engine subset — rejection is client-addressable
        unknown = set(req) - {"regex", "limit", "lang"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        pat = req["regex"]
        if not isinstance(pat, str) or not pat:
            raise RequestError("regex must be a non-empty string")
        from fastmorph_spark.search.regex import validate_regex

        try:
            validate_regex(pat)
        except ValueError as e:
            raise RequestError(str(e)) from None
        limit, lang = _limit_lang(req)
        return {"regex": pat, "limit": limit, "lang": lang}
    if "cql" in req:
        # textual corpus-query form (search/cql.py dialect): compiles to
        # the slots form — same options, same lifecycle — except
        # `within s`, which becomes its own sentence-scoped parsed form
        from fastmorph_spark.search.cql import CQLError, parse_cql

        q = req["cql"]
        if not isinstance(q, str) or not q.strip():
            raise RequestError("cql must be a non-empty query string")
        try:
            c = parse_cql(q)
        except CQLError as e:
            raise RequestError(str(e)) from None
        if c["within_sentence"]:
            unknown = set(req) - {"cql", "until", "lang"}
            if unknown:
                raise RequestError(
                    f"'within s' requests take only until/lang, "
                    f"got extra fields: {sorted(unknown)}")
            until = req.get("until", 20)
            if not isinstance(until, int) or isinstance(until, bool) \
                    or not 1 <= until <= _MAX_UNTIL:
                raise RequestError(
                    f"until must be an integer in [1, {_MAX_UNTIL}]")
            lang = req.get("lang")
            if lang is not None and (not isinstance(lang, str) or not lang):
                raise RequestError("lang must be a non-empty string")
            return {"within_slots": c["slots"], "dists": c["dists"],
                    "until": until, "lang": lang}
        # re-express as a slots-form request and fall through the SAME
        # validation (slot shape, dists arity, pagination bounds) — the
        # compiled slots are engine-form, so map keys back to protocol
        # vocabulary first
        eng_to_proto = {v: k for k, v in _SLOT_KEYS.items()}
        proto_slots = []
        for s in c["slots"]:
            kind = next(k for k in s if k in eng_to_proto)
            ps = {eng_to_proto[kind]: s[kind]}
            if s.get("case"):
                ps["case"] = True
            if "dist" in s:
                ps["dist"] = s["dist"]
            proto_slots.append(ps)
        synth = {k: v for k, v in req.items() if k != "cql"}
        synth["slots"] = proto_slots
        synth["dists"] = [list(d) for d in c["dists"]]
        return parse_request(synth)
    if "more_like" in req:
        # similar-document retrieval: top-m TF-IDF terms of the source
        # doc as a BM25 disjunction off the packed index (search/mlt.py)
        unknown = set(req) - {"more_like", "m", "k", "lang"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        doc = req["more_like"]
        if not isinstance(doc, int) or isinstance(doc, bool) or doc < 0:
            raise RequestError("more_like must be a non-negative doc_id")
        m = req.get("m", 10)
        if not isinstance(m, int) or isinstance(m, bool) \
                or not 1 <= m <= _MAX_UNTIL:
            raise RequestError(f"m must be an integer in [1, {_MAX_UNTIL}]")
        k = req.get("k", 10)
        if not isinstance(k, int) or isinstance(k, bool) \
                or not 1 <= k <= _MAX_UNTIL:
            raise RequestError(f"k must be an integer in [1, {_MAX_UNTIL}]")
        lang = req.get("lang")
        if lang is not None and (not isinstance(lang, str) or not lang):
            raise RequestError("lang must be a non-empty string")
        return {"more_like": doc, "m": m, "k": k, "lang": lang}
    if "suggest" in req:
        # did-you-mean box: dictionary terms near the (possibly
        # mistyped) probe — metadata only, no decode, no corpus scan
        unknown = set(req) - {"suggest", "dist", "k", "lang"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        word = req["suggest"]
        if not isinstance(word, str) or not word.strip():
            raise RequestError("suggest must be a non-empty word")
        d = req.get("dist", 1)
        if not isinstance(d, int) or isinstance(d, bool) \
                or not 1 <= d <= _MAX_FUZZY_DIST:
            raise RequestError(
                f"dist must be an integer in [1, {_MAX_FUZZY_DIST}]")
        k = req.get("k", 10)
        if not isinstance(k, int) or isinstance(k, bool) \
                or not 1 <= k <= _MAX_UNTIL:
            raise RequestError(f"k must be an integer in [1, {_MAX_UNTIL}]")
        lang = req.get("lang")
        if lang is not None and (not isinstance(lang, str) or not lang):
            raise RequestError("lang must be a non-empty string")
        return {"suggest": word, "dist": d, "k": k, "lang": lang}
    if "thesaurus" in req:
        # "similar words" tab: distributional neighbors of one word
        unknown = set(req) - {"thesaurus", "window", "min_shared", "k",
                              "lang"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        word = req["thesaurus"]
        if not isinstance(word, str) or not word:
            raise RequestError("thesaurus must be a non-empty word")
        window = req.get("window", 3)
        if not isinstance(window, int) or isinstance(window, bool) \
                or not 1 <= window <= 10:
            raise RequestError("window must be an integer in [1, 10]")
        min_shared = req.get("min_shared", 2)
        if not isinstance(min_shared, int) or isinstance(min_shared, bool) \
                or min_shared < 1:
            raise RequestError("min_shared must be a positive integer")
        k = req.get("k", 20)
        if not isinstance(k, int) or isinstance(k, bool) \
                or not 1 <= k <= _MAX_UNTIL:
            raise RequestError(f"k must be an integer in [1, {_MAX_UNTIL}]")
        lang = req.get("lang")
        if lang is not None and (not isinstance(lang, str) or not lang):
            raise RequestError("lang must be a non-empty string")
        return {"thesaurus": word, "window": window,
                "min_shared": min_shared, "k": k, "lang": lang}
    if "sketch_diff" in req:
        # two-word comparison tab: shared collocates ranked by pmi_a-pmi_b
        unknown = set(req) - {"sketch_diff", "window", "min_count", "k",
                              "lang"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        pair = req["sketch_diff"]
        ok = (isinstance(pair, (list, tuple)) and len(pair) == 2
              and all(isinstance(w, str) and w for w in pair))
        if not ok:
            raise RequestError(
                "sketch_diff must be a pair of non-empty words [a, b]")
        window = req.get("window", 3)
        if not isinstance(window, int) or isinstance(window, bool) \
                or not 1 <= window <= 10:
            raise RequestError("window must be an integer in [1, 10]")
        min_count = req.get("min_count", 2)
        if not isinstance(min_count, int) or isinstance(min_count, bool) \
                or min_count < 1:
            raise RequestError("min_count must be a positive integer")
        k = req.get("k", 20)
        if not isinstance(k, int) or isinstance(k, bool) \
                or not 1 <= k <= _MAX_UNTIL:
            raise RequestError(f"k must be an integer in [1, {_MAX_UNTIL}]")
        lang = req.get("lang")
        if lang is not None and (not isinstance(lang, str) or not lang):
            raise RequestError("lang must be a non-empty string")
        return {"sketch_diff": [pair[0], pair[1]], "window": window,
                "min_count": min_count, "k": k, "lang": lang}
    if "offsets" in req:
        # positional collocate profile: per-offset top collocates around
        # the target (the concordancer's per-position frequency columns)
        unknown = set(req) - {"offsets", "window", "min_count", "k", "lang"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        target = req["offsets"]
        if not isinstance(target, str) or not target.strip():
            raise RequestError("offsets must be a non-empty target term")
        window = req.get("window", 3)
        if not isinstance(window, int) or isinstance(window, bool) \
                or not 1 <= window <= 1000:
            raise RequestError("window must be an integer in [1, 1000]")
        min_count = req.get("min_count", 2)
        if not isinstance(min_count, int) or isinstance(min_count, bool) \
                or min_count < 1:
            raise RequestError("min_count must be a positive integer")
        k = req.get("k", 5)
        if not isinstance(k, int) or isinstance(k, bool) or not 1 <= k <= 1000:
            raise RequestError("k must be an integer in [1, 1000] "
                               "(collocates PER OFFSET)")
        lang = req.get("lang")
        if lang is not None and (not isinstance(lang, str) or not lang):
            raise RequestError("lang must be a non-empty string")
        return {"offsets": target.strip(), "window": window,
                "min_count": min_count, "k": k, "lang": lang}
    if "mwe" in req:
        # terminology-extraction tab: corpus-wide adjacent-bigram logDice
        unknown = set(req) - {"mwe", "min_count", "k"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        if req["mwe"] is not True:
            raise RequestError("mwe must be true")
        min_count = req.get("min_count", 5)
        if not isinstance(min_count, int) or isinstance(min_count, bool) \
                or min_count < 1:
            raise RequestError("min_count must be a positive integer")
        k = req.get("k", 50)
        if not isinstance(k, int) or isinstance(k, bool) or not 1 <= k <= _MAX_UNTIL:
            raise RequestError(f"k must be an integer in [1, {_MAX_UNTIL}]")
        return {"mwe": True, "min_count": min_count, "k": k, "lang": None}
    if "keyness" in req:
        # corpus-comparison tab: G2 key terms of the `keyness` subcorpus
        unknown = set(req) - {"keyness", "min_count", "k"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        focus = req["keyness"]
        if not isinstance(focus, str) or not focus:
            raise RequestError("keyness must be a non-empty focus lang")
        min_count = req.get("min_count", 5)
        if not isinstance(min_count, int) or isinstance(min_count, bool) \
                or min_count < 1:
            raise RequestError("min_count must be a positive integer")
        k = req.get("k", 50)
        if not isinstance(k, int) or isinstance(k, bool) or not 1 <= k <= _MAX_UNTIL:
            raise RequestError(f"k must be an integer in [1, {_MAX_UNTIL}]")
        return {"keyness": focus, "min_count": min_count, "k": k, "lang": None}
    if "paradigm" in req:
        # morphological paradigm tab: all forms sharing the word's stem
        unknown = set(req) - {"paradigm", "k", "lang"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        word = req["paradigm"]
        if not isinstance(word, str) or not word.strip():
            raise RequestError("paradigm must be a non-empty word")
        k = req.get("k", 100)
        if not isinstance(k, int) or isinstance(k, bool) or not 1 <= k <= _MAX_UNTIL:
            raise RequestError(f"k must be an integer in [1, {_MAX_UNTIL}]")
        lang = req.get("lang")
        if lang is not None and (not isinstance(lang, str) or not lang):
            raise RequestError("lang must be a non-empty string")
        return {"paradigm": word.strip(), "k": k, "lang": lang}
    if "top_terms" in req:
        unknown = set(req) - {"top_terms", "pattern", "lang"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        n = req["top_terms"]
        if not isinstance(n, int) or isinstance(n, bool) or not 1 <= n <= _MAX_UNTIL:
            raise RequestError(
                f"top_terms must be an integer in [1, {_MAX_UNTIL}]")
        pattern = req.get("pattern")
        if pattern is not None and (not isinstance(pattern, str) or not pattern):
            raise RequestError("pattern must be a non-empty wildcard string")
        lang = req.get("lang")
        if lang is not None and (not isinstance(lang, str) or not lang):
            raise RequestError("lang must be a non-empty string")
        return {"top_terms": n, "pattern": pattern, "lang": lang}
    if "collocations" in req:
        unknown = set(req) - {"collocations", "window", "min_count", "k",
                              "lang", "group_by"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        target = req["collocations"]
        if not isinstance(target, str) or not target.strip():
            raise RequestError("collocations must be a non-empty target term")
        window = req.get("window", 3)
        if not isinstance(window, int) or isinstance(window, bool) \
                or not 1 <= window <= 1000:
            raise RequestError("window must be an integer in [1, 1000]")
        min_count = req.get("min_count", 2)
        if not isinstance(min_count, int) or isinstance(min_count, bool) \
                or min_count < 1:
            raise RequestError("min_count must be a positive integer")
        k = req.get("k", 20)
        if not isinstance(k, int) or isinstance(k, bool) or not 1 <= k <= _MAX_UNTIL:
            raise RequestError(f"k must be an integer in [1, {_MAX_UNTIL}]")
        lang = req.get("lang")
        if lang is not None and (not isinstance(lang, str) or not lang):
            raise RequestError("lang must be a non-empty string")
        group_by = req.get("group_by")
        if group_by is not None and group_by not in ("stem", "tag"):
            raise RequestError('group_by must be "stem" or "tag"')
        return {"collocations": target.strip(), "window": window,
                "min_count": min_count, "k": k, "lang": lang,
                "group_by": group_by}
    if "bm25" in req:
        unknown = set(req) - {"bm25", "k", "lang", "expand"}
        if unknown:
            raise RequestError(f"unknown request fields: {sorted(unknown)}")
        q = req["bm25"]
        if not isinstance(q, str) or not q.strip():
            raise RequestError("bm25 must be a non-empty query string")
        k = req.get("k", 10)
        if not isinstance(k, int) or isinstance(k, bool) or not 1 <= k <= _MAX_UNTIL:
            raise RequestError(f"k must be an integer in [1, {_MAX_UNTIL}]")
        # synonym expansion: each query term pulls its top-`expand`
        # thesaurus neighbors before scoring (search/expand.py pinning;
        # window/min_shared fixed at the expansion defaults 3/2)
        expand = req.get("expand", 0)
        if not isinstance(expand, int) or isinstance(expand, bool) \
                or not 0 <= expand <= _MAX_EXPAND:
            raise RequestError(
                f"expand must be an integer in [0, {_MAX_EXPAND}]")
        lang = req.get("lang")
        if lang is not None and (not isinstance(lang, str) or not lang):
            raise RequestError("lang must be a non-empty string")
        return {"bm25": q, "k": k, "lang": lang, "expand": expand}
    unknown = set(req) - {"slots", "dists", "skip", "until", "width", "lang",
                          "format", "facets", "sort", "filter", "freq", "k"}
    if unknown:
        raise RequestError(f"unknown request fields: {sorted(unknown)}")
    freq = req.get("freq")
    if freq is not None:
        # frequency breakdown OF the concordance: the response is the
        # breakdown table, not a page — page/assembly options conflict
        if freq not in ("node", "lang", "source"):
            raise RequestError("freq must be 'node', 'lang' or 'source'")
        clash = [f for f in ("format", "sort", "facets", "width", "skip",
                             "until") if f in req]
        if clash:
            raise RequestError(
                f"freq cannot combine with {sorted(clash)} (the response "
                f"is a breakdown table, not a concordance page)")
    elif "k" in req:
        raise RequestError("k applies to freq requests only")
    freq_k = req.get("k", 50)
    if not isinstance(freq_k, int) or isinstance(freq_k, bool) \
            or not 1 <= freq_k <= _MAX_UNTIL:
        raise RequestError(f"k must be an integer in [1, {_MAX_UNTIL}]")
    filt = req.get("filter")
    if filt is not None:
        # the concordancer's positive/negative context filter
        if not isinstance(filt, dict):
            raise RequestError("filter must be an object")
        fextra = set(filt) - {"slot", "window", "mode"}
        if fextra:
            raise RequestError(f"filter has unknown fields: {sorted(fextra)}")
        if "slot" not in filt:
            raise RequestError("filter needs a slot field")
        fslot = _parse_slot(filt["slot"], "filter slot")
        w = filt.get("window", [-5, 5])
        ok = (isinstance(w, (list, tuple)) and len(w) == 2
              and all(isinstance(x, int) and not isinstance(x, bool) for x in w))
        if not ok or w[0] > w[1] or abs(w[0]) > 1000 or abs(w[1]) > 1000:
            raise RequestError(
                "filter window must be [lo, hi] token offsets with "
                "lo <= hi and |offset| <= 1000")
        fmode = filt.get("mode", "positive")
        if fmode not in ("positive", "negative"):
            raise RequestError("filter mode must be 'positive' or 'negative'")
        filt = {"slot": fslot, "window": [int(w[0]), int(w[1])],
                "mode": fmode}
    facets = req.get("facets", False)
    if not isinstance(facets, bool):
        raise RequestError("facets must be a boolean")
    fmt = req.get("format", "snippets")
    if fmt not in ("snippets", "kwic"):
        raise RequestError("format must be 'snippets' or 'kwic'")
    sort = req.get("sort")
    if sort is not None:
        # the concordancer's sort buttons: only meaningful on kwic lines
        # ("gdex" = best-example ranking instead of collation order)
        if sort not in ("right", "left", "gdex"):
            raise RequestError("sort must be 'right', 'left' or 'gdex'")
        if fmt != "kwic":
            raise RequestError("sort requires format='kwic'")
        if facets:
            raise RequestError(
                "sort and facets cannot combine (sorted view is a flat "
                "line page; request facets from the unsorted view)")
    raw_slots = req.get("slots")
    if not isinstance(raw_slots, list) or not raw_slots:
        raise RequestError("slots must be a non-empty list")
    if len(raw_slots) > _MAX_SLOTS:
        raise RequestError(f"at most {_MAX_SLOTS} slots supported")
    slots = [_parse_slot(s, f"slot {i}") for i, s in enumerate(raw_slots)]
    raw_dists = req.get("dists", [])
    if not isinstance(raw_dists, list) or len(raw_dists) != len(slots) - 1:
        raise RequestError(
            f"dists must list {len(slots) - 1} [lo, hi] ranges "
            f"(one between each slot pair)")
    dists = []
    for i, d in enumerate(raw_dists):
        ok = (isinstance(d, (list, tuple)) and len(d) == 2
              and all(isinstance(x, int) and not isinstance(x, bool) for x in d))
        if not ok or d[0] < 1 or d[1] < d[0]:
            raise RequestError(
                f"dists[{i}] must be [lo, hi] with 1 <= lo <= hi")
        dists.append((int(d[0]), int(d[1])))
    skip = req.get("skip", 0)
    until = req.get("until", 20)
    # width default tracks the format (ADVICE r04): snippets default 2
    # (SNIPPET_WIDTH), kwic default 5 (KWIC_WIDTH) — an unspecified-width
    # kwic request gets the same concordance context every other kwic
    # path (engine.kwic, queryset kwic modes) uses
    width = req.get("width", 5 if fmt == "kwic" else 2)
    for name, v in (("skip", skip), ("until", until), ("width", width)):
        if not isinstance(v, int) or isinstance(v, bool) or v < 0:
            raise RequestError(f"{name} must be a non-negative integer")
    if until > _MAX_UNTIL:
        raise RequestError(f"until must be <= {_MAX_UNTIL} (page is collected)")
    if skip >= until and until > 0:
        raise RequestError("skip must be < until")
    lang = req.get("lang")
    if lang is not None and (not isinstance(lang, str) or not lang):
        raise RequestError("lang must be a non-empty string")
    return {"slots": slots, "dists": dists, "skip": skip, "until": until,
            "width": width, "lang": lang, "format": fmt, "facets": facets,
            "sort": sort, "filter": filt, "freq": freq, "freq_k": freq_k}


def _serialize(rows: list, skip: int, until: int,
               fmt: str = "snippets") -> dict:
    """request_page output rows (one per occurrence, doc/pos order) ->
    the nested response dict. ``fmt`` mirrors the request's "format":
    snippet occurrences carry (pos, hl_offset, snippet, running_total);
    kwic occurrences carry the aligned (pos, left, keyword, right)."""
    results: list[dict] = []
    total_docs = total_matches = 0
    for r in rows:
        total_docs, total_matches = int(r["total_docs"]), int(r["total_matches"])
        if not results or results[-1]["doc_id"] != int(r["doc_id"]):
            results.append({"rank": int(r["rank"]), "doc_id": int(r["doc_id"]),
                            "n_matches": int(r["n_matches"]), "matches": []})
        if fmt == "kwic":
            results[-1]["matches"].append({
                "pos": int(r["pos"]), "left": r["left_ctx"],
                "keyword": r["keyword"], "right": r["right_ctx"],
            })
        else:
            results[-1]["matches"].append({
                "pos": int(r["pos"]), "hl_offset": int(r["hl_offset"]),
                "snippet": r["snippet"], "running_total": int(r["running_total"]),
            })
    return {"total_docs": total_docs, "total_matches": total_matches,
            "skip": skip, "until": until, "results": results}


def handle_request(documents: DataFrame, index, req: dict | str,
                   scope=None, session: dict | None = None,
                   trigram=None) -> dict:
    """Entry point 2 [PK-high]: one serving request over the PACKED
    index, end to end — parse/validate, packed slot scan + pagination +
    snippets (packed_search_request), bounded collect, nested response.

    ``index``: an Index (search/packed.py paths; per-lang routing uses a
    dict lang -> Index from read_lang_indexes when the request carries
    "lang"). Errors come back as {"error": msg} rather than raising —
    the serving boundary answers every request. An empty match set is a
    well-formed response with total_docs == 0, NOT an error.

    ``session``: an optional dict enabling pagination CONTINUATION
    across calls (entry point 3): slot requests that differ only in
    skip/until/width share one persisted match set. The session owns
    those pins — call close_session(session) at end of burst; don't mix
    with ``scope`` for the same request (scope is per-call, session
    outlives it).

    ``trigram``: optional TrigramIndex (or dict lang -> TrigramIndex)
    sidecar accelerating the substring/regex forms; without one they
    run the exact full-scan verify — an ACCELERATOR, never a truth
    source, so a missing per-lang entry degrades to the scan rather
    than answering empty."""
    import json as _json

    from fastmorph_spark.search.packed import packed_search_request

    if isinstance(req, str):
        try:
            req = _json.loads(req)
        except _json.JSONDecodeError as e:
            return {"error": f"request is not valid JSON: {e.msg}"}
    try:
        p = parse_request(req)
    except RequestError as e:
        return {"error": str(e)}
    if "keyness" in p:
        # corpus-comparison: runs on the DOCUMENT corpus (both sides of
        # the comparison), independent of which index serves — so it is
        # answered before any per-lang routing
        from fastmorph_spark.search.keyness import keyness as _keyness

        rows = _keyness(documents, p["keyness"],
                        p["min_count"], p["k"]).collect()
        return {"focus": p["keyness"], "min_count": p["min_count"],
                "k": p["k"],
                "results": [{"rank": int(r["rank"]), "term": r["term"],
                             "f_focus": int(r["f_focus"]),
                             "f_ref": int(r["f_ref"]),
                             "g2": float(r["g2"]),
                             "log_ratio": float(r["log_ratio"])}
                            for r in rows]}
    if "q" in p:
        # one-search-box form: a DOCUMENT-corpus query whose own
        # lang:/repo:/path: atoms do the filtering, so it is answered
        # before per-lang routing; corpus-shape mismatches (a filter on
        # a column the served corpus lacks) come back as
        # client-addressable errors, not crashes
        from fastmorph_spark.search.querylang import query_search

        try:
            rows = query_search(documents, p["q"], k=p["k"]).collect()
        except ValueError as e:
            return {"error": f"q: {e}"}
        return {"q": p["q"], "k": p["k"],
                "results": [
                    {**{"rank": int(r["rank"]), "doc_id": int(r["doc_id"])},
                     **{c: r[c] for c in ("repo", "path")
                        if c in r.__fields__},
                     "score": float(r["score"])}
                    for r in rows]}
    if "mwe" in p:
        # terminology extraction: corpus-wide bigram logDice — like
        # keyness, a DOCUMENT-corpus statistic independent of which
        # index serves, answered before per-lang routing
        from fastmorph_spark.search.collocation import mwe_bigrams

        # single-index serving: its dictionary covers the whole corpus,
        # so unigram cf comes from metadata (one corpus scan total);
        # per-lang routing holds per-lang cf only -> inline unigram agg
        d = index.dictionary if not isinstance(index, dict) else None
        rows = mwe_bigrams(documents, p["min_count"], p["k"],
                           dictionary=d).collect()
        return {"min_count": p["min_count"], "k": p["k"],
                "results": [{"rank": int(r["rank"]), "w1": r["w1"],
                             "w2": r["w2"], "f_xy": int(r["f_xy"]),
                             "f_x": int(r["f_x"]), "f_y": int(r["f_y"]),
                             "logdice": float(r["logdice"])}
                            for r in rows]}
    if isinstance(index, dict):  # per-lang index map (subcorpus routing)
        if p["lang"] is None:
            return {"error": "this serving index requires a lang field"}
        if p["lang"] not in index:
            if "bm25" in p:
                out = {"query": p["bm25"], "k": p["k"], "results": []}
                if p.get("expand"):
                    out["expand"] = p["expand"]
                    out["expanded_terms"] = []
                return out
            if "collocations" in p:
                out = {"target": p["collocations"], "window": p["window"],
                       "min_count": p["min_count"], "k": p["k"],
                       "results": []}
                if p.get("group_by"):
                    out["group_by"] = p["group_by"]
                return out
            if "top_terms" in p:
                return {"top_terms": p["top_terms"], "pattern": p["pattern"],
                        "results": []}
            if "paradigm" in p:
                return {"word": p["paradigm"], "k": p["k"], "results": []}
            if "stats" in p:
                return {"n_docs": 0, "avgdl": 0.0, "vocab": 0,
                        "postings": 0, "tokens": 0}
            if "within_slots" in p:
                return {"until": p["until"], "n_results": 0, "results": []}
            if "thesaurus" in p:
                return {"target": p["thesaurus"], "k": p["k"],
                        "results": []}
            if "suggest" in p:
                return {"word": p["suggest"], "dist": p["dist"],
                        "k": p["k"], "results": []}
            if "more_like" in p:
                return {"doc_id": p["more_like"], "m": p["m"],
                        "k": p["k"], "results": []}
            if "sketch_diff" in p:
                return {"targets": p["sketch_diff"], "k": p["k"],
                        "results": []}
            if p.get("freq"):
                return {"freq": p["freq"], "k": p["freq_k"], "results": []}
            if "grep" in p:
                return {"term": p["grep"], "limit": p["limit"], "results": []}
            if "defs" in p:
                return {"limit": p["limit"], "symbol": p["symbol"],
                        "results": []}
            if "symbol" in p:
                return {"symbol": p["symbol"], "k": p["k"], "results": []}
            if "substring" in p:
                return {"q": p["substring"], "case": p["case"],
                        "limit": p["limit"], "results": []}
            if "regex" in p:
                return {"regex": p["regex"], "limit": p["limit"],
                        "results": []}
            return {"total_docs": 0, "total_matches": 0, "skip": p["skip"],
                    "until": p["until"], "results": []}
        index = index[p["lang"]]
        from pyspark.sql import functions as F

        documents = documents.filter(F.col("lang") == p["lang"])
    if isinstance(trigram, dict):
        trigram = trigram.get(p.get("lang"))
    if "grep" in p:
        # line-level result unit (code-search contract): pure-Catalyst
        # split/posexplode over the (possibly lang-routed) corpus; the
        # ORDER BY + limit fuse into one bounded collect
        from fastmorph_spark.search.grep import grep_context, grep_lines

        if p.get("context", 0) > 0:
            rows = (grep_context(documents, p["grep"], context=p["context"])
                    .limit(p["limit"]).collect())
            return {"term": p["grep"], "limit": p["limit"],
                    "context": p["context"],
                    "results": [{"doc_id": int(r["doc_id"]),
                                 "line_no": int(r["line_no"]),
                                 "line": r["line"],
                                 "is_match": bool(r["is_match"])}
                                for r in rows]}
        rows = grep_lines(documents, p["grep"]).limit(p["limit"]).collect()
        return {"term": p["grep"], "limit": p["limit"],
                "results": [{"doc_id": int(r["doc_id"]),
                             "line_no": int(r["line_no"]),
                             "line": r["line"]} for r in rows]}
    if "refs" in p:
        # find-usages tab: '# see A and B' cross-reference edges
        # (search/history.py) — ranking (refs=true) or one identifier's
        # citing lines; both pure Catalyst over the lang-routed corpus
        from pyspark.sql import functions as F

        from fastmorph_spark.search.history import code_refs, ref_counts

        if p["refs"] is True:
            rows = ref_counts(documents).limit(p["k"]).collect()
            return {"refs": True, "k": p["k"],
                    "results": [{"ref": r["ref"],
                                 "n_docs": int(r["n_docs"]),
                                 "n_refs": int(r["n_refs"])} for r in rows]}
        rows = (code_refs(documents).where(F.col("ref") == p["refs"])
                .limit(p["limit"]).collect())
        return {"refs": p["refs"], "limit": p["limit"],
                "results": [{"doc_id": int(r["doc_id"]),
                             "line_no": int(r["line_no"])} for r in rows]}
    if "defs" in p:
        # symbol tab: ctags-style definition lines off the same
        # split/posexplode scan; optional case-exact symbol narrowing
        # (go-to-definition)
        from pyspark.sql import functions as F

        from fastmorph_spark.search.grep import code_defs

        defs = code_defs(documents)
        if p["symbol"] is not None:
            defs = defs.filter(F.col("symbol") == p["symbol"])
        rows = defs.limit(p["limit"]).collect()
        return {"limit": p["limit"], "symbol": p["symbol"],
                "results": [{"doc_id": int(r["doc_id"]),
                             "line_no": int(r["line_no"]),
                             "kind": r["kind"], "symbol": r["symbol"]}
                            for r in rows]}
    if "symbol" in p:
        # symbol-boosted ranking (definers first, BM25 inside strata)
        from fastmorph_spark.search.symbols import symbol_boosted_topk

        rows = symbol_boosted_topk(documents, p["symbol"], k=p["k"],
                                   scope=scope).collect()
        return {"symbol": p["symbol"], "k": p["k"],
                "results": [{"rank": int(r["rank"]),
                             "doc_id": int(r["doc_id"]),
                             "score": float(r["score"])} for r in rows]}
    if "substring" in p:
        # containment lines via trigram candidates + exact verify (or
        # the exact full scan when no sidecar is mounted)
        from fastmorph_spark.search.substring import substring_grep

        rows = substring_grep(documents, trigram, p["substring"],
                              case=p["case"]).limit(p["limit"]).collect()
        return {"q": p["substring"], "case": p["case"], "limit": p["limit"],
                "results": [{"doc_id": int(r["doc_id"]),
                             "line_no": int(r["line_no"]),
                             "line": r["line"]} for r in rows]}
    if "regex" in p:
        # unanchored line regex, factor-trigram candidates when indexable
        from fastmorph_spark.search.substring import regex_grep

        rows = regex_grep(documents, trigram, p["regex"]) \
            .limit(p["limit"]).collect()
        return {"regex": p["regex"], "limit": p["limit"],
                "results": [{"doc_id": int(r["doc_id"]),
                             "line_no": int(r["line_no"]),
                             "line": r["line"]} for r in rows]}
    if "stats" in p:
        # index summary off METADATA alone: the stats table (n_docs,
        # avgdl — one memoized driver row) + ONE dictionary aggregate
        # (vocab / Σdf / Σcf). No block decode, no corpus scan. Like the
        # frequency profile, numbers are pre-delete until purge.
        from pyspark.sql import functions as F

        s = index.stats_row()
        d = index.dictionary.agg(
            F.count("*").alias("vocab"),
            F.sum("df").alias("postings"),
            F.sum("cf").alias("tokens"),
        ).collect()[0]
        return {"n_docs": int(s["n_docs"]), "avgdl": float(s["avgdl"]),
                "vocab": int(d["vocab"]), "postings": int(d["postings"] or 0),
                "tokens": int(d["tokens"] or 0)}
    if "within_slots" in p:
        # sentence-scoped CQL (`... within s`): packed pruned decode ->
        # composite-key re-base -> unchanged slot engine. The response is
        # the bounded head of the (doc_id, sent_id)-ordered match list —
        # sentence-LOCAL highlight offsets, no snippet assembly.
        from fastmorph_spark.search.sentence import (
            sentence_bounds,
            slot_within_sentence_packed,
        )

        try:
            bounds = sentence_bounds(documents)
            rows = slot_within_sentence_packed(
                index, bounds, p["within_slots"], p["dists"]
            ).limit(p["until"]).collect()
        except ValueError as e:
            return {"error": str(e)}
        return {"until": p["until"], "n_results": len(rows),
                "results": [{"doc_id": int(r["doc_id"]),
                             "sent_id": int(r["sent_id"]),
                             "n_matches": int(r["n_matches"]),
                             "positions": r["match_starts"]}
                            for r in rows]}
    if "paradigm" in p:
        # morphological paradigm view off dictionary METADATA (stem_expr
        # over the ~|vocab| rows; no block decode)
        from fastmorph_spark.stem import paradigm as _paradigm

        rows = _paradigm(index.dictionary, p["paradigm"]) \
            .limit(p["k"]).collect()
        return {"word": p["paradigm"], "k": p["k"],
                "results": [{"term": r["term"], "df": int(r["df"]),
                             "cf": int(r["cf"])} for r in rows]}
    if "top_terms" in p:
        # frequency profile straight off dictionary METADATA (no block
        # decode; (df DESC, term ASC) — the ordering dictionary_top100
        # pins against its oracle). Like BM25 stats, df/cf are stale
        # after deletes until purge.
        from pyspark.sql import functions as F

        d = index.dictionary.select("term", "df", "cf")
        if p["pattern"]:
            from fastmorph_spark.search.engine import wildcard_pattern_to_like

            d = d.filter(F.col("term").like(
                wildcard_pattern_to_like(p["pattern"])))
        rows = d.orderBy(F.desc("df"), F.asc("term")) \
            .limit(p["top_terms"]).collect()
        return {"top_terms": p["top_terms"], "pattern": p["pattern"],
                "results": [{"rank": i + 1, "term": r["term"],
                             "df": int(r["df"]), "cf": int(r["cf"])}
                            for i, r in enumerate(rows)]}
    if "more_like" in p:
        # similar documents: one-row tokenize + dictionary df + WAND
        # top-(k+1) with exact source-drop (search/mlt.py). A source
        # doc absent from the (lang-routed) corpus answers an empty
        # result set, not an error.
        from fastmorph_spark.search.mlt import more_like_this_packed

        rows = more_like_this_packed(index, documents, p["more_like"],
                                     m=p["m"], k=p["k"]).collect()
        return {"doc_id": p["more_like"], "m": p["m"], "k": p["k"],
                "results": [{"rank": int(r["rank"]),
                             "doc_id": int(r["doc_id"]),
                             "score": float(r["score"])} for r in rows]}
    if "suggest" in p:
        # did-you-mean: length-band + levenshtein over the ~|vocab|-row
        # dictionary, (dist ASC, df DESC) — the ranking a portal's
        # suggestion box wants (closest first, then commonest)
        from fastmorph_spark.search.fuzzy import fuzzy_terms

        rows = fuzzy_terms(index.dictionary, p["suggest"],
                           max_dist=p["dist"], k=p["k"]).collect()
        return {"word": p["suggest"], "dist": p["dist"], "k": p["k"],
                "results": [{"term": r["term"], "df": int(r["df"]),
                             "dist": int(r["dist"])} for r in rows]}
    if "thesaurus" in p:
        # "similar words": co-occurrence profiles over the (lang-routed)
        # document corpus; the target's profile broadcasts. In a serving
        # session the PROFILES are the reusable scan state (the at-scale
        # shape thesaurus(profiles=) exists for): one corpus pair-count
        # pass serves every thesaurus request of the burst, keyed by
        # (lang, window); close_session unpersists it like any match set.
        from fastmorph_spark.search.thesaurus import cooc_profiles
        from fastmorph_spark.search.thesaurus import thesaurus as _thes

        profiles = None
        if session is not None:
            pkey = ("thesaurus_profiles", p["lang"], p["window"])
            profiles = session.get(pkey)
            if profiles is None:
                profiles = cooc_profiles(documents, p["window"]).persist()
                session[pkey] = profiles
        rows = _thes(documents, p["thesaurus"], window=p["window"],
                     min_shared=p["min_shared"], k=p["k"],
                     profiles=profiles).collect()
        return {"target": p["thesaurus"], "window": p["window"],
                "min_shared": p["min_shared"], "k": p["k"],
                "results": [{"rank": int(r["rank"]), "term": r["term"],
                             "shared": int(r["shared"]),
                             "mass": int(r["mass"]),
                             "sim": float(r["sim"])} for r in rows]}
    if "sketch_diff" in p:
        # two-word comparison off the packed index: ONE decode bounded
        # by the union of both targets' doc-shard envelopes
        from fastmorph_spark.search.collocation import packed_sketch_diff

        a, b = p["sketch_diff"]
        rows = packed_sketch_diff(index, a, b, window=p["window"],
                                  min_count=p["min_count"], k=p["k"],
                                  scope=scope).collect()
        return {"targets": [a, b], "window": p["window"],
                "min_count": p["min_count"], "k": p["k"],
                "results": [{"rank": int(r["rank"]), "term": r["term"],
                             "cooc_a": int(r["cooc_a"]),
                             "cooc_b": int(r["cooc_b"]),
                             "pmi_a": float(r["pmi_a"]),
                             "pmi_b": float(r["pmi_b"]),
                             "diff": float(r["diff"])} for r in rows]}
    if "offsets" in p:
        # per-offset collocate columns off the packed index (the
        # collocations form's block-skip machinery, per-offset output)
        from fastmorph_spark.search.collocation import colloc_by_offset_packed

        rows = colloc_by_offset_packed(index, p["offsets"],
                                       window=p["window"],
                                       min_count=p["min_count"],
                                       k_per_offset=p["k"],
                                       scope=scope).collect()
        return {"target": p["offsets"], "window": p["window"],
                "min_count": p["min_count"], "k": p["k"],
                "results": [{"offset": int(r["offset"]),
                             "rank": int(r["rank"]), "term": r["term"],
                             "cooc": int(r["cooc"])} for r in rows]}
    if "collocations" in p:
        if p.get("group_by"):
            # lemma-/tag-grouped profile: same block selection + decode,
            # class-grouped scoring tail; rows keyed "key" not "term"
            from fastmorph_spark.search.collocation import (
                packed_collocations_by_attr,
            )

            rows = packed_collocations_by_attr(
                index, p["collocations"], attr=p["group_by"],
                window=p["window"], min_count=p["min_count"], k=p["k"],
                scope=scope).collect()
            return {"target": p["collocations"], "window": p["window"],
                    "min_count": p["min_count"], "k": p["k"],
                    "group_by": p["group_by"],
                    "results": [{"rank": int(r["rank"]), "key": r["key"],
                                 "cooc": int(r["cooc"]), "cf": int(r["cf"]),
                                 "pmi": float(r["pmi"])} for r in rows]}
        from fastmorph_spark.search.collocation import packed_collocations

        rows = packed_collocations(index, p["collocations"],
                                   window=p["window"],
                                   min_count=p["min_count"], k=p["k"],
                                   scope=scope).collect()
        return {"target": p["collocations"], "window": p["window"],
                "min_count": p["min_count"], "k": p["k"],
                "results": [{"rank": int(r["rank"]), "term": r["term"],
                             "cooc": int(r["cooc"]), "cf": int(r["cf"]),
                             "pmi": float(r["pmi"])} for r in rows]}
    if "bm25" in p:
        from fastmorph_spark.search.wand import search_wand, search_wand_terms

        if p.get("expand"):
            # synonym expansion: corpus-side thesaurus neighbors (the
            # profiles persist per serving session under the SAME key
            # the thesaurus form uses — one pair-count pass serves
            # both), then the WAND kernel scores the expanded set
            from fastmorph_spark.search.expand import expand_terms
            from fastmorph_spark.search.thesaurus import cooc_profiles

            own = None
            if session is not None:
                pkey = ("thesaurus_profiles", p["lang"], 3)
                profiles = session.get(pkey)
                if profiles is None:
                    profiles = cooc_profiles(documents, 3).persist()
                    session[pkey] = profiles
            else:
                # session-less call: own the profile pin for exactly
                # this request (expand_terms consumes it eagerly)
                own = profiles = cooc_profiles(documents, 3).persist()
            terms = expand_terms(documents, p["bm25"], n_expand=p["expand"],
                                 window=3, min_shared=2, profiles=profiles)
            if own is not None:
                own.unpersist()
            rows = search_wand_terms(index, terms, k=p["k"]).collect()
            return {"query": p["bm25"], "k": p["k"], "expand": p["expand"],
                    "expanded_terms": terms,
                    "results": [{"rank": int(r["rank"]),
                                 "doc_id": int(r["doc_id"]),
                                 "score": float(r["score"])} for r in rows]}
        rows = search_wand(index, p["bm25"], k=p["k"]).collect()
        return {"query": p["bm25"], "k": p["k"],
                "results": [{"rank": int(r["rank"]), "doc_id": int(r["doc_id"]),
                             "score": float(r["score"])} for r in rows]}
    if p.get("sort"):
        # sorted concordance page: the match set (session-shared when a
        # continuation session exists — sort is ASSEMBLY, same class as
        # format/width) feeds kwic_sorted's TakeOrderedAndProject page;
        # ranks (skip, until] of the sorted order come back flat
        from fastmorph_spark.search.engine import kwic_sorted

        try:
            if session is not None:
                key = _continuation_key(p, index)
                m = session.get(key)
                if m is None:
                    m = _match_set(index, p)
                    session[key] = m
            else:
                m = _match_set(index, p, scope=scope)
            if p["sort"] == "gdex":
                from fastmorph_spark.search.engine import kwic_gdex

                lines = kwic_gdex(documents, index.dictionary, m,
                                  len(p["slots"]), width=p["width"],
                                  n=p["until"]).collect()
            else:
                lines = kwic_sorted(documents, m, len(p["slots"]),
                                    width=p["width"], by=p["sort"],
                                    n=p["until"]).collect()
        except ValueError as e:
            return {"error": str(e)}
        rows = [r for r in lines if r["rank"] > p["skip"]]
        out = {"sort": p["sort"], "skip": p["skip"], "until": p["until"],
               "n_lines": len(rows),
               "results": [{"rank": int(r["rank"]),
                            "doc_id": int(r["doc_id"]),
                            "pos": int(r["pos"]),
                            "left_ctx": r["left_ctx"],
                            "keyword": r["keyword"],
                            "right_ctx": r["right_ctx"]} for r in rows]}
        if p["sort"] == "gdex":
            for o, r in zip(out["results"], rows):
                o["score"] = float(r["score"])
                o["min_cf"] = int(r["min_cf"])
        return out
    try:
        facet_src = None
        if session is None and (p.get("facets") or p.get("filter")
                                or p.get("freq")):
            # facet counts, context filters and freq breakdowns need the
            # FULL match set, which the one-shot packed_search_request
            # never exposes — route through the two-step (match set ->
            # page/breakdown) with an ephemeral session so the decode
            # happens ONCE, then unpersist.
            session = {}
            _ephemeral = True
        else:
            _ephemeral = False
        if session is not None:
            # pagination continuation (SURVEY §3.1 entry point 3
            # [PK-med]: the reference serves skip/until windows from
            # cached scan state): the persisted match set is keyed by the
            # request SHAPE (slots/dists/lang/filter — not
            # skip/until/width), so page N+1 re-pages it instead of
            # re-decoding the index. Pins are SESSION-owned: free them
            # with close_session.
            from fastmorph_spark.search import engine as _engine

            key = _continuation_key(p, index)
            m = session.get(key)
            if m is None:
                m = _match_set(index, p)
                session[key] = m
            if p.get("freq"):
                resp = _freq_response(documents, m, p)
                if _ephemeral:
                    close_session(session)
                return resp
            rows = _engine.request_page(
                documents, m, len(p["slots"]),
                skip=p["skip"], until=p["until"], width=p["width"],
                assembly=p["format"],
            ).collect()
            facet_src = m
        else:
            rows = packed_search_request(
                documents, index, p["slots"], p["dists"],
                skip=p["skip"], until=p["until"], width=p["width"], scope=scope,
                assembly=p["format"],
            ).collect()
        facet_rows = None
        if p.get("facets"):
            from fastmorph_spark.search.facets import facet_counts

            facet_rows = facet_counts(documents, facet_src).collect()
        if _ephemeral:
            close_session(session)
    except ValueError as e:
        # engine-level contract violations surface as client errors
        # (e.g. a case-sensitive slot against an index with no cs twin)
        return {"error": str(e)}
    resp = _serialize(rows, p["skip"], p["until"], fmt=p["format"])
    if facet_rows is not None:
        # the result-page sidebar: match-set doc counts per metadata
        # dimension, within the request's subcorpus
        fc: dict = {}
        for r in facet_rows:
            fc.setdefault(r["facet"], {})[r["value"]] = int(r["n_docs"])
        resp["facets"] = fc
    return resp


def _match_set(index, p: dict, scope=None):
    """The request's PINNED match set — filtered through the context
    filter when the request carries one (packed_filter_context: the node
    slots and the filter pattern share ONE pruned decode)."""
    from fastmorph_spark.search.packed import packed_request_matches

    f = p.get("filter")
    if not f:
        return packed_request_matches(index, p["slots"], p["dists"],
                                      scope=scope)
    from fastmorph_spark.cache import pin
    from fastmorph_spark.search.confilter import packed_filter_context

    return pin(
        packed_filter_context(index, p["slots"], p["dists"], f["slot"],
                              (f["window"][0], f["window"][1]), f["mode"],
                              scope=scope),
        scope,
    )


def _freq_response(documents, matches, p: dict) -> dict:
    """Frequency-breakdown response over a (possibly filtered) match set:
    node forms or a document-attribute distribution."""
    from fastmorph_spark.search import confilter

    if p["freq"] == "node":
        rows = confilter.conc_freq_node(
            matches, documents, match_len=len(p["slots"]), k=p["freq_k"]
        ).collect()
        return {"freq": "node", "k": p["freq_k"],
                "results": [{"keyword": r["keyword"], "n_occ": int(r["n_occ"]),
                             "n_docs": int(r["n_docs"])} for r in rows]}
    rows = confilter.conc_freq_attr(matches, documents, p["freq"]) \
        .limit(p["freq_k"]).collect()
    return {"freq": p["freq"], "k": p["freq_k"],
            "results": [{"value": r[p["freq"]], "n_occ": int(r["n_occ"]),
                         "n_docs": int(r["n_docs"])} for r in rows]}


def _continuation_key(p: dict, index) -> tuple:
    """Request-shape key for the continuation cache. Includes the Index
    object's identity so a session dict reused across different indexes
    (caller misuse, but cheap to defend) can never serve index A's
    matches for index B. A serving loop holds its Index (or per-lang
    dict) for the whole burst, so the id is stable exactly as long as
    the session is valid. The context filter is part of the shape: a
    filtered match set must never answer the unfiltered request (or a
    differently-filtered one)."""
    import json as _json

    return (id(index),
            _json.dumps({"slots": p["slots"], "dists": p["dists"],
                         "lang": p["lang"], "filter": p.get("filter")},
                        sort_keys=True))


def close_session(session: dict) -> None:
    """Unpersist every match set a continuation session holds (the
    serving loop's end-of-burst cleanup; mirrors CacheScope.close)."""
    for m in session.values():
        try:
            m.unpersist()
        except Exception:
            pass  # spark session torn down first
    session.clear()


def to_json(response: dict) -> str:
    import json as _json

    return _json.dumps(response, ensure_ascii=False, sort_keys=True)
