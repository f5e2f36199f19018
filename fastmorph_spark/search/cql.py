"""CQL-lite — a textual corpus-query language over the slot engine.

Corpus portals expose a textual query language alongside their form UI;
the de-facto family is CQP/CQL (IMS Corpus Workbench; Sketch Engine's
dialect) [LIT: Evert & Hardie 2011, "Twenty-first century Corpus
Workbench"]. fastmorph's portal front-end builds its JSON slot requests
from user input of exactly this shape [PK-med]. This module is that
surface re-expressed for this engine: a small, pinned dialect that
COMPILES to the engine's native slot specs — the parser produces the
same {"term"/"pattern"/"stem"/"tag"/"fuzzy", "case", "dist"} dicts and
(lo, hi) distance ranges that `engine.slot_search` and the JSON protocol
already speak, so every query path (corpus, packed, sentence-scoped,
serving) is reachable from one query string with zero new executor code.

Dialect (CQL-LIKE, not CWB-compatible — differences pinned here):

    query  := unit (gap? unit)* (WITHIN 's')?
    unit   := '"' value '"'                       bare word shorthand
            | '[' attr '=' '"' value '"' flag* ']'
    attr   := 'word' | 'lemma' | 'tag' | 'fuzzy' | 'pattern' | 'regex'
    flag   := 'case'                              (word only)
            | 'dist' '=' INT                      (fuzzy only)
    gap    := '[]'                                exactly one any-token
            | '[]' '{' lo ',' hi '}'              lo..hi any-tokens
            | '[]' '{' n '}'                      exactly n any-tokens

  - Values are the engine's native predicates: a bare or word value
    containing ``*``/``?`` compiles to a wildcard (pattern) slot — NOT
    a regex (CWB values are regexes; this dialect keeps fastmorph's
    wildcard vocabulary so the dictionary-first expansion applies
    unchanged).
  - Matching is case-FOLDED by default (the engine's contract); the
    ``case`` flag opts a word slot into the case-preserving twin index.
    (CWB defaults to case-sensitive with ``%c`` to fold — inverted here
    deliberately: folded is this engine's, and fastmorph's, default.)
  - ``[]{lo,hi}`` between two slots means lo..hi intervening tokens,
    i.e. consecutive-slot distance in [lo+1, hi+1]; adjacency (no gap)
    is distance (1, 1). Gap tokens are unconstrained — they never touch
    the index.
  - ``within s`` scopes the whole pattern to one sentence
    (search/sentence.py composite-key postings); it must be the final
    tokens of the query.

The parser is driver-side Python over the query STRING (bytes, not
data) — the compiled plan is whatever the slot engine builds; nothing
here runs per row. Grammar errors raise CQLError with a
client-addressable message (the serving boundary maps it onto the same
error contract as malformed JSON fields).
"""

from __future__ import annotations

import re

_MAX_GAP = 1000          # sanity cap on []{lo,hi} — hi+1 becomes a
                         # position-distance bound in the HOF predicate
_ATTRS = ("word", "lemma", "tag", "fuzzy", "pattern", "regex")
_ATTR_TO_SLOT = {"word": "term", "lemma": "stem", "tag": "tag", "regex": "regex",
                 "fuzzy": "fuzzy", "pattern": "pattern"}

_LEXEME = re.compile(
    r"""\s*(?:
        (?P<string>"(?P<sval>[^"]*)")       # "value"
      | (?P<lbrack>\[)
      | (?P<rbrack>\])
      | (?P<lbrace>\{)
      | (?P<rbrace>\})
      | (?P<eq>=)
      | (?P<comma>,)
      | (?P<int>\d+)
      | (?P<name>[A-Za-z_][A-Za-z0-9_]*)    # attr / flag / within / s
    )""",
    re.VERBOSE,
)


class CQLError(ValueError):
    """Malformed CQL query; the message is safe to serialize back."""


def _lex(q: str) -> list[tuple[str, str]]:
    out, i, q = [], 0, q.strip()
    while i < len(q):
        m = _LEXEME.match(q, i)
        if not m or m.end() == m.start():
            raise CQLError(f"CQL: unexpected character {q[i:].lstrip()[:1]!r} "
                           f"at offset {i}")
        i = m.end()
        if m.group("string") is not None:
            out.append(("string", m.group("sval")))
        else:
            for k in ("lbrack", "rbrack", "lbrace", "rbrace", "eq",
                      "comma", "int", "name"):
                if m.group(k) is not None:
                    out.append((k, m.group(k)))
                    break
    return out


class _Cursor:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks, self.i = toks, 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise CQLError("CQL: unexpected end of query")
        self.i += 1
        return t

    def expect(self, kind: str, what: str) -> str:
        t = self.next()
        if t[0] != kind:
            raise CQLError(f"CQL: expected {what}, got {t[1]!r}")
        return t[1]


def _word_slot(value: str, case: bool) -> dict:
    """Bare/word values compile to wildcard slots when they carry * or ?
    — the engine's native predicate split (term vs pattern)."""
    if not value:
        raise CQLError("CQL: empty quoted value")
    kind = "pattern" if ("*" in value or "?" in value) else "term"
    slot = {kind: value}
    if case:
        slot["case"] = True
    return slot


def _parse_bracket(c: _Cursor) -> dict | tuple:
    """After '[': a constrained slot, or a gap ('[]' with optional
    {lo,hi}). Returns a slot dict, or ('gap', lo, hi)."""
    t = c.peek()
    if t is not None and t[0] == "rbrack":        # [] — gap token(s)
        c.next()
        lo = hi = 1
        t = c.peek()
        if t is not None and t[0] == "lbrace":
            c.next()
            lo = int(c.expect("int", "gap count"))
            t = c.next()
            if t[0] == "comma":
                hi = int(c.expect("int", "gap upper bound"))
                c.expect("rbrace", "'}'")
            elif t[0] == "rbrace":
                hi = lo
            else:
                raise CQLError(f"CQL: expected ',' or '}}', got {t[1]!r}")
        if hi < lo or hi > _MAX_GAP:
            raise CQLError(f"CQL: gap bounds must satisfy "
                           f"lo <= hi <= {_MAX_GAP}, got {{{lo},{hi}}}")
        return ("gap", lo, hi)
    attr = c.expect("name", "an attribute name")
    if attr not in _ATTRS:
        raise CQLError(f"CQL: unknown attribute {attr!r} "
                       f"(one of {', '.join(_ATTRS)})")
    c.expect("eq", "'='")
    value = c.expect("string", "a quoted value")
    if not value:
        raise CQLError("CQL: empty quoted value")
    case = False
    dist = None
    while True:
        t = c.next()
        if t[0] == "rbrack":
            break
        if t == ("name", "case"):
            case = True
            continue
        if t == ("name", "dist"):
            c.expect("eq", "'='")
            dist = int(c.expect("int", "an edit distance"))
            continue
        raise CQLError(f"CQL: unexpected {t[1]!r} in slot "
                       f"(flags are 'case' and 'dist=N')")
    if case and attr != "word":
        raise CQLError("CQL: 'case' applies to word slots only")
    if dist is not None and attr != "fuzzy":
        raise CQLError("CQL: 'dist' applies to fuzzy slots only")
    if attr == "word":
        return _word_slot(value, case)
    if attr == "regex":
        # validate at parse time — a bad pattern is a query-string
        # error, same boundary as every other CQL grammar problem
        from fastmorph_spark.search.regex import validate_regex

        try:
            validate_regex(value.lower())
        except ValueError as e:
            raise CQLError(f"CQL: {e}") from None
    slot = {_ATTR_TO_SLOT[attr]: value}
    if dist is not None:
        if not 1 <= dist <= 2:
            raise CQLError("CQL: dist must be 1 or 2")
        slot["dist"] = dist
    return slot


def parse_cql(q: str) -> dict:
    """Compile a CQL-lite query string into engine arguments:
    {"slots": [engine slot dicts], "dists": [(lo, hi), ...],
     "within_sentence": bool}.

    The output plugs directly into engine.slot_search /
    sentence.slot_within_sentence / the JSON protocol's slots form —
    the parser introduces no semantics of its own beyond the
    gap→distance rewrite ([]{lo,hi} ⇒ (lo+1, hi+1))."""
    if not isinstance(q, str) or not q.strip():
        raise CQLError("CQL: query must be a non-empty string")
    c = _Cursor(_lex(q))
    slots: list[dict] = []
    dists: list[tuple[int, int]] = []
    within = False
    pending_gap: tuple[int, int] | None = None
    while True:
        t = c.peek()
        if t is None:
            break
        if t == ("name", "within"):
            c.next()
            unit = c.expect("name", "'s'")
            if unit != "s":
                raise CQLError(f"CQL: unsupported within-unit {unit!r} "
                               f"(only 's' — sentence — is supported)")
            if c.peek() is not None:
                raise CQLError("CQL: 'within s' must end the query")
            within = True
            break
        if t[0] == "string":
            c.next()
            slot = _word_slot(t[1], case=False)
        elif t[0] == "lbrack":
            c.next()
            parsed = _parse_bracket(c)
            if isinstance(parsed, tuple):            # a gap
                if not slots:
                    raise CQLError("CQL: a gap cannot start a query")
                if pending_gap is not None:
                    # merge consecutive gaps: [] []{1,2} == []{2,3}
                    pending_gap = (pending_gap[0] + parsed[1],
                                   pending_gap[1] + parsed[2])
                else:
                    pending_gap = (parsed[1], parsed[2])
                continue
            slot = parsed
        else:
            raise CQLError(f"CQL: expected a slot, gap, or 'within', "
                           f"got {t[1]!r}")
        if slots:
            if pending_gap is None:
                dists.append((1, 1))                 # adjacency
            else:
                dists.append((pending_gap[0] + 1, pending_gap[1] + 1))
        elif pending_gap is not None:
            raise CQLError("CQL: a gap cannot start a query")
        pending_gap = None
        slots.append(slot)
    if not slots:
        raise CQLError("CQL: query has no slots")
    if pending_gap is not None:
        raise CQLError("CQL: a gap cannot end a query")
    return {"slots": slots, "dists": dists, "within_sentence": within}
