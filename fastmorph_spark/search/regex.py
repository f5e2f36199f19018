"""Regex slots — regular-expression term predicates in slot patterns.

CWB/CQP attribute values are full regular expressions [LIT: Evert &
Hardie 2011], and fastmorph's portal exposes that power for orthographic
searches the `*`/`?` wildcard vocabulary can't write (alternations,
bounded repeats, character classes) [PK-med]. This module adds a
``{"regex": pat}`` slot kind next to ``pattern`` (wildcard), expanded
dictionary-first like every other non-exact slot.

The hard part is CROSS-ENGINE DETERMINISM: Spark's `rlike` is Java
`java.util.regex`, DuckDB's `regexp_matches` is RE2, and the two
dialects disagree at the edges (backslash escapes, lookaround,
backreferences, possessive quantifiers, class intersections). Rather
than document a minefield, `validate_regex` pins a SUBSET on which the
engines are semantically identical, and everything else is a
client-addressable error:

  allowed   literals: any Unicode letter or digit plus ``_`` (the
            union of the ASCII and uni tokenizers' alphabets — a
            literal codepoint matches itself identically in Java regex
            and RE2, so Cyrillic-corpus queries like ``йорт(лар)?``
            are in the subset), ``.``,
            quantifiers ``* + ?`` and bounded ``{m}`` / ``{m,n}``,
            alternation ``|``, plain groups ``( )``, character classes
            ``[abc]`` / ``[a-z0-9]`` / negated ``[^...]`` with literal
            ``-`` first/last
  rejected  ``\\`` (escape semantics differ between dialects), anchors
            ``^ $`` (matching is whole-token by construction), ``(?``
            special groups, nested/empty classes, unbalanced brackets,
            dangling quantifiers, ``{m,n}`` with m > n

Matching is ANCHORED (whole-token): the engine wraps the pattern as
``^(?:pat)$`` for Java and the oracle uses the same wrapper under
`regexp_matches` — on the pinned subset both mean "the token IS a word
of this language". Folded slots lowercase the pattern first (the
wildcard-slot convention; `str.lower` touches only letters, never
metacharacters); ``{"case": True}`` matches against the case-preserving
twin index instead.

Scale shape: identical to wildcard slots — the regex runs over the
~|vocab|-row dictionary (JVM codegen `RLike`), never per-posting; the
expansion feeds the same broadcast semi-join / block-skip / predicate-
direct regimes in engine.slot_search and search/packed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# atoms a quantifier may follow: a literal, `.`, a closed class/group,
# or another closed quantifier (Java and RE2 both allow e.g. `a{2}?` as
# reluctant — reject quantifier-after-quantifier to stay unambiguous)
_QUANTS = frozenset("*+?")


def _is_literal(ch: str) -> bool:
    """A self-matching literal codepoint: Unicode letter/digit or `_` —
    the token alphabets of both tokenizer contracts. Literal-codepoint
    equality is dialect-independent (no metacharacter among them)."""
    return ch == "_" or ch.isalnum()


def validate_regex(pat: str) -> str:
    """Validate `pat` against the pinned cross-engine subset (module
    docstring); returns it unchanged or raises ValueError with a
    client-addressable message."""
    if not isinstance(pat, str) or not pat:
        raise ValueError("regex: pattern must be a non-empty string")
    depth = 0
    prev_atom = False  # can a quantifier attach to what we just closed?
    i, n = 0, len(pat)
    while i < n:
        ch = pat[i]
        if _is_literal(ch):
            prev_atom = True
        elif ch == ".":
            prev_atom = True
        elif ch == "(":
            if i + 1 < n and pat[i + 1] == "?":
                raise ValueError(
                    "regex: special groups '(?...)' are outside the "
                    "pinned subset")
            depth += 1
            prev_atom = False
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise ValueError("regex: unbalanced ')'")
            prev_atom = True
        elif ch == "|":
            prev_atom = False
        elif ch in _QUANTS:
            if not prev_atom:
                raise ValueError(
                    f"regex: quantifier {ch!r} at position {i} has "
                    f"nothing to repeat")
            prev_atom = False
        elif ch == "{":
            if not prev_atom:
                raise ValueError(
                    f"regex: bounded repeat at position {i} has "
                    f"nothing to repeat")
            j = pat.find("}", i + 1)
            if j < 0:
                raise ValueError("regex: unterminated '{m,n}' repeat")
            body = pat[i + 1:j]
            parts = body.split(",")
            if not (1 <= len(parts) <= 2) or not all(
                    p.isdigit() for p in parts):
                raise ValueError(
                    f"regex: bad bounded repeat {{{body}}} (use {{m}} "
                    f"or {{m,n}} with integers)")
            if len(parts) == 2 and int(parts[0]) > int(parts[1]):
                raise ValueError(
                    f"regex: bounded repeat {{{body}}} has m > n")
            i = j
            prev_atom = False
        elif ch == "[":
            j = i + 1
            if j < n and pat[j] == "^":
                j += 1
            body_start = j
            while j < n and pat[j] != "]":
                cj = pat[j]
                if _is_literal(cj) or cj == "-":
                    j += 1
                else:
                    raise ValueError(
                        f"regex: character {cj!r} inside a class is "
                        f"outside the pinned subset (literals and '-' "
                        f"ranges only)")
            if j >= n:
                raise ValueError("regex: unterminated character class")
            body = pat[body_start:j]
            if not body:
                raise ValueError("regex: empty character class")
            # '-' must be first, last, or a well-formed ascending range
            k = 0
            while k < len(body):
                if (k + 2 < len(body) and body[k + 1] == "-"
                        and body[k + 2] != "]"):
                    lo, hi = body[k], body[k + 2]
                    if hi == "-" or lo == "-":
                        raise ValueError(
                            "regex: '-' may not be a range endpoint")
                    if ord(lo) > ord(hi):
                        raise ValueError(
                            f"regex: descending range {lo}-{hi}")
                    k += 3
                else:
                    k += 1
            i = j
            prev_atom = True
        else:
            raise ValueError(
                f"regex: character {ch!r} at position {i} is outside "
                f"the pinned cross-engine subset (no escapes, anchors, "
                f"or shorthand classes)")
        i += 1
    if depth != 0:
        raise ValueError("regex: unbalanced '('")
    return pat


def anchored(pat: str) -> str:
    """The whole-token form both engines run: ``^(?:pat)$``. The
    non-capturing wrapper is IN the Java/RE2 intersection even though
    `(?` is rejected in user input — it is ours, not the user's."""
    return f"^(?:{pat})$"


def regex_pred(pat: str, case: bool = False) -> Column:
    """Spark-side membership predicate on the `term` column (validated,
    folded unless `case`)."""
    p = validate_regex(pat if case else pat.lower())
    return F.col("term").rlike(anchored(p))


def duckdb_regex_cond(col: str, pat: str, case: bool = False) -> str:
    """The oracle-side mirror: same validation, same anchored pattern,
    RE2 `regexp_matches`."""
    p = validate_regex(pat if case else pat.lower())
    return f"regexp_matches({col}, '{anchored(p)}')"


def regex_terms(dictionary: DataFrame, pattern: str) -> DataFrame:
    """Dictionary-first expansion view: every vocabulary term matching
    the (folded, validated) regex, ordered (df DESC, term ASC) — the
    wildcard_terms twin for regex predicates."""
    return (
        dictionary.filter(regex_pred(pattern))
        .select("term", "df", "cf")
        .orderBy(F.desc("df"), F.asc("term"))
    )
