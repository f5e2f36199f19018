"""Engine-wide pinned constants (SURVEY.md §4 determinism rules).

Every path — Spark expression BM25, the WAND kernel, the pure-Python
oracle, and the DuckDB SQL oracle — MUST use exactly these values and
formulas, or rank-identity (BASELINE.json north_rule) dies.
"""

# Canonical tokenizer: lowercase, keep [a-z0-9_] runs, drop everything else.
# Chosen to be code-aware (identifiers survive) and expressible identically
# in pandas (`str.findall`), Spark SQL (`split`+`filter`) and DuckDB
# (`regexp_split_to_array` + `list_filter`).
TOKEN_PATTERN = r"[a-z0-9_]+"
TOKEN_SPLIT_PATTERN = r"[^a-z0-9_]+"

# Case-preserving twins (per-slot case-sensitive match mode, fastmorph
# case flags [PK-high]). The char classes fold onto each other under ASCII
# lower(), so token BOUNDARIES — and therefore positions — are identical
# between the folded and preserved tokenizations of the same text.
#
# ASCII-ONLY CONTRACT (ADVICE r02): the boundary identity holds because
# both tokenizers treat every non-[A-Za-z0-9_] byte as a separator AND
# ASCII lower() is length- and class-preserving. Unicode case mappings
# that change length or class (e.g. 'İ'.lower() -> 'i' + combining dot)
# would make the FOLDED tokenizer emit a token ('i') at a position the
# CS tokenizer never sees — shared position space dies. Non-ASCII input
# is safe for every case-FOLDED operator (non-ASCII chars are separators
# in both engines); only per-slot case-SENSITIVE matching (slot_search
# with case=True) requires that any non-ASCII letters in the text are
# not expected to participate in tokens. See engine.slot_search.
TOKEN_PATTERN_CS = r"[A-Za-z0-9_]+"
TOKEN_SPLIT_PATTERN_CS = r"[^A-Za-z0-9_]+"

# Unicode twin (VERDICT r04 #1): lowercase-fold, keep runs of
# letter/digit/underscore in ANY script — what lets the engine index the
# reference's own corpus class (Tatar/Cyrillic [PK-high]) instead of
# tokenizing it to nothing under the ASCII contract.
#
# Three engines, one boundary rule, verified identical (tests/test_unicode):
#   Python/pandas:  re '\w+' on str.lower()   (\w = L* + N* + '_' runs)
#   Spark/Java:     split on '[^\p{L}\p{N}_]+' of lower()
#   DuckDB/RE2:     regexp_split_to_array(lower(), '[^\p{L}\p{N}_]+')
#
# UNICODE CONTRACT: pinned for scripts whose lower() is 1:1 (Cyrillic
# incl. Tatar һ/ә/ү/җ/ң/ө, Greek, Latin incl. precomposed accents, CJK,
# digits of any script). Out of contract: the handful of LENGTH-CHANGING
# case mappings (e.g. 'İ' U+0130 lowers to 'i' + combining dot) — the
# combining mark (Mn) is a separator in all three engines, so such a char
# may split differently from its lowercase form; corpora containing them
# should be NFC/НFKC-normalized upstream. No case-SENSITIVE uni twin is
# built (build_index_frames refuses): shared-position-space reasoning
# needs fold-invariant boundaries, which length-changing mappings break.
TOKEN_PATTERN_UNI_PY = r"\w+"                 # Python re (Unicode default)
TOKEN_PATTERN_UNI_JAVA = r"[\p{L}\p{N}_]+"    # Java regex / regexp_count
TOKEN_SPLIT_PATTERN_UNI = r"[^\p{L}\p{N}_]+"  # Java split / RE2 split

# Code-identifier subtoken twin (round 5 closing wave): the zoekt /
# Sourcegraph-style splitter for SOURCE-CODE corpora (the contract input
# class, BASELINE.json input_hint) — `parseJSONResponse` indexes as
# [parse, json, response], `XMLHttpRequest` as [xml, http, request],
# `snake_case_util` as [snake, case, util], so a query for `parse` finds
# every identifier embedding it. Two boundary-insertion passes (applied in
# THIS order, pinned — they commute on every tested input but order is part
# of the contract), then lower + split:
#   pass A: between a lower/digit and an upper        ([a-z0-9])([A-Z])
#   pass B: between an acronym and a capitalized word ([A-Z])([A-Z][a-z])
#   then:   lower(), tokens = runs of [a-z0-9] (underscore is a SEPARATOR
#           here, unlike the canonical ASCII contract — subtokens of
#           snake_case identifiers must be individually searchable)
# All three engines do left-to-right non-overlapping global replace with
# identical capture semantics on these ASCII-class patterns (Python re.sub
# / pandas str.replace, Spark/Java regexp_replace '$1 $2', DuckDB/RE2
# regexp_replace '\1 \2' with 'g') — identity pinned by
# tests/test_code_tokenizer.py. ASCII contract as TOKEN_PATTERN_CS.
CODE_BOUNDARY_A = r"([a-z0-9])([A-Z])"
CODE_BOUNDARY_B = r"([A-Z])([A-Z][a-z])"
TOKEN_PATTERN_CODE = r"[a-z0-9]+"
TOKEN_SPLIT_PATTERN_CODE = r"[^a-z0-9]+"

# BM25 constants (Robertson/Sparck-Jones; the "+1" idf variant used by
# Lucene so idf is always positive).
#   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
#   s(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
BM25_K1 = 1.2
BM25_B = 0.75

# Deterministic tie-break for top-k: (score DESC, doc_id ASC).
# Scores are float64 end-to-end.

# Physical index layout.
BLOCK_SIZE = 128          # docs per posting block (Block-Max WAND granularity)
N_TERM_BUCKETS = 64       # hash(term) % N_TERM_BUCKETS file-layout partitions
N_PACK_BUCKETS = 64       # term-hash buckets for pack-time groups: packing
                          # groups are (pack_bucket, doc_shard), coarse
                          # enough to amortize Arrow per-group overhead,
                          # fine enough for parallelism + bounded memory
PACK_SLICES = 8           # doc_shard-hash sub-slices per pack bucket: the
                          # pack exchange partitions on (bucket, slice) so
                          # a Zipf-hot bucket splits 8 ways instead of
                          # becoming the last-wave straggler
DOC_SHARD_SIZE = 1 << 20  # docs per doc-shard (the salt). Contiguous doc_id
                          # ranges: build groups are (term, doc_shard), so a
                          # hot term (df ~= N) splits across N/DOC_SHARD_SIZE
                          # reducers instead of one — skew handled by
                          # construction — and "merging" salted sub-lists is
                          # pure concatenation in shard order (blocks are
                          # self-contained). Query-time WAND runs per shard
                          # (document-partitioned index) and merges top-k.

# Result-hash robustness: queries that surface float scores round to this
# many decimals in BOTH the Spark and the oracle SQL path, so the driver's
# order-insensitive value-hash is immune to <=1e-9 summation-order noise.
SCORE_DECIMALS = 6

# Symbol-definition ranking boost (search/symbols.py, the zoekt
# symbol-atom weighting): added to BM25 when the doc DEFINES the queried
# identifier. Far above any realistic single-term BM25 score (idf*(k1+1)
# tops out ~60 even at df=1, N=10^12), so defining docs form a strict
# first stratum while one sort key preserves BM25 order inside strata.
SYMBOL_BOOST = 1000.0
