"""Round-5 corpus-analytics registry extension: keyness / relative
frequency / dispersion, fuzzy (edit-distance) matching, result facets,
sentence-bounded search, and the deterministic concordance sample.

Kept in its own module so registry.py only merges two dicts; every query
here follows the house rules — (spark, sf_dir) -> DataFrame, a mirrored
DuckDB oracle with IDENTICAL column names, fixtures derived
deterministically in both engines where the synthetic corpus lacks the
phenomenon (typos, sentence enders — the slot_case convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastmorph_spark import oracles_corpus, oracles_ops
from fastmorph_spark.index import build_dictionary, build_postings
from fastmorph_spark.search import engine, facets, fuzzy, keyness, sentence
from fastmorph_spark.sources import read_documents
from fastmorph_spark.tokenize import tokenize_py

KEYNESS_FOCUS, KEYNESS_MIN, KEYNESS_K = "en", 5, 50
PROFILE_TERMS = ["fast", "join", "the"]
DISPERSION_PARTS = 8
FUZZY_PROBE, FUZZY_DIST = "fast", 1
FUZZY_BATCH_PROBES = ["fast", "fst"]
SENT_QUERY = "fast join"
KWIC_SAMPLE_N = 25


def _memo(spark: SparkSession, key: tuple, build):
    from fastmorph_spark.registry import _memo as m

    return m(spark, key, build)


def _fuzzy_tables(spark: SparkSession, sf_dir: str):
    """Postings + dictionary over the typo-bearing derived corpus."""
    def build():
        docs = read_documents(spark, sf_dir).select(
            "doc_id", fuzzy.fuzzy_text_col().alias("text"))
        postings = build_postings(docs).persist()
        dictionary = build_dictionary(postings).persist()
        return docs, postings, dictionary

    return _memo(spark, ("fuzzy_tables", sf_dir), build)


def _sent_tables(spark: SparkSession, sf_dir: str):
    """Derived punctuated corpus + postings + sentence-bounds side table."""
    def build():
        docs = read_documents(spark, sf_dir).select(
            "doc_id", sentence.sent_text_col().alias("text"))
        postings = build_postings(docs).persist()
        bounds = sentence.sentence_bounds(docs).persist()
        return docs, postings, bounds

    return _memo(spark, ("sent_tables", sf_dir), build)


def q_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G²-ranked key terms of the focus subcorpus vs the rest — the
    corpus-comparison tab of a corpus search UI (Dunning log-likelihood
    + Hardie log-ratio, pinned formulas in search/keyness.py)."""
    return keyness.keyness(read_documents(spark, sf_dir),
                           KEYNESS_FOCUS, KEYNESS_MIN, KEYNESS_K)


def q_term_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subcorpus relative frequency (ipm) for a fixed term list."""
    return keyness.term_profile(read_documents(spark, sf_dir), PROFILE_TERMS)


def q_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Juilland's D dispersion over doc-id classes."""
    return keyness.dispersion(read_documents(spark, sf_dir),
                              PROFILE_TERMS, DISPERSION_PARTS)


GDEX_SLOTS = [{"term": "fast"}, {"pattern": "h*"}]
GDEX_DISTS = [(1, 1)]
GDEX_LEN, GDEX_WIDTH, GDEX_N = 2, 5, 50


def q_kwic_gdex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDEX-style best-example concordance: lines ranked by the pinned
    commonness + length heuristic instead of corpus order."""
    from fastmorph_spark.registry import _index_tables

    docs, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    m = engine.slot_search(postings, dictionary, GDEX_SLOTS, GDEX_DISTS)
    return engine.kwic_gdex(docs, dictionary, m, GDEX_LEN, GDEX_WIDTH,
                            GDEX_N)


def q_dispersion_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gries' DP over the same doc-id classes as dispersion — the
    size-weighted modern standard, lower = more even."""
    return keyness.dispersion_dp(read_documents(spark, sf_dir),
                                 PROFILE_TERMS, DISPERSION_PARTS)


def q_fuzzy_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-first edit-distance expansion (typo fixture corpus:
    'fasst'/'fst' planted 1-edit variants of 'fast')."""
    _, _, dictionary = _fuzzy_tables(spark, sf_dir)
    return fuzzy.fuzzy_terms(dictionary, FUZZY_PROBE, FUZZY_DIST, 50)


def q_fuzzy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs containing any fuzzy variant — broadcast expansion into
    postings, the wildcard_docs plan family."""
    _, postings, dictionary = _fuzzy_tables(spark, sf_dir)
    return fuzzy.fuzzy_docs(postings, dictionary, FUZZY_PROBE, FUZZY_DIST)


def q_fuzzy_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell deletion-neighborhood BATCH matching — candidates meet in
    a hash join (no per-probe dictionary scan); oracle states the
    semantics with a plain levenshtein cross join."""
    _, _, dictionary = _fuzzy_tables(spark, sf_dir)
    return fuzzy.fuzzy_terms_batch(spark, dictionary, FUZZY_BATCH_PROBES,
                                   FUZZY_DIST)


FUZZY_SLOTS = [{"fuzzy": "fasst", "dist": 1}, {"pattern": "h*"}]
FUZZY_SLOT_DISTS = [(1, 4)]


def q_slot_fuzzy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-match SLOT inside a multi-slot pattern: `~fasst
    h* within 1..4` — the dist-1 neighborhood {fasst, fast} expands
    dictionary-first like stems/tags (engine.slot_search)."""
    _, postings, dictionary = _fuzzy_tables(spark, sf_dir)
    return engine.slot_search(postings, dictionary,
                              FUZZY_SLOTS, FUZZY_SLOT_DISTS)


def _packed_fuzzy_index(spark: SparkSession, sf_dir: str):
    """Packed physical index over the typo-fixture corpus (the
    _packed_uni_index convention for derived texts)."""
    from fastmorph_spark.index.io import build_index_frames

    def build():
        docs = read_documents(spark, sf_dir).select(
            "doc_id", fuzzy.fuzzy_text_col().alias("text"))
        idx = build_index_frames(
            docs, doc_shard_size=1000, block_size=64,
            pack_partitions=max(2 * spark.sparkContext.defaultParallelism, 8),
        )
        idx.postings = idx.postings.persist()
        idx.dictionary = idx.dictionary.persist()
        return idx

    return _memo(spark, ("packed_fuzzy", sf_dir), build)


def q_slot_fuzzy_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same fuzzy slot query through the PACKED index (dictionary
    expansion -> pruned block decode) — shares q_slot_fuzzy_search's
    oracle, the packed-twin convention."""
    from fastmorph_spark.search.packed import packed_slot_search

    return packed_slot_search(_packed_fuzzy_index(spark, sf_dir),
                              FUZZY_SLOTS, FUZZY_SLOT_DISTS)


def q_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result-page facet sidebar: lang/source doc counts over the
    flagship AND query's match set — one join + ONE unpivoted groupBy."""
    from fastmorph_spark.registry import FLAGSHIP_QUERY, _index_tables

    docs, postings, *_ = _index_tables(spark, sf_dir)
    matches = engine.and_search(postings, FLAGSHIP_QUERY)
    return facets.facet_counts(docs, matches)


def q_within_sentence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`fast ... join within <s>` over the punctuated fixture corpus —
    text path (split -> per-segment tokens -> (doc,sent)-keyed AND)."""
    docs, *_ = _sent_tables(spark, sf_dir)
    return sentence.within_sentence_search(docs, SENT_QUERY)


def q_within_sentence_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query through the POSITIONAL INDEX + sentence-bounds side
    table (no query-time re-tokenization) — shares q_within_sentence's
    oracle, the packed-twin convention."""
    _, postings, bounds = _sent_tables(spark, sf_dir)
    return sentence.within_sentence_indexed(postings, bounds, SENT_QUERY)


SENT_SLOTS = [{"term": "fast"}, {"pattern": "j*"}]
SENT_SLOT_DISTS = [(1, 3)]


def q_slot_within_sentence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-slot pattern scoped to one sentence (`fast j* within <s>`,
    distance 1..3) — engine.slot_search runs UNCHANGED over per-sentence
    composite-key postings (sentence.sentence_postings); match_starts are
    sentence-local highlight offsets."""
    _, postings, bounds = _sent_tables(spark, sf_dir)
    _, _, dictionary = _sent_dict_tables(spark, sf_dir)
    return sentence.slot_within_sentence(postings, bounds, dictionary,
                                         SENT_SLOTS, SENT_SLOT_DISTS)


def _sent_dict_tables(spark: SparkSession, sf_dir: str):
    """Dictionary over the punctuated corpus (slot expansions)."""
    def build():
        docs, postings, _ = _sent_tables(spark, sf_dir)
        dictionary = build_dictionary(postings).persist()
        return docs, postings, dictionary

    return _memo(spark, ("sent_dict", sf_dir), build)


def _packed_sent_index(spark: SparkSession, sf_dir: str):
    """Packed physical index over the punctuated fixture corpus."""
    from fastmorph_spark.index.io import build_index_frames

    def build():
        docs, *_ = _sent_tables(spark, sf_dir)
        idx = build_index_frames(
            docs, doc_shard_size=1000, block_size=64,
            pack_partitions=max(2 * spark.sparkContext.defaultParallelism, 8),
        )
        idx.postings = idx.postings.persist()
        idx.dictionary = idx.dictionary.persist()
        return idx

    return _memo(spark, ("packed_sent", sf_dir), build)


def q_slot_within_sentence_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same sentence-scoped slot query off the PACKED index: pruned block
    scan + Arrow decode feeds sentence re-basing — sentence scope rides
    the decode, never a corpus pass. Shares the corpus path's oracle."""
    _, _, bounds = _sent_tables(spark, sf_dir)
    return sentence.slot_within_sentence_packed(
        _packed_sent_index(spark, sf_dir), bounds,
        SENT_SLOTS, SENT_SLOT_DISTS)


def q_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus sentence profile (count + mean length) on the same fixture."""
    docs, *_ = _sent_tables(spark, sf_dir)
    return sentence.sentence_stats(docs)


def q_collocations_directional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-sketch-style collocation profile: the PMI ranking of the
    `collocations` key plus the LEFT/RIGHT neighbor split (same pinned
    PMI; left_n + right_n == cooc)."""
    from fastmorph_spark.registry import (
        COLLOC_K,
        COLLOC_MIN,
        COLLOC_TARGET,
        COLLOC_WINDOW,
        _index_tables,
    )
    from fastmorph_spark.search.collocation import collocations_directional

    _, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    return collocations_directional(postings, dictionary, COLLOC_TARGET,
                                    COLLOC_WINDOW, COLLOC_MIN, COLLOC_K)


def q_stem_paradigm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morphological paradigm view (the namesake surface): all dictionary
    forms sharing the query word's stem, with df/cf — dictionary-first,
    never a corpus pass. Runs over the inflection fixture corpus
    (PARADIGM_TEXT_SQL plants 'joins'/'joined' beside 'join')."""
    from fastmorph_spark.registry import STEM_QUERY
    from fastmorph_spark.stem import paradigm, paradigm_text_col

    def build():
        docs = read_documents(spark, sf_dir).select(
            "doc_id", paradigm_text_col().alias("text"))
        return build_dictionary(build_postings(docs)).persist()

    dictionary = _memo(spark, ("paradigm_dict", sf_dir), build)
    return paradigm(dictionary, STEM_QUERY)


def q_kwic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'random sample' of concordance lines — md5-ordered
    first N (the md5-family sampling discipline), the corpus-UI 'shuffle
    hits' button with reproducible output."""
    from fastmorph_spark.registry import KWIC_WIDTH, PHRASE_QUERY, _index_tables

    docs, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    terms = tokenize_py(PHRASE_QUERY)
    slots = [{"term": t} for t in terms]
    dists = [(1, 1)] * (len(terms) - 1)
    matches = engine.slot_search(postings, dictionary, slots, dists)
    lines = engine.kwic(docs, matches, match_len=len(terms), width=KWIC_WIDTH)
    sample_key = F.md5(F.concat(
        F.col("doc_id").cast("string"), F.lit(":"),
        F.col("pos").cast("string")))
    return lines.orderBy(sample_key).limit(KWIC_SAMPLE_N)


KWIC_SORT_BY, KWIC_SORT_N = "right", 50


def q_kwic_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-sorted concordance page — engine.kwic lines ordered by the
    right-context string (1R, 2R, ... read direction), rank
    materializing the order; top-n via TakeOrderedAndProject."""
    from fastmorph_spark.registry import KWIC_WIDTH, PHRASE_QUERY, _index_tables

    docs, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    terms = tokenize_py(PHRASE_QUERY)
    slots = [{"term": t} for t in terms]
    dists = [(1, 1)] * (len(terms) - 1)
    matches = engine.slot_search(postings, dictionary, slots, dists)
    return engine.kwic_sorted(docs, matches, match_len=len(terms),
                              width=KWIC_WIDTH, by=KWIC_SORT_BY,
                              n=KWIC_SORT_N)


def q_lexdiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language lexical diversity (tokens/types/ttr/hapax) — the
    vocabulary-richness statistics panel."""
    return keyness.lexdiv(read_documents(spark, sf_dir), "lang")


GROWTH_POINTS = 10


def q_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency spectrum (freq, n_types) — the corpus's Zipfian shape
    table; spectrum[1] is the hapax count."""
    return keyness.freq_spectrum(read_documents(spark, sf_dir))


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve: cumulative (docs, tokens, types) at 10
    equal-width doc_id prefixes — the empirical Heaps'-law plot."""
    return keyness.vocab_growth(read_documents(spark, sf_dir),
                                points=GROWTH_POINTS)


def q_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-corpus summary card (n_docs / n_tokens / vocab / avgdl) —
    the numbers the serving protocol's {"stats": true} form answers."""
    return keyness.corpus_summary(read_documents(spark, sf_dir))


# CQL driver fixtures: the queries are STRINGS parsed by search/cql.py at
# query time, while the oracles pin the HAND-WRITTEN compilation — a
# parser bug (wrong slot kind, off-by-one gap→distance rewrite, dropped
# within flag) diverges the two engines instead of cancelling out.
CQL_QUERY = '[word="fast"] []{0,2} "j*"'
CQL_EXPECTED_SLOTS = [{"term": "fast"}, {"pattern": "j*"}]
CQL_EXPECTED_DISTS = [(1, 3)]
CQL_SENT_QUERY = '"fast" []{0,1} "j*" within s'
CQL_SENT_SLOTS = [{"term": "fast"}, {"pattern": "j*"}]
CQL_SENT_DISTS = [(1, 2)]


def q_cql_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textual corpus query — `[word="fast"] []{0,2} "j*"` parsed by the
    CQL-lite dialect (search/cql.py) at query time, compiled to the slot
    engine; the oracle mirrors the hand-pinned expected compilation."""
    from fastmorph_spark.registry import _index_tables
    from fastmorph_spark.search.cql import parse_cql

    c = parse_cql(CQL_QUERY)
    _, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    return engine.slot_search(postings, dictionary, c["slots"], c["dists"])


def q_cql_within_sentence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-scoped textual query — `"fast" []{0,1} "j*" within s`:
    the parser's within-flag routes to sentence.slot_within_sentence over
    the punctuated fixture corpus."""
    from fastmorph_spark.search.cql import parse_cql

    c = parse_cql(CQL_SENT_QUERY)
    assert c["within_sentence"]
    _, postings, bounds = _sent_tables(spark, sf_dir)
    _, _, dictionary = _sent_dict_tables(spark, sf_dir)
    return sentence.slot_within_sentence(postings, bounds, dictionary,
                                         c["slots"], c["dists"])


THES_TARGET, THES_WINDOW, THES_MIN_SHARED, THES_K = "fast", 3, 2, 20
SKETCH_A, SKETCH_B = "fast", "slow"


# regex-slot fixtures: alternation + bounded repeat — power the
# wildcard vocabulary can't write; non-vacuous against the fixture
# vocabulary (scan/small/slow/sort/spark/batch/big all match the
# dictionary view; fast|slow makes the slot a genuine 2-term union)
REGEX_PATTERN = "(s|b).{2,4}"
REGEX_SLOTS = [{"regex": "fast|slow"}, {"term": "join"}]
REGEX_DISTS = [(1, 3)]


def q_regex_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary expansion of a whole-token regex (search/regex.py) —
    the vocabulary view behind regex slots, (df DESC, term ASC)."""
    from fastmorph_spark.registry import _index_tables
    from fastmorph_spark.search.regex import regex_terms

    _, _, dictionary, *_ = _index_tables(spark, sf_dir)
    return regex_terms(dictionary, REGEX_PATTERN)


def q_slot_regex_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-in-slot: alternation `s.*s|f(a|o)st` then `join` within
    1..3 — CWB-style regex power inside multi-slot patterns."""
    from fastmorph_spark.registry import _index_tables

    _, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    return engine.slot_search(postings, dictionary, REGEX_SLOTS, REGEX_DISTS)


def q_slot_regex_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """slot_regex_search through the packed index (dictionary-first
    expansion feeding block-skip pruning; predicate-direct regime when
    the expansion is too wide). Shares slot_regex_search's oracle."""
    from fastmorph_spark.registry import _packed_index
    from fastmorph_spark.search.packed import packed_slot_search

    return packed_slot_search(_packed_index(spark, sf_dir),
                              REGEX_SLOTS, REGEX_DISTS)


def q_collocations_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation tab with the full association-measure panel: PMI +
    logDice (the Sketch Engine default ranking) + t-score per collocate,
    one pair-count join, three expressions."""
    from fastmorph_spark.registry import (
        COLLOC_K,
        COLLOC_MIN,
        COLLOC_TARGET,
        COLLOC_WINDOW,
        _index_tables,
    )
    from fastmorph_spark.search.collocation import collocations_measures

    _, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    return collocations_measures(postings, dictionary, COLLOC_TARGET,
                                 window=COLLOC_WINDOW, min_count=COLLOC_MIN,
                                 k=COLLOC_K)


def q_thesaurus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional thesaurus: terms whose windowed collocate profile
    overlaps 'fast' most (Dice over pair counts — search/thesaurus.py
    pinning). One bounded explode + one partial-agg groupBy builds the
    profile table; the query side broadcasts one term's profile."""
    from fastmorph_spark.search import thesaurus as th

    docs = read_documents(spark, sf_dir)
    return th.thesaurus(docs, THES_TARGET, THES_WINDOW,
                        THES_MIN_SHARED, THES_K)


def q_sketch_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-sketch diff 'fast' vs 'slow': shared collocates ranked by
    pmi_a - pmi_b under the exact collocations PMI pinning — the
    two-word comparison view of a corpus portal."""
    from fastmorph_spark.registry import (
        COLLOC_K,
        COLLOC_MIN,
        COLLOC_WINDOW,
        _index_tables,
    )
    from fastmorph_spark.search.collocation import sketch_diff

    _, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    return sketch_diff(postings, dictionary, SKETCH_A, SKETCH_B,
                       COLLOC_WINDOW, COLLOC_MIN, COLLOC_K)


# --- concordance context filters + frequency breakdown (round 5, wave 4)
# window (-5, 5): "within 5 tokens either side of the match start" — the
# portal's default filter range; the node itself is a single token here so
# offset 0 is the node position (a self-hit is impossible: the filter term
# differs from the node term in the fixture)
CONF_SLOTS = [{"term": "fast"}]
CONF_DISTS: list = []
CONF_FILTER = {"term": "join"}
CONF_WINDOW = (-5, 5)
FREQNODE_SLOTS = [{"pattern": "s*"}]
FREQNODE_K = 50
CONF_ATTR = "lang"


def q_conc_filter_positive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive concordance filter: keep 'fast' matches only where 'join'
    occurs within +-5 tokens — the CQP/Sketch-Engine 'positive filter'
    operation ON a result set [PK-high: every concordancer in the
    fastmorph family offers it]."""
    from fastmorph_spark.registry import _index_tables
    from fastmorph_spark.search import confilter

    _, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    m = engine.slot_search(postings, dictionary, CONF_SLOTS, CONF_DISTS)
    return confilter.filter_context(m, postings, dictionary, CONF_FILTER,
                                    CONF_WINDOW, "positive")


def q_conc_filter_negative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative twin: keep 'fast' matches only where 'join' does NOT occur
    within +-5 tokens. positive ∪ negative partitions the unfiltered match
    starts (pinned by test_confilter)."""
    from fastmorph_spark.registry import _index_tables
    from fastmorph_spark.search import confilter

    _, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    m = engine.slot_search(postings, dictionary, CONF_SLOTS, CONF_DISTS)
    return confilter.filter_context(m, postings, dictionary, CONF_FILTER,
                                    CONF_WINDOW, "negative")


def q_conc_filter_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """conc_filter_positive through the packed index: ONE pruned decode
    covers the node slot AND the filter pattern. Shares the corpus-path
    oracle (result-identical)."""
    from fastmorph_spark.registry import _packed_index
    from fastmorph_spark.search.confilter import packed_filter_context

    return packed_filter_context(_packed_index(spark, sf_dir), CONF_SLOTS,
                                 CONF_DISTS, CONF_FILTER, CONF_WINDOW,
                                 "positive")


# a contiguous 2-slot node ("fast h*" as a phrase) so the concordance
# collocation runs on a genuinely multi-word node (span exclusion matters)
CONCCOLL_SLOTS = [{"term": "fast"}, {"pattern": "h*"}]
CONCCOLL_DISTS = [(1, 1)]
CONCCOLL_LEN = 2
CONCCOLL_WINDOW, CONCCOLL_MIN, CONCCOLL_K = 3, 2, 20


def q_conc_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocates of a CONCORDANCE (multi-slot node), not a single
    term — the portal's collocation tab over the current result set."""
    from fastmorph_spark.registry import _index_tables
    from fastmorph_spark.search.collocation import conc_collocations

    _, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    m = engine.slot_search(postings, dictionary, CONCCOLL_SLOTS, CONCCOLL_DISTS)
    return conc_collocations(m, postings, dictionary, CONCCOLL_LEN,
                             CONCCOLL_WINDOW, CONCCOLL_MIN, CONCCOLL_K)


def q_conc_collocations_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """conc_collocations off the packed index: one envelope-bounded
    decode serves the node match set AND the neighbor side. Shares the
    corpus-path oracle."""
    from fastmorph_spark.registry import _packed_index
    from fastmorph_spark.search.collocation import conc_collocations_packed

    return conc_collocations_packed(_packed_index(spark, sf_dir),
                                    CONCCOLL_SLOTS, CONCCOLL_DISTS,
                                    CONCCOLL_LEN, CONCCOLL_WINDOW,
                                    CONCCOLL_MIN, CONCCOLL_K)


def q_conc_freq_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency breakdown of a wildcard concordance by NODE FORM: which
    h-words matched, with occurrence + document counts — the portal's
    'Frequency > node forms' tab."""
    from fastmorph_spark.registry import _index_tables
    from fastmorph_spark.search import confilter

    docs, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    m = engine.slot_search(postings, dictionary, FREQNODE_SLOTS, [])
    return confilter.conc_freq_node(m, docs, match_len=1, k=FREQNODE_K)


def q_conc_freq_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-type distribution of a concordance over the lang attribute —
    occurrences + matched docs per subcorpus, never re-reading text."""
    from fastmorph_spark.registry import _index_tables
    from fastmorph_spark.search import confilter

    docs, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    m = engine.slot_search(postings, dictionary, CONF_SLOTS, CONF_DISTS)
    return confilter.conc_freq_attr(m, docs, CONF_ATTR)


MWE_MIN, MWE_K = 5, 50
OFFSET_WINDOW, OFFSET_MIN, OFFSET_K = 3, 2, 5
KEYWORDS_M = 3
POSDIST_BINS = 10


def q_mwe_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide multiword-expression candidates: adjacent bigrams
    ranked by logDice — terminology extraction without a target term.
    Unigram frequencies come from the index dictionary (exact, identical
    to a fresh count) so the statistic costs ONE corpus scan."""
    from fastmorph_spark.registry import _index_tables
    from fastmorph_spark.search.collocation import mwe_bigrams

    docs, _, dictionary, *_ = _index_tables(spark, sf_dir)
    return mwe_bigrams(docs, MWE_MIN, MWE_K, dictionary=dictionary)


def q_colloc_by_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional collocate profile: top collocates at each signed offset
    -w..-1, +1..+w around the target — the concordancer's per-position
    frequency columns."""
    from fastmorph_spark.registry import COLLOC_TARGET, _index_tables
    from fastmorph_spark.search.collocation import colloc_by_offset

    _, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    return colloc_by_offset(postings, dictionary, COLLOC_TARGET,
                            OFFSET_WINDOW, OFFSET_MIN, OFFSET_K)


def q_colloc_by_offset_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """colloc_by_offset off the packed index (target-envelope block skip,
    one decode for both pair sides). Shares the corpus-path oracle."""
    from fastmorph_spark.registry import COLLOC_TARGET, _packed_index
    from fastmorph_spark.search.collocation import colloc_by_offset_packed

    return colloc_by_offset_packed(_packed_index(spark, sf_dir),
                                   COLLOC_TARGET, OFFSET_WINDOW,
                                   OFFSET_MIN, OFFSET_K)


NEXTWORD_MIN, NEXTWORD_K = 1, 20


def q_next_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase completion: most frequent continuations of the target —
    the query-autocomplete box."""
    from fastmorph_spark.registry import COLLOC_TARGET
    from fastmorph_spark.search.collocation import next_word

    return next_word(read_documents(spark, sf_dir), COLLOC_TARGET,
                     NEXTWORD_MIN, NEXTWORD_K)


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-m TF-IDF keywords (pinned smoothed idf)."""
    return keyness.doc_keywords(read_documents(spark, sf_dir), KEYWORDS_M)


def q_term_position_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc position-decile histogram for the profile terms — the
    distribution-plot panel (complements between-doc dispersion)."""
    return keyness.term_position_dist(read_documents(spark, sf_dir),
                                      PROFILE_TERMS, POSDIST_BINS)


STRATA = {"en": 0.5, "de": 0.25, "zh": 1.0}  # es/fr absent -> dropped
FREQ_ATTR_K, FREQ_ATTR_MIN = 50, 2


def q_freq_by_stem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency list grouped by LEMMA CLASS (rule stemmer) — the
    portal frequency tab's group-by-lemma selector; the key expression
    is the J4c matching rule, so matcher and frequency view agree by
    construction."""
    return keyness.freq_by_attr(read_documents(spark, sf_dir), "stem",
                                FREQ_ATTR_K, FREQ_ATTR_MIN)


def q_freq_by_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency list grouped by TOKEN CLASS (deterministic tagger) —
    group-by-tag: 4 classes, so also a hot-key stress of the map-side
    partial agg."""
    return keyness.freq_by_attr(read_documents(spark, sf_dir), "tag",
                                FREQ_ATTR_K, FREQ_ATTR_MIN)


def q_collocations_by_stem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocates of COLLOC_TARGET grouped by LEMMA CLASS (word-sketch
    convention): inflections pool under one stem row; class mass =
    Σ cf over the class, node mass stays the target term's cf."""
    from fastmorph_spark.registry import (
        COLLOC_K,
        COLLOC_MIN,
        COLLOC_TARGET,
        COLLOC_WINDOW,
        _index_tables,
    )
    from fastmorph_spark.search.collocation import collocations_by_attr

    _, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    return collocations_by_attr(postings, dictionary, COLLOC_TARGET,
                                attr="stem", window=COLLOC_WINDOW,
                                min_count=COLLOC_MIN, k=COLLOC_K)


def q_unigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc perplexity under the self-trained corpus unigram LM
    (ops/quality.unigram_ppl) — the CCNet/Gopher-family LM quality
    filter, summation order pinned term-ASC in both engines."""
    from fastmorph_spark.ops.quality import unigram_ppl

    return unigram_ppl(read_documents(spark, sf_dir))


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language md5 mixture sampling (ops/text.stratified_sample):
    en halved, de quartered, zh kept whole, es/fr dropped — the
    training-mixture knob, deterministic and nested across rates."""
    from fastmorph_spark.ops.text import stratified_sample

    return stratified_sample(read_documents(spark, sf_dir), STRATA)


# parallel (aligned) corpus fixture: source side = even doc_ids; the
# aligned "translation" segment is the REVERSED token stream with each
# token prefixed tr_ at doc_id + PAR_OFFSET — deterministic from the
# pinned tokenizer in BOTH engines (the slot_case fixture convention),
# and token-disjoint from the source vocabulary so a match can only
# ever come from the source side (pinned by tests/test_parallel.py).
PAR_MOD, PAR_OFFSET = 2, 3_000_000
PAR_SLOTS = [{"term": "order"}, {"term": "fast"}]
PAR_DISTS = [(1, 1)]
PAR_WIDTH = 4


def _parallel_tables(spark: SparkSession, sf_dir: str):
    def build():
        from fastmorph_spark.tokenize import tokenize_expr

        docs = read_documents(spark, sf_dir).select("doc_id", "text")
        src = docs.filter(F.col("doc_id") % PAR_MOD == 0)
        t = tokenize_expr("text")
        tgt = src.select(
            (F.col("doc_id") + F.lit(PAR_OFFSET)).alias("doc_id"),
            F.concat_ws(
                " ", F.transform(F.reverse(t),
                                 lambda x: F.concat(F.lit("tr_"), x))
            ).alias("text"),
        )
        alignment = src.select(
            F.col("doc_id").alias("pair_id"),
            F.col("doc_id").alias("src_id"),
            (F.col("doc_id") + F.lit(PAR_OFFSET)).alias("tgt_id"),
        )
        postings = build_postings(src).persist()
        dictionary = build_dictionary(postings).persist()
        return src, tgt, alignment, postings, dictionary

    return _memo(spark, ("parallel", sf_dir), build)


def q_parallel_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel-concordance search (search/parallel.parallel_search):
    slot matches on the SOURCE side of the aligned fixture, one row per
    occurrence with the source KWIC line and the aligned target segment
    — the bilingual result unit of a national-corpus portal's parallel
    subcorpus [PK-med]."""
    from fastmorph_spark.search.parallel import parallel_search

    src, tgt, alignment, postings, dictionary = _parallel_tables(spark, sf_dir)
    return parallel_search(src, tgt, alignment, postings, dictionary,
                           PAR_SLOTS, PAR_DISTS, width=PAR_WIDTH)


def q_parallel_search_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-backed twin: the node query runs over a packed index
    built from the SOURCE side (pruned block scan + Arrow decode), same
    KWIC + alignment assembly — must be result-identical to the corpus
    path (shares its oracle)."""
    from fastmorph_spark.index.io import build_index_frames
    from fastmorph_spark.search.parallel import parallel_search_packed

    src, tgt, alignment, *_ = _parallel_tables(spark, sf_dir)

    def build():
        idx = build_index_frames(src, doc_shard_size=1000, block_size=64)
        idx.postings = idx.postings.persist()
        idx.dictionary = idx.dictionary.persist()
        return idx

    idx = _memo(spark, ("parallel_packed", sf_dir), build)
    return parallel_search_packed(idx, src, tgt, alignment,
                                  PAR_SLOTS, PAR_DISTS, width=PAR_WIDTH)


QUERIES = {
    # wave-4 conc-filter/freq keys lead the extension so they land inside
    # the driver's 50-key window (new keys earn driver-green rows first)
    "conc_filter_positive": q_conc_filter_positive,
    "conc_filter_negative": q_conc_filter_negative,
    "conc_filter_packed": q_conc_filter_packed,
    "conc_collocations": q_conc_collocations,
    "conc_collocations_packed": q_conc_collocations_packed,
    "mwe_bigrams": q_mwe_bigrams,
    "colloc_by_offset": q_colloc_by_offset,
    "colloc_by_offset_packed": q_colloc_by_offset_packed,
    "doc_keywords": q_doc_keywords,
    "term_position_dist": q_term_position_dist,
    "next_word": q_next_word,
    "dispersion_dp": q_dispersion_dp,
    "kwic_gdex": q_kwic_gdex,
    "conc_freq_node": q_conc_freq_node,
    "conc_freq_lang": q_conc_freq_lang,
    "keyness": q_keyness,
    "term_profile": q_term_profile,
    "dispersion": q_dispersion,
    "fuzzy_terms": q_fuzzy_terms,
    "fuzzy_docs": q_fuzzy_docs,
    "fuzzy_batch": q_fuzzy_batch,
    # --- round-5 final wave: tail keys (outside the 50-key driver
    # window by design — attested by jobs/check_queries.py + pytest)
    "freq_by_stem": q_freq_by_stem,
    "freq_by_tag": q_freq_by_tag,
    "stratified_sample": q_stratified_sample,
    "collocations_by_stem": q_collocations_by_stem,
    "unigram_ppl": q_unigram_ppl,
    "slot_fuzzy_search": q_slot_fuzzy_search,
    "slot_fuzzy_packed": q_slot_fuzzy_packed,
    "facet_counts": q_facet_counts,
    "within_sentence": q_within_sentence,
    "within_sentence_indexed": q_within_sentence_indexed,
    "slot_within_sentence": q_slot_within_sentence,
    "slot_within_sentence_packed": q_slot_within_sentence_packed,
    "sentence_stats": q_sentence_stats,
    "collocations_directional": q_collocations_directional,
    "stem_paradigm": q_stem_paradigm,
    "kwic_sample": q_kwic_sample,
    "thesaurus": q_thesaurus,
    "sketch_diff": q_sketch_diff,
    "kwic_sorted": q_kwic_sorted,
    "lexdiv": q_lexdiv,
    "cql_search": q_cql_search,
    "cql_within_sentence": q_cql_within_sentence,
    "corpus_summary": q_corpus_summary,
    "collocations_measures": q_collocations_measures,
    "regex_terms": q_regex_terms,
    "slot_regex_search": q_slot_regex_search,
    "slot_regex_packed": q_slot_regex_packed,
    "freq_spectrum": q_freq_spectrum,
    "vocab_growth": q_vocab_growth,
    "parallel_search": q_parallel_search,
    "parallel_search_packed": q_parallel_search_packed,
}


def oracle_sqls() -> dict[str, str]:
    from fastmorph_spark import oracles
    from fastmorph_spark import registry as _r
    from fastmorph_spark.registry import FLAGSHIP_QUERY, KWIC_WIDTH, PHRASE_QUERY

    within = oracles_corpus.within_sentence_sql(
        SENT_QUERY, text_expr=sentence.SENT_TEXT_SQL)
    _fuzzy_slot_oracle = oracles.slot_search_sql(
        FUZZY_SLOTS, FUZZY_SLOT_DISTS, text_expr=fuzzy.FUZZY_TEXT_SQL)
    _slot_within_oracle = oracles_corpus.slot_within_sentence_sql(
        SENT_SLOTS, SENT_SLOT_DISTS, text_expr=sentence.SENT_TEXT_SQL)
    from fastmorph_spark.stem import PARADIGM_TEXT_SQL as _paradigm_text
    terms = tokenize_py(PHRASE_QUERY)
    slots = [{"term": t} for t in terms]
    dists = [(1, 1)] * (len(terms) - 1)
    _conf_pos = oracles.filter_context_sql(
        CONF_SLOTS, CONF_DISTS, CONF_FILTER, CONF_WINDOW, "positive")
    _conccoll = oracles.conc_collocations_sql(
        CONCCOLL_SLOTS, CONCCOLL_DISTS, CONCCOLL_LEN, CONCCOLL_WINDOW,
        CONCCOLL_MIN, CONCCOLL_K)
    from fastmorph_spark.registry import COLLOC_TARGET as _ctgt
    _parallel_oracle = oracles_corpus.parallel_search_sql(
        PAR_SLOTS, PAR_DISTS, len(PAR_SLOTS), PAR_WIDTH,
        PAR_MOD, PAR_OFFSET)
    _offsets = oracles_corpus.colloc_by_offset_sql(
        _ctgt, OFFSET_WINDOW, OFFSET_MIN, OFFSET_K)
    return {
        "conc_filter_positive": _conf_pos,
        "conc_filter_negative": oracles.filter_context_sql(
            CONF_SLOTS, CONF_DISTS, CONF_FILTER, CONF_WINDOW, "negative"),
        # packed twin must be result-identical to the corpus path
        "conc_filter_packed": _conf_pos,
        "conc_collocations": _conccoll,
        "conc_collocations_packed": _conccoll,
        "mwe_bigrams": oracles_corpus.mwe_bigrams_sql(MWE_MIN, MWE_K),
        "colloc_by_offset": _offsets,
        # packed twin must be result-identical to the corpus path
        "colloc_by_offset_packed": _offsets,
        "doc_keywords": oracles_corpus.doc_keywords_sql(KEYWORDS_M),
        "term_position_dist": oracles_corpus.term_position_dist_sql(
            PROFILE_TERMS, POSDIST_BINS),
        "next_word": oracles_corpus.next_word_sql(
            _ctgt, NEXTWORD_MIN, NEXTWORD_K),
        "dispersion_dp": oracles_corpus.dispersion_dp_sql(
            PROFILE_TERMS, DISPERSION_PARTS),
        "kwic_gdex": oracles_corpus.kwic_gdex_sql(
            GDEX_SLOTS, GDEX_DISTS, GDEX_LEN, GDEX_WIDTH, GDEX_N),
        "conc_freq_node": oracles.conc_freq_node_sql(
            FREQNODE_SLOTS, [], match_len=1, k=FREQNODE_K),
        "conc_freq_lang": oracles.conc_freq_attr_sql(
            CONF_SLOTS, CONF_DISTS, CONF_ATTR),
        "keyness": oracles_corpus.keyness_sql(
            KEYNESS_FOCUS, KEYNESS_MIN, KEYNESS_K),
        "term_profile": oracles_corpus.term_profile_sql(PROFILE_TERMS),
        "dispersion": oracles_corpus.dispersion_sql(
            PROFILE_TERMS, DISPERSION_PARTS),
        "fuzzy_terms": oracles_corpus.fuzzy_terms_sql(
            FUZZY_PROBE, FUZZY_DIST, 50, text_expr=fuzzy.FUZZY_TEXT_SQL),
        "fuzzy_docs": oracles_corpus.fuzzy_docs_sql(
            FUZZY_PROBE, FUZZY_DIST, text_expr=fuzzy.FUZZY_TEXT_SQL),
        "fuzzy_batch": oracles_corpus.fuzzy_batch_sql(
            FUZZY_BATCH_PROBES, FUZZY_DIST, text_expr=fuzzy.FUZZY_TEXT_SQL),
        "freq_by_stem": oracles_corpus.freq_by_attr_sql(
            "stem", FREQ_ATTR_K, FREQ_ATTR_MIN),
        "freq_by_tag": oracles_corpus.freq_by_attr_sql(
            "tag", FREQ_ATTR_K, FREQ_ATTR_MIN),
        "stratified_sample": oracles_ops.stratified_sample_sql(STRATA),
        "unigram_ppl": oracles_ops.unigram_ppl_sql(),
        "collocations_by_stem": oracles.collocations_by_attr_sql(
            _r.COLLOC_TARGET, "stem", _r.COLLOC_WINDOW, _r.COLLOC_MIN,
            _r.COLLOC_K),
        "slot_fuzzy_search": _fuzzy_slot_oracle,
        "slot_fuzzy_packed": _fuzzy_slot_oracle,
        "facet_counts": oracles_corpus.facet_counts_sql(FLAGSHIP_QUERY),
        "within_sentence": within,
        "within_sentence_indexed": within,
        "slot_within_sentence": _slot_within_oracle,
        "slot_within_sentence_packed": _slot_within_oracle,
        "sentence_stats": oracles_corpus.sentence_stats_sql(
            text_expr=sentence.SENT_TEXT_SQL),
        "collocations_directional": oracles_corpus.collocations_directional_sql(
            _r.COLLOC_TARGET, _r.COLLOC_WINDOW, _r.COLLOC_MIN, _r.COLLOC_K),
        "stem_paradigm": oracles_corpus.paradigm_sql(
            _r.STEM_QUERY, text_expr=_paradigm_text),
        "kwic_sample": oracles_corpus.kwic_sample_sql(
            slots, dists, len(terms), KWIC_SAMPLE_N, width=KWIC_WIDTH),
        "thesaurus": oracles_corpus.thesaurus_sql(
            THES_TARGET, THES_WINDOW, THES_MIN_SHARED, THES_K),
        "sketch_diff": oracles_corpus.sketch_diff_sql(
            SKETCH_A, SKETCH_B, _r.COLLOC_WINDOW, _r.COLLOC_MIN,
            _r.COLLOC_K),
        "kwic_sorted": oracles_corpus.kwic_sorted_sql(
            slots, dists, len(terms), by=KWIC_SORT_BY, n=KWIC_SORT_N,
            width=KWIC_WIDTH),
        "lexdiv": oracles_corpus.lexdiv_sql("lang"),
        # the CQL oracles pin the EXPECTED compilation by hand (the Spark
        # side parses the string at runtime — see the fixture comment)
        "cql_search": oracles.slot_search_sql(
            CQL_EXPECTED_SLOTS, CQL_EXPECTED_DISTS),
        "cql_within_sentence": oracles_corpus.slot_within_sentence_sql(
            CQL_SENT_SLOTS, CQL_SENT_DISTS,
            text_expr=sentence.SENT_TEXT_SQL),
        "corpus_summary": oracles_corpus.corpus_summary_sql(),
        "collocations_measures": oracles_corpus.collocations_measures_sql(
            _r.COLLOC_TARGET, _r.COLLOC_WINDOW, _r.COLLOC_MIN, _r.COLLOC_K),
        "regex_terms": oracles_corpus.regex_terms_sql(REGEX_PATTERN),
        # packed twin shares the corpus-path oracle (must be identical)
        "slot_regex_search": oracles.slot_search_sql(REGEX_SLOTS, REGEX_DISTS),
        "slot_regex_packed": oracles.slot_search_sql(REGEX_SLOTS, REGEX_DISTS),
        "freq_spectrum": oracles_corpus.freq_spectrum_sql(),
        "vocab_growth": oracles_corpus.vocab_growth_sql(GROWTH_POINTS),
        "parallel_search": _parallel_oracle,
        # packed twin must be result-identical to the corpus path
        "parallel_search_packed": _parallel_oracle,
    }
