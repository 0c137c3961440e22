"""Filter-chain coverage: stemmers, normalizers, shingles, minhash,
concat, possessive, protected words, HTML strip — mirroring the
reference's AnalyzerTest.java vectors and ZuliaFieldAnalyzer.java's
filter wiring."""

import pandas as pd
import pytest

from zuliasearch_spark.analysis.analyzers import analyze_query_text, analyze_series
from zuliasearch_spark.analysis.stem import (
    english_minimal_stem,
    english_possessive,
    german_normalize,
    porter2_stem,
)
from zuliasearch_spark.config import (
    DEFAULT_ANALYZERS,
    KEYWORD,
    STANDARD,
    WHITESPACE,
    AnalyzerSettings,
)


def _an(*filters, tokenizer=STANDARD, strip_html=False):
    return AnalyzerSettings("t", tokenizer, tuple(filters), strip_html=strip_html)


def toks(text, settings):
    _, terms = analyze_series(pd.Series([text]), settings)
    return [str(t) for t in terms]


# ---- unit: stemmers / normalizers ---------------------------------------


def test_english_minimal_stem():
    # Lucene EnglishMinimalStemmer (Harman S-stemmer) cases
    assert english_minimal_stem("types") == "type"
    assert english_minimal_stem("dogs") == "dog"
    assert english_minimal_stem("dress") == "dress"  # -ss kept
    assert english_minimal_stem("focus") == "focus"  # -us kept
    assert english_minimal_stem("ponies") == "pony"  # -ies → -y
    assert english_minimal_stem("ties") == "ty"  # -ies → -y (len>3 branch)
    assert english_minimal_stem("aies") == "aies"  # s[-4] ∈ {a,e} guard
    assert english_minimal_stem("as") == "as"  # too short


def test_porter2_vectors():
    # high-confidence Snowball English pairs
    assert porter2_stem("running") == "run"
    assert porter2_stem("connection") == "connect"
    assert porter2_stem("connections") == "connect"
    assert porter2_stem("rational") == "ration"
    assert porter2_stem("cries") == "cri"
    assert porter2_stem("ties") == "tie"
    assert porter2_stem("dying") == "die"  # exception
    assert porter2_stem("skies") == "sky"  # exception
    assert porter2_stem("news") == "news"  # invariant
    assert porter2_stem("hopeful") == "hope"
    assert porter2_stem("proceed") == "proceed"  # post-1a exception
    assert porter2_stem("indexing") == "index"
    assert porter2_stem("searches") == "search"
    # idempotence on already-stemmed output
    for w in ("run", "connect", "index", "search"):
        assert porter2_stem(porter2_stem(w)) == porter2_stem(w)


def test_possessive_and_german():
    assert english_possessive("john's") == "john"
    assert english_possessive("john’s") == "john"
    assert english_possessive("its") == "its"
    # AnalyzerTest.java vectors: juergen→jurgen, straße→strasse
    assert german_normalize("juergen") == "jurgen"
    assert german_normalize("jurgen") == "jurgen"
    assert german_normalize("straße") == "strasse"
    assert german_normalize("fussgängern") == "fussgangern"
    assert german_normalize("quelle") == "quelle"  # ue after q kept
    assert german_normalize("aue") == "aue"  # u after vowel: e kept


# ---- chain-level: the reference's myAnalyzer (AnalyzerTest.java:70-77) ---

MY_ANALYZER = AnalyzerSettings(
    "myAnalyzer",
    STANDARD,
    (
        "LOWERCASE",
        "ASCII_FOLDING",
        "GERMAN_NORMALIZATION",
        "ENGLISH_POSSESSIVE",
        "ENGLISH_MIN_STEM",
        "BRITISH_US",
    ),
    strip_html=True,
)


def test_my_analyzer_matches_reference_vectors():
    # doc side strips tags; Jürgen and Juergen normalize identically
    assert toks("<i>Jürgen</i>", MY_ANALYZER) == ["jurgen"]
    assert analyze_query_text("Juergen", MY_ANALYZER) == ["jurgen"]
    assert analyze_query_text("Jürgen", MY_ANALYZER) == ["jurgen"]
    # Straße / Strasse / Fussgängern ↔ Fußgängern
    assert analyze_query_text("Straße", MY_ANALYZER) == ["strasse"]
    assert analyze_query_text("Strasse", MY_ANALYZER) == ["strasse"]
    assert analyze_query_text("Fußgängern", MY_ANALYZER) == analyze_query_text(
        "Fussgängern", MY_ANALYZER
    )
    # British→US then plural strip
    assert analyze_query_text("colours", MY_ANALYZER) == ["color"]


def test_builtin_min_stem_and_kstem():
    assert toks("Running dogs and indexes", DEFAULT_ANALYZERS["minStem"]) == [
        "running",
        "dogs"[:-1],
        "indexe",  # S-stemmer drops the final s only
    ]
    assert toks("Running dogs and indexes", DEFAULT_ANALYZERS["kstem"]) == [
        "run",
        "dog",
        "index",
    ]


def test_concat_all_and_html():
    assert toks("Wi-Fi ready_2 go", DEFAULT_ANALYZERS["lcConcatAll"]) == ["wifiready2go"]
    assert toks(
        "<p>alpha &amp; beta</p>", DEFAULT_ANALYZERS["standardHtml"]
    ) == ["alpha", "beta"]


def test_shingles():
    got = toks("a b c d", _an("LOWERCASE", "TWO_TWO_SHINGLE"))
    assert got == ["a b", "b c", "c d"]
    got3 = toks("a b c d", _an("LOWERCASE", "THREE_THREE_SHINGLE"))
    assert got3 == ["a b c", "b c d"]
    # outputUnigrams=false: shorter docs emit nothing
    assert toks("solo", _an("TWO_TWO_SHINGLE")) == []


def test_shingle_gap_fill_exact():
    got = toks("quick the fox", _an("LOWERCASE", "STOPWORDS", "TWO_TWO_SHINGLE"))
    # positions: quick@0, [the removed]@1, fox@2 → windows starting at
    # real tokens: (quick,_) and (fox,) has no second slot... fox@2 is
    # last position so only "quick _" plus no window at 1 (filler start)
    assert got == ["quick _"]


def test_lsh_analyzer_shapes():
    s = DEFAULT_ANALYZERS["lsh"]
    out = toks("the quick brown fox jumps over the lazy dog again and again", s)
    assert out, "lsh analyzer should emit fingerprint tokens"
    # MinHashFilter withRotation: every doc emits exactly bucketCount
    # positions, each a 128-bit hash as 32 hex digits
    assert len(out) == 512
    assert all(len(t) == 32 and set(t) <= set("0123456789abcdef") for t in out)
    # deterministic
    out2 = toks("the quick brown fox jumps over the lazy dog again and again", s)
    assert out == out2


def test_murmur3_x64_128_vectors():
    # published mmh3 vectors (MurmurHash3.cpp x64_128, seed 0)
    from zuliasearch_spark.util.hashing import murmur3_x64_128

    v1, v2 = murmur3_x64_128(b"foo")
    signed = lambda x: x - (1 << 64) if x >= (1 << 63) else x  # noqa: E731
    assert (signed(v1), signed(v2)) == (-2129773440516405919, 9128664383759220103)
    assert (v2 << 64) | v1 == 168394135621993849475852668931176482145
    assert murmur3_x64_128(b"") == (0, 0)
    # >16 bytes exercises the block loop; 17..31 exercises both tails
    a = murmur3_x64_128(b"abcdefghijklmnopq")
    b = murmur3_x64_128(b"abcdefghijklmnopQ")
    assert a != b and a != murmur3_x64_128(b"abcdefghijklmnop")


def test_minhash_rotation_and_bucketing():
    # single-token doc: the one hash rotates into all 512 buckets →
    # 512 positions, ONE distinct term (tf=512), like Lucene's
    # withRotation stream collapses to one term with high tf
    from zuliasearch_spark.util.hashing import murmur3_x64_128

    s = _an("MINHASH", tokenizer=WHITESPACE)
    out = toks("solo", s)
    assert len(out) == 512 and len(set(out)) == 1
    v1, v2 = murmur3_x64_128("solo".encode("utf-16-le"))
    assert out[0] == f"{v1:016x}{v2:016x}"
    # two docs sharing a token share that token's fingerprint term
    out_b = toks("solo other words here", s)
    assert out[0] in set(out_b)
    # bucket layout: top 32 bits of val2 over bucketSize 2^32/512
    bucket = (v2 >> 32) // ((1 << 32) // 512)
    assert 0 <= bucket < 512


def test_case_protected_words_skip_stemming():
    s = _an("CASE_PROTECTED_WORDS", "KSTEM")
    # AIDS is in the protected set (CaseProtectedWordsFilter.java);
    # no lowercase in this chain so the marker applies to "AIDS"
    got = toks("AIDS studies", s)
    assert "AIDS" in got
    assert "studi" in got or "study" in got


def test_protected_set_survives_remap():
    # a folding filter between the marker and the stemmer must not
    # lose the marker (codes are remapped through re-encoding)
    s = _an("CASE_PROTECTED_WORDS", "ASCII_FOLDING", "KSTEM")
    got = toks("AIDS running", s)
    assert "AIDS" in got and "run" in got


def test_analyzer_e2e_search(spark):
    """AnalyzerTest.java end-to-end: index German/Hungarian titles
    with the custom chain and match folded/normalized query forms."""
    from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
    from zuliasearch_spark.indexing.builder import build_index
    from zuliasearch_spark.search.executor import SearchEngine

    docs = [
        ("0", "<i>Jürgen</i>"),
        ("1", "Straße "),
        ("2", "András"),
    ]
    cfg = IndexConfig(
        index_name="an2",
        unique_id_col="uniqueId",
        number_of_shards=1,
        default_search_fields=("titleCustom",),
        field_configs=(
            FieldConfig(
                "title",
                index_as=(
                    IndexAs("titleStandard", "standard"),
                    IndexAs("titleCustom", "myAnalyzer"),
                ),
            ),
        ),
        analyzers={"myAnalyzer": MY_ANALYZER},
    )
    pdf = pd.DataFrame(docs, columns=["uniqueId", "title"])
    tables = build_index(spark.createDataFrame(pdf), cfg).persist()
    try:
        eng = SearchEngine(tables)

        def hits(qs):
            return eng.search_string(qs, amount=10)["totalHits"]

        assert hits("titleCustom:Jürgen") == 1
        assert hits("titleCustom:Juergen") == 1  # german normalization
        assert hits("titleStandard:Jürgen") == 1
        assert hits("titleStandard:Juergen") == 0  # standard keeps ü
        assert hits("titleCustom:Strasse") == 1
        assert hits("titleCustom:Straße") == 1
        assert hits("titleCustom:András") == 1
        assert hits("titleCustom:andras") == 1  # folded
        assert hits("titleStandard:andras") == 0
    finally:
        tables.unpersist()
