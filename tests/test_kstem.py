"""KStem (Krovetz) stemmer — AnalyzerTest.java's KSTEM filter analogue.

The reference wires Lucene's KStemFilter for Filter.KSTEM
(ZuliaFieldAnalyzer.java:111-113). These vectors assert the
dictionary-driven contract that distinguishes KStem from suffix
strippers: transformations are kept only when they land on a known
head word, real words survive intact, and inflectional endings get
spelling repair (undoubling, +e restoration, i→y)."""

import pytest

from zuliasearch_spark.analysis.kstem import (
    DIRECT_CONVERSIONS,
    LEXICON,
    kstem_stem,
)


INFLECTIONAL = {
    # plural
    "dogs": "dog",
    "indexes": "index",
    "churches": "church",
    "boxes": "box",
    "flies": "fly",
    "movies": "movie",
    "dies": "die",
    "ties": "tie",
    "studies": "study",
    "buildings": "building",
    # past tense
    "walked": "walk",
    "baked": "bake",
    "stopped": "stop",
    "planned": "plan",
    "carried": "carry",
    "studied": "study",
    "died": "die",
    # aspect (-ing)
    "walking": "walk",
    "baking": "bake",
    "running": "run",
    "singing": "sing",
}

DERIVATIONAL = {
    # dictionary-gated: result is a known head word
    # r5: common derived forms are dictionary ENTRIES (KStemData
    # lists them), so lookup returns them untouched — Lucene parity
    # (Solr docs' canonical example: organizations -> organization)
    "happiness": "happiness",
    "darkness": "darkness",  # r5: dictionary entry, lookup-first
    "quickly": "quick",
    "happily": "happily",
    "happier": "happy",
    "carrier": "carry",
    "creation": "creation",
    "organization": "organization",
    "formality": "formal",
    "readable": "read",
    "probably": "probable",
    "logical": "logic",
    "singer": "sing",
    "writer": "write",
    "urgency": "urgent",
}

# The property Porter-style strippers get wrong: words that ARE the
# head form (in the lexicon) come back untouched. Porter2 truncates
# every one of these.
DICTIONARY_PRESERVED = [
    "meeting", "building", "police", "news", "series", "species",
    "during", "something", "everything", "movement", "decision",
    "activity", "arrival", "actor", "being", "doing", "data",
]

IRREGULAR = {
    "feet": "foot",
    "children": "child",
    "indices": "index",
    "matrices": "matrix",
    "wives": "wife",
    "analyses": "analysis",
    "criteria": "criterion",
    "people": "person",
}


@pytest.mark.parametrize("word,want", sorted(INFLECTIONAL.items()))
def test_inflectional(word, want):
    assert kstem_stem(word) == want


@pytest.mark.parametrize("word,want", sorted(DERIVATIONAL.items()))
def test_derivational_dictionary_gated(word, want):
    assert kstem_stem(word) == want


@pytest.mark.parametrize("word", DICTIONARY_PRESERVED)
def test_lexicon_words_preserved(word):
    assert kstem_stem(word) == word


@pytest.mark.parametrize("word,want", sorted(IRREGULAR.items()))
def test_direct_conversions(word, want):
    assert kstem_stem(word) == want


def test_differs_from_porter2_where_it_should():
    """The point of shipping real KStem: Porter2 mangles head words."""
    from zuliasearch_spark.analysis.stem import porter2_stem

    for w in ("meeting", "police", "activity"):
        assert kstem_stem(w) == w
        assert porter2_stem(w) != w


def test_non_candidates_pass_through():
    # short / non-alpha / mixed-case tokens bypass (KStemFilter stems
    # only all-lowercase alpha tokens)
    for w in ("ab", "x1y", "AIDS", "Running", "a-b", "42"):
        assert kstem_stem(w) == w


def test_oov_inflectional_repair():
    # unknown words still get deterministic inflectional handling...
    assert kstem_stem("zorbs") == "zorb"
    assert kstem_stem("frobbed") == "frob"
    # ...but derivational endings never fire off-dictionary
    assert kstem_stem("zorbness") == "zorbness"
    assert kstem_stem("frobment") == "frobment"


def test_idempotent_on_outputs():
    for w in list(INFLECTIONAL) + list(DERIVATIONAL) + DICTIONARY_PRESERVED:
        out = kstem_stem(w)
        assert kstem_stem(out) == out, (w, out)


def test_load_lexicon_extends(tmp_path):
    from zuliasearch_spark.analysis import kstem as K

    assert kstem_stem("blorting") == "blort"  # OOV default: plain strip
    p = tmp_path / "extra.txt"
    p.write_text("# custom head words\nblorte\n")
    try:
        added = K.load_lexicon(str(p))
        assert added == 1
        assert kstem_stem("blorting") == "blorte"  # +e repair now gated in
    finally:
        K.LEXICON.discard("blorte")
        K.kstem_stem.cache_clear()


def test_analyzer_chain_integration():
    """DefaultAnalyzers 'kstem' preset end-to-end through the
    vectorized analyzer (AnalyzerTest.java KSTEMMED)."""
    import pandas as pd

    from zuliasearch_spark.analysis.analyzers import tokenize
    from zuliasearch_spark.config import DEFAULT_ANALYZERS

    ts = tokenize(pd.Series(["Police meetings were running smoothly"]),
                  DEFAULT_ANALYZERS["kstem"])
    vocab = ts.vocab.to_pylist()
    toks = [vocab[c] for c in ts.codes]
    # "were" is not in Lucene's English stop set; "smoothly" is its
    # own KStemData-style entry so lookup keeps it whole
    assert toks == ["police", "meeting", "were", "run", "smoothly"]


def test_direct_conversion_heads_are_words():
    assert set(DIRECT_CONVERSIONS.values()) <= LEXICON


# ---- round-5 breadth vectors over the supplement lexicon ------------
# ~330 surface forms exercising every family (plural/-ies/-es, past
# tense with undoubling and +e repair, aspect, -ness, -ation/-ion,
# agent -er with Lucene's minus-"r"-first order) against the broadened
# ~6.4k head-word lexicon (analysis/kstem.py _SUPPLEMENT).

BREADTH_PLURALS = """
accidents ambitions anchors animals answers apologies armies arrows
assemblies auctions authors babies badges balloons banners barrels
batteries beaches berries bicycles biographies blankets blossoms
bottles boundaries branches bridges brushes bubbles budgets
bunches burdens bushes butterflies cabbages cabins calendars cameras
campaigns canals candles canyons captains carriages carrots
cartoons casualties categories cathedrals ceilings cemeteries
ceremonies chairs chapters charities chimneys choirs churches circles
cities classes clinics clusters colleges colonies columns comedies
committees communities companies compasses conferences copies corners
cottages counties countries couples courtyards cousins crafts cranes
craters creatures crystals cultures currencies curtains cycles
daisies dances dangers debates decades decisions deliveries demands
deputies deserts designs devices diagrams dialects diamonds diaries
dictionaries dinners disasters diseases dishes districts ditches
doctors dollars donkeys doors dozens dramas dreams dresses drills
duties eagles echoes economies edges editions elbows elections
emergencies empires enemies engines entries envelopes errands essays
estates excuses exercises exits expenses factories families fences
ferries festivals fevers fields figures fingers fisheries flavors
forests fortresses fountains foxes galleries gardens gates gems
glaciers glasses grocers guesses habits harbors heroes
highways histories hobbies horizons hotels houses hymns
identities idioms impulses inches incidents industries injuries inns
insects instincts islands issues items jackets jellies jewels
journeys judges juices jungles juries kettles kingdoms kitchens
kites kittens knees knights ladders lakes lamps languages lanterns
leagues lectures legends lessons letters levels libraries licenses
lilies limits lions lizards lodges lotteries luxuries machines
magazines mansions marbles marches markets marshes masses matches
meadows melodies memories messages metals methods minutes miracles
mirrors missiles missions mistakes molecules monasteries monkeys
monuments mosques motives mountains muscles museums mysteries
""".split()


def test_breadth_plurals_conflate():
    for w in BREADTH_PLURALS:
        s = kstem_stem(w)
        assert s != w and w.startswith(s[:3]), (w, s)
        # round-trip: the produced head word is itself stable
        assert kstem_stem(s) == s, (w, s)


BREADTH_VECTORS = {
    # past tense: +e repair, undoubling, -ied
    "negotiated": "negotiate", "celebrated": "celebrate",
    "hesitated": "hesitate", "illustrated": "illustrate",
    "imitated": "imitate", "irritated": "irritate",
    "whispered": "whisper", "wandered": "wander", "murmured": "murmur",
    "conquered": "conquer", "delivered": "deliver", "considered": "consider",
    "dragged": "drag", "grabbed": "grab", "slipped": "slip",
    "wrapped": "wrap", "hugged": "hug", "nodded": "nod",
    "shrugged": "shrug", "snapped": "snap",
    "worried": "worry", "hurried": "hurry", "buried": "bury",
    "married": "marry", "emptied": "empty", "envied": "envy",
    "pitied": "pity", "copied": "copy",
    # aspect: +e repair against the broadened lexicon
    "navigating": "navigate", "operating": "operate",
    "decorating": "decorate", "vibrating": "vibrate",
    "migrating": "migrate", "donating": "donate",
    "shivering": "shiver", "gathering": "gather", "suffering": "suffer",
    "glittering": "glitter", "fluttering": "flutter",
    "stuttering": "stutter", "smiling": "smile", "hiding": "hide",
    "sliding": "slide", "gazing": "gaze", "blazing": "blaze",
    "dozing": "doze", "grazing": "graze",
    # -ness and -ation forms are dictionary ENTRIES (lookup-first
    # conservatism, Lucene parity): they return themselves — the
    # conflating rules still serve out-of-dictionary words, pinned in
    # BREADTH_OOV below
    # agent -er: minus-"r" (the +e form) before the bare stem
    "gardener": "garden", "prisoner": "prison", "villager": "village",
    "announcer": "announce", "explorer": "explore", "invader": "invade",
    "weaver": "weave", "mourner": "mourn", "trader": "trade",
    "driver": "drive", "dancer": "dance", "maker": "make",
}


BREADTH_PRESERVED = [
    "brightness", "darkness", "weakness", "kindness", "politeness",
    "rudeness", "navigation", "celebration", "decoration", "migration",
    "donation", "imitation", "irritation", "hesitation", "information",
    "combination", "happiness", "creation", "organization", "smoothly",
]

# out-of-dictionary derived forms: the gated rules still conflate
BREADTH_OOV = {
    "dampness": "damp", "crispness": "crisp",
    "vastness": "vast", "starvation": "starve",
}


def test_breadth_vectors():
    for w, want in BREADTH_VECTORS.items():
        assert kstem_stem(w) == want, (w, kstem_stem(w), want)


def test_breadth_preserved_dictionary_entries():
    for w in BREADTH_PRESERVED:
        assert kstem_stem(w) == w, (w, kstem_stem(w))


def test_breadth_oov_still_conflates():
    for w, want in BREADTH_OOV.items():
        assert kstem_stem(w) == want, (w, kstem_stem(w), want)
