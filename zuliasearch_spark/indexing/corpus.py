"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Schema per ``BASELINE.json input_hint``:
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Mirrors the reference's test strategy of small deterministic document
sets with exactly known term statistics
(zulia-server/src/test/java/io/zulia/server/test/node/FacetTest.java:34-128
and friends), scaled up: content mixes per-lang keywords, camelCase /
snake_case identifiers, string literals and comment words drawn from
a 500-word list with Zipf(1.1) frequencies — guaranteeing hot terms
(skew) and rare terms (per-doc unique symbols).

Everything is chunk-deterministic: ``gen_chunk(chunk_id, ...)`` seeds
its own RNG from (seed, chunk_id), so the same doc index ``i`` always
gets the same row no matter how generation is partitioned — the same
corpus comes out of pandas (tests/oracle) and Spark (bench scale).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SEED = 42
CHUNK = 8192

# Engine vocabulary — the fixture queries (FIXTURES.md F3) draw from these.
CORE_WORDS = (
    "parse query node shard reader writer index segment merge block term "
    "posting score rank varint encode decode delta gap compress buffer "
    "search filter match boost fetch store commit batch stream token "
    "analyze lower split field document unique hash route partition "
    "stat count facet sort page cursor cache warm replica primary"
).split()

_SYL1 = "ba ce di fo gu ha ki lo mu ne po qua ri su te vo wa xe yo zu".split()
_SYL2 = "lan mer nor pel ric sol tun ver wil zan dor fen gim hol jes".split()
_SYL3 = "a e i o u ay en ix on uz".split()


def _filler_words(n: int) -> list[str]:
    out = []
    for i in range(n):
        w = _SYL1[i % len(_SYL1)] + _SYL2[(i // len(_SYL1)) % len(_SYL2)] + _SYL3[(i // (len(_SYL1) * len(_SYL2))) % len(_SYL3)]
        out.append(w + (str(i % 7) if i % 11 == 0 else ""))
    return out


# 500-word natural-language comment vocabulary (Zipf(1.1) weighted).
NL_WORDS: list[str] = (CORE_WORDS + _filler_words(500))[:500]

LANGS = ["python", "java", "js", "go"]
_LANG_CYCLE = ["python", "python", "python", "python", "java", "java", "java", "js", "js", "go"]  # 4:3:2:1
EXT = {"python": "py", "java": "java", "js": "js", "go": "go"}
KEYWORDS = {
    "python": "def class return import from lambda yield self None True with".split(),
    "java": "public static void class final return import new extends interface".split(),
    "js": "function const let var return export import async await class".split(),
    "go": "func package return import type struct interface defer go chan".split(),
}

_DIRS = "core util search index io net model api impl test".split()
_NAMES = "reader writer handler manager builder parser codec merger router scorer".split()


def _identifiers(n: int = 4000) -> list[str]:
    """Deterministic camelCase + snake_case identifier vocabulary."""
    rng = np.random.default_rng(SEED)
    w = np.array(CORE_WORDS)
    a, b_, c = (rng.integers(0, len(w), n) for _ in range(3))
    out = []
    for i in range(n):
        x, y, z = w[a[i]], w[b_[i]], w[c[i]]
        if i % 2 == 0:  # camelCase (2 or 3 parts)
            ident = x + y.capitalize() + (z.capitalize() if i % 3 == 0 else "")
        else:  # snake_case
            ident = x + "_" + y + ("_" + z if i % 3 == 0 else "")
        out.append(ident)
    return out


IDENTIFIERS: list[str] = _identifiers()


def _zipf_weights(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return w / w.sum()


_NL_W = _zipf_weights(len(NL_WORDS))
_PUNCT = ["(", "):", ";", "=", "{", "}", "->", "#", '"s"', "[0]", "\n"]

# One fixed token vocabulary; sampling produces int codes and Arrow's
# dictionary take + binary_join materialize strings in C++.
_KW_FLAT = [KEYWORDS[_LANG_CYCLE[c]][k] for c in range(10) for k in range(10)]
_VOCAB: list[str] = NL_WORDS + IDENTIFIERS + _KW_FLAT + _PUNCT
_NL_OFF, _ID_OFF = 0, len(NL_WORDS)
_KW_OFF = _ID_OFF + len(IDENTIFIERS)
_PUNCT_OFF = _KW_OFF + len(_KW_FLAT)
_VOCAB_ARR = pa.array(_VOCAB, type=pa.string())


def gen_chunk(chunk_id: int, n_total: int, seed: int = SEED) -> pd.DataFrame:
    """Generate rows [chunk_id*CHUNK, min((chunk_id+1)*CHUNK, n_total))."""
    start = chunk_id * CHUNK
    count = min(CHUNK, n_total - start)
    if count <= 0:
        return pd.DataFrame(columns=["repo", "path", "commit", "lang", "content"])
    i = np.arange(start, start + count, dtype=np.int64)
    rng = np.random.default_rng((seed, chunk_id))

    repo = "org" + pd.Series(i % 7).astype(str) + "/repo" + pd.Series(i % 23).astype(str)
    lang = pd.Series([_LANG_CYCLE[c] for c in i % 10])
    d = pd.Series([_DIRS[c] for c in i % len(_DIRS)])
    nm = pd.Series([_NAMES[c] for c in (i // 3) % len(_NAMES)])
    path = "src/" + d + "/" + nm + pd.Series(i).astype(str) + "." + lang.map(EXT)
    commit = pd.Series([hashlib.sha1(f"c{x}".encode()).hexdigest() for x in i])

    # --- content: per-doc token codes, materialized by Arrow ---------
    n_lines = rng.integers(20, 401, count)
    n_tokens = (n_lines * 6).astype(np.int64)
    total = int(n_tokens.sum())
    doc_of = np.repeat(np.arange(count, dtype=np.int32), n_tokens)

    # token class: 37% NL (zipf), 31% identifier, 21% keyword, 11% punct
    u = rng.random(total)
    codes = np.empty(total, dtype=np.int32)
    m = u < 0.37
    codes[m] = _NL_OFF + rng.choice(len(NL_WORDS), int(m.sum()), p=_NL_W)
    m2 = (u >= 0.37) & (u < 0.68)
    # identifier popularity is itself zipf-ish: square a uniform
    codes[m2] = _ID_OFF + (rng.random(int(m2.sum())) ** 2 * len(IDENTIFIERS)).astype(np.int32)
    m3 = (u >= 0.68) & (u < 0.89)
    lang_code = (i % 10).astype(np.int32)
    codes[m3] = _KW_OFF + lang_code[doc_of[m3]] * 10 + rng.integers(0, 10, int(m3.sum()), dtype=np.int32)
    m4 = u >= 0.89
    codes[m4] = _PUNCT_OFF + rng.integers(0, len(_PUNCT), int(m4.sum()), dtype=np.int32)

    flat = pc.take(_VOCAB_ARR, pa.array(codes))
    offsets = np.zeros(count + 1, dtype=np.int32)
    np.cumsum(n_tokens, out=offsets[1:])
    lst = pa.ListArray.from_arrays(pa.array(offsets), flat)
    content = pc.binary_join(lst, " ").to_pandas()
    # rare terms: 2 per-doc-unique symbols appended as a trailing line
    istr = pd.Series(i).astype(str)
    content = content + "\nsym_" + istr + "_a sym_" + istr + "_b"

    return pd.DataFrame(
        {"repo": repo.values, "path": path.values, "commit": commit.values, "lang": lang.values, "content": content.values}
    )


def gen_corpus_pandas(n_docs: int, seed: int = SEED) -> pd.DataFrame:
    """Whole corpus as pandas (tests / oracle; small n only)."""
    chunks = [gen_chunk(c, n_docs, seed) for c in range((n_docs + CHUNK - 1) // CHUNK)]
    df = pd.concat(chunks, ignore_index=True)
    df["uniqueId"] = df["repo"] + ":" + df["path"] + ":" + df["commit"]
    return df


def gen_corpus_spark(spark, n_docs: int, seed: int = SEED, partitions: int | None = None):
    """Distributed corpus generation: one task per chunk, same rows as pandas."""
    from pyspark.sql import functions as F

    n_chunks = (n_docs + CHUNK - 1) // CHUNK
    chunks = spark.range(n_chunks).withColumnRenamed("id", "chunk_id")
    if partitions:
        chunks = chunks.repartition(partitions, "chunk_id")

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        out = [gen_chunk(int(c), n_docs, seed) for c in pdf["chunk_id"]]
        return pd.concat(out, ignore_index=True)

    schema = "repo string, path string, commit string, lang string, content string"
    df = chunks.groupBy("chunk_id").applyInPandas(lambda _, pdf: gen(pdf), schema)
    return df.withColumn("uniqueId", F.concat_ws(":", "repo", "path", "commit"))
