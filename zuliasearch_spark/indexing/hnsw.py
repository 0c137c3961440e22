"""Per-shard HNSW graphs for VECTOR fields (index_type="HNSW").

Reference parity: the reference indexes dense vectors through
Lucene's HNSW codec per IndexAs field
(ZuliaPerFieldKnnVectorsFormat.java picks the per-field KNN format;
zulia_index.proto VectorIndexingConfig carries the dials) and serves
KNN from the per-segment graph (ZuliaIndex.buildKnnQuery:597-615)
instead of scanning the corpus. This module re-expresses that
structure Spark-first:

- **Build**: one ``applyInPandas`` pass over doc_map grouped by
  shard constructs each shard's graph in NumPy (the exact analogue
  of Lucene building one HNSW per segment at flush). The output is
  a columnar graph table — one row per (doc_id, level) with the
  neighbor list, level-0 rows carrying the full-precision vector —
  written as parquet partitioned by (field, shard) so a query's
  per-shard traversal task reads only its own partition.
- **Search**: greedy descent from the top layer + beam (efSearch)
  at layer 0, per shard, inside a grouped pandas kernel. Each
  Python worker caches the decoded CSR graph keyed by the build's
  graph_id, so a query stream pays Arrow decode once per
  (worker, shard) — the Spark analogue of Lucene holding the graph
  reader open per segment.

Algorithm: Malkov & Yashunin 2016 ("Efficient and robust
approximate nearest neighbor search using Hierarchical Navigable
Small World graphs"), the same paper Lucene's HnswGraphBuilder
implements: geometric level assignment with mL = 1/ln(M), beam
efConstruction inserts, Algorithm-4 diversity heuristic for
neighbor selection, degree cap M (2M at layer 0). Everything is
deterministic — levels come from a splitmix64 hash of the node's
insertion position, not an RNG — so two builds of the same corpus
produce byte-identical graphs (segment replays in the streaming
path stay idempotent).

Similarity is cosine throughout: vectors are L2-normalized once at
build/traversal and compared by dot product (zero vectors get
cosine 0, matching the executor's codegen cosine which yields
NULL/0 contribution for zero-norm rows).
"""

from __future__ import annotations

import heapq
import math
from collections import OrderedDict

import numpy as np

# level-0 degree cap is 2M, upper layers M — the paper's M0 = 2M
# default, which Lucene also uses (maxConn vs maxConn0)


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _level_for(pos: int, m_l: float) -> int:
    """Deterministic geometric level: the paper draws
    floor(-ln(U) * mL) with U ~ uniform(0,1]; U here is a splitmix64
    hash of the insertion position mapped into (0, 1]."""
    h = _splitmix64(pos)
    u = ((h >> 11) + 1) / float(1 << 53)  # (0, 1]
    return int(-math.log(u) * m_l)


def _normalize(vecs: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return (vecs / norms).astype(np.float32)


def _search_layer(
    q: np.ndarray,
    eps: list[int],
    ef: int,
    adj: list[list[int] | None],
    vecs: np.ndarray,
) -> list[tuple[float, int]]:
    """Beam search one layer (paper Algorithm 2): returns up to
    ``ef`` (similarity, position) pairs, unordered (a min-heap).
    Neighbor similarities are computed in one NumPy matvec per
    expansion step."""
    visited = set(eps)
    sims = vecs[eps] @ q
    cand = [(-float(s), p) for s, p in zip(sims, eps)]
    heapq.heapify(cand)
    res = [(float(s), p) for s, p in zip(sims, eps)]
    heapq.heapify(res)
    while len(res) > ef:
        heapq.heappop(res)
    while cand:
        neg, cp = heapq.heappop(cand)
        if len(res) >= ef and -neg < res[0][0]:
            break
        nbrs = adj[cp]
        if not nbrs:
            continue
        fresh = [n for n in nbrs if n not in visited]
        if not fresh:
            continue
        visited.update(fresh)
        nsims = vecs[fresh] @ q
        for s, p in zip(nsims, fresh):
            s = float(s)
            if len(res) < ef or s > res[0][0]:
                heapq.heappush(cand, (-s, p))
                heapq.heappush(res, (s, p))
                if len(res) > ef:
                    heapq.heappop(res)
    return res


def _search_layer_filtered(
    q: np.ndarray,
    eps: list[int],
    ef: int,
    adj: list[list[int] | None],
    vecs: np.ndarray,
    allowed: set[int],
    visited_limit: int,
) -> tuple[list[tuple[float, int]], bool]:
    """Layer-0 beam with an acceptDocs-style filter (Lucene's
    filtered KNN: AbstractKnnVectorQuery hands the filter bitset to
    the HNSW searcher): EVERY node routes, only ``allowed`` positions
    are collected into the result queue, so the candidate frontier is
    pruned against the best ACCEPTED results — identical shape to
    Lucene's minCompetitiveSimilarity over the accepted queue.
    Returns (results, exhausted); exhausted=True means the visited
    budget was hit (graph search has cost more than an exact scan of
    the filter, Lucene's visitedLimit) and the caller must fall back
    to exact."""
    visited = set(eps)
    sims = vecs[eps] @ q
    cand = [(-float(s), p) for s, p in zip(sims, eps)]
    heapq.heapify(cand)
    res = [(float(s), p) for s, p in zip(sims, eps) if p in allowed]
    heapq.heapify(res)
    while len(res) > ef:
        heapq.heappop(res)
    while cand:
        if len(visited) > visited_limit:
            return res, True
        neg, cp = heapq.heappop(cand)
        if len(res) >= ef and -neg < res[0][0]:
            break
        nbrs = adj[cp]
        if not nbrs:
            continue
        fresh = [n for n in nbrs if n not in visited]
        if not fresh:
            continue
        visited.update(fresh)
        nsims = vecs[fresh] @ q
        for s, p in zip(nsims, fresh):
            s = float(s)
            if len(res) < ef or s > res[0][0]:
                heapq.heappush(cand, (-s, p))
                if p in allowed:
                    heapq.heappush(res, (s, p))
                    if len(res) > ef:
                        heapq.heappop(res)
    return res, False


def _select_neighbors(
    cands: list[tuple[float, int]], m: int, vecs: np.ndarray
) -> list[int]:
    """Diversity heuristic (paper Algorithm 4, Lucene's
    diversityCheck): walk candidates by similarity to the base
    vector descending; keep one only if it is closer to the base
    than to every already-kept neighbor — prunes redundant edges
    into one cluster so the graph keeps long-range links."""
    out: list[int] = []
    for s, p in sorted(cands, key=lambda t: (-t[0], t[1])):
        v = vecs[p]
        if all(float(v @ vecs[o]) <= s for o in out):
            out.append(p)
            if len(out) >= m:
                break
    return out


def build_graph(
    vecs: np.ndarray, m: int = 16, ef_construction: int = 100
) -> tuple[list[list[list[int] | None]], list[int]]:
    """Build one shard's HNSW over row-indexed ``vecs`` (assumed
    already L2-normalized). Returns (layers, levels) where
    ``layers[lev][pos]`` is the neighbor list of ``pos`` at layer
    ``lev`` (None below the node's level is impossible — every node
    has an entry at each layer ≤ its level) and ``levels[pos]`` is
    each node's top layer. Insertion order IS row order: callers
    pass rows sorted by doc_id so the build is deterministic."""
    n = len(vecs)
    m_l = 1.0 / math.log(m)
    levels = [_level_for(i, m_l) for i in range(n)]
    if n == 0:
        return [], levels
    top = levels[0]
    layers: list[list[list[int] | None]] = [
        [None] * n for _ in range(max(levels) + 1)
    ]
    for lev in range(levels[0] + 1):
        layers[lev][0] = []
    entry = 0
    for i in range(1, n):
        li = levels[i]
        q = vecs[i]
        eps = [entry]
        for lev in range(top, li, -1):
            # greedy hop toward q on layers above the node's level
            best = max(_search_layer(q, eps, 1, layers[lev], vecs))
            eps = [best[1]]
        for lev in range(min(top, li), -1, -1):
            w = _search_layer(q, eps, ef_construction, layers[lev], vecs)
            cap = 2 * m if lev == 0 else m
            nbrs = _select_neighbors(w, cap, vecs)
            layers[lev][i] = list(nbrs)
            for nb in nbrs:
                lst = layers[lev][nb]
                lst.append(i)
                if len(lst) > cap:
                    cands = [(float(vecs[p] @ vecs[nb]), p) for p in lst]
                    layers[lev][nb] = _select_neighbors(cands, cap, vecs)
            eps = [p for _, p in sorted(w, key=lambda t: (-t[0], t[1]))]
        if li > top:
            # the node tops out above the current entry: it owns the
            # new upper layers alone (empty adjacency) and becomes
            # the graph's entry point
            for lev in range(top + 1, li + 1):
                layers[lev][i] = []
            top = li
            entry = i
    return layers, levels


def search_graph(
    layers: list[list[list[int] | None]],
    levels: np.ndarray,
    vecs: np.ndarray,
    q: np.ndarray,
    ef: int,
    k: int,
    dead: set[int] | None = None,
    allowed: set[int] | None = None,
    visited_limit: int | None = None,
) -> list[tuple[float, int]] | None:
    """Query one shard's graph: greedy descent from the max-level
    node, beam ``ef`` at layer 0, then the top-k LIVE results
    (similarity, position) sorted desc. Dead positions (tombstoned
    docs) are traversed — they still route, Lucene's acceptDocs
    shape — but never collected.

    With ``allowed`` (a filtered-KNN bitset of LIVE accepted
    positions): the descent still navigates every node, but only
    accepted positions are collected, and the beam aborts once it
    has visited more than ``visited_limit`` nodes — returning None
    to signal that an exact scan over the filter is cheaper
    (Lucene's visitedLimit fallback)."""
    n = len(vecs)
    if n == 0:
        return []
    nq = np.linalg.norm(q)
    qn = (q / nq).astype(np.float32) if nq > 0 else q.astype(np.float32)
    top = int(levels.max())
    # deterministic entry: the lowest position among max-level nodes
    entry = int(np.nonzero(levels == top)[0][0])
    eps = [entry]
    for lev in range(top, 0, -1):
        best = max(_search_layer(qn, eps, 1, layers[lev], vecs))
        eps = [best[1]]
    if allowed is not None:
        res, exhausted = _search_layer_filtered(
            qn, eps, max(ef, k), layers[0], vecs, allowed,
            visited_limit if visited_limit is not None else n,
        )
        if exhausted:
            return None
    else:
        res = _search_layer(qn, eps, max(ef, k), layers[0], vecs)
        if dead:
            res = [(s, p) for s, p in res if p not in dead]
    res.sort(key=lambda t: (-t[0], t[1]))
    return res[:k]


# -- columnar (de)serialization -----------------------------------------

# worker-side decoded-graph cache: (graph_id, shard) -> (layers,
# levels, vecs, doc_ids). Python workers are reused across jobs, so a
# query stream decodes each shard's Arrow batch into CSR once. Small
# LRU — a worker typically owns a handful of shards.
_GRAPH_CACHE: OrderedDict = OrderedDict()
_GRAPH_CACHE_MAX = 16


def graph_rows(
    doc_ids: np.ndarray,
    vecs_raw: np.ndarray,
    m: int,
    ef_construction: int,
    uids=None,
):
    """Build + emit the columnar graph for one shard: one dict row
    per (doc_id, level); level-0 rows carry the raw full-precision
    vector and the doc's uniqueId (the graph file doubles as
    Lucene's .vec storage, so query-time traversal never joins back
    to doc_map). Neighbors are stored as DOC IDS, not positions —
    segment merges renumber nothing."""
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    vecs_raw = vecs_raw[order]
    uids = uids[order] if uids is not None else None
    layers, levels = build_graph(_normalize(vecs_raw), m, ef_construction)
    rows = []
    for pos, did in enumerate(doc_ids):
        for lev in range(levels[pos] + 1):
            rows.append(
                {
                    "doc_id": int(did),
                    "uniqueId": (str(uids[pos]) if uids is not None else None)
                    if lev == 0
                    else None,
                    "level": lev,
                    "neighbors": [int(doc_ids[p]) for p in layers[lev][pos]],
                    "vector": [float(x) for x in vecs_raw[pos]]
                    if lev == 0
                    else None,
                }
            )
    return rows


def decode_graph(pdf, cache_key: tuple | None = None):
    """Decode one shard's graph rows (a pandas frame with doc_id,
    level, neighbors, vector) into traversal arrays, LRU-cached per
    worker when ``cache_key`` is given."""
    if cache_key is not None:
        hit = _GRAPH_CACHE.get(cache_key)
        if hit is not None:
            _GRAPH_CACHE.move_to_end(cache_key)
            return hit
    base = pdf[pdf["level"] == 0].sort_values("doc_id")
    doc_ids = base["doc_id"].to_numpy(dtype=np.int64)
    pos_of = {int(d): i for i, d in enumerate(doc_ids)}
    uids = base["uniqueId"].to_numpy(object) if "uniqueId" in base else None
    raw = np.stack([np.asarray(v, dtype=np.float32) for v in base["vector"]])
    vecs = _normalize(raw)
    n_levels = int(pdf["level"].max()) + 1
    layers: list[list[list[int] | None]] = [
        [None] * len(doc_ids) for _ in range(n_levels)
    ]
    for did, lev, nbrs in zip(pdf["doc_id"], pdf["level"], pdf["neighbors"]):
        layers[int(lev)][pos_of[int(did)]] = [pos_of[int(x)] for x in nbrs]
    levels = np.zeros(len(doc_ids), dtype=np.int64)
    lv = pdf.groupby("doc_id")["level"].max()
    for did, top in lv.items():
        levels[pos_of[int(did)]] = int(top)
    got = (layers, levels, vecs, raw, doc_ids, uids)
    if cache_key is not None:
        _GRAPH_CACHE[cache_key] = got
        while len(_GRAPH_CACHE) > _GRAPH_CACHE_MAX:
            _GRAPH_CACHE.popitem(last=False)
    return got


def decode_graph_parquet(path: str, cache_key: tuple | None = None):
    """Worker-side load of one (field, shard) graph partition
    straight from its parquet directory — the serving path: the
    per-query task input is a one-row shard skeleton, so repeat
    queries move O(k) bytes over Arrow instead of the whole graph.
    Cached like decode_graph (callers version the key with the
    partition's mtime so a rebuild invalidates)."""
    if cache_key is not None:
        hit = _GRAPH_CACHE.get(cache_key)
        if hit is not None:
            _GRAPH_CACHE.move_to_end(cache_key)
            return hit
    import pyarrow.parquet as pq

    pdf = pq.read_table(path).to_pandas()
    return decode_graph(pdf, cache_key=cache_key)


def _positions_of(doc_ids: np.ndarray, ids) -> set[int]:
    """Graph positions of the given doc ids (ids absent from this
    shard are ignored) — doc_ids is sorted by construction."""
    out: set[int] = set()
    if ids is None or len(ids) == 0:
        return out
    arr = np.asarray(sorted(ids), dtype=np.int64)
    idx = np.searchsorted(doc_ids, arr)
    for i, d in zip(idx, arr):
        if i < len(doc_ids) and doc_ids[i] == d:
            out.add(int(i))
    return out


def shard_topk(
    decoded,
    q,
    ef: int,
    k: int,
    dead_ids=None,
    allowed_ids=None,
) -> list[tuple[int, str | None, float]]:
    """Top-k of one decoded shard graph: float32 beam traversal,
    then an exact float64 cosine for the ≤k winners only (parity
    with the executor's codegen cosine / the DuckDB oracle — same
    arithmetic the FLAT path reports, rounded to 6). Returns
    [(doc_id, uniqueId, cosine)]; dead doc ids are routed through
    but never collected, and the beam widens by the shard's dead
    count so deletes cannot starve k.

    ``allowed_ids`` is the filtered-KNN accept set (the boolean
    pre-filter's matches in this shard). Lucene's cost rule
    (AbstractKnnVectorQuery): a filter no bigger than the beam is
    scanned exactly; otherwise the graph is traversed with the
    filter bitset under a visited budget of |allowed|, falling back
    to the exact scan when the budget is exhausted — graph search
    that visits more nodes than the filter has is never cheaper."""
    layers, levels, vecs, raw, doc_ids, uids = decoded
    dead_pos = _positions_of(doc_ids, sorted(dead_ids)) if dead_ids else set()
    n_dead = len(dead_pos)
    qv = np.asarray(q, dtype=np.float32)
    if allowed_ids is not None:
        allowed_pos = _positions_of(doc_ids, allowed_ids) - dead_pos
        if not allowed_pos:
            return []
        beam = max(ef, k)
        res = None
        if len(allowed_pos) > beam:
            res = search_graph(
                layers, levels, vecs, qv, beam, k,
                allowed=allowed_pos, visited_limit=len(allowed_pos),
            )
        if res is None:
            # exact over the filter, in float64 straight away — the
            # identical arithmetic + rounding the executor's codegen
            # exact scan reports, so the fallback is bit-compatible
            pos = np.fromiter(allowed_pos, dtype=np.int64)
            qd = np.asarray(q, dtype=np.float64)
            nq = float(np.linalg.norm(qd))
            rv = raw[pos].astype(np.float64)
            nv = np.linalg.norm(rv, axis=1)
            with np.errstate(invalid="ignore", divide="ignore"):
                cs = np.where(
                    (nv > 0) & (nq > 0), rv @ qd / (nv * nq), 0.0
                )
            cs = np.round(cs, 6)
            order = sorted(range(len(pos)), key=lambda i: (-cs[i], doc_ids[pos[i]]))
            return [
                (
                    int(doc_ids[pos[i]]),
                    str(uids[pos[i]])
                    if uids is not None and uids[pos[i]] is not None
                    else None,
                    float(cs[i]),
                )
                for i in order[:k]
            ]
    else:
        res = search_graph(
            layers, levels, vecs, qv, max(ef, k + n_dead), k, dead=dead_pos or None
        )
    qd = np.asarray(q, dtype=np.float64)
    nq = float(np.linalg.norm(qd))
    out = []
    for _, p in res:
        v = raw[p].astype(np.float64)
        nv = float(np.linalg.norm(v))
        c = float(v @ qd / (nv * nq)) if nv > 0 and nq > 0 else 0.0
        out.append(
            (
                int(doc_ids[p]),
                str(uids[p]) if uids is not None and uids[p] is not None else None,
                round(c, 6),
            )
        )
    return out
