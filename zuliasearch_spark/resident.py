"""Resident-index cache with transient eviction.

Spark analogue of the reference's node-level index residency manager
(zulia-server/.../index/resident/LoadedIndexCache.java,
TransientIndexPolicy.java, IndexLease.java; exercised by the
TransientEvict*Test / FsTransientIndexTest suites):

- every defined index is REGISTERED; non-transient indexes load at
  startup and stay resident, transient indexes load lazily on first
  access (LoadedIndexCache class doc);
- a :class:`TransientIndexPolicy` bounds residency by a max loaded
  count and/or an idle timeout; the evictor unloads the LONGEST-IDLE
  transient index first (LoadedIndexCache eviction ordering);
- a just-loaded index cannot be evicted before MIN_RESIDENCY
  (LoadedIndexCache.MIN_RESIDENCY_MILLIS = 10 s) so size pressure
  never unloads it before first use;
- callers hold an index through a LEASE; eviction is deferred while
  any lease is open (IndexLease.java);
- load/eviction counters are exposed (loadCount/evictionCount
  LongAdders).

Here "resident" means the engine's postings are pinned in Spark
executor cache (:meth:`SearchEngine.pin` — shard-partitioned,
term-sorted in-memory columnar copies) and "unloaded" means
unpinned; the parquet index stays on disk either way, exactly like
the reference's Lucene directories, so a faulted-in index serves its
first query from the scan path while re-pinning.

Deviation: the reference runs a 5-second evictor thread
(EVICTOR_INTERVAL_MS); here :meth:`ResidentIndexCache.evict_pass` is
synchronous — the serving layer calls it on its own cadence (and
every ``get``/``lease`` runs one pass), which keeps the semantics
deterministic and testable without daemon threads in the driver.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable


MIN_RESIDENCY_SECONDS = 10.0  # LoadedIndexCache.MIN_RESIDENCY_MILLIS


@dataclass(frozen=True)
class TransientIndexPolicy:
    """TransientIndexPolicy.java: a count bound, an idle timeout, or
    both; 0 disables each. ``enabled()`` mirrors the reference."""

    max_loaded_indexes: int = 0
    idle_timeout_seconds: float = 0.0

    def enabled(self) -> bool:
        return self.max_loaded_indexes > 0 or self.idle_timeout_seconds > 0


@dataclass
class _Handle:
    engine: object
    transient: bool
    loaded_at: float
    last_access: float
    leases: int = 0


@dataclass
class _Registered:
    loader: Callable[[], object]
    transient: bool
    pin: bool


class IndexLease:
    """A hold on a resident index for one operation (IndexLease.java):
    while open, the index cannot be evicted. Close is idempotent;
    usable as a context manager."""

    def __init__(self, cache: "ResidentIndexCache", name: str, engine):
        self._cache = cache
        self._name = name
        self.engine = engine
        self._closed = False

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._cache._release(self._name)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ResidentIndexCache:
    """Owns the registry of defined indexes and the resident set
    (LoadedIndexCache.java). ``clock`` is injectable so tests can
    advance idle time deterministically."""

    def __init__(
        self,
        policy: TransientIndexPolicy | None = None,
        clock: Callable[[], float] = time.monotonic,
        min_residency: float = MIN_RESIDENCY_SECONDS,
    ):
        self.policy = policy or TransientIndexPolicy()
        self._clock = clock
        self._min_residency = min_residency
        self._registered: dict[str, _Registered] = {}
        self._resident: dict[str, _Handle] = {}
        self.load_count = 0
        self.eviction_count = 0

    # -- registry ---------------------------------------------------

    def register(
        self,
        name: str,
        loader: Callable[[], object],
        transient: bool = False,
        pin: bool = True,
    ) -> None:
        """Define an index. ``loader`` builds/opens the SearchEngine.
        Non-transient indexes load IMMEDIATELY and stay resident
        (the reference loads them at startup); transient indexes
        wait for first access."""
        self._registered[name] = _Registered(loader, transient, pin)
        if not transient:
            self._load(name)

    def registered(self) -> tuple[str, ...]:
        return tuple(self._registered)

    def resident(self, name: str) -> bool:
        return name in self._resident

    # -- access -----------------------------------------------------

    def get(self, name: str):
        """Resident engine for a one-shot operation: faults the index
        in if evicted (TransientEvict*Test: queries after eviction
        reload on the hosting node), touches last-access, then runs
        one eviction pass over the OTHER indexes."""
        with self.lease(name) as l:
            engine = l.engine
        self.evict_pass()
        return engine

    def peek(self, name: str):
        """Resident engine or ``None`` WITHOUT faulting in — the stats
        path's ``tryLeaseQuietly`` (ZuliaIndexManager.getIndexStats:
        1913-1927 reports an unloaded transient index as a bare
        non-resident entry instead of loading it)."""
        h = self._resident.get(name)
        return h.engine if h is not None else None

    @property
    def resident_count(self) -> int:
        """LoadedIndexCache.getResidentCount()."""
        return len(self._resident)

    def lease(self, name: str) -> IndexLease:
        """Open a lease (fault-in + pin-until-closed)."""
        if name not in self._registered:
            raise KeyError(f"index {name!r} is not registered")
        h = self._resident.get(name)
        if h is None:
            h = self._load(name)
        h.last_access = self._clock()
        h.leases += 1
        return IndexLease(self, name, h.engine)

    def _release(self, name: str) -> None:
        h = self._resident.get(name)
        if h is not None and h.leases > 0:
            h.leases -= 1

    # -- residency --------------------------------------------------

    def _load(self, name: str) -> _Handle:
        reg = self._registered[name]
        engine = reg.loader()
        if reg.pin and hasattr(engine, "pin"):
            engine.pin()
        now = self._clock()
        h = _Handle(engine, reg.transient, loaded_at=now, last_access=now)
        self._resident[name] = h
        self.load_count += 1
        return h

    def _unload(self, name: str) -> None:
        h = self._resident.pop(name)
        if hasattr(h.engine, "unpin"):
            h.engine.unpin()
        self.eviction_count += 1

    def evict_pass(self) -> tuple[str, ...]:
        """One evictor pass (LoadedIndexCache evictor loop): unload
        transient indexes idle past the timeout, then the
        longest-idle ones beyond the count bound. Leased handles and
        handles younger than MIN_RESIDENCY are never selected.
        Returns the names evicted."""
        if not self.policy.enabled():
            return ()
        now = self._clock()
        evicted: list[str] = []

        def evictable(item):
            n, h = item
            return (
                h.transient
                and h.leases == 0
                and now - h.loaded_at >= self._min_residency
            )

        cands = sorted(
            filter(evictable, self._resident.items()), key=lambda kv: kv[1].last_access
        )
        if self.policy.idle_timeout_seconds > 0:
            for n, h in cands:
                if now - h.last_access >= self.policy.idle_timeout_seconds:
                    self._unload(n)
                    evicted.append(n)
        if self.policy.max_loaded_indexes > 0:
            live = [
                (n, h)
                for n, h in cands
                if n in self._resident and h.transient
            ]
            n_transient = sum(1 for h in self._resident.values() if h.transient)
            overflow = n_transient - self.policy.max_loaded_indexes
            for n, _h in live[:max(0, overflow)]:
                self._unload(n)
                evicted.append(n)
        return tuple(evicted)

    def shutdown(self) -> None:
        """Unload everything (LoadedIndexCache shutdown path)."""
        for n in list(self._resident):
            self._unload(n)
