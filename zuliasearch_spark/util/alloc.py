"""Allocator tuning for allocation-heavy Arrow/NumPy kernels.

The build kernels allocate and free large transient buffers (token
gathers, posting sorts, varint streams) on every Arrow batch. With
default allocator settings those buffers are returned to the OS on
free (glibc mmap/munmap churn, jemalloc dirty-page decay) and every
batch re-faults its working set. On virtualized hosts where reclaimed
pages must round-trip through the hypervisor (free-page reporting /
ballooning), refaulting can run orders of magnitude slower than the
kernel itself — measured here: a 108 MB ``np.concatenate`` taking 12 s
while the same call on pool-resident pages takes 0.05 s.

Two knobs keep pages resident:

- **jemalloc (Arrow's pool)**: disable dirty-page decay so the pool
  retains its high-water mark instead of returning pages.
- **glibc (NumPy)**: raise ``M_MMAP_THRESHOLD`` / ``M_TRIM_THRESHOLD``
  so large arrays come from the retained heap, not transient mmaps.
  glibc reads these from the environment at process start, so Spark
  python workers need them via ``spark.executorEnv.*`` (exported as
  :data:`WORKER_ALLOC_ENV`); the in-process :func:`tune_allocators`
  handles jemalloc, which is configurable after start.

Bounding per-batch working sets matters just as much: keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` small enough that a
batch's transient buffers stay inside the already-faulted pool
(~1024 docs for ~10 KB documents; measured 12.6 MB/s sustained vs
0.7 MB/s at 16k-doc batches on this host).
"""

from __future__ import annotations

import os

#: Environment for Spark executor python workers (glibc reads these
#: only at process start). 1 GiB thresholds: every build buffer is far
#: smaller, so nothing is ever mmap'd transiently or trimmed back.
WORKER_ALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
    "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
}

_tuned = False


def tune_allocators() -> None:
    """Idempotent in-process tuning (jemalloc decay off)."""
    global _tuned
    if _tuned:
        return
    _tuned = True
    try:
        import pyarrow as pa

        pa.jemalloc_set_decay_ms(-1)
    except Exception:
        pass  # non-jemalloc Arrow builds: nothing to tune


def worker_env_configs() -> dict[str, str]:
    """Spark conf entries that propagate the glibc env to workers."""
    return {f"spark.executorEnv.{k}": v for k, v in WORKER_ALLOC_ENV.items()}


def export_env() -> None:
    """Set the glibc vars in this process's environment so forked
    children (local-mode python worker daemons) inherit them."""
    for k, v in WORKER_ALLOC_ENV.items():
        os.environ.setdefault(k, v)
