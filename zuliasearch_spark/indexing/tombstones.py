"""Durable tombstones: deleted uniqueIds persisted beside the index.

Lucene records deletions in per-segment live-docs bitsets that
survive restarts and are dropped at merge
(IndexWriter.deleteDocuments → purge on merge); the Spark analogue is
a uniqueId list at ``<index root>/tombstones.jsonl`` written with the
same atomic rewrite-and-rename protocol as the segment manifest.
SearchEngine loads it on construction (deletes survive a new engine
on the same tables) and ``segments.optimize`` physically purges the
listed docs during its block rewrite, after which the merged index
starts with an empty tombstone set.
"""

from __future__ import annotations

import json
import os

FILENAME = "tombstones.jsonl"


def tombstone_path(root: str | None) -> str | None:
    return os.path.join(root, FILENAME) if root else None


def load_tombstone_uids(root: str | None) -> list[str]:
    p = tombstone_path(root)
    if p is None or not os.path.exists(p):
        return []
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def save_tombstone_uids(root: str | None, uids) -> None:
    """Atomic full rewrite (single-writer, crash-safe: temp + rename)."""
    p = tombstone_path(root)
    if p is None:
        return  # memory-backed index: session-only tombstones
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        for u in sorted(uids):
            f.write(json.dumps(u) + "\n")
    os.replace(tmp, p)


def clear_tombstones(root: str | None) -> None:
    p = tombstone_path(root)
    if p is not None and os.path.exists(p):
        os.remove(p)
