"""Import/Export/Clear: JSON-lines dump & restore of an index's
documents + settings, and index teardown.

Mirrors the zulia-tools CLI family (ZuliaExport/ZuliaImport/
ZuliaDump/ZuliaRestore: JSON-lines of stored documents plus the
index settings; Clear zulia_service.proto:295-300 drops all docs).
Spark writers do the heavy lifting — export is one ``write.json``
of the stored-document view, restore is ``read.json`` back into a
corpus a build can ingest.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from zuliasearch_spark.config import IndexConfig
from zuliasearch_spark.indexing.builder import IndexTables

SETTINGS_FILE = "index_settings.json"


def export_index(tables: IndexTables, out_dir: str) -> str:
    """Dump stored documents (doc_map view) as JSON-lines + settings."""
    os.makedirs(out_dir, exist_ok=True)
    tables.doc_map.write.mode("overwrite").json(os.path.join(out_dir, "documents"))
    with open(os.path.join(out_dir, SETTINGS_FILE), "w") as f:
        f.write(tables.config.to_json())
    return out_dir


def import_documents(spark: SparkSession, dump_dir: str) -> tuple[DataFrame, IndexConfig]:
    """Read a dump back: (documents DataFrame, IndexConfig)."""
    docs = spark.read.json(os.path.join(dump_dir, "documents"))
    with open(os.path.join(dump_dir, SETTINGS_FILE)) as f:
        cfg = IndexConfig.from_json(f.read())
    return docs, cfg


def clear_index(path: str) -> None:
    """Drop all index data under ``path`` (Clear,
    zulia_service.proto:295-300): segments, tables, manifest,
    tombstones. The directory itself remains (an empty index)."""
    if not os.path.isdir(path):
        return
    for entry in os.listdir(path):
        p = os.path.join(path, entry)
        if os.path.isdir(p):
            shutil.rmtree(p)
        else:
            os.remove(p)
