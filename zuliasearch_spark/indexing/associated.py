"""Associated-file blob storage — the reference's DocumentStorage
(MongoDocumentStorage GridFS / FileDocumentStorage filesystem
backends; client surface AssociatedBuilder / FetchAllAssociated /
BatchDeleteGroupBuilder setFilename/setDeleteAllAssociated,
exercised by GeneralFeaturesTest.batchFetchGroupTest and
.batchDeleteTest, FileStorageTest, FileDocumentStorageTest).

Spark-first, the store is ONE DataFrame keyed (uniqueId, filename):

    uniqueId string, filename string, content binary,
    meta map<string,string>, ts timestamp

updated functionally the way the index upserts documents —
``union(new, old ANTI-JOIN new-keys)`` — so every mutation is one
narrow plan, no driver-side record loop. Fetch shapes follow
FetchType (zulia_query.proto FetchType FULL/META/NONE): FULL
projects content + meta, META drops the (potentially huge) binary
column so the scan never reads it (column pruning — check
ReadSchema), NONE returns filenames only.

Scale notes (100 TB lens): content lives in a parquet binary column;
fetches by uniqueId are predicate-pushed scans; deletes/upserts are
broadcast anti-joins against a tiny key set. For blobs past a few
MB each, store an object-store URI in ``meta`` and keep ``content``
null — the plumbing is identical, and parquet row groups stay
balanced.
"""

from __future__ import annotations

import datetime as _dt

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

ASSOCIATED_SCHEMA = (
    "uniqueId string, filename string, content binary, "
    "meta map<string,string>, ts timestamp"
)

_FETCH_TYPES = ("FULL", "META", "NONE")


class AssociatedStore:
    """Immutable-DataFrame blob store; every mutation returns the
    store with a new underlying frame (callers keep one store object;
    the frame swap is internal, mirroring how the reference's storage
    is shared per index)."""

    def __init__(self, df: DataFrame):
        self._df = df

    # --- constructors -------------------------------------------------

    @classmethod
    def empty(cls, spark: SparkSession) -> "AssociatedStore":
        return cls(spark.createDataFrame([], schema=ASSOCIATED_SCHEMA))

    @classmethod
    def read(cls, spark: SparkSession, path: str) -> "AssociatedStore":
        return cls(spark.read.parquet(path))

    def write(self, path: str) -> None:
        self._df.write.mode("overwrite").parquet(path)

    @property
    def df(self) -> DataFrame:
        return self._df

    # --- store (upsert by uniqueId+filename) --------------------------

    def store(self, unique_id: str, filename: str, content: bytes | str,
              meta: dict[str, str] | None = None) -> "AssociatedStore":
        """Store/replace ONE associated file (AssociatedBuilder
        .setFilename/.setDocument; storing again under the same
        (uniqueId, filename) replaces, like GridFS upload semantics
        in MongoDocumentStorage)."""
        if isinstance(content, str):
            content = content.encode("utf-8")
        spark = self._df.sparkSession
        row = [(str(unique_id), str(filename), content, meta or {},
                _dt.datetime.now(tz=_dt.timezone.utc).replace(tzinfo=None))]
        return self.store_df(spark.createDataFrame(row, schema=ASSOCIATED_SCHEMA))

    def store_df(self, new: DataFrame) -> "AssociatedStore":
        """Bulk upsert: incoming rows replace same-key rows —
        one broadcast anti-join, the same shape as the index's
        replace-by-uniqueId upsert."""
        keys = new.select("uniqueId", "filename").distinct()
        kept = self._df.join(F.broadcast(keys), ["uniqueId", "filename"], "left_anti")
        cols = ["uniqueId", "filename", "content", "meta", "ts"]
        return AssociatedStore(kept.select(cols).unionByName(new.select(cols)))

    # --- fetch ---------------------------------------------------------

    def _shape(self, df: DataFrame, fetch_type: str) -> DataFrame:
        if fetch_type not in _FETCH_TYPES:
            raise ValueError(f"fetch_type must be one of {_FETCH_TYPES}, got {fetch_type!r}")
        if fetch_type == "FULL":
            return df.select("uniqueId", "filename", "content", "meta", "ts")
        if fetch_type == "META":
            # binary column pruned from the scan entirely
            return df.select("uniqueId", "filename", "meta", "ts")
        return df.select("uniqueId", "filename")

    def fetch_all(self, unique_id: str, fetch_type: str = "FULL") -> DataFrame:
        """Every associated file of a document (FetchAllAssociated).
        A doc without associated files returns an empty frame, not an
        error (GeneralFeaturesTest: empty associated list)."""
        return self._shape(
            self._df.where(F.col("uniqueId") == str(unique_id)), fetch_type
        )

    def fetch(self, unique_id: str, filename: str, fetch_type: str = "FULL") -> DataFrame:
        """One associated file by name (Fetch setFilename)."""
        return self._shape(
            self._df.where(
                (F.col("uniqueId") == str(unique_id))
                & (F.col("filename") == str(filename))
            ),
            fetch_type,
        )

    def fetch_for(self, unique_ids, fetch_type: str = "FULL",
                  filename: str | None = None) -> DataFrame:
        """Batch fetch (BatchFetchGroupBuilder setAssociatedFetchType
        / setFilename): associated files for many docs in ONE scan —
        a broadcast semi-join on the id list, optionally filtered to
        a single filename."""
        spark = self._df.sparkSession
        ids = spark.createDataFrame([(str(u),) for u in unique_ids], "uniqueId string")
        got = self._df.join(F.broadcast(ids), "uniqueId", "left_semi")
        if filename is not None:
            got = got.where(F.col("filename") == filename)
        return self._shape(got, fetch_type)

    def filenames(self, unique_id: str) -> list[str]:
        return [
            r["filename"]
            for r in self.fetch_all(unique_id, "NONE").orderBy("filename").collect()
        ]

    # --- delete ----------------------------------------------------------

    def delete_file(self, unique_id: str, filename: str) -> "AssociatedStore":
        """Delete one associated file, keep the document and its other
        files (BatchDeleteGroupBuilder setDeleteDocument(false)
        .setFilename — GeneralFeaturesTest.batchDeleteTest)."""
        return AssociatedStore(
            self._df.where(
                ~(
                    (F.col("uniqueId") == str(unique_id))
                    & (F.col("filename") == str(filename))
                )
            )
        )

    def delete_all(self, unique_ids) -> "AssociatedStore":
        """Delete every associated file of the given docs
        (setDeleteAllAssociated(true), and the associated half of
        DeleteFull — pair with SearchEngine.delete_by_unique_ids for
        full-delete semantics)."""
        if isinstance(unique_ids, str):
            unique_ids = [unique_ids]
        spark = self._df.sparkSession
        ids = spark.createDataFrame([(str(u),) for u in unique_ids], "uniqueId string")
        return AssociatedStore(self._df.join(F.broadcast(ids), "uniqueId", "left_anti"))

    def count(self, unique_id: str | None = None) -> int:
        df = self._df
        if unique_id is not None:
            df = df.where(F.col("uniqueId") == str(unique_id))
        return df.count()
