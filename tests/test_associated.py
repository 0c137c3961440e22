"""Associated-file blob storage, mirroring the reference's
GeneralFeaturesTest associated-document scenarios (store per doc,
FetchAllAssociated, fetch by filename, FULL/META/NONE shaping,
delete one file / deleteAllAssociated / DeleteFull) and the
FileStorageTest store-replace semantics."""

import os
import shutil
import tempfile

import pytest

from zuliasearch_spark.indexing.associated import AssociatedStore


@pytest.fixture()
def store(spark):
    # GeneralFeaturesTest.index(): doc 1 has notes.txt; doc 2 has
    # notes.txt and summary.txt
    s = AssociatedStore.empty(spark)
    s = s.store("1", "notes.txt", "Java is great")
    s = s.store("2", "notes.txt", "Python is easy", meta={"kind": "note"})
    s = s.store("2", "summary.txt", "A beginner guide")
    return s


def test_fetch_all_counts(store):
    assert store.count("1") == 1
    assert store.count("2") == 2
    assert store.count("3") == 0  # empty list, not an error
    assert store.count() == 3


def test_fetch_full_content_roundtrip(store):
    rows = store.fetch_all("2").orderBy("filename").collect()
    assert [r["filename"] for r in rows] == ["notes.txt", "summary.txt"]
    assert bytes(rows[0]["content"]).decode() == "Python is easy"
    assert rows[0]["meta"]["kind"] == "note"


def test_fetch_by_filename(store):
    # batch fetch associated by specific filename: both docs have notes.txt
    got = store.fetch_for(["1", "2"], filename="notes.txt").collect()
    assert sorted(r["uniqueId"] for r in got) == ["1", "2"]
    assert all(r["filename"] == "notes.txt" for r in got)


def test_fetch_type_shapes(store):
    # META drops the binary column (pruned scan); NONE is names only
    meta = store.fetch_all("2", "META")
    assert "content" not in meta.columns and "meta" in meta.columns
    none = store.fetch_all("2", "NONE")
    assert set(none.columns) == {"uniqueId", "filename"}
    with pytest.raises(ValueError, match="fetch_type"):
        store.fetch_all("2", "EVERYTHING")


def test_store_replaces_same_key(store):
    # re-storing (uniqueId, filename) replaces the content
    s2 = store.store("1", "notes.txt", "restored notes")
    assert s2.count("1") == 1
    got = s2.fetch("1", "notes.txt").collect()[0]
    assert bytes(got["content"]).decode() == "restored notes"


def test_delete_single_file_keeps_others(store):
    # batchDeleteTest: delete summary.txt from doc 2; notes.txt stays
    s2 = store.delete_file("2", "summary.txt")
    assert s2.filenames("2") == ["notes.txt"]
    assert s2.count("1") == 1  # other docs untouched


def test_delete_all_associated(store):
    # setDeleteAllAssociated(true): doc 1 loses its files, doc 2 keeps
    s2 = store.delete_all("1")
    assert s2.count("1") == 0
    assert s2.count("2") == 2


def test_delete_full_many(store):
    s2 = store.delete_all(["1", "2"])
    assert s2.count() == 0


def test_parquet_roundtrip(spark, store):
    d = tempfile.mkdtemp(prefix="zulia_assoc_")
    try:
        store.write(os.path.join(d, "assoc"))
        back = AssociatedStore.read(spark, os.path.join(d, "assoc"))
        assert back.count() == 3
        got = back.fetch("2", "summary.txt").collect()[0]
        assert bytes(got["content"]).decode() == "A beginner guide"
    finally:
        shutil.rmtree(d, ignore_errors=True)
