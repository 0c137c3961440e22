"""Data connector tests mirroring zulia-data's DataSourceTest,
JsonLineSourceTest, JsonArraySourceTest and NumberCSVWriterTest:
CSV/TSV roundtrips with headers and typed cells, header-only and
truly-empty inputs, extension/content-type detection, JSON-lines
malformed-line policy, and the delimited target's cell formatting
(numbers, booleans, dates, collections, nulls)."""

import os
import shutil
import tempfile

import pytest

from zuliasearch_spark.sources import (
    read_delimited,
    read_json_array,
    read_json_lines,
    read_spreadsheet,
    split_list_column,
    spreadsheet_type,
    write_delimited,
    write_json_lines,
)

import pyspark.sql.functions as F


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="zulia_sources_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write(path, text):
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)
    return path


# --- spreadsheet type detection (SpreadsheetType.getSpreadsheetType) ---


def test_spreadsheet_type_by_content_type():
    assert spreadsheet_type("whatever.bin", "text/csv") == "csv"
    assert spreadsheet_type("x", "text/tab-separated-values") == "tsv"
    assert (
        spreadsheet_type(
            "x",
            "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
        )
        == "xlsx"
    )


def test_spreadsheet_type_falls_back_to_extension_when_content_type_is_null():
    # DataSourceTest.spreadsheetTypeFallsBackToExtensionWhenContentTypeIsNull
    assert spreadsheet_type("data.csv", None) == "csv"
    assert spreadsheet_type("data.dat", None) is None


def test_spreadsheet_type_gzip_suffix():
    assert spreadsheet_type("dump.tsv.gz") == "tsv"
    assert spreadsheet_type("dump.gz") is None


# --- CSV / TSV sources (DataSourceTest) ---


def test_csv_roundtrip_with_headers(spark, tmpdir):
    # DataSourceTest.testCSV: write with headers, read back typed
    src = _write(os.path.join(tmpdir, "test.csv"), "header1,header2\nvalue1,1\nvalue3,1\n")
    df = read_delimited(spark, src, ",", headers=True)
    assert df.columns == ["header1", "header2"]
    rows = df.orderBy("header1").collect()
    assert len(rows) == 2
    assert rows[0]["header1"] == "value1" and rows[0]["header2"] == 1
    assert dict(df.dtypes)["header2"] == "int"


def test_header_only_csv_reads_zero_rows(spark, tmpdir):
    # emptySingleUseDelimitedSourceIteratesWithoutReopening
    src = _write(os.path.join(tmpdir, "test.csv"), "header1,header2\n")
    df = read_delimited(spark, src, ",", headers=True)
    assert df.columns == ["header1", "header2"]
    assert df.count() == 0


def test_truly_empty_csv_with_headers_raises(spark, tmpdir):
    # trulyEmptyDelimitedSourceWithHeadersThrowsIOException
    src = _write(os.path.join(tmpdir, "test.csv"), "")
    with pytest.raises(OSError, match="no header"):
        read_delimited(spark, src, ",", headers=True)


def test_tsv_parses_tabs_not_commas(spark, tmpdir):
    # tsvWithDefaultsParsesTabsNotCommas: embedded comma survives
    src = _write(os.path.join(tmpdir, "test.tsv"), "name\tcity\tage\nAlice\tPortland, OR\t34\n")
    df = read_spreadsheet(spark, src)
    r = df.collect()[0]
    assert r["name"] == "Alice"
    assert r["city"] == "Portland, OR"
    assert r["age"] == 34


def test_excel_stubs_clearly(spark, tmpdir):
    src = _write(os.path.join(tmpdir, "book.xlsx"), "not a real workbook")
    with pytest.raises((NotImplementedError, ValueError, ImportError, Exception)):
        read_spreadsheet(spark, src)


# --- JSON lines source (JsonLineSourceTest) ---

JSONL = (
    '{"id": "a", "count": 1, "ratio": 1.5, "active": true}\n'
    '{"id": "b", "count": 2, "ratio": 2.5, "active": false}\n'
    '{"id": "c", "count": 3, "ratio": 3.5, "active": true}\n'
)


def test_json_lines_parses_multiple_lines(spark, tmpdir):
    src = _write(os.path.join(tmpdir, "test.jsonl"), JSONL)
    df = read_json_lines(spark, src)
    rows = df.orderBy("id").collect()
    assert [r["id"] for r in rows] == ["a", "b", "c"]
    assert rows[0]["count"] == 1
    assert rows[1]["active"] is False


def test_json_numeric_getters_accept_any_number_type(spark, tmpdir):
    # numericGettersAcceptAnyJsonNumberType: a whole-number column is
    # readable as long/double/float/int via cast — no ClassCastException
    src = _write(
        os.path.join(tmpdir, "n.jsonl"),
        '{"count": 42, "big": 5000000000, "ratio": 2.5}\n',
    )
    df = read_json_lines(spark, src)
    r = df.select(
        F.col("count").cast("long").alias("l"),
        F.col("count").cast("double").alias("d"),
        F.col("count").cast("float").alias("f"),
        F.col("count").cast("int").alias("i"),
        F.col("big").cast("long").alias("bl"),
        F.col("ratio").cast("double").alias("rd"),
    ).collect()[0]
    assert (r["l"], r["d"], r["f"], r["i"]) == (42, 42.0, 42.0, 42)
    assert r["bl"] == 5_000_000_000
    assert r["rd"] == 2.5


def test_json_lines_skip_mode_drops_malformed(spark, tmpdir):
    # skipsMalformedLineWithoutLooping: the logging handler drops the
    # bad line and keeps the good ones
    src = _write(
        os.path.join(tmpdir, "bad.jsonl"),
        '{"id": "a"}\n{not valid json\n{"id": "c"}\n',
    )
    df = read_json_lines(spark, src, on_error="skip")
    assert sorted(r["id"] for r in df.select("id").collect()) == ["a", "c"]


def test_json_lines_fail_mode_raises(spark, tmpdir):
    # surfacesStreamErrorLoudlyByDefault: the default handler throws
    src = _write(
        os.path.join(tmpdir, "bad.jsonl"),
        '{"id": "a"}\n{not valid json\n{"id": "c"}\n',
    )
    with pytest.raises(Exception):
        read_json_lines(
            spark, src, on_error="fail", schema="id string"
        ).collect()


def test_json_lines_empty_source(spark, tmpdir):
    src = _write(os.path.join(tmpdir, "empty.jsonl"), "")
    assert read_json_lines(spark, src, schema="id string").count() == 0


def test_json_lines_bad_mode_rejected(spark, tmpdir):
    with pytest.raises(ValueError, match="on_error"):
        read_json_lines(spark, "x.jsonl", on_error="explode")


# --- JSON array source (JsonArraySourceTest) ---


def test_json_array_source(spark, tmpdir):
    src = _write(
        os.path.join(tmpdir, "arr.json"),
        '[{"id": "a", "n": 1}, {"id": "b", "n": 2}]',
    )
    df = read_json_array(spark, src)
    assert sorted((r["id"], r["n"]) for r in df.collect()) == [("a", 1), ("b", 2)]


# --- delimited target formatting (NumberCSVWriterTest + handlers) ---


def test_write_delimited_cell_formatting(spark, tmpdir):
    df = spark.createDataFrame(
        [
            (42, 5_000_000_000, 1.5, 2.5, True, ["x", None, "y"], None),
            (7, 3, None, None, None, None, "keep"),
        ],
        schema="i int, l bigint, f float, d double, b boolean, "
        "tags array<string>, s string",
    )
    out = os.path.join(tmpdir, "out")
    write_delimited(df, out, single_file=True)
    back = read_delimited(spark, out, ",", headers=True, infer_schema=False)
    rows = {r["i"]: r for r in back.collect()}
    r = rows["42"]
    # ints/longs verbatim; floats/doubles %.3f (NumberCSVWriterTest)
    assert r["l"] == "5000000000"
    assert r["f"] == "1.500" and r["d"] == "2.500"
    # booleans True/False (BooleanDelimitedWriter)
    assert r["b"] == "True"
    # collections joined by ';' with nulls as '' (DefaultDelimitedListHandler)
    assert r["tags"] == "x;;y"
    # nulls write empty cells that read back as NULL
    assert r["s"] is None
    r2 = rows["7"]
    assert r2["f"] is None and r2["b"] is None and r2["tags"] is None


def test_split_list_column_roundtrip(spark):
    df = spark.createDataFrame([("1;2;3",), (None,)], schema="cell string")
    out = df.select(split_list_column(F.col("cell"), "int").alias("xs")).collect()
    vals = sorted(
        (tuple(r["xs"]) if r["xs"] is not None else None for r in out),
        key=lambda v: (v is None, v or ()),
    )
    assert vals[0] == (1, 2, 3) and vals[1] is None


def test_split_list_column_rejects_unknown_type():
    with pytest.raises(ValueError, match="unsupported item type"):
        split_list_column(F.col("x"), "decimal")


# --- JSON lines target roundtrip ---


def test_json_lines_roundtrip(spark, tmpdir):
    df = spark.createDataFrame(
        [("a", 1, 1.5), ("b", 2, None)], schema="id string, n int, r double"
    )
    out = os.path.join(tmpdir, "jl")
    write_json_lines(df, out, single_file=True)
    back = read_json_lines(spark, out, schema="id string, n bigint, r double")
    rows = sorted(back.collect(), key=lambda r: r["id"])
    assert [(r["id"], r["n"], r["r"]) for r in rows] == [("a", 1, 1.5), ("b", 2, None)]
