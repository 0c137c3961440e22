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


# --- Excel .xlsx source/target (ExcelSource/ExcelTarget via stdlib) ---


def _mk_typed_df(spark):
    import datetime as dt

    from pyspark.sql.types import (
        ArrayType, BooleanType, DateType, DoubleType, LongType,
        StringType, StructField, StructType, TimestampType,
    )

    schema = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
        StructField("flag", BooleanType()),
        StructField("day", DateType()),
        StructField("ts", TimestampType()),
        StructField("tags", ArrayType(StringType())),
    ])
    rows = [
        (1, 'plain "quoted" <xml&>', 3.25, True,
         dt.date(2024, 5, 17), dt.datetime(2024, 5, 17, 9, 30, 15), ["a", "b"]),
        (2, None, -0.5, False, None, None, ["x", None, "z"]),
        (3, "third", 1e300, None, dt.date(1999, 1, 2), None, None),
    ]
    return spark.createDataFrame(rows, schema)


def test_xlsx_roundtrip_typed_cells(spark, tmpdir):
    # ExcelTarget typed cell handlers -> ExcelSource typed read:
    # numbers stay numeric (exact doubles), booleans stay boolean,
    # dates/timestamps come back as the DateCellHandler ISO strings,
    # collections as list-delimited strings, nulls as null cells.
    from zuliasearch_spark.sources import read_xlsx, write_xlsx

    path = os.path.join(tmpdir, "typed.xlsx")
    write_xlsx(_mk_typed_df(spark), path)
    back = read_xlsx(spark, path)
    assert back.columns == ["id", "name", "score", "flag", "day", "ts", "tags"]
    got = {r["id"]: r.asDict() for r in back.collect()}
    assert dict(back.dtypes)["id"] == "bigint"
    assert dict(back.dtypes)["score"] == "double"
    assert dict(back.dtypes)["flag"] == "boolean"
    assert got[1]["name"] == 'plain "quoted" <xml&>'
    assert got[1]["score"] == 3.25 and got[3]["score"] == 1e300
    assert got[1]["flag"] is True and got[2]["flag"] is False and got[3]["flag"] is None
    assert got[1]["day"] == "2024-05-17"
    assert got[1]["ts"] == "2024-05-17T09:30:15"
    assert got[1]["tags"] == "a;b" and got[2]["tags"] == "x;;z" and got[3]["tags"] is None
    assert got[2]["name"] is None


def test_xlsx_multi_sheet_and_switch(spark, tmpdir):
    # ExcelTarget.newSheet + ExcelSource.switchSheet(index|name) and
    # the unknown-name IllegalArgumentException
    from zuliasearch_spark.sources import (
        read_xlsx, write_xlsx_sheets, xlsx_sheet_names,
    )

    path = os.path.join(tmpdir, "multi.xlsx")
    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(10,), (20,)], "n long")
    write_xlsx_sheets({"alpha": a, "beta": b}, path)
    assert xlsx_sheet_names(path) == ["alpha", "beta"]
    assert read_xlsx(spark, path, sheet=1).count() == 2
    assert [r["n"] for r in read_xlsx(spark, path, sheet="beta").collect()] == [10, 20]
    assert read_xlsx(spark, path, sheet="active").columns == ["k", "v"]
    with pytest.raises(ValueError, match="No sheet named"):
        read_xlsx(spark, path, sheet="gamma")


def test_xlsx_no_headers_and_empty(spark, tmpdir):
    from zuliasearch_spark.sources import read_xlsx, write_xlsx

    path = os.path.join(tmpdir, "nohdr.xlsx")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "x long, y string")
    write_xlsx(df, path, headers=False)
    back = read_xlsx(spark, path, headers=False)
    assert back.columns == ["_c0", "_c1"]
    assert back.count() == 2

    # truly-empty sheet with headers=True raises like ExcelSource /
    # the delimited trulyEmpty contract
    empty = os.path.join(tmpdir, "empty.xlsx")
    write_xlsx(df.limit(0), empty, headers=False)
    with pytest.raises(OSError):
        read_xlsx(spark, empty, headers=True)
    # headers written + zero data rows iterates to 0 rows
    hdr_only = os.path.join(tmpdir, "hdronly.xlsx")
    write_xlsx(df.limit(0), hdr_only, headers=True)
    out = read_xlsx(spark, hdr_only, headers=True)
    assert out.columns == ["x", "y"] and out.count() == 0


def test_xlsx_shared_strings_and_date_styles(spark, tmpdir):
    # Files from other producers use sharedStrings + date-styled
    # numeric cells (POI writes these); craft one by hand and check
    # the DefaultExcelCellHandler-equivalent decode: shared string
    # lookup, rich-text concatenation, serial->ISO for date styles.
    import zipfile

    from zuliasearch_spark.sources import read_xlsx

    path = os.path.join(tmpdir, "foreign.xlsx")
    ct = (
        '<?xml version="1.0"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        "</Types>"
    )
    wb = (
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    sst = (
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">'
        "<si><t>hdr</t></si><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>"
    )
    styles = (
        '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14"/></cellXfs></styleSheet>'
    )
    sheet = (
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>1</v></c></row>'
        '<row r="3"><c r="A3" s="1"><v>45429</v></c></row>'
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr(
            "_rels/.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>',
        )
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/styles.xml", styles)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    got = [r["hdr"] for r in read_xlsx(spark, path).collect()]
    assert got == ["rich", "2024-05-17"]


def test_xlsx_row_cap_enforced(spark, tmpdir):
    from zuliasearch_spark.sources.xlsx import EXCEL_MAX_ROWS
    assert EXCEL_MAX_ROWS == 1_048_576  # SpreadsheetVersion.EXCEL2007


def test_read_spreadsheet_dispatches_xlsx(spark, tmpdir):
    from zuliasearch_spark.sources import write_xlsx

    path = os.path.join(tmpdir, "disp.xlsx")
    write_xlsx(spark.createDataFrame([(5, "q")], "a long, b string"), path)
    df = read_spreadsheet(spark, path)
    assert df.columns == ["a", "b"] and df.count() == 1
    # legacy .xls dispatches to the BIFF8 codec (r5: sources/xls.py)
    from zuliasearch_spark.sources import write_xls

    old = os.path.join(tmpdir, "old.xls")
    write_xls(spark.createDataFrame([(7, "w")], "a long, b string"), old)
    df2 = read_spreadsheet(spark, old)
    assert df2.columns == ["a", "b"] and df2.count() == 1


def test_xlsx_blank_rows_bools_and_huge_numbers(spark, tmpdir):
    """The 5.3.x spreadsheet robustness fixes: a blank <row/> reads as
    an all-empty record (not an error), boolean cells survive typed,
    very large whole numbers keep their value (no clamp to
    Long.MAX_VALUE), and a missing trailing cell reads as NULL."""
    import zipfile

    from zuliasearch_spark.sources import read_xlsx

    path = os.path.join(tmpdir, "edges.xlsx")
    ct = (
        '<?xml version="1.0"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        "</Types>"
    )
    wb = (
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    sheet = (
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>name</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>flag</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t>n</t></is></c></row>'
        '<row r="2"><c r="A2" t="inlineStr"><is><t>x</t></is></c>'
        '<c r="B2" t="b"><v>1</v></c><c r="C2"><v>92233720368547758070000</v></c></row>'
        '<row r="3"/>'
        '<row r="4"><c r="A4" t="inlineStr"><is><t>y</t></is></c>'
        '<c r="B4" t="b"><v>0</v></c></row>'
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    df = read_xlsx(spark, path)
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0]["flag"] is True and rows[2]["flag"] is False
    assert rows[0]["n"] == pytest.approx(9.223372036854776e22)
    # blank <row/> -> all-empty record; missing trailing cell -> NULL
    assert rows[1]["name"] is None and rows[1]["flag"] is None and rows[1]["n"] is None
    assert rows[2]["n"] is None
    assert dict(df.dtypes)["flag"] == "boolean"
