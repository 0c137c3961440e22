"""Legacy binary .xls (BIFF8-in-CFB) codec — sources/xls.py.

Round-trips through our own writer plus hand-assembled BIFF streams
for the record types the writer doesn't emit (RK/MULRK packed
numbers, date-formatted XFs, the 1904 date system, LABEL inline
strings, FORMULA cached results) — the surfaces a real
Excel-97-2003 file produced by POI/Excel exercises
(reference: zulia-data ExcelSource via WorkbookFactory,
SpreadsheetSourceFactory.java:95).
"""

import datetime as dt
import os
import struct

import pytest

from zuliasearch_spark.sources import (
    read_xls,
    read_xlsx,
    write_xls,
    write_xls_sheets,
    write_xlsx,
    xls_sheet_names,
)
from zuliasearch_spark.sources import xls as X


def _mk_typed_df(spark):
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
        (1, 'plain "quoted" text', 3.25, True,
         dt.date(2024, 5, 17), dt.datetime(2024, 5, 17, 9, 30, 15), ["a", "b"]),
        (2, None, -0.5, False, None, None, ["x", None, "z"]),
        (3, "third", 1e300, None, dt.date(1999, 1, 2), None, None),
    ]
    return spark.createDataFrame(rows, schema)


def test_xls_roundtrip_typed_cells(spark, tmpdir):
    path = os.path.join(tmpdir, "typed.xls")
    write_xls(_mk_typed_df(spark), path)
    back = read_xls(spark, path)
    assert back.columns == ["id", "name", "score", "flag", "day", "ts", "tags"]
    got = {r["id"]: r.asDict() for r in back.collect()}
    types = dict(back.dtypes)
    assert types["id"] == "bigint" and types["score"] == "double"
    assert types["flag"] == "boolean"
    assert got[1]["name"] == 'plain "quoted" text'
    assert got[1]["score"] == 3.25 and got[3]["score"] == 1e300
    assert got[1]["day"] == "2024-05-17"
    assert got[1]["ts"] == "2024-05-17T09:30:15"
    assert got[1]["tags"] == "a;b" and got[2]["tags"] == "x;;z"
    assert got[2]["name"] is None and got[3]["flag"] is None


def test_xls_matches_xlsx_semantics(spark, tmpdir):
    """The two Excel flavors must read back IDENTICALLY (the
    reference serves both through one ExcelSource)."""
    df = _mk_typed_df(spark)
    p_old = os.path.join(tmpdir, "twin.xls")
    p_new = os.path.join(tmpdir, "twin.xlsx")
    write_xls(df, p_old)
    write_xlsx(df, p_new)
    a = [tuple(r) for r in read_xls(spark, p_old).collect()]
    b = [tuple(r) for r in read_xlsx(spark, p_new).collect()]
    assert a == b
    assert read_xls(spark, p_old).dtypes == read_xlsx(spark, p_new).dtypes


def test_xls_multi_sheet_and_switch(spark, tmpdir):
    a = spark.createDataFrame([("k1", 1)], "k string, v long")
    b = spark.createDataFrame([(10,), (20,)], "n long")
    path = os.path.join(tmpdir, "multi.xls")
    write_xls_sheets({"alpha": a, "beta": b}, path)
    assert xls_sheet_names(path) == ["alpha", "beta"]
    assert read_xls(spark, path, sheet=1).count() == 2
    assert [r["n"] for r in read_xls(spark, path, sheet="beta").collect()] == [10, 20]
    assert read_xls(spark, path, sheet="active").columns == ["k", "v"]
    with pytest.raises(ValueError, match="gamma"):
        read_xls(spark, path, sheet="gamma")


def test_xls_no_headers_and_empty(spark, tmpdir):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "x long, y string")
    path = os.path.join(tmpdir, "nohdr.xls")
    write_xls(df, path, headers=False)
    back = read_xls(spark, path, headers=False)
    assert back.columns == ["_c0", "_c1"]
    assert back.count() == 2
    empty = os.path.join(tmpdir, "empty.xls")
    write_xls(df.limit(0), empty, headers=False)
    with pytest.raises(OSError):
        read_xls(spark, empty, headers=True)
    hdr_only = os.path.join(tmpdir, "hdr.xls")
    write_xls(df.limit(0), hdr_only, headers=True)
    out = read_xls(spark, hdr_only, headers=True)
    assert out.columns == ["x", "y"] and out.count() == 0


def test_xls_sst_continue_spill(spark, tmpdir):
    """>8224 bytes of shared strings force CONTINUE records; long
    strings split mid-character-array and restate the flag byte."""
    rows = [(i, "s%04d_" % i + "x" * 700) for i in range(40)]
    df = spark.createDataFrame(rows, "i long, s string")
    path = os.path.join(tmpdir, "big.xls")
    write_xls(df, path)
    back = {r["i"]: r["s"] for r in read_xls(spark, path).collect()}
    assert len(back) == 40
    assert all(back[i] == "s%04d_" % i + "x" * 700 for i in range(40))


def test_xls_unicode_strings(spark, tmpdir):
    df = spark.createDataFrame([(1, "grüße 日本語 ω")], "i long, s string")
    path = os.path.join(tmpdir, "uni.xls")
    write_xls(df, path)
    assert read_xls(spark, path).head()["s"] == "grüße 日本語 ω"


def _wrap_sheet(cells: bytes, n_xf_extra: bytes = b"", date1904: bool = False) -> bytes:
    """Hand-assemble a one-sheet workbook stream: globals (with any
    extra XF/FORMAT records appended) + sheet substream."""
    prefix = X._globals_prefix() + n_xf_extra + X._sst_bytes([])
    bs_name = b"S"
    bs_len = 4 + 4 + 2 + 2 + len(bs_name)
    globals_len = len(prefix) + bs_len + 4
    bound = X._rec(0x0085, struct.pack("<IH", globals_len, 0) + bytes([1, 0]) + bs_name)
    sheet = (
        X._rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
        + cells
        + X._rec(0x000A, b"")
    )
    stream = prefix + bound + X._rec(0x000A, b"") + sheet
    if date1904:
        stream = stream.replace(
            X._rec(0x0022, struct.pack("<H", 0)), X._rec(0x0022, struct.pack("<H", 1)), 1
        )
    return stream


def _write_cfb(tmpdir, name: str, stream: bytes) -> str:
    path = os.path.join(tmpdir, name)
    with open(path, "wb") as fh:
        fh.write(X._cfb_wrap(stream))
    return path


def test_xls_rk_mulrk_and_dates(spark, tmpdir):
    """Records our writer never emits but real files use: RK packed
    numbers (int, /100, truncated-double shapes), MULRK runs, and a
    NUMBER cell whose XF points at the builtin date format 14."""
    ixfe_general = X._N_STYLE_XFS
    ixfe_date = X._N_STYLE_XFS + 1  # appended date XF (ifmt 14)
    date_xf = X._rec(0x00E0, struct.pack("<HHHH", 0, 14, 0x0001, 0) + b"\x00" * 12)

    def rk_int(v: int) -> int:
        return ((v << 2) | 0x02) & 0xFFFFFFFF

    def rk_cents(v: int) -> int:  # value/100 with the mul flag
        return ((v << 2) | 0x03) & 0xFFFFFFFF

    def rk_double(x: float) -> int:
        top = struct.unpack("<Q", struct.pack("<d", x))[0] >> 32
        return top & 0xFFFFFFFC

    cells = b""
    # header row
    for col, h in enumerate((b"a", b"b", b"c", b"d")):
        cells += X._rec(0x0204, struct.pack("<HHH", 0, col, ixfe_general)
                        + struct.pack("<HB", 1, 0) + h)
    cells += X._rec(0x027E, struct.pack("<HHHI", 1, 0, ixfe_general, rk_int(123)))
    cells += X._rec(0x027E, struct.pack("<HHHI", 1, 1, ixfe_general, rk_cents(250)))
    cells += X._rec(0x027E, struct.pack("<HHHI", 1, 2, ixfe_general, rk_double(0.75)))
    # serial 45429 = 2024-05-17 under the 1900 system
    cells += X._rec(0x0203, struct.pack("<HHH", 1, 3, ixfe_date) + struct.pack("<d", 45429.0))
    # MULRK row: three packed ints in one record
    cells += X._rec(
        0x00BD,
        struct.pack("<HH", 2, 0)
        + b"".join(struct.pack("<HI", ixfe_general, rk_int(v)) for v in (7, 8, 9))
        + struct.pack("<H", 2),
    )
    path = _write_cfb(tmpdir, "rk.xls", _wrap_sheet(cells, n_xf_extra=date_xf))
    back = read_xls(spark, path)
    rows = [tuple(r) for r in back.collect()]
    assert rows[0][:3] == (123, 2.5, 0.75)
    assert rows[0][3] == "2024-05-17"
    assert rows[1][:3] == (7, 8, 9)


def test_xls_1904_date_system(spark, tmpdir):
    """DATEMODE=1 shifts the serial epoch to 1904 (serial s renders
    as s+1462 under the 1900 decoder)."""
    ixfe_date = X._N_STYLE_XFS + 1
    date_xf = X._rec(0x00E0, struct.pack("<HHHH", 0, 14, 0x0001, 0) + b"\x00" * 12)
    cells = X._rec(0x0204, struct.pack("<HHH", 0, 0, X._N_STYLE_XFS)
                   + struct.pack("<HB", 1, 0) + b"d")
    # serial 100 in the 1904 system = 1904-04-10
    cells += X._rec(0x0203, struct.pack("<HHH", 1, 0, ixfe_date) + struct.pack("<d", 100.0))
    path = _write_cfb(
        tmpdir, "d1904.xls", _wrap_sheet(cells, n_xf_extra=date_xf, date1904=True)
    )
    assert read_xls(spark, path).head()["d"] == "1904-04-10"


def test_xls_formula_cached_results(spark, tmpdir):
    """FORMULA cells read their cached result: numeric inline, string
    via the following STRING record, boolean via the special value."""
    g = X._N_STYLE_XFS
    cells = b""
    for col, h in enumerate((b"n", b"s", b"b")):
        cells += X._rec(0x0204, struct.pack("<HHH", 0, col, g)
                        + struct.pack("<HB", 1, 0) + h)
    cells += X._rec(0x0006, struct.pack("<HHH", 1, 0, g) + struct.pack("<d", 6.5)
                    + b"\x00\x00\x00\x00\x00\x00")
    str_result = struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 0, 0xFF, 0xFF)
    cells += X._rec(0x0006, struct.pack("<HHH", 1, 1, g) + str_result + b"\x00" * 6)
    cells += X._rec(0x0207, struct.pack("<HB", 2, 0) + b"ok")
    bool_result = struct.pack("<BBBBBBBB", 1, 0, 1, 0, 0, 0, 0xFF, 0xFF)
    cells += X._rec(0x0006, struct.pack("<HHH", 1, 2, g) + bool_result + b"\x00" * 6)
    path = _write_cfb(tmpdir, "formula.xls", _wrap_sheet(cells))
    row = read_xls(spark, path).head()
    assert row["n"] == 6.5 and row["s"] == "ok" and row["b"] is True


def test_xls_row_cap(spark, tmpdir):
    import pandas as pd

    big = spark.createDataFrame(pd.DataFrame({"x": range(65600)}))
    with pytest.raises(ValueError, match="65,536"):
        write_xls(big, os.path.join(tmpdir, "cap.xls"))


def test_xls_rejects_non_cfb(tmpdir):
    p = os.path.join(tmpdir, "fake.xls")
    with open(p, "wb") as fh:
        fh.write(b"not a compound file at all")
    with pytest.raises(ValueError, match="CFB signature"):
        X._workbook_stream(p)


def test_xls_large_stream_multi_sector_fat(spark, tmpdir):
    """A workbook stream past 64 KB needs MULTIPLE FAT sectors in the
    compound container (the r5 gate at sf0.1 tripped a single-sector
    assumption): 3k rows round-trip losslessly."""
    rows = [(i, f"row_{i}_" + "abcdefghij" * 4, float(i) / 8) for i in range(3000)]
    df = spark.createDataFrame(rows, "i long, s string, x double")
    path = os.path.join(tmpdir, "large.xls")
    write_xls(df, path)
    assert os.path.getsize(path) > 64 * 1024
    back = read_xls(spark, path)
    assert back.count() == 3000
    got = {r["i"]: (r["s"], r["x"]) for r in back.collect()}
    assert got[2999] == ("row_2999_" + "abcdefghij" * 4, 2999 / 8)
    assert got[0] == ("row_0_" + "abcdefghij" * 4, 0.0)
