"""Data connectors — the reference's zulia-data sources/targets
(JSON-lines, JSON-array, CSV/TSV delimited, Excel) re-expressed over
Spark's native distributed readers and writers.

The reference streams files record-at-a-time through handler
pipelines (JsonLineDataSource, DelimitedSource/Target,
SpreadsheetSourceFactory — zulia-data/src/main/java/io/zulia/data/).
Spark-first, each connector is a `spark.read` / `df.write` call:
scans parallelize per file split, schema inference replaces the
typed per-cell getters (SpreadsheetRecord.getInt/getString;
JsonSourceRecord numeric getters accept any JSON number type — a
bigint column casts to int/long/float/double the same way), and
malformed-record policy maps onto Spark read modes:

- ThrowingJsonLineParseExceptionHandler (default)  -> FAILFAST
- LoggingJsonLineParseExceptionHandler (skip bad)  -> DROPMALFORMED
- keep-with-corruption-column                       -> PERMISSIVE

Cell-formatting on write mirrors the delimited target's handler set
(formatter/*.java): ints/longs verbatim, floats/doubles fixed
decimal places (NumberCSVWriter, default 3), booleans "True"/"False"
(BooleanDelimitedWriter), dates ISO-8601 (DateCSVWriter),
collections joined by a list delimiter with nulls as ""
(CollectionDelimitedWriter + DefaultDelimitedListHandler), null
cells empty. All formatting is Catalyst column expressions — no
Python in the row path.

At 100 TB these wrappers inherit Spark's scan parallelism, column
pruning and (for parquet-ized downstream stages) predicate pushdown;
the reference's single-threaded stream iterators have no equivalent
scale path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_CONTENT_TYPES = {
    "text/csv": "csv",
    "text/tab-separated-values": "tsv",
    "application/vnd.ms-excel": "xls",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet": "xlsx",
}
_EXTENSIONS = {"csv", "tsv", "xls", "xlsx"}


def spreadsheet_type(filename: str | None, content_type: str | None = None) -> str | None:
    """Detect the spreadsheet flavor: content-type first, then the
    file extension (gzip-suffix aware) — SpreadsheetType
    .getSpreadsheetType (zulia-data SpreadsheetType.java), including
    the null-content-type fallback DataSourceTest
    .spreadsheetTypeFallsBackToExtensionWhenContentTypeIsNull covers.
    Returns "csv" | "tsv" | "xls" | "xlsx" | None."""
    if content_type:
        got = _CONTENT_TYPES.get(content_type.lower())
        if got:
            return got
    if not filename:
        return None
    name = filename.lower()
    if name.endswith(".gz"):
        name = name[:-3]
    ext = name.rsplit(".", 1)[-1] if "." in name else ""
    return ext if ext in _EXTENSIONS else None


_JSON_MODES = {"fail": "FAILFAST", "skip": "DROPMALFORMED", "keep": "PERMISSIVE"}


def read_json_lines(
    spark: SparkSession,
    path: str,
    on_error: str = "fail",
    schema: str | None = None,
) -> DataFrame:
    """JSON-lines source (JsonLineDataSource.withDefaults/withConfig).

    ``on_error``: "fail" raises on the first malformed line (the
    default ThrowingJsonLineParseExceptionHandler —
    JsonLineSourceTest.surfacesStreamErrorLoudlyByDefault); "skip"
    drops malformed lines and keeps iterating (the logging handler —
    .skipsMalformedLineWithoutLooping); "keep" retains them in a
    ``_corrupt_record`` column. An explicit ``schema`` (DDL string)
    skips the inference pass — at scale always pass one: inference
    reads the data twice."""
    mode = _JSON_MODES.get(on_error)
    if mode is None:
        raise ValueError(f"on_error must be one of {sorted(_JSON_MODES)}, got {on_error!r}")
    reader = spark.read.option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if mode == "DROPMALFORMED" and "_corrupt_record" in df.columns:
        # inferred schemas keep the corrupt column; the skip contract
        # is "bad lines vanish" (the logging handler returns null and
        # the caller filters)
        df = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return df


def read_json_array(
    spark: SparkSession, path: str, on_error: str = "fail", schema: str | None = None
) -> DataFrame:
    """JSON-array source (JsonArrayDataSource): one top-level JSON
    array per file; each element becomes a row. Spark's multiLine
    reader parses whole files — one task per file, so shard large
    exports into many files (the reference streams elements off one
    parser for the same reason)."""
    mode = _JSON_MODES.get(on_error)
    if mode is None:
        raise ValueError(f"on_error must be one of {sorted(_JSON_MODES)}, got {on_error!r}")
    reader = spark.read.option("multiLine", "true").option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_delimited(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    headers: bool = True,
    infer_schema: bool = True,
    schema: str | None = None,
) -> DataFrame:
    """Delimited source (CSVSource / TSVSource, DelimitedSource
    iteration): first line = headers when ``headers``; typed access
    comes from schema inference (SpreadsheetRecord.getInt/getString →
    typed columns). TSV callers pass delimiter="\\t" — the tab, not a
    comma (DataSourceTest.tsvWithDefaultsParsesTabsNotCommas pinned
    that copy-paste bug in the reference).

    A headered read of a zero-byte file raises like the reference's
    IOException (DataSourceTest
    .trulyEmptyDelimitedSourceWithHeadersThrowsIOException); a
    header-only file yields 0 rows with the header columns
    (.emptySingleUseDelimitedSourceIteratesWithoutReopening)."""
    reader = (
        spark.read.option("header", str(headers).lower())
        .option("sep", delimiter)
        .option("quote", '"')
        .option("escape", '"')
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    if headers and not df.columns:
        raise OSError(f"delimited source {path} has no header line")
    return df


def read_spreadsheet(
    spark: SparkSession,
    path: str,
    headers: bool = True,
    content_type: str | None = None,
) -> DataFrame:
    """Extension-dispatched spreadsheet source
    (SpreadsheetSourceFactory.fromStreamWithHeaders): csv/tsv go to
    the delimited reader; xlsx to the stdlib SpreadsheetML reader
    (sources/xlsx.py); legacy binary .xls to the pure-stdlib
    BIFF8/CFB codec (sources/xls.py) — the reference serves both
    Excel flavors through POI's WorkbookFactory."""
    kind = spreadsheet_type(path, content_type)
    if kind is None:
        raise ValueError(f"cannot detect spreadsheet type for {path!r}")
    if kind == "csv":
        return read_delimited(spark, path, ",", headers)
    if kind == "tsv":
        return read_delimited(spark, path, "\t", headers)
    if kind == "xlsx":
        from zuliasearch_spark.sources.xlsx import read_xlsx

        return read_xlsx(spark, path, headers=headers)
    from zuliasearch_spark.sources.xls import read_xls

    return read_xls(spark, path, headers=headers)


def split_list_column(col, item_type: str = "string", list_delimiter: str = ";"):
    """Delimited-cell → array column
    (DefaultDelimitedListHandler.cellValueToList): split on the list
    delimiter and cast items — int/long/float/double/string like the
    reference's typed branches. NULL cells stay NULL."""
    if item_type not in ("string", "int", "bigint", "long", "float", "double"):
        raise ValueError(f"unsupported item type {item_type!r}")
    arr = F.split(col, list_delimiter)
    if item_type == "string":
        return arr
    cast_to = "bigint" if item_type == "long" else item_type
    return F.transform(arr, lambda x: x.cast(cast_to))


def _format_cell(col, dtype: str, list_delimiter: str, decimal_places: int):
    """One column → its delimited cell string, per the reference's
    writer handlers (formatter/*.java). Null in → null out (empty
    cell in the written file)."""
    if dtype in ("float", "double"):
        # NumberCSVWriter: fixed decimal places (default 3)
        return F.when(col.isNotNull(), F.format_string(f"%.{decimal_places}f", col))
    if dtype == "boolean":
        # BooleanDelimitedWriter: True/False
        return F.when(col, "True").when(~col, "False")
    if dtype in ("date", "timestamp", "timestamp_ntz"):
        # DateCSVWriter: ISO_DATE_TIME
        fmt = "yyyy-MM-dd" if dtype == "date" else "yyyy-MM-dd'T'HH:mm:ss"
        return F.when(col.isNotNull(), F.date_format(col, fmt))
    if dtype.startswith("array<"):
        # CollectionDelimitedWriter + DefaultDelimitedListHandler:
        # join with the list delimiter, nulls as ""
        inner = dtype[6:-1]
        items = F.transform(
            col, lambda x: _format_cell(x, inner, list_delimiter, decimal_places)
        )
        return F.when(col.isNotNull(), F.array_join(items, list_delimiter, ""))
    if dtype.startswith("decimal") or dtype in (
        "int", "bigint", "smallint", "tinyint",
    ):
        # exact value, never a lossy double round-trip
        # (NumberCSVWriterTest.otherNumberSubtypesKeepTheirValue)
        return col.cast("string")
    return col.cast("string")


def write_delimited(
    df: DataFrame,
    path: str,
    delimiter: str = ",",
    list_delimiter: str = ";",
    decimal_places: int = 3,
    headers: bool = True,
    single_file: bool = False,
) -> None:
    """Delimited target (CSVTarget / TSVTarget / DelimitedTarget):
    header row + one line per row with the reference's cell
    formatting (see _format_cell). ``single_file`` coalesces to one
    output part — only for small exports; a 100 TB write stays
    per-partition parallel."""
    cols = [
        _format_cell(F.col(name), dtype, list_delimiter, decimal_places).alias(name)
        for name, dtype in df.dtypes
    ]
    out = df.select(*cols)
    if single_file:
        out = out.coalesce(1)
    (
        out.write.mode("overwrite")
        .option("header", str(headers).lower())
        .option("sep", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .option("emptyValue", "")
        .csv(path)
    )


def write_json_lines(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON-lines target (JsonLinesDataTarget + GsonObjectSerializer):
    one JSON object per line; null fields are omitted (Gson default),
    which Spark's JSON writer also does."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)
