"""Excel (.xlsx) source/target in pure stdlib — zipfile + XML.

The reference's Excel connectors sit on Apache POI: ExcelSource wraps
a Workbook with sheet switching, header mapping, and a cell handler
that stringifies by cell type (zulia-data
source/spreadsheet/excel/ExcelSource.java, DefaultExcelCellHandler
.java); ExcelTarget streams rows through an SXSSF workbook with typed
cell handlers — numbers as numeric cells, booleans as boolean cells,
dates formatted, collections joined (target/spreadsheet/excel/
ExcelTarget.java + cell/*.java). This environment ships no Excel
codec (no POI, no openpyxl), but XLSX is just a ZIP of
SpreadsheetML XML parts — so this module implements the subset the
connectors need directly on ``zipfile`` + ``xml.etree``:

- :func:`write_xlsx` — DataFrame → one .xlsx file. Cells are typed
  the way ExcelTarget's handlers type them: int/float → numeric
  ``<c t="n">`` (NumberCellHandler sets the raw double — values
  round-trip exactly), boolean → ``<c t="b">`` (BooleanCellHandler),
  date/timestamp → ISO-8601 string (DateCellHandler's
  DateTimeFormatter), arrays → list-delimiter-joined string
  (CollectionCellHandler), everything else → inline string. Rows
  stream through ``df.toLocalIterator()`` into the ZIP member, so
  driver memory stays bounded the same way SXSSF's row window does.
- :func:`read_xlsx` — .xlsx → DataFrame. Sheet selection by index,
  name, or "active" (ExcelSource.switchSheet / OpenHandling
  .ACTIVE_SHEET); header row → column names (SheetInfo header
  mapping); shared strings, inline strings, booleans, formula
  cached values, and date-formatted numerics (styles.xml numFmtId,
  like DefaultExcelCellHandler.isCellDateFormatted) all decode.
  Column types unify bottom-up (all-bool → boolean, all-int → long,
  numeric → double, else string) standing in for the reference's
  typed per-cell getters (ExcelRecord.getInt/getString/...).

Scale note: an .xlsx is a single sequential stream at both ends —
exactly like the reference's POI-based connectors — and Excel caps a
sheet at 1,048,576 rows, so this is an interchange format for small
exports. The 100 TB paths are parquet and the delimited/JSON
connectors; :func:`write_xlsx` enforces the sheet row cap rather
than silently truncating.
"""

from __future__ import annotations

import re
import zipfile
from typing import TYPE_CHECKING, Iterable
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

EXCEL_MAX_ROWS = 1_048_576  # per-sheet cap (SpreadsheetVersion.EXCEL2007)

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"

# ---------------------------------------------------------------- write

_CONTENT_TYPES_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/styles.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
    "{sheet_overrides}</Types>"
)

_SHEET_OVERRIDE = (
    '<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/'
    '2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

# minimal but complete styles part: one font/fill/border/xf so Excel
# itself opens the file (readers that ignore styles don't need it)
_STYLES_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    '<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>'
    '<fills count="1"><fill><patternFill patternType="none"/></fill></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf numFmtId="0"/></cellStyleXfs>'
    '<cellXfs count="1"><xf numFmtId="0" xfId="0"/></cellXfs>'
    "</styleSheet>"
)


def _col_letter(idx: int) -> str:
    """0-based column index → A1-style letters (A, B, …, AA, AB…)."""
    out = ""
    idx += 1
    while idx > 0:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value, dtype: str, list_delimiter: str) -> str:
    """One value → SpreadsheetML cell, typed like the reference's
    ExcelTarget handlers (cell/NumberCellHandler, BooleanCellHandler,
    DateCellHandler, CollectionCellHandler, StringCellHandler)."""
    if value is None:
        return ""
    if dtype == "boolean":
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if dtype in ("int", "bigint", "smallint", "tinyint", "float", "double") or dtype.startswith(
        "decimal"
    ):
        return f'<c r="{ref}" t="n"><v>{value!r}</v></c>'
    if dtype == "date":
        s = value.isoformat()
    elif dtype in ("timestamp", "timestamp_ntz"):
        s = value.isoformat(sep="T")
    elif dtype.startswith("array<"):
        s = list_delimiter.join("" if x is None else str(x) for x in value)
    else:
        s = str(value)
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(s)}</t></is></c>'


def _write_sheet(zf: zipfile.ZipFile, part: str, header: list[str] | None,
                 rows: Iterable, dtypes: list[str], list_delimiter: str) -> None:
    """Stream one sheet's rows into ``part`` inside the ZIP. The row
    iterable is consumed lazily (SXSSF-style bounded memory)."""
    with zf.open(part, "w") as raw:
        raw.write(
            b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            b'<worksheet xmlns="http://schemas.openxmlformats.org/'
            b'spreadsheetml/2006/main"><sheetData>'
        )
        rownum = 0
        if header is not None:
            rownum += 1
            cells = "".join(
                _cell_xml(f"{_col_letter(i)}1", h, "string", list_delimiter)
                for i, h in enumerate(header)
            )
            raw.write(f'<row r="1">{cells}</row>'.encode())
        for row in rows:
            rownum += 1
            if rownum > EXCEL_MAX_ROWS:
                raise ValueError(
                    f"xlsx sheet cap is {EXCEL_MAX_ROWS} rows; export to "
                    "parquet/delimited for larger data"
                )
            cells = "".join(
                _cell_xml(f"{_col_letter(i)}{rownum}", v, dtypes[i], list_delimiter)
                for i, v in enumerate(row)
            )
            raw.write(f'<row r="{rownum}">{cells}</row>'.encode())
        raw.write(b"</sheetData></worksheet>")


def write_xlsx_sheets(
    sheets: dict[str, "DataFrame"],
    path: str,
    headers: bool = True,
    list_delimiter: str = ";",
) -> None:
    """Write one .xlsx with one worksheet per dict entry, in order —
    ExcelTarget.newSheet(sheetName, headers) multi-sheet flow. Each
    DataFrame streams through ``toLocalIterator`` (one Spark job per
    sheet; partitions are fetched one at a time, so driver memory is
    bounded by a partition, not the sheet)."""
    if not sheets:
        raise ValueError("need at least one sheet")
    names = list(sheets)
    sheet_tags = "".join(
        f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheet_tags}</sheets></workbook>"
    )
    rel_tags = "".join(
        f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
        f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(len(names))
    ) + (
        f'<Relationship Id="rId{len(names) + 1}" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/styles" Target="styles.xml"/>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f"{rel_tags}</Relationships>"
    )
    overrides = "".join(_SHEET_OVERRIDE.format(i=i + 1) for i in range(len(names)))
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED, allowZip64=True) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES_XML.format(sheet_overrides=overrides))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/styles.xml", _STYLES_XML)
        for i, name in enumerate(names):
            df = sheets[name]
            dtypes = [t for _, t in df.dtypes]
            header = df.columns if headers else None
            _write_sheet(
                zf, f"xl/worksheets/sheet{i + 1}.xml", header,
                df.toLocalIterator(), dtypes, list_delimiter,
            )


def write_xlsx(
    df: "DataFrame",
    path: str,
    sheet_name: str = "Sheet1",
    headers: bool = True,
    list_delimiter: str = ";",
) -> None:
    """Excel target (ExcelTarget.withDefaultsFromFile + typed cell
    handlers): one DataFrame → one .xlsx worksheet."""
    write_xlsx_sheets({sheet_name: df}, path, headers=headers, list_delimiter=list_delimiter)


# ----------------------------------------------------------------- read

# built-in numFmtIds that render as dates/times (ECMA-376 §18.8.30),
# the set POI's DateUtil.isInternalDateFormat checks
_BUILTIN_DATE_FMT_IDS = frozenset(range(14, 23)) | frozenset(range(45, 48))
# a custom format code is a date format when it uses date tokens
# outside [] sections / quoted literals (DateUtil.isADateFormat)
_DATE_TOKEN_RE = re.compile(r"[ymdhs]", re.IGNORECASE)


def _load_date_styles(zf: zipfile.ZipFile) -> frozenset[int]:
    """Style indices (cellXfs order) whose number format is a date
    format — DefaultExcelCellHandler.isCellDateFormatted's input."""
    try:
        data = zf.read("xl/styles.xml")
    except KeyError:
        return frozenset()
    root = ET.fromstring(data)
    custom_date_ids = set()
    for fmt in root.iter(f"{_NS}numFmt"):
        code = fmt.get("formatCode", "")
        bare = re.sub(r"\[[^\]]*\]|\"[^\"]*\"|\\.", "", code)
        if _DATE_TOKEN_RE.search(bare):
            custom_date_ids.add(int(fmt.get("numFmtId", "-1")))
    out = set()
    cell_xfs = root.find(f"{_NS}cellXfs")
    if cell_xfs is not None:
        for i, xf in enumerate(cell_xfs.findall(f"{_NS}xf")):
            fmt_id = int(xf.get("numFmtId", "0"))
            if fmt_id in _BUILTIN_DATE_FMT_IDS or fmt_id in custom_date_ids:
                out.add(i)
    return frozenset(out)


def _serial_to_iso(serial: float) -> str:
    """Excel 1900-epoch day serial → ISO string, the way
    DefaultExcelCellHandler.formatDateCellAsString renders
    date-formatted numerics (UTC, no TZ suffix). Excel's serial 1 is
    1900-01-01 and serial 60 is the phantom 1900-02-29, so the epoch
    anchor is 1899-12-30 for serials ≥ 61 (every modern file)."""
    import datetime as dt

    whole = int(serial)
    frac = serial - whole
    base = dt.datetime(1899, 12, 30) + dt.timedelta(days=whole)
    secs = round(frac * 86400)
    out = base + dt.timedelta(seconds=secs)
    if out.time() == dt.time(0, 0):
        return out.date().isoformat()
    return out.isoformat(sep="T")


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>…; concatenate all t's
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _cell_col(ref: str | None, fallback: int) -> int:
    """'AB12' → 0-based column 27; cells without r attr are
    positional."""
    if not ref:
        return fallback
    col = 0
    for ch in ref:
        if ch.isdigit():
            break
        col = col * 26 + (ord(ch) - ord("A") + 1)
    return col - 1 if col else fallback


def xlsx_sheet_names(path: str) -> list[str]:
    """Workbook sheet names in order (ExcelSource.getNumberOfSheets /
    getSheetName surface)."""
    with zipfile.ZipFile(path) as zf:
        root = ET.fromstring(zf.read("xl/workbook.xml"))
        return [
            s.get("name", "")
            for s in root.iter(f"{_NS}sheet")
        ]


def _resolve_sheet_part(zf: zipfile.ZipFile, sheet) -> str:
    """Sheet index / name / "active" → worksheet part path, via the
    workbook rels (ExcelSource.switchSheet + OpenHandling
    .ACTIVE_SHEET)."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = list(wb.iter(f"{_NS}sheet"))
    if not sheets:
        raise OSError("workbook has no sheets")
    if sheet == "active":
        view = wb.find(f"{_NS}bookViews/{_NS}workbookView")
        idx = int(view.get("activeTab", "0")) if view is not None else 0
    elif isinstance(sheet, str):
        names = [s.get("name") for s in sheets]
        if sheet not in names:
            raise ValueError(f"No sheet named {sheet}")  # switchSheet(String) parity
        idx = names.index(sheet)
    else:
        idx = int(sheet)
    if not 0 <= idx < len(sheets):
        raise IndexError(f"sheet index {idx} out of range ({len(sheets)} sheets)")
    rid = sheets[idx].get(f"{_NS_REL}id")
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rels.iter("{http://schemas.openxmlformats.org/package/2006/relationships}Relationship"):
        if rel.get("Id") == rid:
            target = rel.get("Target", "")
            return target if target.startswith("xl/") else f"xl/{target}"
    # no rels (minimal producers): positional fallback
    return f"xl/worksheets/sheet{idx + 1}.xml"


def _parse_rows(zf: zipfile.ZipFile, part: str, strings: list[str],
                date_styles: frozenset[int]) -> list[dict[int, object]]:
    """Worksheet XML → sparse {col: value} per row. Values come out
    typed the way DefaultExcelCellHandler reads them: str, bool,
    float/int, date-ISO str."""
    rows: list[dict[int, object]] = []
    with zf.open(part) as fh:
        for _, row_el in ET.iterparse(fh):
            if row_el.tag != f"{_NS}row":
                continue
            vals: dict[int, object] = {}
            next_col = 0
            for c in row_el.findall(f"{_NS}c"):
                col = _cell_col(c.get("r"), next_col)
                next_col = col + 1
                ctype = c.get("t", "n")
                v_el = c.find(f"{_NS}v")
                if ctype == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    if is_el is not None:
                        vals[col] = "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
                    continue
                if v_el is None or v_el.text is None:
                    continue
                raw = v_el.text
                if ctype == "s":
                    vals[col] = strings[int(raw)]
                elif ctype == "b":
                    vals[col] = raw.strip() in ("1", "true")
                elif ctype in ("str", "e"):
                    # cached formula string / error literal
                    vals[col] = raw
                else:  # numeric
                    num = float(raw)
                    style = int(c.get("s", "-1"))
                    if style in date_styles:
                        vals[col] = _serial_to_iso(num)
                    elif num.is_integer() and abs(num) < 2**53:
                        vals[col] = int(num)
                    else:
                        vals[col] = num
            row_el.clear()
            rows.append(vals)
    return rows


def _unify_column(values: list) -> tuple[str, list]:
    """Per-column type unification standing in for ExcelRecord's
    typed getters: all-bool → boolean, all-int → long, any-float →
    double, mixed → string."""
    non_null = [v for v in values if v is not None]
    if not non_null:
        return "string", values
    types = {type(v) for v in non_null}
    if types == {bool}:
        return "boolean", values
    if types == {int}:
        return "long", values
    if types <= {int, float}:
        return "double", [None if v is None else float(v) for v in values]
    return "string", [
        None if v is None else (v if isinstance(v, str) else str(v)) for v in values
    ]


def read_xlsx(
    spark: "SparkSession",
    path: str,
    headers: bool = True,
    sheet: int | str = 0,
) -> "DataFrame":
    """Excel source (ExcelSource.withDefaults + DefaultExcelCellHandler):
    one worksheet → DataFrame. ``sheet`` is an index, a name, or
    "active". The file parses on the driver — an .xlsx is one
    sequential ZIP stream, exactly like the reference's POI reader —
    and ``createDataFrame`` distributes the rows; the scale path for
    big data is parquet/delimited, not Excel."""
    with zipfile.ZipFile(path) as zf:
        part = _resolve_sheet_part(zf, sheet)
        strings = _shared_strings(zf)
        date_styles = _load_date_styles(zf)
        raw_rows = _parse_rows(zf, part, strings, date_styles)
    return rows_to_dataframe(spark, raw_rows, headers, path)


def rows_to_dataframe(
    spark: "SparkSession",
    raw_rows: list[dict[int, object]],
    headers: bool,
    path: str,
) -> "DataFrame":
    """Sparse {col: value} rows → typed DataFrame — the shared tail
    of every spreadsheet reader (ExcelRecord's typed getters +
    header handling); also used by the legacy-.xls reader."""
    from pyspark.sql.types import (
        BooleanType, DoubleType, LongType, StringType, StructField, StructType,
    )

    if headers and not raw_rows:
        # ExcelSource: header read on a truly empty sheet fails loudly
        raise OSError(f"spreadsheet source {path} has no header row")
    n_cols = max((max(r) + 1 for r in raw_rows if r), default=0)
    if headers:
        header_cells = raw_rows[0]
        names = [
            str(header_cells.get(i, f"_c{i}")) for i in range(n_cols)
        ]
        body = raw_rows[1:]
    else:
        names = [f"_c{i}" for i in range(n_cols)]
        body = raw_rows
    columns = [[r.get(i) for r in body] for i in range(n_cols)]
    spark_types = {
        "boolean": BooleanType(), "long": LongType(),
        "double": DoubleType(), "string": StringType(),
    }
    fields, data_cols = [], []
    for name, col in zip(names, columns):
        tname, coerced = _unify_column(col)
        fields.append(StructField(name, spark_types[tname], True))
        data_cols.append(coerced)
    schema = StructType(fields)
    rows = list(zip(*data_cols)) if data_cols else []
    return spark.createDataFrame(rows, schema)
