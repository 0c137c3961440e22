"""Data source / target connectors (the reference's zulia-data
module) re-expressed as thin wrappers over Spark's distributed
readers and writers."""

from zuliasearch_spark.sources.data import (
    read_delimited,
    read_json_array,
    read_json_lines,
    read_spreadsheet,
    split_list_column,
    spreadsheet_type,
    write_delimited,
    write_json_lines,
)
from zuliasearch_spark.sources.xls import (
    read_xls,
    write_xls,
    write_xls_sheets,
    xls_sheet_names,
)
from zuliasearch_spark.sources.xlsx import (
    read_xlsx,
    write_xlsx,
    write_xlsx_sheets,
    xlsx_sheet_names,
)

__all__ = [
    "read_delimited",
    "read_json_array",
    "read_json_lines",
    "read_spreadsheet",
    "split_list_column",
    "spreadsheet_type",
    "read_xls",
    "read_xlsx",
    "write_delimited",
    "write_json_lines",
    "write_xls",
    "write_xls_sheets",
    "write_xlsx",
    "write_xlsx_sheets",
    "xls_sheet_names",
    "xlsx_sheet_names",
]
