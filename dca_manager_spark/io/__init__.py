"""IO layer: sources and sinks."""

from dca_manager_spark.io.readers import TABLE_NAMES, load_tables, read_json_canonical, register_tables
from dca_manager_spark.io.merge import MergeTable, WriteOperation

__all__ = [
    "TABLE_NAMES",
    "load_tables",
    "register_tables",
    "read_json_canonical",
    "MergeTable",
    "WriteOperation",
]
