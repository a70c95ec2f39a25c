from .io import (
    jdbc_reader,
    jdbc_writer,
    read_binary_dir,
    read_csv,
    read_json,
    read_orc,
    write_bucketed,
    write_orc,
    write_partitioned,
)
from .tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = [
    "TABLE_NAMES",
    "jdbc_reader",
    "jdbc_writer",
    "load_table",
    "load_tables",
    "read_binary_dir",
    "read_csv",
    "read_json",
    "read_orc",
    "register_views",
    "write_bucketed",
    "write_orc",
    "write_partitioned",
]
