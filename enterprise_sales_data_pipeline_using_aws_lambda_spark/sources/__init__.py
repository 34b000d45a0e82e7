from .readers import read_any, read_sales, read_table, star_tables
from .writers import write_partitioned_parquet, write_quarantine

__all__ = [
    "read_any",
    "read_sales",
    "read_table",
    "star_tables",
    "write_partitioned_parquet",
    "write_quarantine",
]
