from titanlib_spark.sources.io import (
    read_pages,
    read_table,
    write_salted,
)

__all__ = ["read_pages", "read_table", "write_salted"]
