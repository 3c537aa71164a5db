from .readers import load_table, load_tables, parallelize_if_narrow  # noqa: F401
