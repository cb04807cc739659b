from . import fixtures, parquet  # noqa: F401
