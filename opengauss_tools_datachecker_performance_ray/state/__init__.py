from . import checkpoint, report  # noqa: F401
