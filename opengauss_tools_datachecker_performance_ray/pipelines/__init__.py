from . import checks, validate  # noqa: F401
