from . import compare, digest, profile  # noqa: F401
