from . import (  # noqa: F401
    compare, dedup, digest, multimodal, profile, similarity, skew,
)
