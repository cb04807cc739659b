from . import canonical, hashing, merkle, sketches, textfn  # noqa: F401
