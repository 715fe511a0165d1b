from . import asof, dedup, similarity, vectorize, windows  # noqa: F401
