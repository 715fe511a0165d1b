from . import asof, dedup, similarity, splits, vectorize, windows  # noqa: F401
