from . import asof, dedup, similarity, skew, splits, vectorize, windows  # noqa: F401
