from . import asof, dedup, encode, similarity, skew, splits, vectorize, windows  # noqa: F401
