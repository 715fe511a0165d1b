from . import asof, windows  # noqa: F401
