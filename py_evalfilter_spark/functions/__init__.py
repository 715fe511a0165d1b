from . import textfeats  # noqa: F401
