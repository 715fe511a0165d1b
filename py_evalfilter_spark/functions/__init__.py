from . import multimodal, textanalysis, textfeats  # noqa: F401
