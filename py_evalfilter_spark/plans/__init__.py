from . import driver_queries  # noqa: F401
