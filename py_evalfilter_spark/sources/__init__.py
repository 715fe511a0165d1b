from . import rants_csv, sinks, tables  # noqa: F401
