"""py_evalfilter_spark — a from-scratch PySpark-native feature-engineering
engine with the capabilities of dumoulma/py-evalfilter, generalized to a
point-in-time / as-of + windowed feature store over multi-turn transcript
tables (conv_id, turn_idx, role, text, tool, ts).

Spark-first architecture: DataFrame/SQL plans optimized by Catalyst; Python
only in Arrow-vectorized batches (pandas_udf / mapInPandas / applyInPandas);
explicit partitioning and skew handling for 10^12-turn scale.
"""

__version__ = "0.1.0"

from . import textcore  # noqa: F401
