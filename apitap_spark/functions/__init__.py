"""Reusable column-expression helpers (all JVM-side built-ins — no Python UDFs).

The reference registers zero UDFs (SURVEY §2.2 Q14); everything here is
composed from ``pyspark.sql.functions`` so it stays inside whole-stage
codegen at any scale.
"""

from apitap_spark.functions.text import (
    normalize_ws,
    shingles,
    token_count,
    tokens,
)
from apitap_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "tokens",
    "token_count",
    "shingles",
    "normalize_ws",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
