"""Text-processing column expressions (tokenize, shingle, normalize).

Built for the 100 TB document-pipeline path: everything is a Catalyst
expression over ``array<string>`` — vectorized, codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS_PATTERN = r"\s+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of a text column (leading/trailing ws trimmed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), WS_PATTERN)


def token_count(col: Column | str) -> Column:
    """Number of whitespace-separated tokens, 0 for empty/blank text."""
    c = F.col(col) if isinstance(col, str) else col
    t = tokens(c)
    return (
        F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(t)).cast("bigint")
    )


def normalize_ws(col: Column | str) -> Column:
    """Lowercase + collapse all whitespace runs to single spaces + trim.

    The canonical form used for exact-dup hashing and fingerprints.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), WS_PATTERN, " ")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles ('w1 w2 w3') of a text column.

    Texts with fewer than ``n`` tokens yield an empty array (guarded —
    Spark's ``sequence`` would otherwise count backwards).
    """
    t = tokens(col)
    make = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.when(F.size(t) >= n, F.array_distinct(make)).otherwise(
        F.array().cast("array<string>")
    )
