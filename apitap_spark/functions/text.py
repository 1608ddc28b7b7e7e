"""Text-processing column expressions (tokenize, shingle, normalize).

Built for the 100 TB document-pipeline path: everything is a Catalyst
expression over ``array<string>`` — vectorized, codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS_PATTERN = r"\s+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of a text column (leading/trailing ws trimmed).

    Contract note: ``trim`` strips ASCII SPACES only (identically in
    Spark and DuckDB — the oracle parity relies on this), so text whose
    leading/trailing whitespace is tabs/newlines yields empty-string
    edge tokens. Corpora with significant tab indentation should pass
    through ``normalize_ws`` first (as the dedup/fingerprint paths do).
    """
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


def shingle_grams(col: Column | str, n: int = 3) -> Column:
    """Raw (position-ordered, non-distinct) n-word shingle array.

    Built as a zip_with chain over n equal-length shifted slices rather
    than transform(sequence, i -> slice(t, i, n)): higher-order lambdas
    are interpreted per element, and the per-gram slice allocation makes
    the sequence form ~4x slower (measured at sf0.1). The slices must
    share EXACTLY length size-n+1 — zip_with pads the shorter array with
    nulls and concat_ws silently drops them, which would fabricate a
    trailing (n-1)-gram.

    Texts with fewer than ``n`` tokens yield an empty array (guarded —
    a negative slice length would otherwise error).
    """
    t = tokens(col)
    length = F.size(t) - (n - 1)
    acc = F.slice(t, 1, length)
    for k in range(2, n + 1):
        acc = F.zip_with(
            acc, F.slice(t, k, length), lambda x, y: F.concat_ws(" ", x, y)
        )
    return F.when(F.size(t) >= n, acc).otherwise(
        F.array().cast("array<string>")
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles ('w1 w2 w3') of a text column."""
    made = shingle_grams(col, n)
    return F.when(F.size(made) > 0, F.array_distinct(made)).otherwise(made)
