"""Vector math over ``array<float|double>`` columns — JVM-side, no UDFs.

Dot products fold left-to-right in index order (``F.aggregate``), which
makes results deterministic and reproducible across engines — required for
the DuckDB oracle comparison and good hygiene for ANN pipelines at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Double-precision dot product of two array columns (index order)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    """Double-precision L2 norm of an array column."""
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Double-precision cosine similarity (NULL when either norm is 0)."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def cosine_from_norms(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """Cosine from precomputed per-side L2 norms.

    Pairwise scorers (cross joins, bucket self-joins) recompute both
    norms per PAIR when using cosine_similarity — O(pairs) array folds
    for values that are O(rows). Precomputing ``l2_norm`` per side
    before the join drops two of the three folds from the pair kernel.
    Bit-exactness: the final expression is the same ``d / (na * nb)``
    with identically-computed doubles, so oracle hashes are unchanged.
    """
    d = dot(a, b)
    return F.when((_c(na) > 0) & (_c(nb) > 0), d / (_c(na) * _c(nb)))
