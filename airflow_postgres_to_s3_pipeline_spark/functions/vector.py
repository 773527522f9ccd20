"""Vector math over ``array<float>`` embedding columns, JVM-side.

Everything here is built from higher-order functions (``transform`` /
``zip_with`` / ``aggregate``) so the hot path stays inside whole-stage
codegen — no Python UDF, no serialization.  Dot products fold left-to-right,
which both matches DuckDB's sequential semantics for the oracle and is
deterministic across partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    """Cast array<float> -> array<double> so arithmetic runs in fp64."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def l2_norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (fp64, deterministic).

    Zero-norm inputs (dead encoder rows) yield NULL via ``try_divide``
    instead of an ANSI divide-by-zero ERROR (Spark 4 default) — a plain
    ``/`` makes one bad corpus row kill the whole job.  Consumers treat
    NULL as "not a neighbor" (filter before ranking); the DuckDB mirrors
    exclude the same rows by a norm-product > 0 predicate, because
    DuckDB's list_cosine_similarity returns -1.0 (not NULL/NaN) on a
    zero vector."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def sq_l2(a: Column, b: Column) -> Column:
    """Sequential-fold squared-L2 distance of two array<double> columns.

    Folds dimension-by-dimension left-to-right, so the sum is
    bit-identical to DuckDB's ``list_reduce`` over the same transform
    (``(0.0 + x1)`` is IEEE-exact for the non-negative squared terms)."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)))
