"""Skew mitigation: salted aggregation and salted join.

AQE's skew-join splitting handles most hot keys automatically
(``spark.sql.adaptive.skewJoin.enabled``, on by default in session.py); the
explicit salting here is for the cases AQE can't fix:

- **salted_aggregate**: a groupBy where one key holds a huge share of rows —
  partial-aggregate under (key, salt) first, then re-aggregate by key.  The
  two-phase shape caps any single reducer's input at ~1/n_salts of the hot
  key.
- **salted_broadcast_left**: replicate-and-salt for joining a skewed fact
  against a medium dimension that is too big to broadcast whole but fine
  to replicate n_salts ways.

Both are pure DataFrame compositions — deterministic results, any plan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt",
              deterministic_by: str | None = None) -> DataFrame:
    """Add a salt column in [0, n_salts).

    ``deterministic_by`` salts by hash of an existing column (stable across
    runs — required when results feed an oracle-checked pipeline); without
    it a uniform pseudo-random salt from ``monotonically_increasing_id`` is
    used (stable within a run).
    """
    if deterministic_by is not None:
        salt = F.pmod(F.xxhash64(deterministic_by), F.lit(n_salts))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    return df.withColumn(salt_col, salt.cast("int"))


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, Callable[[], Column]],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column name -> zero-arg builder returning a
    partial-mergeable aggregate (sum/count/min/max).  Phase 1 aggregates by
    (group_cols + salt); phase 2 merges partials by group_cols.  count is
    merged as sum of partial counts.
    """
    salted = with_salt(df, n_salts, deterministic_by=salt_source)
    phase1 = salted.groupBy(*group_cols, "_salt").agg(
        *[fn().alias(f"_p_{name}") for name, fn in aggs.items()]
    )
    merge = {
        name: F.sum(f"_p_{name}") if _is_additive(fn) else F.max(f"_p_{name}")
        for name, fn in aggs.items()
    }
    return phase1.groupBy(*group_cols).agg(
        *[expr.alias(name) for name, expr in merge.items()]
    )


def _is_additive(fn: Callable[[], Column]) -> bool:
    # sum/count partials merge by sum; min/max by themselves.  Inspect the
    # built expression's name.
    expr = str(fn())
    return "sum(" in expr or "count(" in expr


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, explode the dim side.

    fact gets salt = hash(row) % n; dim is replicated n ways with every
    salt value; join on (key, salt).  The hot key's rows now spread over
    n_salts reducers instead of one.
    """
    salted_fact = with_salt(fact, n_salts)
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(replicated_dim, [key, "_salt"]).drop("_salt")
