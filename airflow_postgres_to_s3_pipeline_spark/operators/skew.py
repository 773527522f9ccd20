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


_MERGE_FNS: dict[str, Callable[[str], Column]] = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, Callable[[], Column] | tuple[Callable[[], Column], str]],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column name -> either
    ``(builder, merge)`` where ``merge`` in {"sum", "min", "max"} names how
    phase-2 combines the phase-1 partials, or a bare zero-arg ``builder``
    for the plain cases (sum/count/min/max) where the merge is inferred
    from the built expression — anything else (avg, first, collect_list,
    composite expressions, ...) raises so a wrong silent merge is
    impossible; pass the explicit ``(builder, merge)`` form or decompose
    the aggregate (avg = merged sum / merged count).

    Phase 1 aggregates by (group_cols + salt); phase 2 merges partials by
    group_cols.  count partials merge as sum.
    """
    specs: dict[str, tuple[Callable[[], Column], str]] = {}
    for name, spec in aggs.items():
        if isinstance(spec, tuple):
            builder, merge = spec
            if merge not in _MERGE_FNS:
                raise ValueError(
                    f"aggregate {name!r}: merge must be one of "
                    f"{sorted(_MERGE_FNS)}, got {merge!r}"
                )
        else:
            builder, merge = spec, _infer_merge(name, spec())
        specs[name] = (builder, merge)
    salted = with_salt(df, n_salts, deterministic_by=salt_source)
    phase1 = salted.groupBy(*group_cols, "_salt").agg(
        *[builder().alias(f"_p_{name}") for name, (builder, _) in specs.items()]
    )
    return phase1.groupBy(*group_cols).agg(
        *[
            _MERGE_FNS[merge](f"_p_{name}").alias(name)
            for name, (_, merge) in specs.items()
        ]
    )


# top-level aggregate function -> how its per-salt partials combine.
# count partials merge as sum.
_INFERABLE_FNS = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _infer_merge(name: str, col: Column) -> str:
    """Infer the phase-2 merge for a plain aggregate from its unresolved
    Catalyst tree; raise for anything whose partials don't merge by
    sum/min/max.  The column's TOP node (Cast/Alias wrappers unwrapped)
    must itself be a non-DISTINCT sum/count/min/max call: string matching
    on ``str(col)`` is NOT sound here — Spark renders ``sum_distinct(x)``
    as "sum(x)" (the DISTINCT flag lives on the node, invisible in the
    string) and a composite like ``sum(x)/count(x)`` contains "sum(" even
    though its top node is "/" — both previously inferred "sum" and
    silently double-counted across salt buckets."""

    def _fail(why: str) -> ValueError:
        return ValueError(
            f"aggregate {name!r} ({col}): {why} — pass an explicit "
            "(builder, merge) spec or decompose the aggregate "
            "(avg = merged sum / merged count)"
        )

    try:
        node = col._jc.node()
        for _ in range(8):
            cls = node.getClass().getSimpleName()
            if cls in ("Cast", "Alias"):
                node = node.child()
            else:
                break
        cls = node.getClass().getSimpleName()
        if cls != "UnresolvedFunction":
            raise _fail(f"top expression node is {cls}, not an aggregate call")
        fn = node.functionName().lower()
        distinct = bool(node.isDistinct())
    except ValueError:
        raise
    except Exception as exc:  # no classic-mode column tree (e.g. Connect)
        raise _fail(
            f"cannot introspect the expression tree ({type(exc).__name__})"
        ) from exc
    if distinct:
        raise _fail(
            f"partials of {fn.upper()}(DISTINCT ...) do not merge — a value "
            "present under two salts would be counted twice"
        )
    merge = _INFERABLE_FNS.get(fn)
    if merge is None:
        raise _fail(f"partials of {fn!r} do not merge by sum/min/max")
    return merge


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
