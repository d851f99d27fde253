"""Skew-handling join utilities.

The reference leans on per-partition hash→sort-merge fallback
(HashJoinOperator.java:260-267) and two-phase aggregation for skew;
Spark's first line of defense is AQE skew-join splitting
(spark.sql.adaptive.skewJoin, on in session.py). This module adds the
remaining tool: explicit SALTING for when one join key dominates so
hard that even a split shuffle partition is one hot key — the classic
100 TB web-log × dimension case.

``salted_join``: left rows get a deterministic salt in [0, n); the
right side is replicated n× (one copy per salt); the join key becomes
(key, salt), spreading one hot key over n reducers. Replication cost =
|right| × n, so use for modest-size right sides (or pre-filter to the
hot keys via ``hot_keys`` and salt only those).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Equi-join on ``key`` with the left side salted n ways.

    With ``hot_keys`` (a 1-column frame of skewed key values) only hot
    rows are salted/replicated and the cold remainder joins normally —
    replication cost drops from |right|×n to |hot dim rows|×n.
    """
    salt_expr = F.pmod(F.xxhash64(*left.columns), F.lit(n_salts)).cast("int")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))

    if hot_keys is None:
        l = left.withColumn("__salt", salt_expr)
        r = right.withColumn("__salt", salts)
        return l.join(r, [key, "__salt"], how).drop("__salt")

    hot = F.broadcast(hot_keys.select(F.col(hot_keys.columns[0]).alias(key)).distinct())
    l_hot = left.join(hot, key, "left_semi").withColumn("__salt", salt_expr)
    l_cold = left.join(hot, key, "left_anti").withColumn("__salt", F.lit(-1))
    r_hot = right.join(hot, key, "left_semi").withColumn("__salt", salts)
    r_cold = right.join(hot, key, "left_anti").withColumn("__salt", F.lit(-1))
    return (
        l_hot.unionByName(l_cold)
        .join(r_hot.unionByName(r_cold), [key, "__salt"], how)
        .drop("__salt")
    )
