"""Skew-handling: salted joins for hot keys.

AQE's skew-join splitting (on in session.py) handles sort-merge skew
automatically; salting is the explicit tool for the cases AQE can't
see — skewed *aggregations* and broadcast-ineligible joins against a
replicable right side.

Pattern: explode the small side N× (one copy per salt), salt the big
side's key with hash(row)%N, join on (key, salt). The hot key's rows
spread over N tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_left(df: DataFrame, n_salts: int, id_cols: list[str]) -> DataFrame:
    """Add a deterministic salt derived from the row identity (md5-based
    so replays/retries salt identically — no RNG)."""
    ident = F.concat_ws("", *[F.col(c).cast("string") for c in id_cols])
    salt = (
        F.conv(F.substring(F.md5(ident), 1, 4), 16, 10).cast("long") % n_salts
    ).cast("int")
    return df.withColumn(SALT_COL, salt)


def explode_right(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate the right side once per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int,
    left_id_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread across n_salts
    partitions. Result is identical to left.join(right, on, how) —
    asserted in tests — with the salt columns dropped."""
    lf = salt_left(left, n_salts, left_id_cols)
    rf = explode_right(right, n_salts)
    return lf.join(rf, on + [SALT_COL], how).drop(SALT_COL)
