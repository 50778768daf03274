"""Skew-aware join: explicit key salting.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime; explicit salting remains necessary when one side must be
*aggregated* on a hot key first, or on engines/paths where AQE can't
split (e.g. a broadcast-ineligible dimension with one whale key).

Pattern: left side gets a random salt in [0, salt); right side is
replicated `salt` times with every salt value; the join key becomes
(key, salt) so the whale key's rows spread over `salt` tasks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join on `on` with the left (large/skewed) side salted and the
    right side replicated `salt`×. Result equals left.join(right, on,
    how); cost trades `salt`× replication of the small side for even
    task sizes on the large side."""
    on = list(on)
    l_s = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l_s.join(r_s, [*on, "__salt"], how).drop("__salt")
