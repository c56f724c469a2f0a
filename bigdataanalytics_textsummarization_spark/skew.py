"""Skew mitigation: explicit key salting for joins on hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions.  Salting is the complementary
*static* technique for the pathological case AQE can't fix: a single join
key so hot that one task would still process it alone.  The big side
scatters each hot key across ``n_salts`` sub-keys; the small side is
replicated once per salt.  Join fan-out is unchanged — only the shuffle
distribution changes.

The salt must be deterministic for the correctness oracle, so it hashes the
big side's full row rather than using a random number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted across ``n_salts`` sub-partitions.

    Result is identical to ``big.join(small, on, how)`` for row-preserving
    join types; the shuffle key becomes (key..., salt) so one hot key
    spreads over ``n_salts`` reducers instead of one.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn(SALT, salt)
    small_s = small.withColumn(
        SALT, F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
    )
    return big_s.join(small_s, keys + [SALT], how).drop(SALT)
