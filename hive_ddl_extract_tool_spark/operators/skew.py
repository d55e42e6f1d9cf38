"""Skew-handling join (SURVEY.md §2B scale mandate).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in session.py) handles most skew at runtime. `salted_join` is the
explicit fallback for the pathological case AQE can't fix: a single join key
so hot that one task would receive a partition too large to split usefully
(classic in training-data pipelines: the empty-string document, the null
user, the default timestamp).

Mechanics: the big side gets a uniform random salt in [0, n); the small side
is exploded n ways so every (key, salt) bucket finds its match. The hot key's
rows now spread across n tasks. Row-level results are identical to the
unsalted join (verified in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join `big` with `small`, salting the shuffle `n_salts` ways.

    The small side is replicated n_salts times (explode of a literal range),
    so choose n_salts ~ the skew factor, not larger. Output columns = both
    inputs' columns minus the salt plumbing.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    # Deterministic salt: hash of the whole row (not F.rand -- nondeterministic
    # expressions get re-evaluated around outer joins and can drop unmatched
    # rows). Hot keys spread as long as their rows differ anywhere; fully
    # identical duplicate rows share a salt, which only matters for exact-dup
    # floods (dedup those first).
    salted_big = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.struct([big[c] for c in big.columns]), F.lit(seed)), F.lit(n_salts)).cast("int")
    )
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big[SALT_COL] == salted_small[SALT_COL]),
        how,
    )
    return joined.drop(salted_big[SALT_COL]).drop(salted_small[SALT_COL])
