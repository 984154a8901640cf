"""Skew-mitigation utilities for hot join keys at scale.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting remains the tool when one key dominates so hard
that even split partitions bottleneck, or when the small side must stay a
shuffle join (too big to broadcast). Pattern: salt the big side's rows
pseudo-randomly into N sub-keys, replicate the small side N times, join on
(key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on column ``on``, spreading each hot
    key across ``num_salts`` reducers.

    The big side gets a deterministic pseudo-random salt (hash of all its
    columns — no RNG, so retried tasks salt identically); the small side is
    replicated via ``explode(sequence(...))`` — a num_salts-x blowup of the
    SMALL side only, which is the entire point of the asymmetry.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (semantics-preserving)")
    big_s = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*big.columns), F.lit(num_salts)).cast("int")
    )
    small_s = small.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<int>")),
    )
    return big_s.join(small_s, [on, _SALT], how).drop(_SALT)
