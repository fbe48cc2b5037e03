"""Skew-handling joins: salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting is the deterministic fallback for *known* hot
keys, and the only option for skewed aggregations.

``salted_join``: replicate the small side S ways, scatter the big side's
hot keys across S salt buckets, join on (key, salt). Trades S-fold
replication of the small side for an S-fold reduction of the hottest
partition — at 1000 executors this is the difference between one straggler
task and even utilization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_buckets: int = 8,
    how: str = "inner",
    force_shuffle: bool = False,
) -> DataFrame:
    """Equi-join big⋈small on big_key = small_key with salt-scattered
    hot keys.

    The big side gets a deterministic per-row salt in [0, S) (hash of all
    columns); the small side is exploded S times so every (key, salt)
    pair finds its match.

    ``force_shuffle`` adds a merge hint so the join cannot silently plan
    as a broadcast: salting only matters on the shuffle path, and at a
    small test SF the planner would otherwise broadcast the exploded
    side and never exercise the machinery being verified. Production
    callers leave it False — if the side fits a broadcast, broadcasting
    beats salting and the salt columns are harmless.
    """
    if force_shuffle:
        big = big.hint("merge")
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(
        salted_small,
        (F.col(big_key) == F.col(small_key)) & (salted_big["_salt"] == salted_small["_salt"]),
        how,
    )
    return out.drop(salted_big["_salt"]).drop(salted_small["_salt"])
