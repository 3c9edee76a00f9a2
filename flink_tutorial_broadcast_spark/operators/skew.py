"""Skew-aware join utilities (docs/scale.md "Joins"; SURVEY.md §4 skew row).

At 100 TB a single hot key (one user with 10^8 events, one null-bucket)
turns a shuffle join into one straggler task. Two mitigations, layered:

1. **AQE skew-join split** (config, already on): Spark splits oversized
   shuffle partitions at runtime. First line of defense, zero code.
2. **Key salting** (`salted_join` below): when AQE's split is not enough
   (extreme skew concentrated in ONE key value, or a non-AQE engine),
   explode the small side into ``n_salts`` replicas and scatter the big
   side uniformly across them — the hot key's rows spread over
   ``n_salts`` tasks by construction.

`salted_join` is semantics-preserving for inner equi-joins (asserted
against the plain join in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt__"


def salted_join(big: DataFrame, small: DataFrame, key_big: str,
                key_small: str, n_salts: int = 16) -> DataFrame:
    """Inner equi-join with the big (skewed) side salted ``n_salts`` ways.

    Each big-side row gets a deterministic salt in [0, n_salts) —
    ``xxhash64`` over all its columns, so re-runs produce identical plans
    and results (no ``rand()``). The small side is exploded ``n_salts``×
    so every (key, salt) pair finds its match exactly once. Shuffle keys
    become (key, salt): the hot key's rows land in n_salts partitions
    instead of one.
    """
    salt_expr = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                       F.lit(n_salts)).cast("int")
    big_salted = big.withColumn(_SALT, salt_expr)
    small_exploded = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = big_salted.join(
        small_exploded,
        (big_salted[key_big] == small_exploded[key_small])
        & (big_salted[_SALT] == small_exploded[_SALT]),
        "inner",
    )
    return out.drop(_SALT)
