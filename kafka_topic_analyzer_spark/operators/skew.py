"""Manual skew mitigation for pathological hot keys.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime; this is the explicit tool for the cases it can't reach —
deterministic pre-planned salting, usable in streaming jobs and in
writes that pre-partition by a hot key.

``salted_equi_join``: the big side gets a deterministic per-row salt, the
small side is replicated once per salt value, and the join key becomes
(key, salt) — a hot key's rows spread over ``salt`` partitions instead
of one straggler task. Result is row-identical to the plain equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the big side salted ``salt`` ways.

    The salt is a deterministic hash of the big side's full row (stable
    across retries, unlike ``monotonically_increasing_id``); the small
    side explodes to every salt value, multiplying its shuffle volume by
    ``salt`` — the usual trade: only worth it when a key is hot enough
    to straggle.

    Only big-side-preserving join types are accepted: each big row
    carries exactly ONE salt value, so inner/left/semi/anti results are
    row-identical to the plain join — but the small side exists ``salt``
    times, so right/full outer would emit every unmatched small row once
    PER SALT REPLICA. Rejected loudly rather than silently wrong.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "semi",
                   "leftsemi", "left_semi", "anti", "leftanti", "left_anti"):
        raise ValueError(
            f"salted_equi_join: join type {how!r} is not semantics-preserving "
            "under small-side replication (use the plain join for right/full)"
        )
    b = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")
