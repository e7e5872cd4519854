"""Skew-aware equi-join: explicit key salting for the case AQE's
skew-join can't fix.

AQE splits an oversized SHUFFLE PARTITION of a sort-merge join at
runtime, which handles most skew (and stays enabled everywhere in this
engine). It cannot help when a SINGLE KEY's rows must meet a
non-broadcastable build side: every row of the hot key still lands in
one task because the join key IS the partition key. The classic fix is
to widen the key: the probe side gets a deterministic salt derived from
one of its own high-cardinality columns, the build side is replicated
once per salt value, and the join runs on (key, salt) — the hot key's
rows now spread over ``num_salts`` tasks.

Cost model at the 100 TB design point: the build side is shipped
``num_salts`` times (choose the smallest salt count that caps the hot
key's per-task rows), the probe side pays nothing extra, and the
output is identical to the plain join. Use broadcast when the build
side fits (no salt needed), AQE alone when the skew is partition-level
rather than key-level, and this when one key dominates.

The reference has no join surface (single-threaded dict-walking
linter); this is engine-brief surface, same tier as the dedup/ANN
pipeline ops.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_from: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` (large, key-skewed probe side) to ``right``
    (build side too big to broadcast, small enough to replicate
    ``num_salts`` times) on the equality of ``on`` — result identical
    to ``left.join(right, on, how)``.

    ``salt_from`` names a LEFT column whose values vary WITHIN a hot
    key (a row id, timestamp, or any near-unique column); the salt is
    ``pmod(xxhash64(salt_from), num_salts)`` — deterministic, so runs
    and retries place every row identically. The right side explodes
    to one copy per salt value and the join runs shuffle-hash on
    ``on + [salt]`` (hinted: broadcasting a replicated build side
    would silently undo the point of salting on small test inputs).

    Only ``inner`` and ``left`` joins are supported: under build-side
    replication an unmatched RIGHT row would surface once per salt,
    so right/full outer semantics cannot be preserved — ask for the
    mirror-image call instead.
    """
    keys = list(on)
    if not keys:
        raise ValueError("salted_join requires at least one key column")
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join preserves semantics only for inner/left joins, got {how!r}"
        )
    for c in (_SALT,):
        if c in left.columns or c in right.columns:
            raise ValueError(f"column {c!r} already exists on an input")

    l = left.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(salt_from)), F.lit(num_salts))
    )
    r = right.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<bigint>")),
    )
    out = l.join(r.hint("shuffle_hash"), keys + [_SALT], how)
    return out.drop(_SALT)
