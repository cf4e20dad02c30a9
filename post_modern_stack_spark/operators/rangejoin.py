"""Range (interval) join — pair left rows with right rows whose time
falls in a per-left-row window, without a theta-join explosion.

Spark executes a raw inequality join as BroadcastNestedLoopJoin (O(n·m)
— unusable at scale). The scale shape is *bucketing*: quantize time
into coarse buckets, equi-join on (key, bucket) so the shuffle machinery
does the pairing, then refine with the exact range predicate. A window
spanning ``k`` buckets costs ``k+1`` candidate buckets per left row —
constant fan-out, fully shuffle-partitioned, AQE-eligible.

``interval_join_buckets`` picks the candidate buckets on the *left*
side (explode of a ``sequence``), keeping the right side — typically
the larger event stream — exploded-free and scanned once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def interval_join_buckets(
    left: DataFrame,
    right: DataFrame,
    *,
    by: Sequence[str],
    left_time: str,
    right_time: str,
    lookback: int,
    bucket: int | None = None,
    strict_upper: bool = True,
) -> DataFrame:
    """Join right rows with ``left_time - lookback <= right_time <
    left_time`` (``<=`` when ``strict_upper=False``), per ``by`` key.

    ``bucket`` (default ``lookback``) is the quantization width in the
    time column's units: each left row explodes to the
    ``lookback/bucket + 1`` candidate buckets its window can touch;
    right rows map to exactly one bucket. The equi-join on
    (by..., bucket) is an ordinary shuffled hash join — broadcastable,
    AQE-skew-splittable — and the exact predicate prunes the candidates.

    Inner semantics: callers needing per-left-row outer behavior (e.g.
    "0 matches" rows) should aggregate this result and left-join it
    back to ``left`` — cheaper than threading outer semantics through
    the bucket explode.

    Non-``by`` column names (including the two time columns) must be
    disjoint between the sides — rename before calling.
    """
    by = list(by)
    bucket = bucket or lookback

    lt, rt = F.col(left_time), F.col(right_time)
    l = left.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor((lt - F.lit(lookback)) / F.lit(bucket)),
                F.floor(lt / F.lit(bucket)),
            )
        ),
    )
    r = right.withColumn(_BUCKET, F.floor(rt / F.lit(bucket)))
    upper_ok = (rt < lt) if strict_upper else (rt <= lt)
    refined = l.join(r, on=[*by, _BUCKET], how="inner").filter(
        (rt >= lt - F.lit(lookback)) & upper_ok
    )
    return refined.drop(_BUCKET)
