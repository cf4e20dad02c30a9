"""Stream-static dimension enrichment (SURVEY.md §2 J-family widened).

The reference enriches event rows with dimensional context inside its
SQL models (the session-date window join in
``shopping_events_exploded.sql:16-27`` is a static-relation join
applied to every new ETL batch). The streaming analog is Spark's
stream-static join: each micro-batch of the stream joins against a
static (or slowly-refreshed) dimension relation, statelessly — no
watermark is needed because the static side never expires.

100 TB posture: the dimension side is broadcast (dims are MB-to-GB
while the stream is unbounded), so enrichment adds zero shuffle to the
streaming plan; a changing dimension is handled by re-reading a
Delta/parquet dir per micro-batch (Spark re-plans the static side on
each trigger for file sources) — the slowly-changing-dimension refresh
pattern without restarting the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_events(
    events: DataFrame,
    dims: DataFrame,
    on: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Left-enrich (streaming or batch) events with a static dimension.

    Identical code path for batch and stream — stream-static joins are
    stateless micro-batch joins, so parity with the batch join is
    structural, not approximate. Broadcast hint keeps the streaming
    plan shuffle-free on the static side; `left` keeps unmatched events
    (enrichment must never drop facts).
    """
    if how not in ("left", "inner"):
        raise ValueError(
            f"stream-static enrichment supports left/inner, got {how!r}: "
            "right/full outer against an unbounded stream would need the "
            "static side to know stream completeness"
        )
    return events.join(F.broadcast(dims), on=on, how=how)
