"""External-job polling (SURVEY.md §2 I4).

The reference drives an external engine asynchronously: trigger a dbt
Cloud run over REST, then poll ``/runs/{id}/`` every 10 s until a
terminal status, failing the flow on error/cancel (reference
``src/clients/dbt_cloud_runner.py:24-120``; status codes mapped at
``:40-47``). This module reimplements that orchestration contract
engine-agnostically:

- :func:`poll_until_done` is the generic trigger-then-poll loop —
  injectable clock/sleep so tests run without wall-clock waits, the
  same status vocabulary as the reference (queued/running →
  success/error/cancelled), per-poll progress callback (the reference
  logs each poll at ``:105``), and a hard timeout that raises instead
  of hanging the pipeline.
- :class:`StreamingQueryJob` adapts a Structured Streaming query to
  the same interface: Spark's own long-running "external job" whose
  status lives on the driver. ``awaitTermination(timeout)`` already
  covers blocking waits; this adapter exists for DAGs that multiplex
  several async jobs under one polling loop, exactly how the reference
  flow babysits its dbt run while Metaflow owns the step lifecycle.

No driver-side data movement: polling reads only job metadata.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

# Reference status vocabulary (dbt_cloud_runner.py:40-47 maps dbt Cloud's
# numeric codes 1/2/3/10/20/30 to these). Terminal = the last three.
QUEUED = "queued"
STARTING = "starting"
RUNNING = "running"
SUCCESS = "success"
ERROR = "error"
CANCELLED = "cancelled"

TERMINAL = frozenset({SUCCESS, ERROR, CANCELLED})


class JobFailed(RuntimeError):
    """Raised when a polled job lands on error/cancelled (the reference
    raises on non-success at dbt_cloud_runner.py:113-118, failing the
    Metaflow step fast)."""


class JobTimeout(TimeoutError):
    """Raised when the job does not reach a terminal status inside
    ``timeout_s`` — the reference loops forever; a bounded deadline is
    the production-safe variant."""


@dataclass
class PollResult:
    status: str
    n_polls: int
    elapsed_s: float


def poll_until_done(
    get_status: Callable[[], str],
    *,
    interval_s: float = 10.0,
    timeout_s: float = 3600.0,
    on_poll: Callable[[int, str], None] | None = None,
    raise_on_failure: bool = True,
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
) -> PollResult:
    """Poll ``get_status`` every ``interval_s`` until a terminal status.

    Mirrors the reference loop (dbt_cloud_runner.py:96-118): sleep →
    fetch status → log → break on terminal; plus a deadline. ``sleep``
    and ``clock`` are injectable so tests simulate hours in
    microseconds. The first status check happens immediately (a job
    may already be finished), matching the reference's check-then-wait
    ordering.
    """
    start = clock()
    n = 0
    while True:
        status = get_status()
        n += 1
        if on_poll is not None:
            on_poll(n, status)
        if status in TERMINAL:
            if raise_on_failure and status != SUCCESS:
                raise JobFailed(f"job finished with status {status!r} after {n} polls")
            return PollResult(status=status, n_polls=n, elapsed_s=clock() - start)
        if clock() - start + interval_s > timeout_s:
            raise JobTimeout(
                f"job still {status!r} after {n} polls / {clock() - start:.0f}s "
                f"(timeout {timeout_s}s)"
            )
        sleep(interval_s)


@dataclass
class StreamingQueryJob:
    """Adapt a ``pyspark.sql.streaming.StreamingQuery`` to the polling
    vocabulary: RUNNING while active, SUCCESS once stopped cleanly,
    ERROR if the query died with an exception. Lets a DAG babysit
    streaming sinks through the same loop that watches any external
    engine."""

    query: object  # StreamingQuery (duck-typed for testability)
    _seen_error: bool = field(default=False, init=False)

    def status(self) -> str:
        if self.query.isActive:
            return RUNNING
        if self.query.exception() is not None:
            return ERROR
        return SUCCESS

    def poll(self, **kwargs) -> PollResult:
        return poll_until_done(self.status, **kwargs)
