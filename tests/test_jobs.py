"""I4 external-job polling: the reference's trigger-then-poll contract
(dbt_cloud_runner.py:96-118) engine-agnostically, plus the Structured
Streaming adapter."""

from __future__ import annotations

import pytest

from post_modern_stack_spark import jobs


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps: list[float] = []

    def clock(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.sleeps.append(s)
        self.t += s


def test_poll_until_success_after_n_polls():
    clk = FakeClock()
    statuses = iter([jobs.QUEUED, jobs.STARTING, jobs.RUNNING, jobs.SUCCESS])
    seen = []
    res = jobs.poll_until_done(
        lambda: next(statuses),
        interval_s=10,
        timeout_s=3600,
        on_poll=lambda n, s: seen.append((n, s)),
        sleep=clk.sleep,
        clock=clk.clock,
    )
    assert res.status == jobs.SUCCESS and res.n_polls == 4
    assert clk.sleeps == [10, 10, 10]  # no sleep after the terminal poll
    assert seen[0] == (1, jobs.QUEUED) and seen[-1] == (4, jobs.SUCCESS)


def test_poll_raises_on_error_and_cancel():
    clk = FakeClock()
    for bad in (jobs.ERROR, jobs.CANCELLED):
        statuses = iter([jobs.RUNNING, bad])
        with pytest.raises(jobs.JobFailed):
            jobs.poll_until_done(
                lambda: next(statuses), interval_s=1, sleep=clk.sleep, clock=clk.clock
            )
    # raise_on_failure=False returns the terminal status instead
    res = jobs.poll_until_done(
        lambda: jobs.ERROR, raise_on_failure=False, sleep=clk.sleep, clock=clk.clock
    )
    assert res.status == jobs.ERROR


def test_poll_timeout_simulated_hours():
    clk = FakeClock()
    with pytest.raises(jobs.JobTimeout):
        jobs.poll_until_done(
            lambda: jobs.RUNNING,
            interval_s=10,
            timeout_s=3600,
            sleep=clk.sleep,
            clock=clk.clock,
        )
    # deadline respected: never sleeps past the timeout boundary
    assert clk.t <= 3600


def test_immediate_terminal_needs_no_sleep():
    clk = FakeClock()
    res = jobs.poll_until_done(
        lambda: jobs.SUCCESS, interval_s=10, sleep=clk.sleep, clock=clk.clock
    )
    assert res.n_polls == 1 and clk.sleeps == []


def test_streaming_query_adapter(spark, tmp_path):
    """A real Structured Streaming query through the poller: RUNNING
    while active, SUCCESS after a clean stop."""
    df = spark.readStream.format("rate").option("rowsPerSecond", "5").load()
    q = (
        df.writeStream.format("memory")
        .queryName("jobs_poll_probe")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        job = jobs.StreamingQueryJob(q)
        assert job.status() == jobs.RUNNING
    finally:
        q.stop()
        q.awaitTermination(30)
    clk = FakeClock()
    job = jobs.StreamingQueryJob(q)
    res = jobs.poll_until_done(
        job.status, interval_s=1, timeout_s=60, sleep=clk.sleep, clock=clk.clock
    )
    assert res.status == jobs.SUCCESS
