"""Catalog-freeze guard (VERDICT round-4 item 8).

The driver verifies a bounded ~50-query window per round; rounds 2-4
held a registration freeze so the window could sweep the never-checked
backlog. Round 5's window covers the FINAL 46 never-checked
oracle-paired queries — any new registration before CORRECTNESS_r05.json
lands would displace one of them and re-open the saga.

This test fails on any catalog-size change until the round-5 driver
correctness file exists, then becomes a no-op (delete it afterwards,
per the verdict: "test present this round, removed next").
"""

import os

import pytest

FROZEN_QUERY_COUNT = 212
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_catalog_frozen_until_r05_correctness_lands():
    if os.path.exists(os.path.join(REPO_ROOT, "CORRECTNESS_r05.json")):
        pytest.skip("CORRECTNESS_r05.json recorded — freeze lifted")
    from post_modern_stack_spark.plans import entryflow

    assert len(entryflow.QUERIES) == FROZEN_QUERY_COUNT, (
        f"catalog changed size ({len(entryflow.QUERIES)} != "
        f"{FROZEN_QUERY_COUNT}) during the round-5 freeze; new "
        "registrations displace never-driver-checked queries from the "
        "bounded correctness window (VERDICT r04 item 1/8)"
    )


def test_window_covers_every_unverified_paired_query():
    """Every oracle-paired query without a green driver row must sit in
    the first 50 entries of queries() — the driver's check window —
    so CORRECTNESS_r05.json closes the paired catalog completely.
    """
    import __spark_entry__ as se
    from post_modern_stack_spark.plans import entryflow

    ordered = list(se.queries())
    window = set(ordered[:50])
    green = entryflow.driver_green()
    missing = [
        n
        for n in entryflow.ORACLES
        if n not in green and n not in window
    ]
    assert not missing, (
        f"oracle-paired queries outside the 50-slot driver window: "
        f"{missing} — pairing/deferral budget exceeded"
    )
