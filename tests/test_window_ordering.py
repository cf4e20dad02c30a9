"""The driver verifies a bounded ~50-query window per round, so
__spark_entry__.queries() ordering IS the verification schedule. These
tests pin the contract (VERDICT round-3 items 1/4):

- never-driver-checked oracle-paired queries come first (after the
  sessionize smoke anchor), in registration order;
- DEFER_FROM_WINDOW names rank after EVERY non-deferred never-checked
  paired query (so they can never displace a never-checked family)
  but BEFORE rows-only entries — leftover window capacity fills with
  hash-gated deferred queries automatically, no manual un-defer;
- zero-row green rows (vacuous greens like round-3's
  sql_param_extract) do NOT count as driver-green.
"""

from __future__ import annotations

from unittest import mock

import __spark_entry__ as entry_mod
from post_modern_stack_spark.plans import entryflow

WINDOW = 50


def _order(green: frozenset, defer: tuple) -> list[str]:
    with mock.patch.object(entryflow, "driver_green", return_value=green), mock.patch.object(
        entryflow, "DEFER_FROM_WINDOW", defer
    ):
        return list(entry_mod.queries())


def test_current_window_holds_only_never_checked_paired():
    names = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    green = entryflow.driver_green()
    assert names[0] == "sessionize"
    window = names[1:WINDOW]
    backlog = [
        n
        for n in entryflow.QUERIES
        if n not in green and n in oracles and n not in entryflow.DEFER_FROM_WINDOW
    ]
    if len(backlog) >= WINDOW - 1:
        # oversubscribed: every window slot must be a never-checked
        # oracle-paired query, and deferred names must be outside it
        for n in window:
            assert n in oracles and n not in green, n
        for d in entryflow.DEFER_FROM_WINDOW:
            assert d not in window, d


def test_defer_auto_releases_when_backlog_fits():
    oracles = set(entryflow.ORACLES)
    paired = [n for n in entryflow.QUERIES if n in oracles and n != "sessionize"]
    defer = tuple(paired[:3])
    # green everything except ~10 paired stragglers + the deferred 3:
    # backlog (13) + anchor fits one window -> defer must be released
    stragglers = [n for n in paired if n not in defer][:10]
    green = frozenset(
        n for n in entryflow.QUERIES if n not in stragglers and n not in defer
    ) - {"sessionize"}
    names = _order(green, defer)
    window = names[:WINDOW]
    for d in defer:
        assert d in window, f"{d} not auto-released into the window"


def test_defer_holds_while_oversubscribed():
    oracles = set(entryflow.ORACLES)
    paired = [n for n in entryflow.QUERIES if n in oracles and n != "sessionize"]
    assert len(paired) > WINDOW + 3, "catalog no longer oversubscribes a window"
    defer = tuple(paired[:3])
    names = _order(frozenset(), defer)  # nothing green: max backlog
    window = names[:WINDOW]
    for d in defer:
        assert d not in window, f"{d} displaced a never-checked query"


def test_zero_row_green_rows_do_not_count():
    green = entryflow.driver_green()
    # round-3 recorded sql_param_extract as a hash-match on 0 rows;
    # driver_green must ignore it so the fixed query re-enters the
    # window (it may legitimately become green in a LATER round's file
    # once a nonzero-row match is recorded)
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.abspath(entry_mod.__file__))
    zero_row_only = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(path)).items():
            if not isinstance(row, dict) or row.get("err") is not None:
                continue
            flags = [v for v in row.values() if isinstance(v, bool)]
            if flags and all(flags):
                if row.get("spark_rows", 0) > 0:
                    zero_row_only[name] = False
                else:
                    zero_row_only.setdefault(name, True)
    for name, only_vacuous in zero_row_only.items():
        if only_vacuous:
            assert name not in green, f"vacuous green {name} counted as verified"
