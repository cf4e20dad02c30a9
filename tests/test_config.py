from __future__ import annotations

import pytest

from post_modern_stack_spark.config import EngineConfig


def test_default_config_validates():
    cfg = EngineConfig(sf_dir="/root/testdata/sf0.001").validate()
    assert cfg.max_len == 20 and cfg.train_frac == 0.9


@pytest.mark.parametrize(
    "kwargs,msg",
    [
        ({"sf_dir": "/nope/nothing"}, "sf_dir"),
        ({"start_date": "2020-01-01", "end_date": "2019-01-01"}, "date window"),
        ({"train_frac": 1.5}, "train_frac"),
        ({"max_len": 0}, "max_len"),
        ({"min_session_len": 0}, "min_session_len"),
        ({"max_sessions": -5}, "max_sessions"),
    ],
)
def test_invalid_configs_fail_fast(kwargs, msg):
    base = {"sf_dir": "/root/testdata/sf0.001"}
    base.update(kwargs)
    with pytest.raises(ValueError, match=msg):
        EngineConfig(**base).validate()


def test_driver_green_reads_correctness_files():
    """driver_green() unions recorded CORRECTNESS_r*.json greens with
    the static round-1 floor, and queries() lists every
    never-driver-checked entry before any green one."""
    import __spark_entry__ as m
    from post_modern_stack_spark.plans import entryflow

    green = entryflow.driver_green()
    # top_customers: green in round 1 with nonzero rows
    assert "sessionize" in green and "top_customers" in green
    names = list(m.queries())
    assert names[0] == "sessionize"
    seen_green_tail = False
    for n in names[1:]:
        is_green = n in green
        if seen_green_tail:
            assert is_green, f"unchecked query {n} listed after green ones"
        elif is_green:
            seen_green_tail = True


def test_driver_green_ignores_vacuous_zero_row_greens(tmp_path):
    """The vacuous-green filter, tested against a SYNTHETIC fixture
    (VERDICT r05 item 2: asserting a live catalog name stays
    non-green expires the moment the driver legitimately greens it —
    rich_idle_customers did exactly that in round 5). A hash match on
    an empty result proves the query compiles, not that its
    predicates select rows, so spark_rows == 0 must not count unless
    the name is in EXPECTED_EMPTY."""
    import json

    from post_modern_stack_spark.plans import entryflow

    rows = {
        "synthetic_real_green": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "spark_rows": 7,
            "oracle_rows": 7,
            "err": None,
        },
        "synthetic_vacuous_green": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "spark_rows": 0,
            "oracle_rows": 0,
            "err": None,
        },
        "synthetic_errored": {
            "rows_match": False,
            "schema_match": True,
            "hash_match": False,
            "spark_rows": 7,
            "oracle_rows": 7,
            "err": "boom",
        },
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(rows))
    green = entryflow.driver_green(root=str(tmp_path))
    assert "synthetic_real_green" in green
    assert "synthetic_vacuous_green" not in green  # 0-row = vacuous
    assert "synthetic_errored" not in green
    # the static round-1 floor still unions in under an override root
    assert "sessionize" in green
