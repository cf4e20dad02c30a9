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
    # top_customers: green in round 1 with nonzero rows (unlike the
    # vacuous 0-row greens, which driver_green must NOT count)
    assert "sessionize" in green and "top_customers" in green
    assert "rich_idle_customers" not in green  # 0-row green = vacuous
    names = list(m.queries())
    assert names[0] == "sessionize"
    seen_green_tail = False
    for n in names[1:]:
        is_green = n in green
        if seen_green_tail:
            assert is_green, f"unchecked query {n} listed after green ones"
        elif is_green:
            seen_green_tail = True
