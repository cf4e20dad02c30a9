"""Engine configuration with fail-fast validation (SURVEY.md §1.3:
"engine config object replaces .env vars", validated like the
reference's start step; reference src/local.env:1-17 +
src/my_dbt_flow.py:94-118).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    """All run-shaping knobs in one validated object.

    Defaults mirror the reference's local.env where a counterpart
    exists (MAX_SESSIONS, date window) and the driver contract where
    not (sf_dir).
    """

    sf_dir: str = field(
        default_factory=lambda: os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    api_key: str = "tenant-1"
    start_date: str = "2019-01-13"  # reference my_dbt_flow.py:35-45 defaults
    end_date: str = "2019-03-14"
    max_sessions: int | None = 1000  # reference local.env:9 MAX_SESSIONS
    train_frac: float = 0.9
    max_len: int = 20  # reference my_dbt_flow.py:308
    min_session_len: int = 3  # ARRAY_SIZE > 2, my_dbt_flow.py:243
    timezone: str = "UTC"
    shuffle_partitions: int = 32

    def validate(self) -> "EngineConfig":
        """Fail fast before any compute (reference my_dbt_flow.py:94-118
        asserts env + date sanity at flow start)."""
        errors = []
        if not os.path.isdir(self.sf_dir):
            errors.append(f"sf_dir does not exist: {self.sf_dir}")
        if not self.start_date < self.end_date:
            errors.append(
                f"bad date window: {self.start_date!r} >= {self.end_date!r}"
            )
        if not 0.0 < self.train_frac < 1.0:
            errors.append(f"train_frac out of (0,1): {self.train_frac}")
        if self.max_len <= 0:
            errors.append(f"max_len must be positive: {self.max_len}")
        if self.min_session_len < 1:
            errors.append(f"min_session_len must be >= 1: {self.min_session_len}")
        if self.max_sessions is not None and self.max_sessions <= 0:
            errors.append(f"max_sessions must be positive: {self.max_sessions}")
        if errors:
            raise ValueError("invalid EngineConfig: " + "; ".join(errors))
        return self
