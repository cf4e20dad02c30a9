"""Bounded reads of Observation metrics (the §7 observe pattern).

``Observation.get`` blocks with NO timeout, so any Spark build/config
where an eager action (localCheckpoint) materializes outside the
tracked query execution would hang forever. Poll the JVM-side
``getOrEmpty`` (each call waits ≤100 ms) up to ``timeout_s``; once the
metric is present ``obs.get`` returns without blocking. Returns
``None`` when the metric never fires (or the internal accessor is
unavailable on this build) — callers degrade to their pre-observe
fallback (an explicit aggregate job), never a hang. Same posture as
the r11 ADVICE fix in dedup._observed_n_changed.
"""

from __future__ import annotations

import time


def observed_value(obs, key: str, timeout_s: float = 30.0):
    jo = getattr(obs, "_jo", None)
    if jo is None:
        return None
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            if not jo.getOrEmpty().isEmpty():
                return obs.get[key]
        except Exception:
            return None
    return None
