"""Guard against the NOTES_r5 float-rounding landmine (VERDICT r3 #3).

``round(avg(x), k)`` over a fixed-decimal double column is a latent
cross-run flake: the double sum inside avg() depends on partial-
aggregate merge order (task completion order), so when the true mean
sits exactly on a k-dp rounding boundary the rounded digit can flip
between runs of the SAME engine. The deterministic forms are:

- integer-valued x     → plain avg is fine (integer partial sums are
                         exact doubles below 2^53, order-independent)
- fixed 2dp x          → ``sum(CAST(round(x*100) AS BIGINT))/100.0/count(x)``
                         (``functions.core.cents`` / ``exact_avg``)
- arbitrary-mantissa x → plain avg is fine (a true mean with a full
                         mantissa cannot sit exactly on a boundary)

This test greps the catalog sources for rounded averages and fails on
any site not in the audited allowlist below, forcing new queries to
classify their argument (SURVEY.md §5 strategy: mechanical guards for
known cross-engine hazards).
"""

from __future__ import annotations

import re
from pathlib import Path

PLANS = Path(__file__).resolve().parents[1] / "post_modern_stack_spark" / "plans"
OPERATORS = Path(__file__).resolve().parents[1] / "post_modern_stack_spark" / "operators"

# audited argument prefixes (normalized: whitespace collapsed).
# Every entry is integer-valued (counts, lengths, day/ms gaps,
# integer-valued TPC-H quantity, 0/1 indicator) or has an arbitrary
# mantissa (theta-adjusted metrics, embedding dot products,
# percentile-clipped mixtures) — see module docstring for why each
# class is flake-free.
SQL_ALLOWED_PREFIXES = (
    "len(",                 # array/list lengths — integers
    "CASE WHEN CAST(inter", # 0/1 hit indicator — integers
    "CASE WHEN y_enc BETWEEN",  # HitRate@K 0/1 indicator — integers
    "n)", "n,", "n ",       # pre-aggregated counts
    "d.dau",                # daily-active counts — integers
    "l_quantity",           # integer-valued TPC-H quantity
    "epoch_ms(",            # ms gaps — integers
    "days_to_ship",         # day gaps — integers
    "adjusted_c",           # theta-adjusted (arbitrary mantissa)
    "list_sum(list_transform(embedding",  # dot products (arb. mantissa)
    "n_chars",              # char counts — integers
    "least(greatest(e.value, th.p05",     # percentile-clipped mixture
)
SPARK_ALLOWED_PREFIXES = (
    '"n"', '"dau"', '"l_quantity"', '"days_to_ship"', '"n_chars"',
    '"adjusted_c"',
    'F.col("od_ms"',        # ms gaps — integers
    "F.size(",              # array lengths — integers
    "clipped",              # percentile-clipped mixture
    "F.aggregate(sq",       # squared-norm sums (arbitrary mantissa)
    "F.array_contains(",    # HitRate@K 0/1 indicator — integers
)

SQL_RE = re.compile(r"round\(\s*avg\(([\s\S]{0,60})")
SPARK_RE = re.compile(r"F\.round\(\s*F\.avg\(([\s\S]{0,60})")


def _scan(pattern: re.Pattern, allowed: tuple[str, ...]) -> list[str]:
    bad = []
    for path in sorted(list(PLANS.glob("*.py")) + list(OPERATORS.glob("*.py"))):
        text = path.read_text()
        for m in pattern.finditer(text):
            arg = re.sub(r"\s+", " ", m.group(1)).strip()
            if not any(arg.startswith(p) for p in allowed):
                line = text[: m.start()].count("\n") + 1
                bad.append(f"{path.name}:{line}: round(avg({arg!r}")
    return bad


def test_no_unaudited_rounded_averages_sql():
    bad = _scan(SQL_RE, SQL_ALLOWED_PREFIXES)
    assert not bad, (
        "unaudited round(avg(...)) in oracle SQL — use the exact-cents "
        "sum form (functions.core.exact_avg docstring) or extend the "
        f"audited allowlist with a safety argument: {bad}"
    )


def test_no_unaudited_rounded_averages_spark():
    bad = _scan(SPARK_RE, SPARK_ALLOWED_PREFIXES)
    assert not bad, (
        "unaudited F.round(F.avg(...)) in a catalog plan — use "
        "functions.core.exact_avg (or justify + allowlist): "
        f"{bad}"
    )


# ---------------------------------------------------------------------------
# int64-overflow guard (round-4 review finding): a long F.sum over a
# PRODUCT of cents factors overflows at 100 TB group sizes — ANSI
# ARITHMETIC_OVERFLOW on Spark, HUGEINT widening on DuckDB. Such sums
# must go through functions.core.sum128 (decimal(38,0) accumulator).
# ---------------------------------------------------------------------------

PRODUCT_SUM_RE = re.compile(r"F\.sum\(\s*cents\([^)]*\)\s*\*")


def test_no_long_sums_of_cents_products():
    bad = []
    for path in sorted(list(PLANS.glob("*.py")) + list(OPERATORS.glob("*.py"))):
        text = path.read_text()
        for m in PRODUCT_SUM_RE.finditer(text):
            line = text[: m.start()].count("\n") + 1
            bad.append(f"{path.name}:{line}")
    assert not bad, (
        "long F.sum over a cents PRODUCT — overflows int64 at 100 TB "
        f"group sizes; use functions.core.sum128: {bad}"
    )
