"""SQL-surface engine functions (SURVEY.md §4: "registering engine
functions as SQL UDFs for the SQL surface").

Spark 4 SQL scalar UDFs (``CREATE FUNCTION ... RETURN <expr>``) keep
the body as a Catalyst expression — fully codegen'd, no Python
boundary — so the SQL surface gets the same engine idioms the
DataFrame API exposes in ``functions/core.py``:

- ``pad_seq(arr, n)``        — D4 Keras-parity left-pad/keep-last-n
- ``normalize_sku(s)``       — C1/C2 lower + spaces→underscores
- ``json_get_str/long(j,k)`` — B1 permissive path extraction
- ``epoch_ms_to_date(ms)``   — C3 UTC date derivation
- ``cosine_sim(a, b)``       — K3 vector cosine (NULL on zero norm)
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FUNCTIONS = {
    "pad_seq": """
        CREATE OR REPLACE TEMPORARY FUNCTION pad_seq(arr ARRAY<INT>, n INT)
        RETURNS ARRAY<INT>
        RETURN concat(array_repeat(0, greatest(0, n - size(arr))),
                      slice(arr, greatest(1, size(arr) - n + 1), n))
    """,
    "normalize_sku": """
        CREATE OR REPLACE TEMPORARY FUNCTION normalize_sku(s STRING)
        RETURNS STRING
        RETURN lower(replace(s, ' ', '_'))
    """,
    "json_get_str": """
        CREATE OR REPLACE TEMPORARY FUNCTION json_get_str(j STRING, k STRING)
        RETURNS STRING
        RETURN get_json_object(j, concat('$.', k))
    """,
    "json_get_long": """
        CREATE OR REPLACE TEMPORARY FUNCTION json_get_long(j STRING, k STRING)
        RETURNS BIGINT
        RETURN try_cast(get_json_object(j, concat('$.', k)) AS BIGINT)
    """,
    "epoch_ms_to_date": """
        CREATE OR REPLACE TEMPORARY FUNCTION epoch_ms_to_date(ms BIGINT)
        RETURNS DATE
        RETURN to_date(timestamp_millis(ms))
    """,
    "cosine_sim": """
        CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
        RETURNS DOUBLE
        RETURN aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
               / nullif(sqrt(aggregate(a, 0.0D, (acc, v) -> acc + v * v))
                        * sqrt(aggregate(b, 0.0D, (acc, v) -> acc + v * v)), 0.0D)
    """,
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install every engine SQL function into the session; idempotent."""
    for ddl in _FUNCTIONS.values():
        spark.sql(ddl)
    return sorted(_FUNCTIONS)


def register_udtfs(spark: SparkSession) -> list[str]:
    """Install Python UDTFs (Spark 4 table-valued functions, callable
    from SQL FROM/LATERAL position).

    ``char_ngrams(text, n)`` emits one row per character n-gram — the
    table-function shape of the shingling step the dedup family uses.
    NOTE the cost model: a Python UDTF is a per-row Python boundary;
    it exists here to cover the SQL-surface API (the reference's dbt
    models consume table-valued SQL), while the scale path for
    shingling stays the builtin explode/transform pipeline in
    operators/dedup.py (JVM-side, codegen). Arrow batching is enabled
    for the transfer (spark.sql.execution.pythonUDTF.arrow.enabled).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, gram: string")
    class CharNgrams:
        def eval(self, text: str, n: int):  # noqa: D401 - UDTF contract
            if text is None or n is None or n <= 0:
                return
            for i in range(max(len(text) - n + 1, 0)):
                yield i, text[i : i + n]

    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult
    from pyspark.sql.types import IntegerType, StringType, StructType

    class SplitFields:
        """POLYMORPHIC UDTF (Spark 4 ``analyze()``): output schema is
        computed at PLAN TIME from the constant field-list argument —
        ``split_fields(line, 'a,b,c')`` yields columns (a, b, c). The
        dynamic-schema table function every CSV-ish SQL surface needs;
        schema resolution happens once in the optimizer, not per row.
        """

        @staticmethod
        def analyze(line: AnalyzeArgument, fields: AnalyzeArgument) -> AnalyzeResult:
            if fields.value is None:
                raise ValueError("split_fields: field list must be a constant")
            schema = StructType()
            for name in str(fields.value).split(","):
                schema = schema.add(name.strip(), StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, line: str, fields: str):
            names = str(fields).split(",")
            parts = (line or "").split(",")
            parts += [None] * (len(names) - len(parts))
            yield tuple(parts[: len(names)])

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("char_ngrams", CharNgrams)
    from pyspark.sql.functions import udtf as _udtf

    spark.udtf.register("split_fields", _udtf(SplitFields))
    return ["char_ngrams", "split_fields"]
