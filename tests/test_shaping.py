

def test_pps_systematic_sample_properties(spark):
    """Systematic PPS: a row holding >1/k of the group weight is
    always picked; uniform weights give exactly k evenly spaced picks
    with ranks 1..k; float weights are rejected (cross-engine replay
    needs integer sums)."""
    import pytest
    from pyspark.sql import functions as F

    from post_modern_stack_spark.operators.shaping import pps_systematic_sample

    # one heavy row (60% of mass) among 99 light ones
    df = spark.range(100).select(
        F.lit("g").alias("grp"),
        F.col("id"),
        F.when(F.col("id") == 42, F.lit(594)).otherwise(F.lit(4)).alias("wt"),
    )
    picks = pps_systematic_sample(df, ["grp"], "wt", "id", 5).collect()
    ids = {r["id"] for r in picks}
    assert 42 in ids, "heavy row must be a near-certain pick"
    assert len(picks) <= 5 + 2  # heavy row may absorb several thresholds

    uniform = spark.range(100).select(
        F.lit("g").alias("grp"), F.col("id"), F.lit(1).alias("wt")
    )
    u = sorted(r["id"] for r in pps_systematic_sample(uniform, ["grp"], "wt", "id", 5).collect())
    assert len(u) == 5 and u == [19, 39, 59, 79, 99]  # every 20th row

    floaty = df.withColumn("wt", F.col("wt").cast("double"))
    with pytest.raises(TypeError):
        pps_systematic_sample(floaty, ["grp"], "wt", "id", 5)
