

def test_temperature_weights_flatten_distribution(spark):
    """α=0.5 weights sit between uniform and proportional: the
    majority stratum's weight is below its corpus share, the minority
    stratum's above; weights sum to 1 over present strata; missing
    strata contribute nothing."""
    from ctgov_ai_etl_spark.operators.limits import temperature_weights

    rows = [(i, "big") for i in range(90)] + [(i + 100, "small") for i in range(10)]
    d = spark.createDataFrame(rows, "id long, src string")
    w = temperature_weights(d, "src", ["big", "ghost", "small"], alpha=0.5)
    assert set(w) == {"big", "small"}  # ghost absent
    assert abs(sum(w.values()) - 1.0) < 1e-12
    assert 0.5 < w["big"] < 0.9  # below its 0.9 corpus share
    assert 0.1 < w["small"] < 0.5  # above its 0.1 share
    import math
    denom = math.sqrt(90) + 0.0 + math.sqrt(10)
    assert w["big"] == math.sqrt(90) / denom  # exact fixed-order math


def test_spread_to_parallelism_contract(spark):
    """Spreads a single-partition frame to cluster parallelism, but is
    a NO-OP (same plan object) when the input already has enough
    partitions — the at-scale behavior."""
    from ctgov_ai_etl_spark.operators.limits import spread_to_parallelism

    par = spark.sparkContext.defaultParallelism
    one = spark.range(1000).coalesce(1)
    assert spread_to_parallelism(one).rdd.getNumPartitions() == par

    wide = spark.range(1000).repartition(par + 5)
    out = spread_to_parallelism(wide)
    assert out is wide  # untouched: no repartition node added
