

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
