"""Scale-mechanics tests: salted ops equal naive ops; bucketed joins
co-locate without a shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from ctgov_ai_etl_spark.operators.skew import salted_agg_sum_count, salted_join
from ctgov_ai_etl_spark.tables import load_table
from tests.conftest import SF_SMALL


def test_salted_agg_equals_plain_agg(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    salted = salted_agg_sum_count(li, "l_returnflag", cents, "l_orderkey", n_salts=8)
    plain = li.groupBy("l_returnflag").agg(
        (F.sum(cents).cast("double") / 100).alias("sum_measure"),
        F.count("*").alias("n_rows"),
    )
    key = lambda r: r["l_returnflag"]  # noqa: E731
    assert sorted(map(tuple, salted.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, plain.collect()), key=lambda t: t[0]
    )


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    dim = spark.createDataFrame(
        [("A", "returned"), ("N", "kept"), ("R", "refunded")],
        "l_returnflag string, flag_name string",
    )
    salted = salted_join(li, dim, "l_returnflag", "l_orderkey", n_salts=4).select(
        "l_orderkey", "l_linenumber", "flag_name"
    )
    plain = li.join(dim, "l_returnflag").select("l_orderkey", "l_linenumber", "flag_name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """bucketBy co-location: two tables bucketed on the join key join
    with NO Exchange on either side — the pre-shuffled layout that
    amortizes one write-time shuffle across every later join."""
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("o_b")
    joined = spark.table("li_b").join(
        spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    # disable broadcast so the join strategy is sort-merge over buckets
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        joined.write.format("noop").mode("overwrite").save()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_nested_schema_pruning_reads_only_projected_leaf(spark, tmp_path):
    """Projecting one struct leaf must prune the parquet ReadSchema to
    that leaf — at 100 TB a nested-record scan that deserializes every
    module to answer a one-field query is the difference between a
    column read and a table read (reference R5's nested study record)."""
    src = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
            F.struct(F.col("o_orderpriority").alias("priority")).alias("meta"),
        ).alias("rec"),
    )
    out = str(tmp_path / "nested")
    src.write.mode("overwrite").parquet(out)
    q = spark.read.parquet(out).select(F.col("rec.meta.priority").alias("p"))
    q.write.format("noop").mode("overwrite").save()
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert m, plan
    schema_line = m[0]
    assert "priority" in schema_line
    assert "price" not in schema_line and "status" not in schema_line, schema_line


def test_bloom_prefilter_prunes_without_false_negatives(spark):
    """The bloom pre-filter must pass EVERY true match (no false
    negatives ⇒ exact semi-join results) while pruning most
    non-members map-side (the point of the runtime filter)."""
    from ctgov_ai_etl_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )
    from tests.conftest import SF_SMALL

    li = load_table(spark, SF_SMALL, "lineitem")
    urgent = load_table(spark, SF_SMALL, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    words = bloom_build(urgent.select("o_orderkey"), "o_orderkey", 1 << 17, 5)
    n_fact = li.count()
    n_pass = li.filter(
        bloom_might_contain(F.col("l_orderkey"), words, 5)
    ).count()
    n_true = li.join(
        urgent.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    ).count()
    assert n_true <= n_pass  # no false negatives
    assert n_pass < n_fact  # actually prunes
    # false-positive volume stays a small fraction of the pruned mass
    assert (n_pass - n_true) <= 0.01 * n_fact + 50


def test_compaction_collapses_file_count_and_preserves_rows(spark, tmp_path):
    """Small-file compaction: 64 fragment files -> bounded file count,
    zero row loss, identical content hash per row set."""
    import glob
    import os

    from ctgov_ai_etl_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    frag = str(tmp_path / "frag")
    compact = str(tmp_path / "compact")
    d.repartition(64).write.mode("overwrite").parquet(frag)
    assert len(glob.glob(os.path.join(frag, "*.parquet"))) == 64
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(compact)
    files = glob.glob(os.path.join(compact, "*.parquet"))
    assert len(files) == 4
    back = spark.read.parquet(compact)
    assert back.count() == d.count()
    from pyspark.sql import functions as F

    def content_sum(df):
        return (
            df.select(F.sum(F.crc32(F.concat_ws("|", "doc_id", "text"))).alias("s"))
            .collect()[0]["s"]
        )

    assert content_sum(back) == content_sum(d)


def test_key_skew_profile_hand_computed(spark):
    """Exact profile on a hand-built skewed frame: 1 hot key (6 rows)
    + 3 singletons -> n_keys=4, n_rows=9, max=6, top2=7,
    top2_frac=777777 ppm, imbalance = 6*4/9 = 2666666 ppm."""
    from ctgov_ai_etl_spark.operators.skew import key_skew_profile

    rows = [(i, "hot") for i in range(6)] + [
        (10, "a"), (11, "b"), (12, "c")
    ]
    d = spark.createDataFrame(rows, "id long, k string")
    r = key_skew_profile(d, "k", top_n=2).collect()[0]
    assert (r.n_keys, r.n_rows, r.max_key_count, r.topn_count) == (4, 9, 6, 7)
    assert r.topn_frac_pm == 7 * 1_000_000 // 9
    assert r.imbalance_pm == 6 * 4 * 1_000_000 // 9


def test_zorder_layout_skips_more_row_groups_than_linear_sort(spark, tmp_path):
    """The data-skipping claim behind maintenance_zorder, proven on
    real parquet footers: write lineitem (l_partkey, l_suppkey) once
    sorted by the Morton code and once linearly by l_partkey, with
    small row groups; for a 2-D box predicate, the fraction of row
    groups whose [min, max] rectangles intersect the box — exactly
    what parquet stats-based skipping reads — must be materially
    smaller under z-order.  A linear sort bounds only its leading key;
    the Morton order bounds BOTH dimensions per row group."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ctgov_ai_etl_spark.functions.zorder import morton2
    from ctgov_ai_etl_spark.tables import load_table
    from tests.conftest import SF_SMALL

    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    z = morton2(F.col("l_partkey"), F.col("l_suppkey"))
    layouts = {
        "zorder": li.repartition(1).sortWithinPartitions(z),
        "linear": li.repartition(1).sortWithinPartitions("l_partkey"),
    }
    # 2-D box: a narrow range in BOTH dimensions.
    lo_p, hi_p, lo_s, hi_s = 10, 30, 10, 30

    def overlap_fraction(path: str) -> float:
        touched = total = 0
        for f in pq.ParquetDataset(path).files:
            md = pq.ParquetFile(f).metadata
            cols = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                sp = g.column(cols["l_partkey"]).statistics
                ss = g.column(cols["l_suppkey"]).statistics
                total += 1
                if (
                    sp.min <= hi_p and sp.max >= lo_p
                    and ss.min <= hi_s and ss.max >= lo_s
                ):
                    touched += 1
        assert total >= 8, f"need enough row groups to compare ({total})"
        return touched / total

    fracs = {}
    for name, df in layouts.items():
        out = str(tmp_path / name)
        # maxRecordsPerFile rolls sequential files off the sorted
        # stream — one row group each, the unit parquet stats skip.
        (
            df.write.mode("overwrite")
            .option("maxRecordsPerFile", 400)
            .parquet(out)
        )
        fracs[name] = overlap_fraction(out)
    # Same rows, same predicate — the layout alone must cut the
    # touched-row-group fraction at least in half.
    assert fracs["zorder"] <= fracs["linear"] / 2, fracs
