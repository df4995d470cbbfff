"""diagnose_skew — heavy-hitter census + salt sizing for shuffle keys."""

import pandas as pd

from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import route


def _skewed(spark):
    # one hot tenant carries 80% of rows, the rest spread over 40 keys
    hot = spark.range(8000).select(
        F.lit("tenant-hot").alias("tenant"),
        F.col("id").alias("doc_id"))
    cold = spark.range(2000).select(
        F.concat(F.lit("t"), (F.col("id") % 40).cast("string")).alias("tenant"),
        (F.col("id") + 100000).alias("doc_id"))
    return hot.unionByName(cold)


def test_diagnose_skew_census_and_salt_sizing(spark):
    df = _skewed(spark)
    diag = route.diagnose_skew(
        df, ["tenant"], top=5, target_rows_per_task=1000).toPandas()
    assert diag.iloc[0]["key"] == "tenant-hot"
    # cardinality (41) << max_items_tracked: sketch counts are exact
    assert diag.iloc[0]["est_rows"] == 8000
    assert abs(diag.iloc[0]["row_frac"] - 0.8) < 1e-9
    assert diag.iloc[0]["salt_buckets"] == 8  # ceil(8000 / 1000)
    # cold keys need no salting
    assert (diag.iloc[1:]["salt_buckets"] == 1).all()


def test_diagnose_skew_feeds_salted_repartition(spark):
    df = _skewed(spark)
    buckets = int(
        route.diagnose_skew(df, ["tenant"], top=1, target_rows_per_task=1000)
        .toPandas().iloc[0]["salt_buckets"]
    )
    # at test scale every partition is tiny, so AQE would re-coalesce the
    # salted exchange into one partition; at real scale partitions exceed
    # the advisory size and the salt spread survives — pin it here
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        salted = route.salted_repartition(df, "tenant", buckets=buckets)
        parts = (
            salted.where(F.col("tenant") == "tenant-hot")
            .groupBy(F.spark_partition_id().alias("p"))
            .count()
            .toPandas()
        )
    finally:
        spark.conf.set(key, prev)
    # the hot key is spread over multiple tasks instead of one
    assert len(parts) >= 2
    assert parts["count"].max() < 8000


def test_diagnose_skew_composite_key(spark):
    pdf = pd.DataFrame({
        "a": ["x", "x", "x", "y"],
        "b": ["1", "2", "1", "1"],
        "doc_id": [1, 2, 3, 4],
    })
    diag = route.diagnose_skew(
        spark.createDataFrame(pdf), ["a", "b"], top=5).toPandas()
    assert diag.iloc[0]["key"] == "x\x1f1"
    assert diag.iloc[0]["est_rows"] == 2


def test_diagnose_skew_null_components_stay_distinct(spark):
    pdf = pd.DataFrame({
        "a": [None, "prod", None, "prod"],
        "b": ["prod", None, "prod", None],
    })
    diag = route.diagnose_skew(
        spark.createDataFrame(pdf.astype(object), "a string, b string"),
        ["a", "b"], top=5).toPandas()
    # (NULL, prod) and (prod, NULL) are different shuffle keys: the
    # census must report two keys of 2 rows, never one merged key of 4
    assert len(diag) == 2
    assert sorted(diag["est_rows"]) == [2, 2]
