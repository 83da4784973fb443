"""AQE skew-join evidence for the way⋈node join side.

`way_bboxes` (operators/calcqts.py) documents its skew posture: the
AGGREGATION side is bounded by native partial min/max (salt measured
and defaulted off), and the JOIN side — a city-landmark node referenced
by half the ways — is handled by AQE skew-join splitting.  This test
makes that second claim load-bearing: a synthetic hot node (50% of all
refs) must make the final adaptive plan split the SortMergeJoin
(``skew=true``), and the split must not change the aggregated bboxes
(value-equal to the same job with skew splitting disabled).
"""

from pyspark.sql import functions as F

from osmquadtree_depreceated_spark.operators.calcqts import way_bboxes

_SKEW_CONF = {
    # production defaults split at 256MB; scale the trigger down to the
    # test's ~MB shuffle so the same code path runs
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}

N = 400_000


def _skewed_inputs(spark):
    # half the refs hit node 0 (the hot landmark), half are unique
    way_refs = spark.range(N).select(
        (F.col("id") % (N // 4)).alias("way_id"),
        (F.col("id") / (N // 4)).cast("long").alias("pos"),
        F.when(F.pmod("id", 2) == 0, F.lit(0))
         .otherwise(F.col("id")).alias("ref"),
    )
    nodes = spark.range(N).select(
        F.col("id").alias("node_id"),
        (F.pmod(F.col("id") * 7, F.lit(3600000000)) - 1800000000)
        .alias("lon"),
        (F.pmod(F.col("id") * 3, F.lit(1800000000)) - 900000000)
        .alias("lat"),
    )
    return way_refs, nodes


def _with_conf(spark, conf: dict):
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    return old


def _restore(spark, old: dict):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_hot_node_join_splits_and_matches(spark):
    way_refs, nodes = _skewed_inputs(spark)
    old = _with_conf(spark, _SKEW_CONF)
    try:
        wb = way_bboxes(way_refs, nodes)
        split_rows = sorted(map(tuple, wb.collect()))
        # collect() executed THIS Dataset's QueryExecution — read its
        # final adaptive plan, not a derived one
        plan = wb._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, (
            "hot-node join did not trigger an AQE skew split:\n"
            + plan[:2000]
        )

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        wb2 = way_bboxes(way_refs, nodes)
        plain_rows = sorted(map(tuple, wb2.collect()))
        assert "skew=true" not in (
            wb2._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        _restore(spark, old)

    assert split_rows == plain_rows
    assert len(split_rows) == N // 4
