import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("osmquadtree-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    from osmquadtree_depreceated_spark.conf import apply_engine_conf

    apply_engine_conf(s)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    d = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    # export so sf-dependent lazy oracle builders (gate.q25_oracle_build)
    # freeze their literals against the SAME parquet the tests run on
    os.environ["SPARK_GRAFT_TEST_SF_DIR"] = d
    return d
