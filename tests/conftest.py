import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("mvrepair-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _release_owned_cache():
    """Session hygiene for the cache-ownership convention
    (mvrepair.cache): any frame an eager operator registered during a
    test is released afterwards, so owned cache never accumulates
    across the suite's single shared Spark session."""
    yield
    from mvrepair import cache

    cache.release_all()
