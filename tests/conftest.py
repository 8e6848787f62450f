import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF0001 = "/root/testdata/sf0.001"


def drop_warehouse_table(spark, name: str) -> None:
    """Drop a warehouse table AND its on-disk location. The tests run
    against the default in-memory catalog, which forgets tables between
    sessions while spark-warehouse/ directories persist — a bare DROP
    TABLE IF EXISTS in a fresh session is then a no-op and the stale
    directory fails the next saveAsTable with LOCATION_ALREADY_EXISTS.
    (A production deployment has a persistent metastore, where catalog
    and location stay in sync and plain DROP suffices.)"""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, name), ignore_errors=True)


@pytest.fixture(scope="session")
def spark():
    from page_rank_hadoop_spark import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def docs(spark):
    from page_rank_hadoop_spark.sources.catalog import load_table

    return load_table(spark, SF0001, "documents")


@pytest.fixture(scope="session")
def events(spark):
    from page_rank_hadoop_spark.sources.catalog import load_table

    return load_table(spark, SF0001, "events")
