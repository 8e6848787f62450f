import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF0001 = "/root/testdata/sf0.001"


def drop_warehouse_table(spark, name: str) -> None:
    """Test alias for sources/serving.drop_table_and_location (catalog
    entry + on-disk location — see its docstring for the in-memory-
    catalog stale-directory failure mode it exists to prevent)."""
    from page_rank_hadoop_spark.sources.serving import drop_table_and_location

    drop_table_and_location(spark, name)


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
