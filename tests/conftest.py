import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from bytewax_iceberg_connector_spark.session import get_spark

    import tempfile

    scratch = tempfile.mkdtemp(prefix="bic_test_")
    spark = get_spark(
        app_name="tests",
        master="local[4]",
        **{
            "spark.sql.shuffle.partitions": "4",
            "spark.ui.enabled": "false",
            # managed-table surface (bucketing tests): keep the warehouse
            # and the Derby metastore out of the repo tree
            "spark.sql.warehouse.dir": f"{scratch}/warehouse",
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={scratch}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
