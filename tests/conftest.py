from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zacks_estimates_financial_statements_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="zacks-spark-tests",
                      master="local[4]",
                      extra_conf={"spark.sql.shuffle.partitions": "4",
                                  "spark.ui.enabled": "false"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
