from __future__ import annotations

import logging
import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep test JVM small

from pyspark.sql import SparkSession  # noqa: E402

logging.getLogger("py4j").setLevel(logging.WARNING)

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"
REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    session = (
        SparkSession.builder.master("local[4]")
        .appName("walmart-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield session
    session.stop()
