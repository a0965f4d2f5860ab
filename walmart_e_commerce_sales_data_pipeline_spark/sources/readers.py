"""Source readers.

The reference supports CSV and Parquet scans
(/root/reference/wallmart_pipeline.py:52-53).  This engine adds JSON and
JDBC, and insists on explicit schemas for schemaful-less formats: at 100 TB
an ``inferSchema`` CSV read is a full extra pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# Tables shipped by the driver testdata (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan (reference O1, wallmart_pipeline.py:52).

    Explicit schema strongly preferred; ``inferSchema`` is accepted for
    exploratory use but costs a second scan of every file.
    """
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (reference O2, wallmart_pipeline.py:53).

    Column pruning and predicate pushdown reach the footer/page level via
    the vectorized reader — downstream code should select/filter early and
    let Catalyst push both into this scan.
    """
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """JSON-lines scan (engine extension; not in the reference)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (engine extension; not in the reference).

    Same columnar posture as parquet: the vectorized ORC reader prunes
    columns and pushes predicates to stripe/row-group level (asserted in
    tests/test_sources_roundtrip.py).  Avro, by contrast, stays un-shipped:
    its data-source module (`spark-avro`) is external since Spark 2.4 and
    the sandbox has no jar — same documented gate as Delta/Iceberg.
    """
    return spark.read.orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC scan — parallel when a numeric partition column is given.

    Counterpart of the reference's SQLAlchemy/Postgres surface
    (wallmart_pipeline.py:145-148).  Without partitioning options a JDBC
    read is a single connection / single task — never acceptable for a
    large table, hence the explicit stride parameters.
    """
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 32))
        )
    return reader.load()


def load_testdata(spark: SparkSession, sf_dir: str, *tables: str) -> dict[str, DataFrame]:
    """Load driver testdata parquet tables from ``sf_dir``.

    Returns {name: DataFrame}. With no names given, loads all tables.
    """
    names = tables or TESTDATA_TABLES
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}
