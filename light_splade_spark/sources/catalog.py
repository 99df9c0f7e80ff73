"""Table source abstraction: Iceberg catalog when configured, parquet dirs
otherwise.

The target deployment (BASELINE input_hint) reads Iceberg tables of web
pages. Iceberg support in Spark is pure configuration — a catalog jar plus
``spark.sql.catalog.<name>`` settings — after which ``spark.read.table``
works and Catalyst gets partition pruning + min/max file skipping on the
`bucket`/`term_id` filters exactly like the parquet layout we ship. This
sandbox has no Iceberg runtime jar, so the fallback path (plain parquet
directories with identical layout + pruning semantics) is what tests
exercise; the Iceberg path is the same one-liner with a table identifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# set spark.conf: lss.catalog = iceberg catalog name (e.g. "my_cat") to route
# table ids through an Iceberg catalog; unset -> treat ids as parquet paths
CATALOG_CONF = "lss.catalog"


def has_iceberg(spark: SparkSession) -> bool:
    try:
        name = spark.conf.get(CATALOG_CONF)
    except Exception:  # noqa: BLE001
        return False
    if not name:
        return False
    try:
        return spark.conf.get(f"spark.sql.catalog.{name}") is not None
    except Exception:  # noqa: BLE001
        return False


def read_table(spark: SparkSession, ident: str) -> DataFrame:
    """ident = 'db.table' (Iceberg, when configured) or a parquet path."""
    if has_iceberg(spark):
        cat = spark.conf.get(CATALOG_CONF)
        return spark.read.table(f"{cat}.{ident}")
    return spark.read.parquet(ident)


def write_table(df: DataFrame, ident: str, partition_by: list[str] | None = None,
                mode: str = "overwrite") -> None:
    spark = df.sparkSession
    if has_iceberg(spark):
        cat = spark.conf.get(CATALOG_CONF)
        w = df.writeTo(f"{cat}.{ident}")
        if partition_by:
            from pyspark.sql import functions as F
            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ident)
