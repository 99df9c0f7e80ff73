"""Table source abstraction: Iceberg catalog when configured, parquet dirs
otherwise.

The target deployment (BASELINE input_hint) reads Iceberg tables of web
pages. Iceberg support in Spark is pure configuration — a catalog jar plus
``spark.sql.catalog.<name>`` settings — after which ``spark.read.table``
works and Catalyst gets partition pruning + min/max file skipping on the
`bucket`/`term_id` filters exactly like the parquet layout we ship.

Routing: ``iceberg_jar_available`` probes the live JVM classpath for the
Iceberg SparkCatalog class; ``iceberg_session_conf`` builds the conf dict
that turns it on (pass to ``get_spark(extra_conf=...)``); ``read_table`` /
``write_table`` use the catalog when BOTH the conf and the jar are present,
raise loudly when the conf is set but the jar is missing (an explicitly
configured catalog must never silently degrade to parquet), and fall back
to plain parquet paths otherwise. tests/test_catalog.py is skip-paired on
jar presence, so an Iceberg-enabled environment (e.g. ``spark-submit
--packages org.apache.iceberg:iceberg-spark-runtime-...``) runs the real
catalog round-trip and this sandbox records a skip, not a silent pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# set spark.conf: lss.catalog = iceberg catalog name (e.g. "my_cat") to route
# table ids through an Iceberg catalog; unset -> treat ids as parquet paths
CATALOG_CONF = "lss.catalog"

# the class every iceberg-spark-runtime jar ships; its presence on the JVM
# classpath is the definitive "is Iceberg usable here" probe
_ICEBERG_CATALOG_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_jar_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is loadable in this session.

    Probes with Spark's own ``Utils.classForName`` first — it resolves
    through the session's mutable classloader, which is where
    ``spark.jars.packages``/``--jars`` land AFTER JVM launch (exactly the
    flow ``iceberg_session_conf`` documents), and is the same loader
    Spark's catalog instantiation uses. Plain ``Class.forName`` through
    the Py4J gateway loader is the fallback for baked-in-classpath
    deployments where the Utils call shape differs across Spark versions.
    """
    jvm = spark._jvm  # noqa: SLF001
    try:
        jvm.org.apache.spark.util.Utils.classForName(
            _ICEBERG_CATALOG_CLASS, True, False)
        return True
    except Exception:  # noqa: BLE001 - wrapped ClassNotFound / signature drift
        pass
    try:
        jvm.java.lang.Class.forName(_ICEBERG_CATALOG_CLASS)
        return True
    except Exception:  # noqa: BLE001
        return False


def iceberg_session_conf(catalog: str = "lss",
                         warehouse: str = "/tmp/lss_warehouse") -> dict:
    """The extra_conf that enables a Hadoop-warehouse Iceberg catalog named
    ``catalog`` — pass to ``session.get_spark(extra_conf=...)`` alongside a
    ``spark.jars.packages`` entry for the Iceberg runtime."""
    return {
        CATALOG_CONF: catalog,
        f"spark.sql.catalog.{catalog}": _ICEBERG_CATALOG_CLASS,
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def _catalog_name(spark: SparkSession) -> str | None:
    """The configured catalog name, or None. Raises when configured but the
    jar is absent — a user who explicitly pointed at an Iceberg catalog
    must get an error, not a silent parquet fallback."""
    try:
        name = spark.conf.get(CATALOG_CONF)
    except Exception:  # noqa: BLE001
        return None
    if not name:
        return None
    try:
        configured = spark.conf.get(f"spark.sql.catalog.{name}") is not None
    except Exception:  # noqa: BLE001
        configured = False
    if not configured:
        return None
    if not iceberg_jar_available(spark):
        raise RuntimeError(
            f"{CATALOG_CONF}={name!r} points at spark.sql.catalog.{name} "
            f"but {_ICEBERG_CATALOG_CLASS} is not on the JVM classpath — "
            "add the iceberg-spark-runtime jar (spark.jars.packages) or "
            "unset the catalog conf to use parquet paths")
    return name


def has_iceberg(spark: SparkSession) -> bool:
    return _catalog_name(spark) is not None


def read_table(spark: SparkSession, ident: str) -> DataFrame:
    """ident = 'db.table' (Iceberg, when configured) or a parquet path."""
    cat = _catalog_name(spark)
    if cat is not None:
        return spark.read.table(f"{cat}.{ident}")
    return spark.read.parquet(ident)


def write_table(df: DataFrame, ident: str, partition_by: list[str] | None = None,
                mode: str = "overwrite") -> None:
    spark = df.sparkSession
    cat = _catalog_name(spark)
    if cat is not None:
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
