"""Pages-table IO behind one interface: Iceberg catalog when available,
identically-partitioned Parquet otherwise.

The north star targets an Iceberg table of Common-Crawl-style pages at 10^12
docs. This sandbox's PySpark ships no Iceberg runtime jar (SURVEY.md §7
Phase 0 — verified against ``pyspark/jars``), so:

* ``PagesTable`` resolves to Iceberg (``catalog.db.table`` identifier) when
  the session has an Iceberg catalog configured (``spark.sql.catalog.<name>``
  with the Iceberg implementation class), else to a ``lang``/``day``
  hive-partitioned Parquet directory with the same layout.
* Both paths expose the same partition keys, so partition pruning works
  identically, and every reader in this repo (jobs, checkpoint units) takes
  a ``PagesTable`` and stays storage-agnostic.

The Iceberg branch follows the public Spark-Iceberg API
(``spark.read.table``, ``writeTo(...).partitionedBy(...)``) and is
exercised only when a jar is provisioned; the Parquet branch is the tested
path in this environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_COLUMNS = ("url", "warc_ts", "html", "text", "lang")
PARTITION_KEYS = ("lang", "day")

_ICEBERG_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"


def has_iceberg_catalog(spark: SparkSession, catalog: str = "iceberg") -> bool:
    """True iff ``catalog`` is configured with the ICEBERG catalog impl —
    any other configured catalog (Delta, JDBC) must not read as Iceberg.
    Note :class:`PagesTable` resolves its backend purely on the
    ``iceberg:`` location prefix; this helper only answers whether such a
    location could bind in this session."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    return impl == _ICEBERG_CATALOG_IMPL


class PagesTable:
    """One pages table, addressed either as ``iceberg:<catalog.db.table>``
    or as a Parquet directory path."""

    def __init__(self, location: str) -> None:
        self.is_iceberg = location.startswith("iceberg:")
        self.location = location.removeprefix("iceberg:")

    def read(self, spark: SparkSession) -> DataFrame:
        if self.is_iceberg:
            return spark.read.table(self.location)
        return spark.read.parquet(self.location)

    def read_partition(self, spark: SparkSession, lang: str | None = None,
                       day: str | None = None) -> DataFrame:
        """Partition-pruned read; pruning reaches the scan in both backends
        (Iceberg partition spec / hive directory layout)."""
        df = self.read(spark)
        if lang is not None:
            df = df.filter(F.col("lang") == lang)
        if day is not None:
            df = df.filter(F.col("day") == str(day))
        return df

    def days(self, spark: SparkSession) -> list[str]:
        return sorted(str(r["day"]) for r in
                      self.read(spark).select("day").distinct().collect())

    def write(self, df: DataFrame, mode: str = "append") -> None:
        """Write with the canonical (lang, day) partitioning."""
        if "day" not in df.columns:
            df = df.withColumn("day", F.to_date("warc_ts"))
        if self.is_iceberg:
            writer = df.writeTo(self.location).partitionedBy("lang", "day")
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()
        else:
            (df.write.mode(mode).partitionBy("lang", "day")
             .parquet(self.location))
