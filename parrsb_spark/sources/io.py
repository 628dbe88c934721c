"""Table IO facade — parquet now, Iceberg when the jars are present.

The north star targets Iceberg tables; this container ships no Iceberg
runtime jars, so the writer probes for the catalog and degrades to plain
parquet with identical call sites. On a real cluster, setting
`spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog` makes
`write_table`/`read_table` transparently use Iceberg (atomic commits,
snapshot reads — the checkpoint/lineage protocol in plans/lineage.py is
ordered so parquet-without-atomic-commit still resumes safely).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(df: DataFrame, target: str, mode: str = "overwrite") -> None:
    """target = Iceberg table name (catalog.db.tbl) if Iceberg is on the
    classpath and the name has no '/', else a parquet path."""
    spark = df.sparkSession
    if "/" not in target and iceberg_available(spark):
        writer = df.writeTo(target)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
    else:
        df.write.mode(mode if mode != "append" else "append").parquet(target)


def read_table(spark: SparkSession, target: str) -> DataFrame:
    if "/" not in target and iceberg_available(spark):
        return spark.read.table(target)
    return spark.read.parquet(target)
