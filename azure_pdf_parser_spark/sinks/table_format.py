"""Table-format seam: parquet-dir today, Iceberg on a real deployment.

SURVEY maps the production sinks to Iceberg tables (north_rule:
"... emit ParserOutput ... into Iceberg tables"). The sandbox has no
Iceberg runtime jars or catalog, so the engine ships the seam instead
of a dead import: every job-level write/read goes through a
:class:`TableFormat` object, with

* :class:`ParquetDirFormat` — the default, byte-identical to the
  previous direct ``df.write.parquet`` behavior (run-scoped dirs +
  marker-file commit, plans/manifest.py), and
* :class:`IcebergFormat` — the drop-in for a cluster with an Iceberg
  catalog configured (``spark.sql.catalog.<name>`` +
  ``iceberg-spark-runtime`` on the classpath). It writes through the
  DataFrameWriterV2 API (``df.writeTo(...).append()``), which commits
  one atomic snapshot per run — the run-marker protocol's step 2–3
  collapse into that snapshot commit, exactly as documented in
  plans/manifest.py. Reads go through the catalog table name, so time
  travel (``VERSION AS OF``) replaces the committed-run-dir filter.

The availability probe is a *config* check, not an import check:
Iceberg's Spark integration is JVM-side, so the Python process can't
``import`` it — the reliable signal is whether the session has a
catalog implementation registered under the requested name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class TableFormat:
    """Destination abstraction for job-level table writes/reads.

    ``dest`` strings are format-interpreted: a filesystem/object-store
    directory for parquet, a ``db.table`` identifier for Iceberg.
    """

    def write(
        self, df: DataFrame, dest: str, mode: str = "error", partition_by: tuple = ()
    ) -> None:
        raise NotImplementedError

    def read(self, spark: SparkSession, dest: str, schema=None) -> DataFrame:
        raise NotImplementedError


class ParquetDirFormat(TableFormat):
    """Parquet directory — the sandbox default. Atomicity comes from the
    run-scoped-dir + marker protocol in plans/manifest.py."""

    def write(
        self, df: DataFrame, dest: str, mode: str = "error", partition_by: tuple = ()
    ) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(dest)

    def read(self, spark: SparkSession, dest: str, schema=None) -> DataFrame:
        r = spark.read
        if schema is not None:
            r = r.schema(schema)  # no inference pass over a 100 TB table
        return r.parquet(dest)


def iceberg_table_name(catalog: str, dest: str) -> str:
    """``dest`` (``db.table`` or bare ``table``) → fully qualified name.

    Pure so it is testable without an Iceberg runtime."""
    if not dest or dest.startswith(".") or dest.endswith("."):
        raise ValueError(f"invalid iceberg table identifier: {dest!r}")
    return f"{catalog}.{dest}" if catalog else dest


def iceberg_available(spark: SparkSession, catalog: str) -> bool:
    """True iff the session registers a catalog implementation under
    ``catalog`` (e.g. ``spark.sql.catalog.prod =
    org.apache.iceberg.spark.SparkCatalog``)."""
    try:
        return bool(spark.conf.get(f"spark.sql.catalog.{catalog}"))
    except Exception:
        return False


class IcebergFormat(TableFormat):
    """Iceberg catalog tables via DataFrameWriterV2.

    One ``append()`` = one atomic snapshot commit; concurrent runs
    serialize through Iceberg's optimistic commit protocol, so the
    marker-file step of the parquet protocol is unnecessary — a crash
    mid-write publishes nothing. Requires the session to be launched
    with the Iceberg runtime jar and a catalog config; in this sandbox
    that is absent and every call raises the guidance error below
    (pinned by tests/test_table_format.py).
    """

    def __init__(self, catalog: str = "spark_catalog"):
        self.catalog = catalog

    def _require(self, spark: SparkSession) -> None:
        if not iceberg_available(spark, self.catalog):
            raise RuntimeError(
                f"no catalog registered as spark.sql.catalog.{self.catalog}; "
                "launch with --packages org.apache.iceberg:iceberg-spark-"
                "runtime-4.0_2.13 and set spark.sql.catalog."
                f"{self.catalog}=org.apache.iceberg.spark.SparkCatalog "
                "(plus warehouse/uri), or use ParquetDirFormat"
            )

    def write(
        self, df: DataFrame, dest: str, mode: str = "error", partition_by: tuple = ()
    ) -> None:
        self._require(df.sparkSession)
        name = iceberg_table_name(self.catalog, dest)
        w = df.writeTo(name)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "error":
            w.create()  # fails if the table exists, like SaveMode "error"
        elif mode == "append":
            w.append()
        elif mode == "overwrite":
            w.createOrReplace()
        else:
            raise ValueError(f"unsupported mode for IcebergFormat: {mode!r}")

    def read(self, spark: SparkSession, dest: str, schema=None) -> DataFrame:
        self._require(spark)
        # schema lives in the catalog; an explicit schema arg is ignored
        return spark.read.table(iceberg_table_name(self.catalog, dest))
