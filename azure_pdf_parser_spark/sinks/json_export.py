"""K1 JSON export parity sink.

The reference writes one ``{import_id}.json`` ParserOutput file per
document (reference run.py:88). One-file-per-doc is an object-store
anti-pattern at 100 TB (a listing of 10⁹ keys, tiny PUTs); the
Spark-first parity is line-delimited JSON — each LINE is one complete
ParserOutput object, byte-compatible with the reference's per-doc
payload, but files are task-sized. Downstream consumers that truly
need per-doc keys fan the lines out with an object-store copy job;
analytic consumers read the export directly with the explicit schema
(never schema inference — at scale inference is a full extra pass).

Compression is gzip per file: JSON text compresses ~10×, and the
export is a sequential-read interchange format, not a seek format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def export_json(
    df: DataFrame,
    path: str,
    mode: str = "error",
    compression: str = "gzip",
) -> None:
    """Write ``df`` as line-delimited JSON, one object per row.

    ``ignoreNullFields=false`` keeps explicit ``null``s in the payload so
    the export round-trips the schema exactly (the reference's pydantic
    dump also serializes None fields).
    """
    (
        df.write.mode(mode)
        .option("compression", compression)
        .option("ignoreNullFields", "false")
        .json(path)
    )


def read_json_export(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Read a JSON export back with its declared schema.

    ``mode=FAILFAST``: a corrupt line fails the read loudly instead of
    silently nulling columns — the export is engine-written, so any
    parse failure is a real fault, not dirty data.
    """
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
