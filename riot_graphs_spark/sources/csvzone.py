"""CSV landing-zone ingestion — the third landing format beside the JSON
zone (``streaming/ingest.py``) and the ␟-separated git-log text
(``sources/commits.py``): CI systems and exports commonly drop CSV, and
the same explicit-schema plan must serve batch backfill and a streaming
tail of the drop directory.

Design rules (the 100 TB posture):

* **Schema-on-read is banned.**  Inference scans the data an extra time
  and pins column types from whatever sample it saw — callers pass the
  ``StructType`` (``schemas.py`` owns them).
* **PERMISSIVE with a retained corrupt column.**  A malformed line lands
  whole in ``_corrupt_record`` instead of failing the job (FAILFAST) or
  silently disappearing (DROPMALFORMED) — the P5/P7 totality rule; the
  quarantine split keeps the bad rows auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_csv_zone(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
    streaming: bool = False,
) -> DataFrame:
    """Explicit-schema CSV reader over a landing directory.

    Returns the typed columns plus ``_corrupt_record`` (NULL for clean
    rows, the raw line for malformed ones).  ``streaming=True`` returns
    the ``readStream`` form of the SAME plan — pair with
    ``availableNow`` triggers for incremental backfill exactly like the
    JSON zone.
    """
    if CORRUPT_COL in schema.names:
        raise ValueError(f"schema must not pre-declare {CORRUPT_COL}")
    # Copy, don't schema.add(): StructType.add mutates in place, which
    # would permanently append the corrupt column to the CALLER's schema
    # object (a second call with the same schema — batch then streaming
    # over one zone — would then hit the pre-declare guard above).
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(full)
        .options(
            header=str(header).lower(),
            sep=sep,
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=CORRUPT_COL,
        )
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Batch quarantine split: ``(clean_without_corrupt_col, corrupt)``.

    Spark refuses plans that filter on only the internal corrupt column
    of a CSV scan (the parser would need the raw line it no longer has),
    so the split materializes the scan once with ``cache()`` — batch
    only; a streaming quarantine routes through ``foreachBatch``.
    """
    cached = df.cache()
    clean = cached.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = cached.filter(F.col(CORRUPT_COL).isNotNull()).select(
        CORRUPT_COL
    )
    return clean, corrupt
