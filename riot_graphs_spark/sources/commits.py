"""Commit-log ingestion: parse ``git log`` text output into typed rows
(SURVEY §2.1 S4, reference ``riot_graphs/rg.py:211-223``).

The reference shells out to
``git log --merges --format=%H\\x1f%cd\\x1f%s --date=iso8601`` and splits each
line on the unit separator in Python. Here the raw text lands in a file/zone
and one declarative plan does the split + timestamp parse — the same plan
works on ``spark.read.text`` (batch backfill) and ``spark.readStream.text``
(tailing a log drop zone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import parse_iso_offset

#: ASCII unit separator used by the reference's --format string (rg.py:184).
UNIT_SEP = "\x1f"


def parse_commit_log(lines: DataFrame, col: str = "value") -> DataFrame:
    """``<hash>␟<iso-date>␟<subject>`` lines → (hash, date, msg) rows.

    Total where the reference throws: malformed lines (fewer than three
    fields) and unparseable dates yield NULLs and are dropped, mirroring the
    P5/P7 hardening rule (SURVEY §7 step 5). ``split`` with a literal
    separator + ``element_at`` — narrow, codegen'd, no UDF.
    """
    parts = F.split(F.col(col), UNIT_SEP, 3)
    # try_element_at: short lines yield NULL fields (dropped below) instead
    # of an out-of-bounds error — totality again.
    parsed = lines.select(
        F.try_element_at(parts, F.lit(1)).alias("hash"),
        parse_iso_offset(F.try_element_at(parts, F.lit(2))).alias("date"),
        F.try_element_at(parts, F.lit(3)).alias("msg"),
    )
    return parsed.filter(
        F.col("hash").isNotNull()
        & (F.length("hash") > 0)
        & F.col("date").isNotNull()
        & F.col("msg").isNotNull()
    )
