"""P1 — nested-document explosion, the reference's core reshape.

The reference walks ``{"sizes": {test: {board: {bss, text, data, count?}}}}``
with a row-at-a-time generator (``riot_graphs/rg.py:269-285``). Here it is a
double ``explode`` over MapType — a narrow transformation: no shuffle, fully
pipelined inside whole-stage codegen, scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import EVENT_PROPS


def explode_sizes(sizes_raw: DataFrame) -> DataFrame:
    """``sizes_raw`` (schema :data:`..schemas.SIZES_RAW`) → one row per
    (ts, sha, test, board) with metric columns.

    Covers P2 (``dec = bss + text + data``, reference ``rg.py:298``),
    P3 (int casts, ``rg.py:295-299``) and P4 (``count`` default 0,
    ``rg.py:279``) in the same projection.
    """
    return (
        sizes_raw.select("ts", "sha", F.explode("sizes").alias("test", "by_board"))
        .select("ts", "sha", "test", F.explode("by_board").alias("board", "m"))
        .select(
            "ts",
            "sha",
            "test",
            "board",
            F.col("m.bss").cast("long").alias("bss"),
            F.col("m.data").cast("long").alias("data"),
            F.col("m.text").cast("long").alias("text"),
            (F.col("m.bss") + F.col("m.text") + F.col("m.data"))
            .cast("long")
            .alias("dec"),
            F.coalesce(F.col("m.count"), F.lit(0)).cast("long").alias("count"),
        )
    )


def parse_props(events: DataFrame, field: str = "k") -> DataFrame:
    """P1 analogue on the driver's ``events`` table: ``props`` JSON string →
    typed column via ``from_json`` with an explicit schema (PERMISSIVE —
    malformed rows yield NULL, the totality rule of SURVEY §7 step 5).
    """
    return events.withColumn(
        field, F.from_json("props", EVENT_PROPS).getField(field)
    )
