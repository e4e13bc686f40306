"""Local replica of the driver's DuckDB-oracle comparison so every queries()
entry is verified (row count + column names + exact values, order-insensitive)
before the driver runs it at sf0.01."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLE_NAMES = (
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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]) or df[c].dtype == "float32":
            # int32 vs int64, float32 vs float64 are representation details
            df[c] = df[c].astype("float64") if df[c].dtype == "float32" else df[c].astype("Int64")
    sort_cols = list(df.columns)
    df = df.sort_values(by=sort_cols, kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Driver value-hash type classes.
#
# The driver's per-query value-hash is Arrow-TYPE-sensitive up to these
# equivalence classes (calibrated against every green/red driver row through
# r03): integer widths collapse to int64; floats AND decimals collapse to
# float64 (DuckDB HUGEINT arrives as decimal128(38,0) => float class, which
# is exactly why `sum()` window legs against a Spark BIGINT went red in
# r02/r03); timestamps drop tz and unit.  int-vs-float, decimal-vs-int and
# date-vs-timestamp all hash DIFFERENTLY even when the printed values agree
# (observed reds: pack_sequences r02; corpus_chunks_packed,
# dq_referential_integrity, ts_math_transforms r03).  The local value
# comparator below normalizes those away, so this schema-class check is what
# catches the bug class before the driver does.
# ---------------------------------------------------------------------------

_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
# HUGEINT reaches Arrow as decimal128(38,0) -> float class, NOT int.
_DUCK_FLOAT = {"FLOAT", "REAL", "DOUBLE", "HUGEINT", "UHUGEINT"}


def duck_type_class(t) -> str:
    s = str(t).strip()
    if s.endswith("[]"):
        return f"list<{duck_type_class(s[:-2])}>"
    u = s.upper()
    if u in _DUCK_INT:
        return "int"
    if u in _DUCK_FLOAT or u.startswith("DECIMAL"):
        return "float"
    if u.startswith("TIMESTAMP"):  # any precision, WITH TIME ZONE included
        return "ts"
    if u == "DATE":
        return "date"
    if u in {"VARCHAR", "TEXT", "STRING"}:
        return "string"
    if u == "BOOLEAN":
        return "bool"
    if u == "BLOB":
        return "binary"
    return s  # STRUCT/MAP/...: require exact textual match


def spark_type_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "float"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_type_class(dt.elementType)}>"
    return dt.simpleString()


def assert_hash_compatible_types(sdf, con, sql: str, name: str) -> None:
    """Fail if any output column's Spark type and DuckDB type land in
    different driver-hash classes.  Pure schema work — neither side executes
    (Spark: analyzed schema; DuckDB: lazy relation types)."""
    rel = con.sql(sql)
    duck = {c: duck_type_class(t) for c, t in zip(rel.columns, rel.types)}
    bad = []
    for f in sdf.schema.fields:
        if f.name in duck and spark_type_class(f.dataType) != duck[f.name]:
            bad.append(
                f"{f.name}: spark {f.dataType.simpleString()}"
                f" ({spark_type_class(f.dataType)}) vs oracle ({duck[f.name]})"
            )
    assert not bad, (
        f"{name}: driver value-hash would diverge — oracle/engine output-type"
        f" class mismatch on {len(bad)} column(s): " + "; ".join(bad)
    )


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    pd.testing.assert_frame_equal(a, b, check_exact=True, check_dtype=False, obj=name)
