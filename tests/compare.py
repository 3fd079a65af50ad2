"""Order-insensitive Spark-vs-DuckDB result comparison, mirroring the
driver's correctness gate (row count + schema + value hash with
columns sorted by name). Used by tests to validate every
queries()/oracle_sql() pair locally before the driver does."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from grisp_spark.sources.testdata import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # round so float agg ordering differences don't flap the hash
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if hasattr(v, "asDict"):  # pyspark Row (struct) ≙ duckdb dict
        return _canon_cell(v.asDict())
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat()
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows)


def assert_scalar_schema(spark_df, name: str = "") -> None:
    """The driver's canonicalizer crashes on array/map/struct cells
    (pandas sort_values: unhashable type) — reject them here so the
    local mirror is as strict as the real gate."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: non-scalar output columns {bad} would crash the driver's "
        "canonicalizer — serialize them (e.g. F.array_join(col, '|'))"
    )


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, name: str = "") -> None:
    assert_scalar_schema(spark_df, name)
    spdf = spark_df.toPandas()
    con = duck_connect(sf_dir)
    try:
        ddf = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()
    assert sorted(spdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} duck={sorted(ddf.columns)}"
    )
    # the DRIVER hashes dtypes: a value-identical column that is float
    # on one side and integer on the other (e.g. an un-cast DuckDB
    # HUGEINT sum → float64) is locally invisible after canonization
    # but driver-red. Pin float-ness parity per column.
    floaty = [
        c for c in spdf.columns
        if (spdf[c].dtype.kind == "f") != (ddf[c].dtype.kind == "f")
    ]
    assert not floaty, (
        f"{name}: float/int dtype mismatch on {floaty} — cast the oracle "
        f"(e.g. HUGEINT sum → BIGINT) or the Spark column"
    )
    assert len(spdf) == len(ddf), f"{name}: row count spark={len(spdf)} duck={len(ddf)}"
    srows, drows = canonical_rows(spdf), canonical_rows(ddf)
    mism = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: spark={srows[mism[0]]} duck={drows[mism[0]]}"
    )
