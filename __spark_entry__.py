"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG-construction run at sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2 + training-
data ops), each (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL per query (same column
names); omitted only for genuinely non-SQL-expressible ops.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from grisp_spark import (  # noqa: E402
    queries_kg,
    queries_relational,
    queries_relational2,
    queries_relational3,
    queries_traindata,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full KG-construction pipeline (gazetteer linking →
    canonicalization → turn-window triples) over transcripts derived
    from /root/testdata/sf0.001."""
    return queries_kg.kg06_triples_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(queries_relational.QUERIES)
    out.update(queries_relational2.QUERIES)
    out.update(queries_relational3.QUERIES)
    out.update(queries_traindata.QUERIES)
    out.update(queries_kg.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(queries_relational.ORACLES)
    out.update(queries_relational2.ORACLES)
    out.update(queries_relational3.ORACLES)
    out.update(queries_traindata.ORACLES)
    out.update(queries_kg.ORACLES)
    return out
