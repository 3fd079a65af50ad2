"""Mirror of the driver's correctness gate: every queries() entry with
an oracle_sql() entry must match DuckDB at sf0.01 (row count, schema,
order-insensitive values)."""

import pytest

import __spark_entry__ as entry_mod
from grisp_spark.queries_kg import DRIVER_ALIASES
from tests.compare import assert_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# qNN aliases of kg* queries share the exact callable + oracle SQL —
# run each underlying check once locally (the driver runs the aliases).
_DEDUPED = set(DRIVER_ALIASES)


def test_all_queries_have_callables():
    assert QUERIES, "queries() must not be empty"
    missing = [k for k in ORACLES if k not in QUERIES]
    assert not missing, f"oracle_sql keys missing from queries(): {missing}"


def test_driver_aliases_are_same_objects():
    for alias, target in DRIVER_ALIASES.items():
        assert QUERIES[alias] is QUERIES[target]
        if target in ORACLES:
            assert ORACLES[alias] == ORACLES[target]
        else:
            assert alias not in ORACLES


@pytest.mark.parametrize("name", sorted(set(ORACLES) - _DEDUPED))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ORACLES[name], sf_dir, name)


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES) - _DEDUPED)
)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_bench_headline_names_exist():
    """bench.py's HEADLINE list must reference registered queries —
    a rename otherwise breaks the driver's per-round bench run."""
    import bench

    for name in bench.HEADLINE:
        assert name in QUERIES, name
