"""Closure operators: driver fast path ≡ distributed iterative path."""

from grisp_spark.operators.closure import connected_components, resolve_chains


def _edges(spark):
    # two chains, one cycle, one isolated self-loop
    rows = [(90, 91), (91, 0), (92, 93), (93, 94), (94, 1), (95, 96), (96, 95), (7, 7)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_cc_driver_path(spark):
    got = {
        (r.id, r.component)
        for r in connected_components(_edges(spark)).collect()
    }
    expected = {
        (0, 0), (90, 0), (91, 0),
        (1, 1), (92, 1), (93, 1), (94, 1),
        (95, 95), (96, 95), (7, 7),
    }
    assert got == expected


def test_cc_distributed_path_matches_driver(spark):
    e = _edges(spark)
    driver = {(r.id, r.component) for r in connected_components(e).collect()}
    dist = {
        (r.id, r.component)
        for r in connected_components(e, driver_threshold=0).collect()
    }
    assert dist == driver


def test_resolve_chains_terminal(spark):
    rows = [(90, 91), (91, 0), (0, 0), (92, 93), (93, 1), (1, 1)]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = {(r.src, r.terminal) for r in resolve_chains(e).collect()}
    assert got == {(90, 0), (91, 0), (0, 0), (92, 1), (93, 1), (1, 1)}
