"""Closure operators: driver fast path ≡ distributed iterative path
≡ large-star/small-star path."""

import random

from grisp_spark.operators.closure import (
    connected_components,
    connected_components_star,
    resolve_chains,
)


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


def test_cc_star_matches_driver_on_fixture(spark):
    """Large-star/small-star agrees with union-find on the chain/
    cycle/self-loop fixture — identical contract, including the
    self-loop-only node mapping to itself."""
    e = _edges(spark)
    driver = {(r.id, r.component) for r in connected_components(e).collect()}
    star = {(r.id, r.component) for r in connected_components_star(e).collect()}
    assert star == driver


def test_cc_star_raises_when_unconverged(spark):
    """Exhausting max_rounds before the fixpoint must raise — the
    non-star edge set would silently mislabel components."""
    import pytest

    rows = [(i, i + 1) for i in range(300)]
    e = spark.createDataFrame(rows, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(e, max_rounds=1)


def test_cc_star_long_chain_few_rounds(spark):
    """The point of the star algorithm: a diameter-300 chain converges
    in far fewer than 300 rounds (min-label propagation would need
    ~diameter rounds). max_rounds=12 would time out propagation but
    is ample for O(log²) star convergence."""
    rows = [(i, i + 1) for i in range(300)]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = {
        (r.id, r.component)
        for r in connected_components_star(e, max_rounds=12).collect()
    }
    assert got == {(i, 0) for i in range(301)}


def test_cc_star_random_graph_matches_driver(spark):
    rng = random.Random(17)
    rows = [(rng.randrange(120), rng.randrange(120)) for _ in range(150)]
    rows = [(a, b) for a, b in rows if a != b]
    e = spark.createDataFrame(rows, "src long, dst long")
    driver = {(r.id, r.component) for r in connected_components(e).collect()}
    star = {(r.id, r.component) for r in connected_components_star(e).collect()}
    assert star == driver


def test_resolve_chains_terminal(spark):
    rows = [(90, 91), (91, 0), (0, 0), (92, 93), (93, 1), (1, 1)]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = {(r.src, r.terminal) for r in resolve_chains(e).collect()}
    assert got == {(90, 0), (91, 0), (0, 0), (92, 1), (93, 1), (1, 1)}


def test_bfs_depth_min_hop_and_bounds(spark):
    """Diamond graph: a node reachable at depths 2 and 3 must get 2
    (level order = min-hop); unreachable nodes are absent; cycles
    don't loop (anti-join drops seen nodes); exceeding max_rounds
    raises instead of silently capping."""
    from grisp_spark.operators.closure import bfs_depth

    # 1→2→4, 1→3, 3→4 (diamond), 4→1 (cycle back), 9→10 unreachable
    edges = spark.createDataFrame(
        [(1, 2), (2, 4), (1, 3), (3, 4), (4, 1), (9, 10)],
        "src long, dst long",
    )
    roots = spark.createDataFrame([(1,)], "id long")
    got = {r.id: r.depth for r in bfs_depth(edges, roots).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}

    import pytest as _pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        bfs_depth(chain, spark.createDataFrame([(0,)], "id long"), max_rounds=3)
    # eccentricity EXACTLY max_rounds completes (the raise fires only
    # when the frontier can still expand afterwards)
    short = spark.createDataFrame(
        [(i, i + 1) for i in range(3)], "src long, dst long"
    )
    got3 = {
        r.id: r.depth
        for r in bfs_depth(
            short, spark.createDataFrame([(0,)], "id long"), max_rounds=3
        ).collect()
    }
    assert got3 == {0: 0, 1: 1, 2: 2, 3: 3}
