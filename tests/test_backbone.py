"""Wikidata/translation backbone end-to-end on synthesized dumps —
grisp entry points 2/3 (ProcessWikiData / ProcessTranslation)."""

import os

from grisp_spark.kg import backbone

FIX = "/root/repo/.data/fixtures"


def _write(name: str, content: str) -> str:
    os.makedirs(FIX, exist_ok=True)
    p = os.path.join(FIX, name)
    with open(p, "w") as f:
        f.write(content)
    return p


def test_wikidata_backbone(spark):
    jp = _write(
        "wd.jsonl",
        '{"id":"Q42","type":"item"}\n{"id":"Q1"}\n{"id":"P31"}\n{"id":"Q7"}\n',
    )
    en = _write(
        "pp_en.sql",
        "INSERT INTO `page_props` VALUES (100,'wikibase_item','Q42'),"
        "(101,'wikibase_item','Q1'),(102,'displaytitle','x');\n",
    )
    fr = _write(
        "pp_fr.sql",
        "INSERT INTO `page_props` VALUES (200,'wikibase_item','Q42');\n",
    )
    out = backbone.wikidata_backbone(
        spark.read.text(jp),
        {"en": spark.read.text(en), "fr": spark.read.text(fr)},
    )
    got = {r.qid: dict(r.mapping) for r in out.collect()}
    assert got == {
        "Q42": {"en": 100, "fr": 200},
        "Q1": {"en": 101},
        "Q7": {},
    }


def test_translations(spark):
    ll = _write(
        "ll.sql",
        "INSERT INTO `langlinks` VALUES (10,'fr','salut, les nuls'),"
        "(10,'de','hallo 100%'),(11,'xx','dropped'),(12,'it','ciao');\n",
    )
    out = backbone.translations(spark.read.text(ll))
    got = {r.page_id: dict(r.translations) for r in out.collect()}
    # C8: ',' → %2C and '%' → %25 (ProcessTranslation.java:236-237)
    assert got == {
        10: {"fr": "salut%2C les nuls", "de": "hallo 100%25"},
        12: {"it": "ciao"},
    }
