"""Parser-source tests mirroring the reference's own test surface
(DumpPageParserTest / DumpLinkParserTest / ProcessTranslationTest) on
synthesized fixtures."""

import os

import pytest

from grisp_spark.sources import sqldump, xml

FIX = "/root/repo/.data/fixtures"


@pytest.fixture(scope="module")
def xml_file():
    os.makedirs(FIX, exist_ok=True)
    pages = """<mediawiki>
<page>
  <title>Apache Spark</title>
  <ns>0</ns>
  <id>100</id>
  <revision><timestamp>2016-12-06T03:46:30Z</timestamp>
  <text xml:space="preserve">Spark links to [[Hadoop]] and [[Delta Lake#History|the lake]].</text></revision>
</page>
<page>
  <title>MapReduce</title>
  <ns>0</ns>
  <id>101</id>
  <redirect title="Apache Hadoop" />
  <revision><timestamp>2016-12-06T03:46:31Z</timestamp>
  <text xml:space="preserve">#REDIRECT [[Apache Hadoop]]</text></revision>
</page>
<page>
  <title>Category:Databases</title>
  <ns>14</ns>
  <id>102</id>
  <revision><timestamp>2016-12-06T03:46:32Z</timestamp>
  <text xml:space="preserve">category page</text></revision>
</page>
<page>
  <title>Spark (disambiguation)</title>
  <ns>0</ns>
  <id>103</id>
  <revision><timestamp>2016-12-06T03:46:33Z</timestamp>
  <text xml:space="preserve">{{disambiguation}} * [[Apache Spark]] * [[Spark plug]]</text></revision>
</page>
<page>
  <title>UserPage</title>
  <ns>2</ns>
  <id>104</id>
  <revision><timestamp>2016-12-06T03:46:34Z</timestamp>
  <text xml:space="preserve">should be dropped (wrong namespace)</text></revision>
</page>
</mediawiki>"""
    p = os.path.join(FIX, "dump.xml")
    with open(p, "w") as f:
        f.write(pages)
    return p


def test_page_records_namespace_filter(spark, xml_file):
    pages = xml.page_records(spark, xml_file)
    got = {r.page_id: (r.title, r.ns) for r in pages.collect()}
    assert set(got) == {100, 101, 102, 103}  # ns=2 dropped (F1)
    assert got[102] == ("Category:Databases", 14)


def test_classify_pages(spark, xml_file):
    typed = xml.classify_pages(xml.page_records(spark, xml_file))
    got = {r.page_id: r.page_type for r in typed.collect()}
    assert got == {
        100: "article",
        101: "redirect",
        102: "category",
        103: "disambiguation",
    }


def test_timestamp_parse(spark, xml_file):
    pages = xml.page_records(spark, xml_file)
    ts = {r.page_id: str(r.ts) for r in pages.collect()}
    assert ts[100] == "2016-12-06 03:46:30"


def test_parse_links(spark, xml_file):
    pages = xml.page_records(spark, xml_file)
    links = xml.parse_links(pages.filter("page_id = 100"))
    got = {(r.target_title, r.section, r.anchor) for r in links.collect()}
    assert got == {
        ("Hadoop", "", "Hadoop"),
        ("Delta Lake", "History", "the lake"),
    }


def test_parse_links_namespaces_and_nesting(spark):
    """DumpLinkParserTest.java semantics: namespace-qualified links
    resolve (Category→14, File/Image→6) with the prefix stripped from
    the title; a File link whose caption embeds [[nested links]] is
    extracted as ONE outermost region (Util.gatherComplexRegions);
    unknown colon prefixes stay main-namespace titles."""
    text = (
        "Start [[Marie François Sadi Carnot|Sadi Carnot]] then "
        "[[Issues in anarchism#Communism|communism]] and "
        "[[Category:Hereditary cancers]] plus "
        "[[File:Manifestación CNT Bilbao.jpg|thumb|left|May day of "
        "[[anarcho-syndicalist]] union in [[Bilbao]]]] and "
        "[[Dr. Who: the movie]] end."
    )
    df = spark.createDataFrame([(1, text)], "page_id long, text string")
    got = {
        (r.target_ns, r.target_title, r.section, r.anchor)
        for r in xml.parse_links(df).collect()
    }
    assert (0, "Marie François Sadi Carnot", "", "Sadi Carnot") in got
    assert (0, "Issues in anarchism", "Communism", "communism") in got
    # default anchor is the namespace-STRIPPED target, as in the
    # reference DumpLinkParser
    assert (14, "Hereditary cancers", "", "Hereditary cancers") in got
    # the File link is one outer region; its nested links are not
    # separate rows (reference returns outermost complex regions)
    file_rows = [g for g in got if g[0] == 6]
    assert len(file_rows) == 1
    assert file_rows[0][1] == "Manifestación CNT Bilbao.jpg"
    assert not any(t == "anarcho-syndicalist" for _, t, _, _ in got)
    # unknown prefix stays a main-ns title, colon intact
    assert (0, "Dr. Who: the movie", "", "Dr. Who: the movie") in got


def test_parse_disambig_links(spark):
    """testLinkParserInDisambiguationText: the first link of each
    '*' list line is the disambiguated sense (7 in the fixture)."""
    text = (
        "'''Nardelli''' is an [[Italian language|Italian]] surname of "
        "[[Leonardo]].\n"
        "*[[Elania Nardelli]] (born 1987), sport shooter\n"
        "*[[Francesco Nardelli]] (born 1953), naturalist\n"
        "* [[Maria Nardelli]] (born 1954), athlete\n"
        "*[[Michael Nardelli]] (born 1983), actor\n"
        "*[[Robert Nardelli]] (born 1948), businessman\n"
        "*[[Stefano Nardelli]] (born 1993), cyclist\n"
        "*[[Steve Nardelli]] (born 1948), musician\n"
        "{{surname}}\n[[Category:Italian-language surnames]]"
    )
    df = spark.createDataFrame([(7, text)], "page_id long, text string")
    got = {r.sense_title for r in xml.parse_disambig_links(df).collect()}
    assert got == {
        "Elania Nardelli", "Francesco Nardelli", "Maria Nardelli",
        "Michael Nardelli", "Robert Nardelli", "Stefano Nardelli",
        "Steve Nardelli",
    }


def test_sql_insert_tuples(spark):
    os.makedirs(FIX, exist_ok=True)
    p = os.path.join(FIX, "langlinks.sql")
    with open(p, "w") as f:
        f.write(
            "-- MySQL dump\n"
            "INSERT INTO `langlinks` VALUES (142236,'fr','salut les nuls'),"
            "(7,'xx','drop me'),(9,'de','hallo, welt');\n"
        )
    lines = spark.read.text(p)
    got = {
        (r.page_id, r.lang, r.title)
        for r in sqldump.langlinks(lines).collect()
    }
    # reference fixture: ProcessTranslationTest.java:23-31 expects
    # 142236|fr|salut les nuls and non-whitelisted lang dropped
    assert got == {(142236, "fr", "salut les nuls"), (9, "de", "hallo, welt")}


def test_sql_insert_tuples_backslash_escape_and_extra_column(spark):
    """mysqldump escapes quotes as \\' (not ''-doubling), and
    page_props tuples carry a trailing NULL/float sortkey — both must
    survive the tuple grammar instead of being silently dropped."""
    os.makedirs(FIX, exist_ok=True)
    p = os.path.join(FIX, "pageprops.sql")
    with open(p, "w") as f:
        f.write(
            "INSERT INTO `langlinks` VALUES (1,'fr','l\\'été'),"
            "(2,'de','a\\\\b',NULL),(3,'fr','x',0.25);\n"
        )
    lines = spark.read.text(p)
    got = {
        (r.page_id, r.lang, r.title)
        for r in sqldump.parse_insert_tuples(lines).collect()
    }
    assert got == {(1, "fr", "l'été"), (2, "de", "a\\b"), (3, "fr", "x")}
    stats = sqldump.tuple_counts(lines).collect()
    assert stats[0].raw_tuples == stats[0].parsed_tuples == 3


def test_sql_insert_complete_insert_column_list(spark):
    """mysqldump --complete-insert emits a column-list parenthetical
    before VALUES; it must not be parsed as a (garbage) tuple, and
    tuple_counts must not report it as a parsed tuple."""
    os.makedirs(FIX, exist_ok=True)
    p = os.path.join(FIX, "complete_insert.sql")
    with open(p, "w") as f:
        f.write(
            "INSERT INTO `langlinks` (ll_from,ll_lang,ll_title) VALUES "
            "(5,'fr','bonjour'),(6,'de','welt');\n"
        )
    lines = spark.read.text(p)
    got = {
        (r.page_id, r.lang, r.title)
        for r in sqldump.parse_insert_tuples(lines).collect()
    }
    assert got == {(5, "fr", "bonjour"), (6, "de", "welt")}
    stats = sqldump.tuple_counts(lines).collect()
    assert stats[0].raw_tuples == stats[0].parsed_tuples == 2


def test_sql_insert_values_in_identifier(spark):
    """A backtick-quoted identifier containing the word VALUES must
    not truncate the header strip mid-identifier (the strip anchors on
    the INSERT header structure, not the first literal VALUES)."""
    os.makedirs(FIX, exist_ok=True)
    p = os.path.join(FIX, "values_ident.sql")
    with open(p, "w") as f:
        f.write(
            "INSERT INTO `myVALUEStbl` (ll_from,ll_lang,ll_title) VALUES "
            "(8,'fr','oui'),(9,'de','ja');\n"
        )
    lines = spark.read.text(p)
    got = {
        (r.page_id, r.lang, r.title)
        for r in sqldump.parse_insert_tuples(lines).collect()
    }
    assert got == {(8, "fr", "oui"), (9, "de", "ja")}
    stats = sqldump.tuple_counts(lines).collect()
    assert stats[0].raw_tuples == stats[0].parsed_tuples == 2


def test_repair_truncated_ids(spark):
    """C6 (ProcessWikiData.java:261-289): the reference's own example —
    33702 (canis lupus) appearing as 3702 after losing its first
    digit — must be repaired from the predecessor; ids that are
    legitimately shorter-but-not-truncated (candidate not larger)
    stay untouched."""
    rows = [
        (1, 33700), (2, 3702),   # truncated → 33702
        (3, 33705), (4, 33801),  # normal ascending, untouched
        (5, 12),                 # shorter: candidate '3'+'12'=312 > 12 → repaired
        (6, 9),                  # prev RAW id is 12 → candidate '1'+'9'=19 → repaired
    ]
    df = spark.createDataFrame(rows, "seq int, page_id long")
    got = {r.seq: r.page_id for r in sqldump.repair_truncated_ids(df).collect()}
    assert got[2] == 33702
    assert got[3] == 33705 and got[4] == 33801
    assert got[5] == 312
    assert got[6] == 19


def test_wikidata_json_ids(spark):
    p = os.path.join(FIX, "wikidata.jsonl")
    with open(p, "w") as f:
        f.write('{"id":"Q42","type":"item"}\n{"id":"P31"}\n{"id":"Q1"}\n')
    lines = spark.read.text(p)
    got = {r.qid for r in sqldump.wikidata_ids(lines).collect()}
    assert got == {"Q42", "Q1"}


def test_parse_tql(spark):
    p = os.path.join(FIX, "infobox.tql")
    with open(p, "w") as f:
        f.write(
            '<http://db.org/Paris> <http://db.org/prop/country> <http://db.org/France> <http://g> .\n'
            '<http://db.org/Paris> <http://db.org/prop/population> "2206488" <http://g> .\n'
            "malformed line\n"
        )
    lines = spark.read.text(p)
    got = {
        (r.subject, r.property, r.object) for r in sqldump.parse_tql(lines).collect()
    }
    assert got == {
        ("http://db.org/Paris", "http://db.org/prop/country", "http://db.org/France"),
        ("http://db.org/Paris", "http://db.org/prop/population", "2206488"),
    }
