"""Tag-delimited XML record scan + page parsing — the grisp ingest
path (S1/F1/F2/F5) re-expressed declaratively.

The reference splits a multi-GB dump into <page> records with a
byte-scanning InputFormat (util/XmlInputFormat.java:38-153) and
parses each with a SAX parser (model/DumpPageParser.java:47-137).
Spark's text source already does distributed splitting on an
arbitrary record delimiter (``lineSep``) — each <page>…</page> block
becomes one row, split boundaries handled by the source — and the
field extraction is a column of ``regexp_extract`` expressions
(codegen, pushdown-friendly), not a per-row parser object.

bz2/gz inputs decompress transparently via Hadoop codecs (the S3
compressed-scan path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAIN_NS = 0
CATEGORY_NS = 14
MAX_LINE_CHARS = 100_000  # DumpExtractor.java:898-900 mega-line guard

# per-language patterns (util/LanguageConfiguration.java:112-184 analogue)
DISAMBIG_PATTERN = r"(?i)\{\{\s*(disambiguation|disambig|dab)\s*[|}]"


def page_records(spark: SparkSession, path: str) -> DataFrame:
    """<page> blocks → typed rows (id, title, ns, redirect, ts, text).
    F1: keeps MAIN and CATEGORY namespaces only; S6 guard drops
    mega-records."""
    raw = spark.read.option("lineSep", "</page>").text(path)
    pages = raw.filter(F.col("value").contains("<page>")).select(
        F.regexp_extract("value", r"<title>([^<]*)</title>", 1).alias("title"),
        F.regexp_extract("value", r"<ns>(\d+)</ns>", 1).cast("int").alias("ns"),
        F.regexp_extract("value", r"<id>(\d+)</id>", 1).cast("long").alias("page_id"),
        F.when(
            F.col("value").contains("<redirect"),
            F.regexp_extract("value", r'<redirect title="([^"]*)"', 1),
        ).alias("redirect_title"),
        F.to_timestamp(
            F.regexp_extract("value", r"<timestamp>([^<]*)</timestamp>", 1),
            "yyyy-MM-dd'T'HH:mm:ss'Z'",
        ).alias("ts"),
        F.regexp_extract("value", r"(?s)<text[^>]*>(.*)</text>", 1).alias("text"),
    )
    return pages.filter(
        F.col("ns").isin(MAIN_NS, CATEGORY_NS)
        & (F.length("text") < MAX_LINE_CHARS)
    )


def classify_pages(pages: DataFrame) -> DataFrame:
    """F2 page-type classification (DumpPageParser.java:139-173):
    redirect (redirect attr) > category (ns) > disambiguation (regex)
    > article."""
    return pages.withColumn(
        "page_type",
        F.when(F.col("redirect_title").isNotNull() & (F.col("redirect_title") != ""), "redirect")
        .when(F.col("ns") == CATEGORY_NS, "category")
        .when(F.col("text").rlike(DISAMBIG_PATTERN), "disambiguation")
        .otherwise("article"),
    )


# outermost [[...]] regions with ONE level of nesting (enough for
# File/Image captions that embed [[anchor links]] — the reference's
# depth-tracking Util.gatherComplexRegions returns outermost regions;
# its own tests exercise exactly one nesting level)
LINK_RE = r"\[\[((?:[^\[\]]|\[\[[^\[\]]*\]\])+)\]\]"

# SiteInfo namespace resolution (util/SiteInfo.java keys; multi-
# language prefixes are a documented non-goal — single site config)
FILE_NS = 6
_NS_PREFIXES = {"category": CATEGORY_NS, "file": FILE_NS, "image": FILE_NS}


def parse_links(pages: DataFrame) -> DataFrame:
    """F5 wiki-link parse (model/DumpLinkParser.java:41-83 +
    CategoryTest/DumpLinkParserTest semantics):
    [[ns:Target#Section|anchor]] → (target_ns, target_title, section,
    anchor); anchor defaults to the target AFTER namespace stripping
    ([[Category:X]] → anchor 'X'), matching the reference's default.
    Namespace prefixes (Category:/File:/Image:) resolve to their keys
    and are stripped from the title; unknown prefixes remain
    main-namespace titles. Documented deviation: prefix matching here
    is case-INsensitive ([[category:X]] resolves too), while the
    reference matches the siteinfo name case-sensitively."""
    links = pages.select(
        "page_id",
        F.explode(F.regexp_extract_all("text", F.lit(LINK_RE), 1)).alias("markup"),
    )
    target_full = F.substring_index(F.col("markup"), "|", 1)
    rest = F.when(
        F.col("markup").contains("|"),
        F.regexp_replace(F.col("markup"), r"^[^|]*\|", ""),
    )
    prefix = F.when(
        target_full.contains(":"),
        F.lower(F.substring_index(target_full, ":", 1)),
    )
    ns_expr = F.coalesce(
        *[
            F.when(prefix == p, F.lit(k))
            for p, k in sorted(_NS_PREFIXES.items())
        ],
        F.lit(MAIN_NS),
    )
    title = F.when(
        ns_expr != MAIN_NS, F.regexp_replace(target_full, r"^[^:]*:", "")
    ).otherwise(target_full)
    anchor = F.coalesce(F.nullif(rest, F.lit("")), title)
    tparts = F.split(title, "#")
    return links.select(
        "page_id",
        ns_expr.alias("target_ns"),
        F.get(tparts, 0).alias("target_title"),
        F.coalesce(F.get(tparts, 1), F.lit("")).alias("section"),
        anchor.alias("anchor"),
    ).filter(F.col("target_title") != "")


def parse_disambig_links(pages: DataFrame) -> DataFrame:
    """Disambiguation sense extraction (DumpLinkParserTest
    testLinkParserInDisambiguationText; Util.gatherComplexRegions with
    the '\\*\\s*' prefix): the FIRST link of each '*' list line is the
    disambiguated sense."""
    lines = pages.select(
        "page_id", F.explode(F.split("text", "\n")).alias("line")
    ).filter(F.col("line").rlike(r"^\s*\*"))
    first = F.regexp_extract("line", LINK_RE, 1)
    target = F.substring_index(first, "|", 1)
    return lines.select(
        "page_id", F.substring_index(target, "#", 1).alias("sense_title")
    ).filter(F.col("sense_title") != "")
