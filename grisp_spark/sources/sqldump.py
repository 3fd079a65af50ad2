"""SQL-dump / TQL / JSON-lines scans (grisp's Wikidata backbone,
S3/S4/C5/C7/F7).

The reference streams `*-langlinks.sql.gz` / `*-page_props.sql.gz` in
8KB chunks with hand-rolled tuple splitting
(ProcessWikiData.java:186-336, ProcessTranslation.java:70-180) and
line-streams the 74GB wikidata JSON (ProcessWikiData.java:118-181).
Here: ``spark.read.text`` (codecs decompress bz2/gz transparently),
tuple extraction via ``regexp_extract_all``, field splitting via
``from_csv`` with a quote option (handles quoted commas/escapes), and
JSON ids via ``get_json_object`` — all JVM-side."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# one quoted-string atom: ''-doubled OR \-escaped quotes (MySQL emits
# \' in real dumps, e.g. 'l\'été'); a tuple is any mix of quoted
# strings and unquoted scalars (ints, floats, NULL), so page_props'
# trailing NULL/float 4th column is captured too
_STR = r"'(?:[^'\\]|\\.|'')*'"
TUPLE_RE = rf"\(((?:[^'()\\]|\\.|{_STR})+)\)"
# mysqldump --complete-insert emits a column-list parenthetical —
# `INSERT INTO t (a,b,c) VALUES ...` — that TUPLE_RE would capture as
# a (garbage) tuple; the INSERT header (table name + optional column
# list) is stripped before tuple extraction. Anchored on the header
# STRUCTURE, not on the first literal "VALUES": a backtick-quoted
# identifier containing the word VALUES must not truncate the strip
# mid-identifier. Plain MediaWiki dumps have no column list, so the
# strip is a no-op prefix removal there.
# table name: backtick-quoted identifiers consumed atomically (so a
# name containing the word VALUES can't terminate the match early),
# other chars consumed up to the optional column list / the keyword
_VALUES_PREFIX = r"^INSERT INTO\s+(?:`[^`]*`|[^`(])*(?:\([^)]*\)\s*)?VALUES\s*"


def _tuple_body(col="value"):
    return F.regexp_replace(col, _VALUES_PREFIX, "")


def parse_insert_tuples(
    lines: DataFrame, schema: str = "page_id LONG, lang STRING, title STRING"
) -> DataFrame:
    """INSERT INTO … VALUES (1,'fr','salut'),(2,'de','hallo'); →
    typed rows. C5 tuple surgery as one regex + from_csv (quote=',
    escape=\\ for MySQL-style backslash escapes). Extra trailing
    columns beyond ``schema`` are ignored (page_props' sortkey)."""
    tuples = lines.filter(F.col("value").startswith("INSERT INTO")).select(
        F.explode(
            F.regexp_extract_all(_tuple_body(), F.lit(TUPLE_RE), 1)
        ).alias("t")
    )
    parsed = tuples.select(
        F.from_csv(
            "t", schema, {"quote": "'", "escape": "\\", "mode": "PERMISSIVE"}
        ).alias("r")
    ).select("r.*")
    return parsed


def tuple_counts(lines: DataFrame) -> DataFrame:
    """Dropped-tuple monitor: raw '),('-delimited tuple count vs
    regex-captured count per line (the reference's splitter preserves
    every tuple, ProcessWikiData.java:186-336 — a gap here means the
    grammar missed one)."""
    ins = lines.filter(F.col("value").startswith("INSERT INTO"))
    body = _tuple_body()
    return ins.select(
        F.size(F.split(body, r"\),\(")).alias("raw_tuples"),
        F.size(F.regexp_extract_all(body, F.lit(TUPLE_RE), 1)).alias(
            "parsed_tuples"
        ),
    )


def repair_truncated_ids(
    parsed: DataFrame,
    id_col: str = "page_id",
    order_col: str = "seq",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """C6 corrupted-pageId repair (ProcessWikiData.java:261-289): some
    dump tuples lose the LEADING digit of their page id (33702 'canis
    lupus' appears as 3702). The reference streams sequentially and,
    when an id is shorter than its predecessor, re-injects the
    predecessor's first digit if that yields a larger number.

    Distributed analogue: lag window over the caller-provided dump
    order (``order_col``). Pass ``partition_cols`` (e.g.
    ``[input_file_name()]``-derived column) to parallelize across
    files — within a partition the pass is inherently sequential, as
    in the reference; with no partition the whole input funnels
    through one task (single-file repair only). Deviations,
    documented: (1) the reference compares against the REPAIRED
    predecessor, this compares against the raw one — they differ only
    for two consecutively-truncated ids; (2) the reference's
    Integer.parseInt silently skips ids beyond int32, this uses
    64-bit arithmetic and repairs them too."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(*partition_cols).orderBy(order_col)
        if partition_cols
        else W.orderBy(order_col)
    )
    cur = F.col(id_col).cast("string")
    prev = F.lag(cur).over(w)
    cand = F.concat(F.substring(prev, 1, 1), cur)
    repaired = F.when(
        prev.isNotNull()
        & (F.length(cur) < F.length(prev))
        & (cand.cast("long") > F.col(id_col).cast("long")),
        cand.cast("long"),
    ).otherwise(F.col(id_col))
    return parsed.withColumn(id_col, repaired)


def langlinks(lines: DataFrame, whitelist: tuple[str, ...] = ("fr", "de", "en", "es", "it")) -> DataFrame:
    """F7 language whitelist over parsed langlinks tuples
    (ProcessTranslation.java:201-202)."""
    return parse_insert_tuples(lines).filter(F.col("lang").isin(*whitelist))


def wikidata_ids(lines: DataFrame) -> DataFrame:
    """C7: one JSON entity per line → Q-id (findPath("id") analogue,
    ProcessWikiData.java:149-154)."""
    return (
        lines.select(F.get_json_object("value", "$.id").alias("qid"))
        .filter(F.col("qid").isNotNull() & F.col("qid").startswith("Q"))
    )


TQL_RE = (
    r"^<([^>]+)>\s+<([^>]+)>\s+(?:<([^>]+)>|\"((?:[^\"\\]|\\.)*)\"[^\s]*)\s+<([^>]+)>\s*\.$"
)


def parse_tql(lines: DataFrame) -> DataFrame:
    """S4 TQL (N-Quads) triple scan (ProcessInfoBoxes.java:86-225):
    (subject, property, object-or-literal, graph)."""
    return lines.select(
        F.regexp_extract("value", TQL_RE, 1).alias("subject"),
        F.regexp_extract("value", TQL_RE, 2).alias("property"),
        F.coalesce(
            F.nullif(F.regexp_extract("value", TQL_RE, 3), F.lit("")),
            F.regexp_extract("value", TQL_RE, 4),
        ).alias("object"),
        F.regexp_extract("value", TQL_RE, 5).alias("graph"),
    ).filter(F.col("subject") != "")
