"""Cross-language / Wikidata backbone — grisp entry points 2 and 3
(ProcessWikiData.java:471-487, ProcessTranslation.java:310-331)
re-expressed as two shuffle-based DataFrame jobs instead of
single-threaded LMDB streaming.

Entry point 2 (buildWikidata): stream the entity JSON dump for Q-ids,
then for each language stream page_props SQL for (page_id →
wikibase_item), and accumulate per Q-id the {lang: page_id} map
(ProcessWikiData.java:97-112,338-438 writes ``Qid,m{'lang,'pageId}``).

Entry point 3 (buildTranslation): stream langlinks SQL and accumulate
per page_id the {lang: translated_title} map
(ProcessTranslation.java:215-308).

The reference's LMDB read-your-own-writes buffer (J7,
ProcessWikiData.java:299-308) disappears — groupBy accumulates. The
implicit LMDB-key output ordering (O6) becomes an explicit orderBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grisp_spark.sources import sqldump


def wikidata_backbone(
    json_lines: DataFrame, page_props_by_lang: dict[str, DataFrame]
) -> DataFrame:
    """(qid, mapping: map<lang, page_id>) for every Q-id seen in the
    JSON dump, with per-language page ids joined in from page_props
    (only ``wikibase_item`` rows — F7, ProcessWikiData.java:441-442).
    Q-ids with no sitelink rows keep an empty map (the reference seeds
    all ids first, ProcessWikiData.java:118-181)."""
    qids = sqldump.wikidata_ids(json_lines).distinct()
    per_lang = None
    for lang, lines in sorted(page_props_by_lang.items()):
        props = sqldump.parse_insert_tuples(
            lines, "page_id LONG, prop STRING, value STRING"
        )
        rows = (
            props.filter(F.col("prop") == "wikibase_item")
            .select(
                F.col("value").alias("qid"),
                F.lit(lang).alias("lang"),
                F.col("page_id"),
            )
        )
        per_lang = rows if per_lang is None else per_lang.unionByName(rows)
    if per_lang is None:
        return qids.withColumn(
            "mapping", F.map_from_entries(F.array().cast("array<struct<lang:string,page_id:bigint>>"))
        ).orderBy("qid")
    links = qids.join(per_lang, "qid", "left")
    return (
        links.groupBy("qid")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.filter(
                        F.collect_list(F.struct("lang", "page_id")),
                        lambda s: s.getField("lang").isNotNull(),
                    )
                )
            ).alias("mapping")
        )
        .orderBy("qid")
    )


def translations(
    langlinks_lines: DataFrame,
    whitelist: tuple[str, ...] = ("fr", "de", "en", "es", "it"),
) -> DataFrame:
    """(page_id, translations: map<lang, title>) — entry point 3.
    Percent-escaping of ','/'%' in titles (C8,
    ProcessTranslation.java:236-237) is applied so the map round-trips
    through the reference's CSV format."""
    rows = sqldump.langlinks(langlinks_lines, whitelist)
    esc = F.regexp_replace(F.regexp_replace(F.col("title"), "%", "%25"), ",", "%2C")
    return (
        rows.select("page_id", "lang", esc.alias("title"))
        .groupBy("page_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("lang", "title")))
            ).alias("translations")
        )
        .orderBy("page_id")
    )
