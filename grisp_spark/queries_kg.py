"""KG-construction queries over the derived transcript table, each
mirroring a grisp aggregate with a DuckDB oracle over the same
deterministic derivation (sources/testdata.DERIVE_CONVERSATIONS_SQL).

kg01  label text-statistics (A3: LabelOccurrencesStep.java:153-239)
kg02  label→sense statistics with O1 ordering (A2 + DumpExtractor.java:930-944)
kg03  isPrimary + per-sense label inversion (W1/A7: PageLabelStep.java:80-134)
kg04  co-occurrence edge extraction per turn (LabelSensesStep.java:305-310)
kg05  capped adjacency summaries (A5/O4: PageLinkSummaryStep.java:78-119)
kg06  full KG pipeline flagship over derived transcripts (rows-only)

"Label" here is a unigram from the corpus's own vocabulary (the
self-bootstrapped gazetteer, SURVEY.md §7 stage 3); "sense" is the
role context it links into — small stand-ins with the identical
aggregation shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from grisp_spark.kg.spec import BOUNDARY_PATTERN
from grisp_spark.kg.stats import occ_doc_agg
from grisp_spark.sources.testdata import DERIVE_CONVERSATIONS_SQL, derive_conversations

MIN_OCC = 10
ADJ_CAP = 5

# the tokenizer pattern as a DuckDB string literal (' doubled)
_TOKEN_PAT_SQL = BOUNDARY_PATTERN.replace("'", "''")


def _turn_tokens(conv: DataFrame) -> DataFrame:
    return conv.select(
        "conv_id",
        "turn_idx",
        "role",
        F.posexplode(F.filter(F.split("text", " "), lambda t: t != "")).alias(
            "pos", "token"
        ),
    )


def kg01_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_occ / text_doc per label over 1- and 2-grams (A3: count per
    doc then sum ≡ count + count_distinct(conv))."""
    conv = derive_conversations(spark, sf_dir)
    toks = conv.select(
        "conv_id", F.filter(F.split("text", " "), lambda t: t != "").alias("w")
    )
    unigrams = toks.select("conv_id", F.explode("w").alias("label"))
    bigrams = toks.filter(F.size("w") >= 2).select(
        "conv_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 2),
                lambda i: F.concat_ws(" ", F.slice(F.col("w"), i + 1, 2)),
            )
        ).alias("label"),
    )
    grams = unigrams.unionByName(bigrams)
    return (
        occ_doc_agg(grams, ["label"], "text_occ", "text_doc")
        .filter(F.col("text_occ") >= MIN_OCC)
        .orderBy("label")
    )


def kg02_label_senses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (label, sense) link counts with the O1 sense ordering rank
    (link_occ desc, link_doc desc, sense asc)."""
    conv = derive_conversations(spark, sf_dir)
    toks = _turn_tokens(conv)
    senses = occ_doc_agg(
        toks.select(
            F.col("token").alias("label"), F.col("role").alias("sense"), "conv_id"
        ),
        ["label", "sense"], "link_occ", "link_doc",
    )
    w = W.partitionBy("label").orderBy(
        F.col("link_occ").desc(), F.col("link_doc").desc(), F.col("sense").asc()
    )
    return (
        senses.withColumn("sense_rank", F.row_number().over(w))
        .filter(F.col("link_occ") >= MIN_OCC)
        .orderBy("label", "sense_rank")
    )


def kg03_entity_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 inversion with W1 isPrimary: per sense, its top-10 labels by
    (link_occ desc, label asc); is_primary marks labels whose top sense
    is this one."""
    conv = derive_conversations(spark, sf_dir)
    toks = _turn_tokens(conv)
    senses = toks.groupBy(F.col("token").alias("label"), F.col("role").alias("sense")).agg(
        F.count("*").alias("link_occ")
    )
    w_label = W.partitionBy("label").orderBy(
        F.col("link_occ").desc(), F.col("sense").asc()
    )
    flagged = senses.withColumn("is_primary", F.row_number().over(w_label) == 1)
    w_sense = W.partitionBy("sense").orderBy(
        F.col("link_occ").desc(), F.col("label").asc()
    )
    return (
        flagged.withColumn("rn", F.row_number().over(w_sense))
        .filter(F.col("rn") <= 10)
        .select("sense", "label", "link_occ", "is_primary", "rn")
        .orderBy("sense", "rn")
    )


def kg04_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct directed co-occurrence edges (a < b) between long
    tokens (≥6 chars) within a turn + global support counts — the
    page-link edge build (LabelSensesStep.java:305-310, A9 distinct)."""
    conv = derive_conversations(spark, sf_dir)
    toks = _turn_tokens(conv).filter(F.length("token") >= 6)
    per_turn = toks.groupBy("conv_id", "turn_idx").agg(
        F.array_sort(F.collect_set("token")).alias("ents")
    )
    pairs = (
        per_turn.select(
            "conv_id", F.explode("ents").alias("src"), F.col("ents").alias("e2")
        )
        .select("conv_id", "src", F.explode("e2").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
    )
    return (
        occ_doc_agg(pairs, ["src", "dst"], "support", "n_convs")
        .filter(F.col("support") >= 5)
        .orderBy("src", "dst")
    )


def kg05_adjacency_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/O4: per-node sorted out-neighbor list with a deterministic
    cap + exact degree."""
    edges = kg04_cooccurrence_edges(spark, sf_dir)
    # one collect_set feeds both outputs (countDistinct alongside
    # would force a second exchange); out_adj '|'-joined so the
    # driver's canonicalizer can hash it (scalar columns only)
    return (
        edges.groupBy("src")
        .agg(F.array_sort(F.collect_set("dst")).alias("adj"))
        .select(
            "src",
            F.array_join(F.slice("adj", 1, ADJ_CAP), "|").alias("out_adj"),
            F.size("adj").cast("long").alias("degree"),
        )
        .orderBy("src")
    )


def kg06_triples_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full KG pipeline over derived transcripts with a
    self-bootstrapped KB: gazetteer = frequent long tokens, entities
    numbered by label order, priors from corpus counts, context
    scoring + canonicalization + turn-window triples. Rows-only check
    (numpy context scoring isn't SQL-expressible); every constituent
    stage has its own oracle (kg01-kg05, q13)."""
    from grisp_spark.kg import canonicalize, linking

    conv = derive_conversations(spark, sf_dir)
    toks = _turn_tokens(conv).filter(F.length("token") >= 6)
    # cached: entities feed three consumers (two broadcast builds +
    # canonical map) — without the cache the token agg runs 3x
    vocab = (
        occ_doc_agg(toks, ["token"], "occ", "doc")
        .filter(F.col("occ") >= MIN_OCC)
        .cache()
    )
    # deterministic hash ids — no global-ordering window (which would
    # funnel the vocabulary through a single partition)
    entities = vocab.select(
        F.xxhash64("token").alias("entity_id"),
        F.initcap("token").alias("canonical_name"),
        F.lit("article").alias("entity_type"),
        F.array(F.col("token")).alias("context_vocab"),
        F.lit(None).cast("long").alias("redirect_to"),
        F.col("occ"),
        F.col("doc"),
    )
    label_stats = entities.select(
        F.col("canonical_name").alias("label"),
        "entity_id",
        F.col("occ").alias("link_occ"),
        F.col("doc").alias("link_doc"),
        F.lit(True).alias("from_title"),
        F.lit(False).alias("from_redirect"),
    )
    kb = {"entities": entities, "label_stats": label_stats}
    gaz_bc, evec_bc, canon_bc = linking.build_kb_broadcasts(spark, kb)
    return linking.link_and_extract(conv, gaz_bc, evec_bc, canon_bc)


def kg07_triples_prior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship pipeline, oracle-checked end-to-end: detection →
    prior-only linking (spec score_mode='prior', pure SQL: argmax of
    occ/total with the min-entity-id tie-break) → CC canonicalization
    over surface-equivalence redirects → turn-window triples, hashed
    against a DuckDB replay. kg06 stays as the full context-scored run
    (numpy scoring isn't SQL-expressible).

    Portability choices vs kg06: the real boundary tokenizer
    (spec.BOUNDARY_PATTERN) on both engines, and dense row_number
    entity ids instead of xxhash64 (DuckDB lacks xxhash64) — the
    global window is over the aggregated sense table (hundreds of
    rows after the MIN_OCC cut), not the corpus. Redirect rule:
    a label's 'tool'-role sense redirects to the label's min-id
    sense — one-level star components exercising the CC machinery
    (deep chains are covered by q13/test_closure)."""
    from grisp_spark.kg import canonicalize, linking

    conv, kb = _prior_corpus_kb(spark, sf_dir)
    gaz_bc, evec_bc, canon_bc = linking.build_kb_broadcasts(spark, kb)
    return linking.link_and_extract(
        conv, gaz_bc, evec_bc, canon_bc, score_mode="prior"
    ).orderBy("conv_id", "turn_idx", "pred", "subj", "obj")


def _prior_corpus_kb(spark: SparkSession, sf_dir: str):
    """The kg07/q39 shared setup: derived transcripts + the
    self-bootstrapped prior-mode KB (dense ids, tool-role redirect
    stars) — see kg07_triples_prior for the semantics notes."""
    from grisp_spark.kg import spec

    conv = derive_conversations(spark, sf_dir)
    toks = conv.select(
        "conv_id",
        "role",
        F.explode(
            F.regexp_extract_all("text", F.lit(spec.BOUNDARY_PATTERN), 0)
        ).alias("token"),
    ).filter(F.length("token") >= 6)
    keyed = toks.withColumn(
        "label",
        F.concat(F.upper(F.substring("token", 1, 1)), F.expr("substring(token, 2)")),
    )
    senses = occ_doc_agg(keyed, ["label", "role"], "occ", "doc")
    labs = (
        senses.groupBy("label")
        .agg(F.sum("occ").alias("tot"))
        .filter(F.col("tot") >= MIN_OCC)
        .select("label")
    )
    wl = W.partitionBy("label")
    ent = (
        senses.join(labs, "label")
        # global row_number: the sense table is already aggregated and
        # tiny, so the single-partition window is not a scale concern
        .withColumn(
            "entity_id", F.row_number().over(W.orderBy("label", "role")).cast("long")
        )
        .withColumn("min_eid", F.min("entity_id").over(wl))
    )
    entities = ent.select(
        "entity_id",
        F.col("label").alias("canonical_name"),
        F.lit("article").alias("entity_type"),
        F.array().cast("array<string>").alias("context_vocab"),
        F.when(
            (F.col("role") == "tool") & (F.col("entity_id") != F.col("min_eid")),
            F.col("min_eid"),
        ).alias("redirect_to"),
        "occ",
        "doc",
    )
    label_stats = ent.select(
        "label",
        "entity_id",
        F.col("occ").alias("link_occ"),
        F.col("doc").alias("link_doc"),
        F.lit(True).alias("from_title"),
        F.lit(False).alias("from_redirect"),
    )
    return conv, {"entities": entities, "label_stats": label_stats}


def q39_triples_prior_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kg07's exact pipeline with the linking stage swapped to the
    oversized-gazetteer SHUFFLE-JOIN path (kg/linking_shuffle — no
    broadcast dict, no driver collect of the KB) feeding the staged
    canonicalize → extract_triples stages; checked against the SAME
    DuckDB oracle as kg07, so the distributed-KB plan is
    driver-certified end to end."""
    from grisp_spark.kg import canonicalize, linking_shuffle
    from grisp_spark.kg.triples import extract_triples

    conv, kb = _prior_corpus_kb(spark, sf_dir)
    linked = linking_shuffle.link_mentions_shuffle(conv, kb, score_mode="prior")
    canon = canonicalize.canonical_map(kb["entities"])
    trips = extract_triples(canonicalize.rewrite_linked(linked, canon))
    return trips.select("conv_id", "turn_idx", "subj", "pred", "obj").orderBy(
        "conv_id", "turn_idx", "pred", "subj", "obj"
    )


_BASE = f"WITH conv AS ({DERIVE_CONVERSATIONS_SQL})"

_TURN_TOKENS = """
    toks AS (
        SELECT conv_id, turn_idx, role, token
        FROM (SELECT conv_id, turn_idx, role,
                     unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                       AS token
              FROM conv)
    )
"""

ORACLES: dict[str, str] = {
    "kg01_label_stats": f"""
        {_BASE},
        w AS (SELECT conv_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
              FROM conv),
        grams AS (
            SELECT conv_id, unnest(w) AS label FROM w
            UNION ALL
            SELECT conv_id, array_to_string(w[i : i + 1], ' ') AS label
            FROM w, UNNEST(generate_series(1, len(w) - 1)) t(i)
            WHERE len(w) >= 2
        )
        SELECT label, count(*) AS text_occ, count(DISTINCT conv_id) AS text_doc
        FROM grams GROUP BY label HAVING count(*) >= {MIN_OCC} ORDER BY label
    """,
    "kg02_label_senses": f"""
        {_BASE}, {_TURN_TOKENS},
        senses AS (
            SELECT token AS label, role AS sense, count(*) AS link_occ,
                   count(DISTINCT conv_id) AS link_doc
            FROM toks GROUP BY token, role
        )
        SELECT label, sense, link_occ, link_doc,
               CAST(row_number() OVER (PARTITION BY label
                    ORDER BY link_occ DESC, link_doc DESC, sense ASC) AS INTEGER)
                 AS sense_rank
        FROM senses QUALIFY link_occ >= {MIN_OCC}
        ORDER BY label, sense_rank
    """,
    "kg03_entity_labels": f"""
        {_BASE}, {_TURN_TOKENS},
        senses AS (
            SELECT token AS label, role AS sense, count(*) AS link_occ
            FROM toks GROUP BY token, role
        ), flagged AS (
            SELECT *, (row_number() OVER (PARTITION BY label
                       ORDER BY link_occ DESC, sense ASC) = 1) AS is_primary
            FROM senses
        )
        SELECT sense, label, link_occ, is_primary,
               CAST(rn AS INTEGER) AS rn
        FROM (SELECT *, row_number() OVER (PARTITION BY sense
                        ORDER BY link_occ DESC, label ASC) AS rn
              FROM flagged)
        WHERE rn <= 10 ORDER BY sense, rn
    """,
    "kg04_cooccurrence_edges": f"""
        {_BASE}, {_TURN_TOKENS},
        per_turn AS (
            SELECT conv_id, turn_idx, list_sort(list_distinct(list(token))) AS ents
            FROM toks WHERE length(token) >= 6 GROUP BY conv_id, turn_idx
        ), pairs AS (
            SELECT conv_id, a AS src, b AS dst
            FROM per_turn, UNNEST(ents) t1(a), UNNEST(ents) t2(b)
            WHERE a < b
        )
        SELECT src, dst, count(*) AS support,
               count(DISTINCT conv_id) AS n_convs
        FROM pairs GROUP BY src, dst HAVING count(*) >= 5 ORDER BY src, dst
    """,
    "kg05_adjacency_capped": f"""
        {_BASE}, {_TURN_TOKENS},
        per_turn AS (
            SELECT conv_id, turn_idx, list_sort(list_distinct(list(token))) AS ents
            FROM toks WHERE length(token) >= 6 GROUP BY conv_id, turn_idx
        ), pairs AS (
            SELECT conv_id, a AS src, b AS dst
            FROM per_turn, UNNEST(ents) t1(a), UNNEST(ents) t2(b)
            WHERE a < b
        ), edges AS (
            SELECT src, dst FROM pairs GROUP BY src, dst HAVING count(*) >= 5
        )
        SELECT src,
               array_to_string(list_sort(list_distinct(list(dst)))[1 : {ADJ_CAP}], '|')
                 AS out_adj,
               count(DISTINCT dst) AS degree
        FROM edges GROUP BY src ORDER BY src
    """,
}

ORACLES["kg07_triples_prior"] = f"""
    {_BASE},
    tok AS (
        SELECT conv_id, turn_idx, role, t.token AS token
        FROM conv, UNNEST(regexp_extract_all(text, '{_TOKEN_PAT_SQL}')) t(token)
        WHERE length(t.token) >= 6
    ),
    keyed AS (
        SELECT conv_id, turn_idx, role,
               upper(token[1]) || token[2:] AS label
        FROM tok
    ),
    senses AS (
        SELECT label, role, count(*) AS occ
        FROM keyed GROUP BY label, role
    ),
    labs AS (
        SELECT label FROM senses GROUP BY label HAVING sum(occ) >= {MIN_OCC}
    ),
    ent AS (
        SELECT label, role, occ,
               row_number() OVER (ORDER BY label, role) AS entity_id
        FROM senses JOIN labs USING (label)
    ),
    -- prior-only linking: argmax occ/total ≡ argmax occ (same positive
    -- divisor), tie-break min entity_id; canonicalization closed form:
    -- a picked 'tool' sense rewrites to the label's min-id sense (the
    -- component min of the one-level redirect star)
    pick AS (
        SELECT label,
               CASE WHEN role = 'tool'
                    THEN min(entity_id) OVER (PARTITION BY label)
                    ELSE entity_id END AS canon_eid,
               row_number() OVER (PARTITION BY label
                                  ORDER BY occ DESC, entity_id ASC) AS rn
        FROM ent
    ),
    picked AS (SELECT label, canon_eid FROM pick WHERE rn = 1),
    matched AS (
        SELECT k.conv_id, k.turn_idx, p.canon_eid AS eid
        FROM keyed k JOIN picked p USING (label)
    ),
    turn_sets AS (
        SELECT conv_id, turn_idx, list_sort(list_distinct(list(eid))) AS cur
        FROM matched GROUP BY conv_id, turn_idx
    ),
    allt AS (
        SELECT c.conv_id, c.turn_idx, c.role, c.tool,
               coalesce(t.cur, CAST([] AS BIGINT[])) AS cur
        FROM conv c LEFT JOIN turn_sets t USING (conv_id, turn_idx)
    ),
    w AS (
        SELECT conv_id, turn_idx, role, tool, cur,
               coalesce(lag(cur) OVER (PARTITION BY conv_id ORDER BY turn_idx),
                        CAST([] AS BIGINT[])) AS prev
        FROM allt
    ),
    trip AS (
        SELECT conv_id, turn_idx, t.e AS subj, 'mentioned_by' AS pred, role AS obj
        FROM w, UNNEST(cur) t(e)
        UNION ALL
        SELECT conv_id, turn_idx, t.e AS subj, 'used_with_tool' AS pred, tool AS obj
        FROM w, UNNEST(cur) t(e) WHERE tool IS NOT NULL
        UNION ALL
        SELECT conv_id, turn_idx, a.e AS subj, 'co_occurs_with' AS pred,
               CAST(b.e AS VARCHAR) AS obj
        FROM w,
             UNNEST(list_sort(list_distinct(cur || prev))) a(e),
             UNNEST(list_sort(list_distinct(cur || prev))) b(e)
        WHERE a.e < b.e AND (list_contains(cur, a.e) OR list_contains(cur, b.e))
    )
    SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
           CAST(subj AS BIGINT) AS subj, pred, obj
    FROM trip ORDER BY conv_id, turn_idx, pred, subj, obj
"""

ORACLES["q39_triples_prior_shuffle"] = ORACLES["kg07_triples_prior"]

QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and name.startswith("kg0")
}
QUERIES["q39_triples_prior_shuffle"] = q39_triples_prior_shuffle

# Driver-visible aliases: the driver's correctness gate only evaluates
# q/dd/ss/ta/mm-prefixed names (CORRECTNESS_r02 had no row for any kg*
# query), so the KG spine is registered under qNN names too. The kg*
# names stay for the local mirror / bench; the alias and the original
# are the SAME callable and SAME oracle SQL, and the local contract
# test dedupes on DRIVER_ALIASES so each oracle runs once.
DRIVER_ALIASES: dict[str, str] = {
    "q32_kg_label_stats": "kg01_label_stats",
    "q33_kg_label_senses": "kg02_label_senses",
    "q34_kg_entity_labels": "kg03_entity_labels",
    "q35_kg_cooccurrence_edges": "kg04_cooccurrence_edges",
    "q36_kg_adjacency_capped": "kg05_adjacency_capped",
    "q37_kg_triples_flagship": "kg06_triples_flagship",  # rows-only
    "q38_kg_triples_prior": "kg07_triples_prior",
}
for _alias, _target in DRIVER_ALIASES.items():
    QUERIES[_alias] = QUERIES[_target]
    if _target in ORACLES:
        ORACLES[_alias] = ORACLES[_target]
