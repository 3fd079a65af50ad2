"""Deterministic synthetic transcript + planted-KB generator.

Pure function of (seed, size knobs) — FIXTURES.md §1-2. Generates:

- ``conversations`` (conv_id, turn_idx, role, text, tool, ts) with
  planted entity mentions: canonical names, aliases, case/underscore
  variants, multi-token surfaces up to 15 tokens, ambiguous surfaces
  shared by ≥2 entities, a hot entity in ~30% of turns (skew driver),
  empty turns, duplicate texts, physically shuffled row order.
- ``entities`` (entity_id, canonical_name, entity_type, topic,
  context_vocab) — redirect entities carry redirect_to (chains of 2-3
  hops + one 2-cycle, RedirectCache.java:172-198 analogue).
- ``aliases`` (alias, entity_id, kind, chain_hops).
- ``label_stats`` planted anchor-prior table (ExLabel.java:10-21
  analogue) with senses ordered per DumpExtractor.java:930-944.
- ``gold_mentions`` ground truth of planted mentions (for diagnostics;
  the P/R gate compares Spark vs the reference-semantics oracle).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from grisp_spark.kg import spec

N_TOPICS = 8
DATAGEN_VERSION = 2  # bump when generation semantics change (cache key)

_TOPIC_WORDS = {
    t: [f"{w}{t}" for w in (
        "gravity", "tensor", "lattice", "photon", "syntax", "kernel",
        "harvest", "meadow", "circuit", "ledger", "sonnet", "glacier",
    )]
    for t in range(N_TOPICS)
}

_NAME_POOL = [
    "Apache", "Spark", "Delta", "Lake", "Iceberg", "Catalyst", "Arrow",
    "Parquet", "Tungsten", "Photon", "Flink", "Trino", "Kafka", "Hive",
    "Hadoop", "Presto", "Beam", "Storm", "Samza", "Druid", "Pinot",
    "Hudi", "Paimon", "Gravitino", "Polaris", "Unity", "Glue", "Atlas",
    "Ranger", "Knox", "Zeppelin", "Livy", "Phoenix", "Drill", "Impala",
    "Kudu", "Ozone", "Alluxio", "Celeborn", "Uniffle", "Gluten", "Velox",
    "Comet", "DataFusion", "Ballista", "Polars", "DuckDB", "Pandas",
]

_FILLER = [
    "the", "a", "with", "from", "about", "using", "via", "and", "then",
    "please", "run", "check", "show", "result", "output", "error",
]

_TOOLS = ["bash", "bash", "bash", "search", "python", "browse"]  # hot-skewed
_ROLES = ["user", "assistant", "tool"]


def _entity_names(rng: np.random.Generator, n: int) -> list[str]:
    names: list[str] = []
    seen: set[str] = set()
    while len(names) < n:
        k = int(rng.integers(1, 4))
        toks = list(rng.choice(_NAME_POOL, size=k, replace=False))
        name = spec.normalize_title(" ".join(toks))
        if name not in seen:
            seen.add(name)
            names.append(name)
    return names


def generate_kb(seed: int = 42, n_entities: int = 120) -> dict[str, pd.DataFrame]:
    rng = np.random.default_rng(seed)
    names = _entity_names(rng, n_entities)

    ents = []
    for eid in range(n_entities):
        topic = eid % N_TOPICS
        etype = "article"
        vocab = list(rng.choice(_TOPIC_WORDS[topic], size=6, replace=False))
        vocab += [f"ent{eid}a", f"ent{eid}b"]
        ents.append((eid, names[eid], etype, topic, vocab))

    # one very long canonical name (15 tokens — max ngram test)
    long_name = spec.normalize_title(
        " ".join(f"longword{i}" for i in range(spec.MAX_LABEL_TOKENS))
    )
    ents[5] = (5, long_name, "article", 5 % N_TOPICS, ents[5][4])

    # redirect chains: 90->91->0 (2 hops), 92->93->94->1 (3 hops),
    # cycle 95<->96 (cycle-safety), plain redirect 97->2
    redirect_to = {90: 91, 91: 0, 92: 93, 93: 94, 94: 1, 95: 96, 96: 95, 97: 2}
    for eid, tgt in redirect_to.items():
        e = ents[eid]
        ents[eid] = (e[0], e[1], "redirect", e[3], e[4])

    entities = pd.DataFrame(
        ents, columns=["entity_id", "canonical_name", "entity_type", "topic", "context_vocab"]
    )
    entities["redirect_to"] = entities["entity_id"].map(redirect_to).astype("Int64")

    # aliases: variants + ambiguous surfaces
    alias_rows = []
    for eid in range(n_entities):
        name = names[eid] if eid != 5 else long_name
        toks = name.split(" ")
        # case variant of first char (resolves identically under normalize_title)
        if int(rng.integers(0, 2)):
            alias_rows.append((name[0].lower() + name[1:], eid, "variant", 0))
        # underscore variant
        if len(toks) > 1 and int(rng.integers(0, 2)):
            alias_rows.append(("_".join(toks), eid, "variant", 0))
        # abbreviation alias (first token) — may collide across entities
        if len(toks) > 1 and int(rng.integers(0, 3)) == 0:
            alias_rows.append((toks[0], eid, "variant", 0))
        # distinct nickname
        alias_rows.append((f"nick {eid} name", eid, "variant", 0))

    # explicitly ambiguous surfaces: same alias → two entities with
    # different topics (context must disambiguate)
    amb_pairs = [(10, 11), (20, 21), (30, 31), (40, 41), (50, 51)]
    for i, (a, b) in enumerate(amb_pairs):
        surf = f"ambiguous term {i}"
        alias_rows.append((surf, a, "variant", 0))
        alias_rows.append((surf, b, "variant", 0))

    # a ≥500-char label that must be dropped (LabelCache.java:122)
    alias_rows.append(("x" * 520, 3, "variant", 0))

    # redirect-name aliases (surface of redirect entity → its own id;
    # canonicalization resolves the chain)
    chain_hops = {90: 2, 91: 1, 92: 3, 93: 2, 94: 1, 95: 0, 96: 0, 97: 1}
    for eid, hops in chain_hops.items():
        alias_rows.append((names[eid], eid, "redirect", hops))

    aliases = pd.DataFrame(alias_rows, columns=["alias", "entity_id", "kind", "chain_hops"])

    # planted anchor-prior stats: hot entity 0 gets big counts
    stats_rows = []
    surface_senses: dict[str, set[int]] = {}
    for _, r in entities.iterrows():
        surface_senses.setdefault(spec.normalize_title(r.canonical_name), set()).add(
            int(r.entity_id)
        )
    for _, r in aliases.iterrows():
        if len(r.alias) >= spec.MAX_LABEL_CHARS:
            continue
        surface_senses.setdefault(spec.normalize_title(r.alias), set()).add(int(r.entity_id))
    for surf in sorted(surface_senses):
        for eid in sorted(surface_senses[surf]):
            base = 200 if eid == 0 else int(rng.integers(1, 100))
            link_occ = base
            link_doc = max(1, int(link_occ * float(rng.uniform(0.3, 1.0))))
            is_title = spec.normalize_title(names[eid] if eid != 5 else long_name) == surf
            stats_rows.append((surf, eid, link_occ, link_doc, bool(is_title), False))
    label_stats = pd.DataFrame(
        stats_rows,
        columns=["label", "entity_id", "link_occ", "link_doc", "from_title", "from_redirect"],
    )
    return {"entities": entities, "aliases": aliases, "label_stats": label_stats}


def generate_conversations(
    seed: int, n_convs: int, kb: dict[str, pd.DataFrame]
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (conversations, gold_mentions). Row order is shuffled
    (out-of-order physical layout; (conv_id, turn_idx) keys stay valid
    — the stable-ordering invariant is on keys, not layout)."""
    rng = np.random.default_rng(seed + 1)
    entities = kb["entities"]
    aliases = kb["aliases"]
    names = dict(zip(entities.entity_id, entities.canonical_name))
    vocabs = dict(zip(entities.entity_id, entities.context_vocab))
    alias_by_ent: dict[int, list[str]] = {}
    for _, r in aliases.iterrows():
        if len(r.alias) < spec.MAX_LABEL_CHARS:
            alias_by_ent.setdefault(int(r.entity_id), []).append(r.alias)
    eids = entities.entity_id.to_numpy()

    conv_rows, gold_rows = [], []
    base_ts = pd.Timestamp("2024-01-01 00:00:00")
    for c in range(n_convs):
        conv_id = f"conv-{c:06d}"
        n_turns = int(rng.integers(3, 16))
        for t in range(n_turns):
            role = _ROLES[t % 3]
            tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else None
            ts = base_ts + pd.Timedelta(minutes=c, seconds=t)
            # ~8% empty turns
            if rng.uniform() < 0.08:
                conv_rows.append((conv_id, t, role, "", tool, ts))
                continue
            # choose 0-2 planted entities; entity 0 is hot (~30% of turns)
            k = int(rng.integers(0, 3))
            chosen: list[int] = []
            if rng.uniform() < 0.30:
                chosen.append(0)
            while len(chosen) < k:
                e = int(eids[int(rng.integers(0, len(eids)))])
                if e not in chosen:
                    chosen.append(e)
            # rng.integers indexing instead of rng.choice (~40x faster)
            words: list[str] = [
                _FILLER[i]
                for i in rng.integers(0, len(_FILLER), size=int(rng.integers(2, 6)))
            ]
            for e in chosen:
                # surface: canonical or an alias/variant
                opts = [names[e]] + alias_by_ent.get(e, [])
                surf = opts[int(rng.integers(0, len(opts)))]
                vocab = vocabs[e]
                picks: list[int] = []
                while len(picks) < 3:  # small-k sample w/o replacement
                    j = int(rng.integers(0, len(vocab)))
                    if j not in picks:
                        picks.append(j)
                words.extend(vocab[j] for j in picks)
                pos = int(rng.integers(0, len(words) + 1))
                for j, tok in enumerate(surf.split(" ")):
                    words.insert(pos + j, tok)
                gold_rows.append((conv_id, t, e, surf))
            # ~5% duplicate-of-previous-turn text (doc-count semantics)
            text = " ".join(words)
            conv_rows.append((conv_id, t, role, text, tool, ts))

    # duplicate ~3% of texts into the following turn of the same conv
    # (mutate the row list pre-DataFrame: per-cell pandas .loc writes
    # are ~2ms each at millions of rows — superlinear block churn)
    key_to_idx = {(r[0], r[1]): i for i, r in enumerate(conv_rows)}
    rng_dup = np.random.default_rng(seed + 2)
    n_dup = int(len(conv_rows) * 0.03)
    dup_pos = rng_dup.choice(len(conv_rows), size=n_dup, replace=False)
    for i in dup_pos:
        r = conv_rows[i]
        j = key_to_idx.get((r[0], r[1] + 1))
        if j is not None:
            t = conv_rows[j]
            conv_rows[j] = (t[0], t[1], t[2], r[3], t[4], t[5])
    conversations = pd.DataFrame(
        conv_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    # shuffle physical order
    conversations = conversations.sample(frac=1.0, random_state=seed + 3).reset_index(
        drop=True
    )
    conversations["turn_idx"] = conversations["turn_idx"].astype("int32")
    gold = pd.DataFrame(gold_rows, columns=["conv_id", "turn_idx", "entity_id", "surface"])
    return conversations, gold


def write_dataset(out_dir: str, seed: int = 42, n_convs: int = 200) -> dict[str, str]:
    """Write the full synthetic dataset as parquet; returns paths.

    Conversations are sharded into multiple part files (~5k convs
    each): a single parquet file is one Spark input split, which
    would serialize the scan + exchange map side of every downstream
    job regardless of core count."""
    os.makedirs(out_dir, exist_ok=True)
    kb = generate_kb(seed)
    conv, gold = generate_conversations(seed, n_convs, kb)
    paths = {}
    for name, pdf in {**kb, "conversations": conv, "gold_mentions": gold}.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        for c in pdf.columns:  # Spark can't read NANOS parquet timestamps
            if str(pdf[c].dtype).startswith("datetime64"):
                pdf[c] = pdf[c].astype("datetime64[us]")
        if name == "conversations" and n_convs > 5000:
            import shutil

            shutil.rmtree(p, ignore_errors=True)
            os.makedirs(p, exist_ok=True)
            n_shards = min(64, (n_convs + 4999) // 5000)
            shard = pdf.index % n_shards  # physical order is shuffled already
            for s in range(n_shards):
                pdf[shard == s].to_parquet(
                    os.path.join(p, f"part-{s:04d}.parquet"), index=False
                )
        else:
            pdf.to_parquet(p, index=False)
        paths[name] = p
    with open(os.path.join(out_dir, "_VERSION"), "w") as f:
        f.write(str(DATAGEN_VERSION))
    return paths
