"""Structured-streaming ingest smoke: file-source micro-batches drive
the same linking stage; results equal the batch run."""

import os
import shutil

from grisp_spark.kg import datagen, linking
from grisp_spark.streaming import ingest

DATA = "/root/repo/.data/stream_test"


def test_stream_matches_batch(spark):
    shutil.rmtree(DATA, ignore_errors=True)
    datagen.write_dataset(os.path.join(DATA, "kb"), seed=11, n_convs=20)
    # split conversations into two "arriving" files
    conv = spark.read.parquet(os.path.join(DATA, "kb", "conversations.parquet"))
    in_dir = os.path.join(DATA, "incoming")
    conv.repartition(3).write.mode("overwrite").parquet(in_dir)

    kb = {
        n: spark.read.parquet(os.path.join(DATA, "kb", f"{n}.parquet"))
        for n in ("entities", "aliases", "label_stats")
    }
    gaz_bc, evec_bc = linking.build_broadcasts(spark, kb)

    out_dir = os.path.join(DATA, "linked_stream")
    q = ingest.stream_linked_mentions(spark, in_dir, out_dir, gaz_bc, evec_bc)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out_dir)
    batch = linking.link_mentions(conv, gaz_bc, evec_bc, 8)
    key = lambda r: (r.conv_id, r.turn_idx, r.begin, r.end, int(r.entity_id))  # noqa: E731
    assert {key(r) for r in got.collect()} == {key(r) for r in batch.collect()}


def test_windowed_counts(spark):
    conv = spark.read.parquet(os.path.join(DATA, "kb", "conversations.parquet"))
    in_dir = os.path.join(DATA, "incoming")
    stream = ingest.stream_conversations(spark, in_dir)
    agg = ingest.windowed_turn_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("turn_counts")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT sum(n_turns) AS n FROM turn_counts"
    ).collect()[0].n
    assert got == conv.count()
