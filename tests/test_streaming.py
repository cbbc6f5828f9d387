"""Structured-Streaming incremental ingest: micro-batch mentions equal the
batch pipeline's output; epoch replay is idempotent; watermarked window
aggregation agrees with its batch oracle."""

from __future__ import annotations

import os

import pytest

from ckg_spark.corpus.pages import config_from_vocab, generate_pages_df
from ckg_spark.corpus.vocab import vocab_dataframes
from ckg_spark.extract import with_extracted_text
from ckg_spark.lakehouse import Warehouse
from ckg_spark.streaming import incremental_mentions, windowed_event_counts
from ckg_spark.tag import build_automaton, tag_mentions

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _automaton_bc(spark, vocab):
    etype = {t["id"]: t["entity_type"] for t in vocab.terms}
    rows = [{**a, "entity_type": etype[a["canonical_id"]]} for a in vocab.aliases]
    return spark.sparkContext.broadcast(build_automaton(rows))


def _mention_rows(df):
    return sorted(
        (r["url"], r["canonical_id"], r["n_hits"])
        for r in df.select("url", "canonical_id", "n_hits").collect()
    )


@pytest.fixture()
def corpus_dir(tmp_path, spark, vocab):
    """Pages corpus written as two separate file drops."""
    d = str(tmp_path / "pages")
    os.makedirs(d)
    cfg1 = config_from_vocab(vocab, n_docs=80, seed=42, partitions=2)
    cfg2 = config_from_vocab(vocab, n_docs=40, seed=43, partitions=1)
    generate_pages_df(spark, cfg1).write.mode("append").parquet(d)
    return d, cfg2


def test_incremental_equals_batch_and_is_idempotent(spark, vocab, corpus_dir, tmp_path):
    d, cfg2 = corpus_dir
    wh = Warehouse(str(tmp_path / "wh"))
    table = wh.table("mentions_stream")
    ckpt = str(tmp_path / "ckpt")
    _, _, blocklist = vocab_dataframes(spark, vocab)
    ac = _automaton_bc(spark, vocab)

    s1 = incremental_mentions(spark, d, ac, table, ckpt, blocklist=blocklist)
    assert s1["epochs_committed"] >= 1

    batch = tag_mentions(
        with_extracted_text(spark.read.parquet(d)).select("url", "text", "lang"),
        ac,
        blocklist=blocklist,
    )
    assert _mention_rows(table.read(spark)) == _mention_rows(batch)

    # drain again with no new files: nothing happens
    s2 = incremental_mentions(spark, d, ac, table, ckpt, blocklist=blocklist)
    assert s2["epochs_committed"] == 0
    assert _mention_rows(table.read(spark)) == _mention_rows(batch)

    # second file drop: only the new pages are processed, union matches batch
    generate_pages_df(spark, cfg2).write.mode("append").parquet(d)
    s3 = incremental_mentions(spark, d, ac, table, ckpt, blocklist=blocklist)
    assert s3["epochs_committed"] >= 1
    batch_all = tag_mentions(
        with_extracted_text(spark.read.parquet(d)).select("url", "text", "lang"),
        ac,
        blocklist=blocklist,
    )
    assert _mention_rows(table.read(spark)) == _mention_rows(batch_all)


def test_epoch_replay_skipped(spark, vocab, corpus_dir, tmp_path):
    """A replayed epoch (same epoch id, e.g. crash between sink and commit)
    must not double-append."""
    d, _ = corpus_dir
    wh = Warehouse(str(tmp_path / "wh2"))
    table = wh.table("mentions_stream")
    _, _, blocklist = vocab_dataframes(spark, vocab)
    ac = _automaton_bc(spark, vocab)

    incremental_mentions(spark, d, ac, table, str(tmp_path / "c1"), blocklist=blocklist)
    n1 = table.row_count()
    # fresh stream checkpoint, same sink table: epochs restart at 0 and are
    # recognized as already committed
    s = incremental_mentions(spark, d, ac, table, str(tmp_path / "c2"), blocklist=blocklist)
    assert s["epochs_committed"] == 0
    assert s["epochs_skipped"] >= 1
    assert table.row_count() == n1


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch = windowed_event_counts(events, window="1 day", watermark="2 days")
    exp = sorted(map(tuple, batch.collect()))

    # the file-source requires a directory, the testdata table is one file
    events_dir = str(tmp_path / "events")
    events.write.parquet(events_dir)
    stream = spark.readStream.schema(events.schema).parquet(events_dir)
    out = []
    q = (
        windowed_event_counts(stream, window="1 day", watermark="2 days")
        .writeStream.foreachBatch(
            lambda df, _eid: out.extend(map(tuple, df.collect()))
        )
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "wc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(out) == exp
