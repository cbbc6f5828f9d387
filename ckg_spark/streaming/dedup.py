"""Streaming exact deduplication — the ingest-time twin of the batch
dedup family (ops/dedup.py).

A 100 TB training-data pipeline dedups AT INGEST, not only in batch
sweeps: the stream keeps the FIRST document per content fingerprint and
drops every later duplicate. Two implementations, one semantics:

- :func:`streaming_first_per_fingerprint`: Structured Streaming
  ``dropDuplicatesWithinWatermark`` on the normalized-content
  fingerprint (the q_doc_fingerprint_dups key, textstats.fingerprint).
  State holds one entry per fingerprint seen within the watermark
  horizon — bounded by (unique-docs rate x horizon), the property that
  makes it safe on an unbounded stream; a duplicate arriving later than
  the horizon is re-admitted, which is the standard streaming-dedup
  contract (bound the state or bound the guarantee — pick the horizon
  to cover the duplication window, e.g. a crawl revisit cycle).
- :func:`batch_first_per_fingerprint`: the batch twin — min-by event
  time per fingerprint; on in-horizon data a drained
  ``Trigger.AvailableNow`` run emits exactly this set (asserted by
  tests/test_streaming.py).

Ordering contract: ``dropDuplicatesWithinWatermark`` keeps the first
row ENCOUNTERED — first ARRIVAL wins, the standard streaming-dedup
semantics (Spark forbids sorting a streaming frame, so an event-time
first-wins cannot be enforced pre-state). When arrival order follows
event time (an AvailableNow drain over time-ordered files, or any
in-order ingest) the surviving set equals the batch twin's exactly —
that is what the equivalence test asserts; out-of-order arrival keeps
whichever duplicate landed first, never more than one per horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.textstats import fingerprint, normalized_token_stream


def _with_fingerprint(docs: DataFrame, text_col: str) -> DataFrame:
    """Content fingerprint, NULL when the doc has no [a-z0-9] tokens.

    textstats.fingerprint maps every token-less document (CJK-only,
    punctuation-only, empty, null text) to the one constant md5('') —
    fine for reporting dup GROUPS, catastrophic for ingest dedup, where
    it would silently drop every such document but the first. A NULL
    fingerprint marks 'no content evidence' and both twins pass those
    rows through undeduplicated."""
    t = F.col(text_col)
    return docs.withColumn(
        "fingerprint",
        F.when(F.length(normalized_token_stream(t)) > 0, fingerprint(t)),
    )


def batch_first_per_fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch twin: the earliest (ts, id) row per content fingerprint;
    rows with a NULL fingerprint (no tokens) pass through undeduplicated."""
    d = _with_fingerprint(docs, text_col)
    keyed = (
        d.filter(F.col("fingerprint").isNotNull())
        .groupBy("fingerprint")
        .agg(F.min(F.struct(F.col(ts_col), F.col(id_col))).alias("__k__"))
    )
    deduped = keyed.select(
        "fingerprint",
        F.col(f"__k__.{ts_col}").alias(ts_col),
        F.col(f"__k__.{id_col}").alias(id_col),
    )
    passthrough = d.filter(F.col("fingerprint").isNull()).select(
        "fingerprint", ts_col, id_col
    )
    return deduped.unionByName(passthrough)


def streaming_first_per_fingerprint(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """readStream frame -> deduplicated stream (fingerprint, ts, id):
    one surviving row per content fingerprint within the watermark
    horizon; token-less rows (NULL fingerprint) bypass the stateful
    operator entirely — no state, no drops. Append-mode sink-ready."""
    d = _with_fingerprint(stream, text_col).withWatermark(ts_col, horizon)
    deduped = (
        d.filter(F.col("fingerprint").isNotNull())
        .dropDuplicatesWithinWatermark(["fingerprint"])
        .select("fingerprint", ts_col, id_col)
    )
    passthrough = d.filter(F.col("fingerprint").isNull()).select(
        "fingerprint", ts_col, id_col
    )
    return deduped.unionByName(passthrough)
