"""Structured Streaming ingestion: the AppendableEntryStream contract
(zio/AppendableEntryStream.scala:8-60) as a stateful streaming operator.

``stream_fit_entries`` turns an unbounded stream of raw observations into a
stream of FINALIZED entries via ``applyInPandasWithState``: the per-series
state is exactly the reference fitter's single pending "last entry"
(TSEntryFitter.scala:14-16) -- the next observation may still trim or
RLE-extend it, so it is withheld until a later row closes it. Late rows
(ts <= pending ts) are dropped, matching the reference's strictly-increasing
contract (TimestampValidator.scala:89-94; the reference throws, a stream
counts-and-drops).

Scale notes: state is one tiny fixed-width row per series key, managed by
Spark's state store (RocksDB-backed on a real cluster), so hundreds of
millions of series are fine; the shuffle is the usual hash on the key.
Restart/exactly-once comes from the streaming checkpoint -- the batch-side
twin of this file (append.py) implements the same semantics for
non-streaming callers with an explicit state table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "stream_fit_entries",
    "stream_rollup",
    "stream_exact_dedup",
    "STATE_SCHEMA",
]


def stream_exact_dedup(
    docs: DataFrame,
    watermark_ms: int,
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup of a document stream: emit each distinct text
    (by md5) once; duplicates arriving within ``watermark_ms`` of the first
    sighting are dropped (``dropDuplicatesWithinWatermark`` -- dedup state
    is evicted once the watermark passes, so state is bounded by the late
    window instead of the corpus). This is the streaming twin of
    ``functions.dedup.exact_dedup``: at-most-once per text inside any
    watermark window, with bounded state at unbounded input.
    """
    from pyspark.sql import functions as F

    ev = docs.withColumn(
        "_event_time", F.timestamp_millis(F.col(ts_col))
    ).withColumn("_text_hash", F.md5(F.col(text_col)))
    return (
        ev.withWatermark("_event_time", f"{watermark_ms} milliseconds")
        .dropDuplicatesWithinWatermark(["_text_hash"])
        .drop("_event_time", "_text_hash")
    )

STATE_SCHEMA = StructType(
    [
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("validity", LongType()),
    ]
)


def stream_rollup(
    entries: DataFrame,
    key_cols: list[str],
    step_ms: int,
    watermark_ms: int,
    origin: int = 0,
) -> DataFrame:
    """Streaming continuous-aggregate rollup: the finest tier's sufficient
    statistics over an unbounded entries stream, 100% built-in Structured
    Streaming (no Python in the pipeline).

    Entries are boundary-split at bucket edges BEFORE the windowed
    aggregation (the same stateless ``sequence``/``explode`` the batch
    rollup uses, so time-weighting is exact), then aggregated per
    (key, tumbling window) with watermark-based state eviction: a bucket
    emits once the watermark passes its end (append mode), rows older than
    the watermark are dropped by the engine, and state is one row per OPEN
    (key, bucket). The emitted rows equal ``rollup_time_weighted`` over the
    in-watermark data (pinned in tests) -- this is the streaming twin of
    the TierPipeline's finest tier; coarser tiers reaggregate its output in
    batch exactly as they do today.

    Output: key_cols + bucket, twmean, vmin, vmax, integral_s, support_ms,
    n_pieces (same schema as rollup_time_weighted).
    """
    from pyspark.sql import functions as F

    from ..operators.series_ops import split_at_buckets

    pieces = split_at_buckets(entries, step_ms, origin)
    ev = pieces.withColumn("event_time", F.timestamp_millis(F.col("ts")))
    wm = ev.withWatermark("event_time", f"{watermark_ms} milliseconds")
    win = F.window(
        F.col("event_time"),
        f"{step_ms} milliseconds",
        startTime=f"{origin % step_ms} milliseconds",
    )
    agg = wm.groupBy(*key_cols, win.alias("win")).agg(
        (F.sum(F.col("value") * F.col("validity")) / F.sum("validity")).alias(
            "twmean"
        ),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        (F.sum(F.col("value") * F.col("validity")) / 1000.0).alias("integral_s"),
        F.sum("validity").alias("support_ms"),
        F.count(F.lit(1)).alias("n_pieces"),
    )
    return agg.select(
        *key_cols,
        F.unix_millis(F.col("win.start")).alias("bucket"),
        "twmean", "vmin", "vmax", "integral_s", "support_ms", "n_pieces",
    )


def stream_fit_entries(
    stream_df: DataFrame,
    key_cols: list[str],
    compress: bool = True,
) -> DataFrame:
    """Fit a stream of raw entries per series; emit finalized entries only.

    ``stream_df`` must be a streaming DataFrame with ``key_cols`` +
    ``ts/value/validity``. Returns a streaming DataFrame of the same shape
    whose rows are final: they can never be trimmed or extended by later
    input. The per-series last entry lives in the state store until a later
    micro-batch closes it.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..kernel.fitter import fit

    key_fields = [stream_df.schema[k] for k in key_cols]
    out_schema = StructType(
        [
            *key_fields,
            StructField("ts", LongType()),
            StructField("value", DoubleType()),
            StructField("validity", LongType()),
        ]
    )

    def _fit_group(key, pdf_iter, state: GroupState):
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        entries = sorted(
            zip(rows["ts"].tolist(), rows["value"].tolist(),
                rows["validity"].tolist())
        )
        if state.exists:
            p_ts, p_val, p_dur = state.get
            # late-data contract: only rows strictly after the pending ts
            entries = [(int(p_ts), float(p_val), int(p_dur))] + [
                e for e in entries if e[0] > p_ts
            ]
        fitted = fit(entries, compress=compress)
        if not fitted:
            yield pd.DataFrame(columns=[f.name for f in out_schema.fields])
            return
        last = fitted[-1]
        state.update((int(last[0]), float(last[1]), int(last[2])))
        final = fitted[:-1]
        out = pd.DataFrame(final, columns=["ts", "value", "validity"])
        for col, val in zip(key_cols, key):
            out.insert(0, col, val)
        yield out[[f.name for f in out_schema.fields]]

    return stream_df.groupBy(*key_cols).applyInPandasWithState(
        _fit_group,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
