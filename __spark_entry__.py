"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship raw->1h retention-tier rollup on sf0.001.
``queries()`` exposes one callable per implemented operator from SURVEY.md
section 2 over the driver testdata; ``oracle_sql()`` gives the equivalent
DuckDB SQL. Column names and rounding are aligned on both sides so the
driver's order-insensitive value-hash comparison holds.

Time-series queries run over the ``events`` table re-expressed as an entries
table: series key = (user_id, event_type), ts = epoch ms, value, and
validity = gap to the next observation capped at 1h (the step-function model
of the reference, TSEntry.scala:17,131,136).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CAP_MS = 3_600_000  # default validity cap (1h)
HOUR = 3_600_000
DAY = 86_400_000
RATE_10M = 600_000
SLICE_LO = 1_704_844_800_000  # 2024-01-10 00:00:00 UTC
SLICE_HI = 1_705_708_800_000  # 2024-01-20 00:00:00 UTC
KEYS = ["user_id", "event_type"]


def _prep(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from scala_timeseries_lib_spark.plans.packaging import ship_package

    ship_package(spark)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scala_timeseries_lib_spark.operators.entries import derive_entries

    _prep(spark)
    return derive_entries(
        _events(spark, sf_dir), KEYS, ts_col="ts", value_col="value",
        default_validity=CAP_MS,
    )


# The same entries derivation in ANSI SQL (DuckDB), shared by all oracles.
ENTRIES_CTE = f"""
WITH dedup AS (
    SELECT user_id, event_type, epoch_ms(ts) AS ts, value,
           row_number() OVER (PARTITION BY user_id, event_type, epoch_ms(ts)
                              ORDER BY value DESC) AS rn
    FROM events
), entries AS (
    SELECT user_id, event_type, ts, value,
           CAST(COALESCE(LEAST(LEAD(ts) OVER w - ts, {CAP_MS}), {CAP_MS}) AS BIGINT)
               AS validity
    FROM dedup
    WHERE rn = 1
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts)
)
"""


# ---------------------------------------------------------------------------
# entry: flagship tier pipeline
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: events -> entries -> 1m tier -> 1h tier
    (reaggregated), per-series hourly time-weighted aggregates."""
    from scala_timeseries_lib_spark.operators import series_ops as ops

    entries = _entries(spark, "/root/testdata/sf0.001")
    tier_1m = ops.rollup_time_weighted(entries, KEYS, 60_000)
    tier_1h = ops.reaggregate_rollup(tier_1m, KEYS, HOUR)
    return tier_1h.select(
        *KEYS, "bucket", "twmean", "vmin", "vmax", "integral_s", "support_ms"
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_entries(spark, sf_dir):
    return _entries(spark, sf_dir)


def _q_slice(spark, sf_dir):
    from scala_timeseries_lib_spark.operators import series_ops as ops

    return ops.slice_series(_entries(spark, sf_dir), SLICE_LO, SLICE_HI)


def _q_fill_locf(spark, sf_dir):
    from scala_timeseries_lib_spark.operators import series_ops as ops

    return ops.fill_gaps_locf(_entries(spark, sf_dir), KEYS)


def _q_step_integral(spark, sf_dir):
    from pyspark.sql import functions as F

    from scala_timeseries_lib_spark.operators import series_ops as ops

    df = ops.step_integral(_entries(spark, sf_dir), KEYS, "ms")
    return df.withColumn("value", F.round("value", 5))


def _q_rollup_1h(spark, sf_dir):
    from scala_timeseries_lib_spark.operators import series_ops as ops

    return ops.rollup_time_weighted(
        _entries(spark, sf_dir), KEYS, HOUR, round_to=5
    ).drop("n_pieces")


def _q_rollup_1d_from_1h(spark, sf_dir):
    from pyspark.sql import functions as F

    from scala_timeseries_lib_spark.operators import series_ops as ops

    tier_1h = ops.rollup_time_weighted(_entries(spark, sf_dir), KEYS, HOUR)
    day = ops.reaggregate_rollup(tier_1h, KEYS, DAY).drop("n_pieces")
    return day.withColumn("twmean", F.round("twmean", 5)).withColumn(
        "integral_s", F.round("integral_s", 5)
    )


def _q_sample_10m(spark, sf_dir):
    from scala_timeseries_lib_spark.operators import series_ops as ops

    return ops.sample_strict_grid(_entries(spark, sf_dir), KEYS, RATE_10M)


def _q_merge_plus(spark, sf_dir):
    from scala_timeseries_lib_spark.operators.merge import merge_series

    entries = _entries(spark, sf_dir)
    a = entries.filter("event_type = 'click'").drop("event_type")
    b = entries.filter("event_type = 'view'").drop("event_type")
    return merge_series(a, b, ["user_id"], op="plus")


def _q_merge_strict_plus(spark, sf_dir):
    from scala_timeseries_lib_spark.operators.merge import merge_series

    entries = _entries(spark, sf_dir)
    a = entries.filter("event_type = 'click'").drop("event_type")
    b = entries.filter("event_type = 'view'").drop("event_type")
    return merge_series(a, b, ["user_id"], op="plus_strict")


def _q_fallback(spark, sf_dir):
    from scala_timeseries_lib_spark.operators.merge import merge_series

    entries = _entries(spark, sf_dir)
    a = entries.filter("event_type = 'click'").drop("event_type")
    b = entries.filter("event_type = 'view'").drop("event_type")
    return merge_series(a, b, ["user_id"], op="fallback")


SLIDE_LO = SLICE_LO
SLIDE_HI = SLICE_LO + 3 * DAY  # 3-day window keeps the grid ~300k rows at sf0.01


def _sampled_filled(spark, sf_dir):
    from scala_timeseries_lib_spark.operators import series_ops as ops

    entries = _entries(spark, sf_dir)
    filled = ops.fill_gaps_locf(entries, KEYS)
    sliced = ops.slice_series(filled, SLIDE_LO, SLIDE_HI)
    return ops.sample_strict_grid(sliced, KEYS, RATE_10M)


def _q_sliding_integral_1h(spark, sf_dir):
    from pyspark.sql import functions as F

    from scala_timeseries_lib_spark.operators.window import sliding_grid_agg

    grid = _sampled_filled(spark, sf_dir)
    out = sliding_grid_agg(grid, KEYS, HOUR, RATE_10M, agg="integral", timeunit="ms")
    return out.withColumn("value", F.round("value", 5))


def _q_sliding_mean_1h(spark, sf_dir):
    from pyspark.sql import functions as F

    from scala_timeseries_lib_spark.operators.window import sliding_grid_agg

    grid = _sampled_filled(spark, sf_dir)
    out = sliding_grid_agg(grid, KEYS, HOUR, RATE_10M, agg="mean", timeunit="ms")
    return out.withColumn("value", F.round("value", 5))


def _q_series_stats(spark, sf_dir):
    from pyspark.sql import functions as F

    from scala_timeseries_lib_spark.operators import series_ops as ops

    return ops.series_stats(_entries(spark, sf_dir), KEYS).withColumn(
        "support_ratio", F.round("support_ratio", 5)
    )


def _q_gorilla_roundtrip(spark, sf_dir):
    """Encode every series into a Gorilla tuple block and decode it back;
    output must equal the entries table (the oracle is the entries SQL)."""
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from scala_timeseries_lib_spark.kernel.gorilla import (
        compress_tuple_block,
        decompress_tuple_block,
    )

    entries = _entries(spark, sf_dir)
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("ts", LongType()),
            StructField("value", DoubleType()),
            StructField("validity", LongType()),
        ]
    )

    def _roundtrip(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort")
        ents = list(zip(pdf["ts"], pdf["value"], pdf["validity"]))
        decoded = decompress_tuple_block(compress_tuple_block(ents, compress=False))
        out = pd.DataFrame(decoded, columns=["ts", "value", "validity"])
        out["user_id"], out["event_type"] = key
        return out[["user_id", "event_type", "ts", "value", "validity"]]

    return entries.groupBy(*KEYS).applyInPandas(_roundtrip, schema=schema)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ts_entries": _q_entries,
        "ts_slice": _q_slice,
        "ts_fill_locf": _q_fill_locf,
        "ts_step_integral": _q_step_integral,
        "ts_rollup_1h": _q_rollup_1h,
        "ts_rollup_1d_from_1h": _q_rollup_1d_from_1h,
        "ts_sample_10m": _q_sample_10m,
        "ts_merge_plus": _q_merge_plus,
        "ts_merge_strict_plus": _q_merge_strict_plus,
        "ts_fallback": _q_fallback,
        "ts_sliding_integral_1h": _q_sliding_integral_1h,
        "ts_sliding_mean_1h": _q_sliding_mean_1h,
        "ts_series_stats": _q_series_stats,
        "ts_gorilla_roundtrip": _q_gorilla_roundtrip,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL over the same parquet views)
# ---------------------------------------------------------------------------

def _merge_sql(op_case: str, where: str = "TRUE") -> str:
    """Boundary-union interval merge in SQL: cut both series at every
    definition change, evaluate per segment, drop undefined segments, then
    RLE-compress equal-valued contiguous runs (gaps-and-islands)."""
    return f"""
{ENTRIES_CTE},
a AS (SELECT user_id, ts, value, validity FROM entries WHERE event_type = 'click'),
b AS (SELECT user_id, ts, value, validity FROM entries WHERE event_type = 'view'),
bounds AS (
    SELECT user_id, p FROM (
        SELECT user_id, ts AS p FROM a
        UNION SELECT user_id, ts + validity FROM a
        UNION SELECT user_id, ts AS p FROM b
        UNION SELECT user_id, ts + validity FROM b
    )
),
segs AS (
    SELECT user_id, p AS lo, LEAD(p) OVER (PARTITION BY user_id ORDER BY p) AS hi
    FROM bounds
),
vals AS (
    SELECT s.user_id, s.lo, s.hi, av.value AS a_val, bv.value AS b_val
    FROM segs s
    LEFT JOIN a av ON av.user_id = s.user_id
        AND s.lo >= av.ts AND s.lo < av.ts + av.validity
    LEFT JOIN b bv ON bv.user_id = s.user_id
        AND s.lo >= bv.ts AND s.lo < bv.ts + bv.validity
    WHERE s.hi IS NOT NULL
),
merged AS (
    SELECT user_id, lo, hi, {op_case} AS value
    FROM vals
    WHERE ({where})
),
islands AS (
    SELECT user_id, lo, hi, value,
           CASE WHEN LAG(hi) OVER w = lo AND LAG(value) OVER w = value
                THEN 0 ELSE 1 END AS brk
    FROM merged
    WINDOW w AS (PARTITION BY user_id ORDER BY lo)
),
grp AS (
    SELECT user_id, lo, hi, value,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY lo) AS island
    FROM islands
)
SELECT user_id, MIN(lo) AS ts, value, CAST(MAX(hi) - MIN(lo) AS BIGINT) AS validity
FROM grp
GROUP BY user_id, island, value
"""


def oracle_sql() -> dict[str, str]:
    entries_select = (
        ENTRIES_CTE + "SELECT user_id, event_type, ts, value, validity FROM entries"
    )
    rollup_pieces = f"""
{ENTRIES_CTE},
pieces AS (
    SELECT user_id, event_type, value, b.bucket AS bucket,
        LEAST(ts + validity, b.bucket + {HOUR}) - GREATEST(ts, b.bucket) AS dur
    FROM entries,
    LATERAL (
        SELECT UNNEST(generate_series(ts - (ts % {HOUR}),
                                      (ts + validity - 1) - ((ts + validity - 1) % {HOUR}),
                                      {HOUR})) AS bucket
    ) b
)
"""
    rollup_1h = (
        rollup_pieces
        + f"""
SELECT user_id, event_type, bucket,
       ROUND(SUM(value * dur) / SUM(dur), 5) AS twmean,
       MIN(value) AS vmin, MAX(value) AS vmax,
       ROUND(SUM(value * dur) / 1000.0, 5) AS integral_s,
       CAST(SUM(dur) AS BIGINT) AS support_ms
FROM pieces GROUP BY user_id, event_type, bucket
"""
    )
    rollup_1d = (
        rollup_pieces
        + f"""
SELECT user_id, event_type, bucket - (bucket % {DAY}) AS bucket,
       ROUND(SUM(value * dur) / SUM(dur), 5) AS twmean,
       MIN(value) AS vmin, MAX(value) AS vmax,
       ROUND(SUM(value * dur) / 1000.0, 5) AS integral_s,
       CAST(SUM(dur) AS BIGINT) AS support_ms
FROM pieces GROUP BY user_id, event_type, bucket - (bucket % {DAY})
"""
    )
    filled_cte = f"""
, filled AS (
    SELECT user_id, event_type, ts, value, validity FROM entries
    UNION ALL
    SELECT user_id, event_type, ts + validity AS ts, value,
           next_ts - (ts + validity) AS validity
    FROM (
        SELECT *, LEAD(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts)
               AS next_ts
        FROM entries
    )
    WHERE next_ts - (ts + validity) > 0
)
"""
    sample_cte = f"""
, sliced AS (
    SELECT user_id, event_type,
           GREATEST(ts, {SLIDE_LO}) AS ts, value,
           LEAST(ts + validity, {SLIDE_HI}) - GREATEST(ts, {SLIDE_LO}) AS validity
    FROM filled
    WHERE ts < {SLIDE_HI} AND ts + validity > {SLIDE_LO}
),
bounds_f AS (
    SELECT user_id, event_type, MIN(ts) AS start, MAX(ts + validity) AS dend
    FROM sliced GROUP BY user_id, event_type
),
grid AS (
    SELECT user_id, event_type,
           UNNEST(generate_series(start, dend - 1, {RATE_10M})) AS p
    FROM bounds_f
),
sampled AS (
    SELECT g.user_id, g.event_type, g.p AS ts, f.value
    FROM grid g
    JOIN sliced f ON f.user_id = g.user_id AND f.event_type = g.event_type
        AND g.p >= f.ts AND g.p < f.ts + f.validity
)
"""
    return {
        "ts_entries": entries_select,
        "ts_slice": ENTRIES_CTE
        + f"""
SELECT user_id, event_type,
       GREATEST(ts, {SLICE_LO}) AS ts, value,
       LEAST(ts + validity, {SLICE_HI}) - GREATEST(ts, {SLICE_LO}) AS validity
FROM entries
WHERE ts < {SLICE_HI} AND ts + validity > {SLICE_LO}
""",
        "ts_fill_locf": ENTRIES_CTE + filled_cte
        + "SELECT user_id, event_type, ts, value, validity FROM filled",
        "ts_step_integral": ENTRIES_CTE
        + """
SELECT user_id, event_type, ts,
       ROUND(SUM(value * validity / 1000.0) OVER (
           PARTITION BY user_id, event_type ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 5) AS value,
       validity
FROM entries
""",
        "ts_rollup_1h": rollup_1h,
        "ts_rollup_1d_from_1h": rollup_1d,
        "ts_sample_10m": ENTRIES_CTE
        + f"""
, bounds_e AS (
    SELECT user_id, event_type, MIN(ts) AS start, MAX(ts + validity) AS dend
    FROM entries GROUP BY user_id, event_type
),
grid AS (
    SELECT user_id, event_type,
           UNNEST(generate_series(start, dend - 1, {RATE_10M})) AS p
    FROM bounds_e
)
SELECT g.user_id, g.event_type, g.p AS ts, e.value,
       CAST({RATE_10M} AS BIGINT) AS validity
FROM grid g
JOIN entries e ON e.user_id = g.user_id AND e.event_type = g.event_type
    AND g.p >= e.ts AND g.p < e.ts + e.validity
""",
        "ts_merge_plus": _merge_sql(
            "CASE WHEN a_val IS NOT NULL AND b_val IS NOT NULL THEN a_val + b_val "
            "WHEN a_val IS NOT NULL THEN a_val ELSE b_val END",
            "a_val IS NOT NULL OR b_val IS NOT NULL",
        ),
        "ts_merge_strict_plus": _merge_sql(
            "a_val + b_val", "a_val IS NOT NULL AND b_val IS NOT NULL"
        ),
        "ts_fallback": _merge_sql(
            "COALESCE(a_val, b_val)", "a_val IS NOT NULL OR b_val IS NOT NULL"
        ),
        "ts_sliding_integral_1h": ENTRIES_CTE + filled_cte + sample_cte
        + f"""
SELECT user_id, event_type, ts,
       ROUND(SUM(value * {RATE_10M} / 1000.0) OVER (
           PARTITION BY user_id, event_type ORDER BY ts
           RANGE BETWEEN {HOUR + RATE_10M - 1} PRECEDING AND CURRENT ROW), 5)
           AS value,
       CAST({RATE_10M} AS BIGINT) AS validity
FROM sampled
""",
        "ts_sliding_mean_1h": ENTRIES_CTE + filled_cte + sample_cte
        + f"""
SELECT user_id, event_type, ts,
       ROUND(SUM(value * {RATE_10M}) OVER w / SUM(CAST({RATE_10M} AS BIGINT)) OVER w, 5)
           AS value,
       CAST({RATE_10M} AS BIGINT) AS validity
FROM sampled
WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts
             RANGE BETWEEN {HOUR + RATE_10M - 1} PRECEDING AND CURRENT ROW)
""",
        "ts_series_stats": ENTRIES_CTE
        + """
SELECT user_id, event_type,
       MIN(ts) AS domain_start, MAX(ts + validity) AS domain_until,
       COUNT(*) AS n_entries, SUM(validity) AS support_ms,
       ROUND(SUM(validity) / CAST(MAX(ts + validity) - MIN(ts) AS DOUBLE), 5)
           AS support_ratio
FROM entries GROUP BY user_id, event_type
""",
        "ts_gorilla_roundtrip": entries_select,
    }
