"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Schema mandated by BASELINE.json input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Generated entirely with Spark expressions (``range`` + hash-seeded
pseudo-randomness), so the same (seed, n_urls) always produces byte-identical
rows on any cluster size and any partitioning -- there is no driver-side
loop and no RNG state. Hot-domain skew is built in on purpose (quadratic
concentration of urls onto low domain ids) to exercise the salting path.

The per-row invariant (BASELINE.json): ``text`` is the byte-stable
extraction of ``html`` -- see :mod:`.extract`; ``pages_table`` materializes
both and tests pin ``extract_text(html) == text`` byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import extract_text_col

__all__ = ["pages_table", "WORD_BANK", "EPOCH_START_MS"]

WORD_BANK = [
    "web", "page", "crawl", "index", "data", "value", "stream", "series",
    "rollup", "merge", "window", "sample", "archive", "signal", "domain",
    "snapshot", "content", "update", "revision", "cache",
]

EPOCH_START_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
_MAX_GAP_MS = 48 * 3_600_000
_MIN_GAP_MS = 60_000
LANGS = ["en", "de", "fr", "es"]


def _h(col, salt: int):
    """Deterministic 63-bit hash of a column + salt (xxhash64 is stable
    across Spark versions and partitionings)."""
    return F.abs(F.xxhash64(col, F.lit(salt)))


def pages_table(
    spark: SparkSession,
    n_urls: int = 50,
    snapshots_per_url: int = 20,
    n_domains: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Build the pages table: ``n_urls`` urls, each with a deterministic
    number of snapshots (snapshots_per_url +- 50%), strictly increasing
    ``warc_ts`` per url (TimestampValidator contract), Zipf-ish domain skew.
    """
    urls = spark.range(n_urls).select(F.col("id").alias("url_id"))
    # quadratic skew: ~sqrt share of urls land on domain 0
    u = (_h(F.col("url_id"), seed) % 1_000_000) / 1_000_000.0
    domain_id = F.floor(u * u * n_domains).cast("long")
    n_snaps = (
        snapshots_per_url / 2 + (_h(F.col("url_id"), seed + 1) % (snapshots_per_url + 1))
    ).cast("int")
    urls = urls.select(
        "url_id",
        F.concat(
            F.lit("https://site"), domain_id, F.lit(".example/p"), F.col("url_id")
        ).alias("url"),
        F.element_at(
            F.array(*[F.lit(lg) for lg in LANGS]),
            (_h(F.col("url_id"), seed + 2) % len(LANGS) + 1).cast("int"),
        ).alias("lang"),
        n_snaps.alias("n_snaps"),
    )
    snaps = urls.select(
        "url_id", "url", "lang",
        F.explode(F.sequence(F.lit(0), F.col("n_snaps") - 1)).alias("k"),
    )
    # strictly increasing per url without a running sum: base grid + jitter
    base_gap = (_MIN_GAP_MS + _MAX_GAP_MS) // 2
    jitter = _h(F.concat(F.col("url_id"), F.lit(":"), F.col("k")), seed + 3) % (
        base_gap - _MIN_GAP_MS
    )
    ts_ms = (
        F.lit(EPOCH_START_MS)
        + _h(F.col("url_id"), seed + 4) % base_gap
        # k is INT (from sequence); widen before the ms-scale multiply or
        # snapshot counts >= ~50 overflow int32 under ANSI mode
        + F.col("k").cast("long") * base_gap
        + jitter
    )
    # deterministic page body: words picked by hash of (url, k, slot)
    words = F.transform(
        F.sequence(F.lit(0), (_h(F.col("url_id"), seed + 5) % 40 + 10).cast("int")),
        lambda s: F.element_at(
            F.array(*[F.lit(w) for w in WORD_BANK]),
            (
                _h(F.concat(F.col("url_id"), F.lit("/"), F.col("k"), F.lit("/"), s), seed + 6)
                % len(WORD_BANK)
                + 1
            ).cast("int"),
        ),
    )
    body = F.concat_ws(" ", words)
    html_str = F.concat(
        F.lit("<html><head><title>"),
        F.col("url"),
        F.lit("</title></head><body><p>"),
        body,
        F.lit("</p></body></html>"),
    )
    df = snaps.select(
        "url",
        F.timestamp_millis(ts_ms).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        "lang",
    )
    return df.withColumn("text", extract_text_col(F.col("html"))).select(
        "url", "warc_ts", "html", "text", "lang"
    )
