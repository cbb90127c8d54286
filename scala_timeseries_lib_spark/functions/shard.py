"""Deterministic corpus sharding and sampling.

Training pipelines need reproducible, engine-independent splits: shard
assignment for parallel downstream jobs, and fixed-percentage samples for
eval/holdout carving. Both use the portable 32-bit md5 prefix of the doc id
(same ``hash32`` as the dedup/text family), so any engine -- Spark today,
DuckDB in the oracle, anything else tomorrow -- reproduces the same split
bit-for-bit. Everything here is a single Catalyst scan; shard statistics
add one hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import hash32

__all__ = ["assign_shards", "shard_stats", "deterministic_sample"]


def _id_hash(id_col: str):
    # hash the DECIMAL STRING of the id: engine-independent and stable
    # across integer widths (hashing raw int64 bytes would not be portable)
    return hash32(F.col(id_col).cast("string"))


def assign_shards(df: DataFrame, n_shards: int, id_col: str = "doc_id") -> DataFrame:
    """Stable shard per row: ``hash32(str(id)) % n_shards``. Rows never move
    between shards when the corpus grows (assignment depends only on the
    id), which is what makes incremental downstream jobs possible."""
    return df.withColumn(
        "shard", F.pmod(_id_hash(id_col), F.lit(n_shards)).cast("int")
    )


def shard_stats(
    df: DataFrame, n_shards: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-shard balance check: doc count and total whitespace tokens.
    One scan + one aggregate on the shard int."""
    toks = F.size(F.split(F.col(text_col), " "))
    return (
        assign_shards(df, n_shards, id_col)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks.cast("long")).alias("n_tokens"),
        )
    )


def deterministic_sample(
    df: DataFrame, rate_bp: int, id_col: str = "doc_id"
) -> DataFrame:
    """Keep rows with ``hash32(str(id)) % 10000 < rate_bp`` (basis points:
    1000 = 10%). Unlike ``df.sample`` this is reproducible across runs,
    engines, and partitionings, and the samples NEST: the 5% sample is a
    subset of the 10% sample, so eval sets can grow without churn."""
    if not 0 <= rate_bp <= 10_000:
        raise ValueError("rate_bp must be in [0, 10000]")
    return df.filter(F.pmod(_id_hash(id_col), F.lit(10_000)) < rate_bp)
