"""Gorilla archival blocks table: the GorillaSuperBlock / MultiSeriesBlock
analog (reference archive/GorillaSuperBlock.scala, MultiSeriesBlock.scala).

One row per block: the series key columns plus

- ``block_start_ts`` / ``block_validity`` -- the TSEntry wrapping the block
  (NestedTimeSeries analog, immutable/NestedTimeSeries.scala:114-117)
- ``block_type``  -- 'tuple' | 'sampled' (gorilla.thrift:37-40)
- ``sample_rate`` -- nullable, sampled blocks only
- ``block_bytes`` -- the serialized GorillaBlock (framing
  GorillaBlock.scala:39-48)
- ``n_entries``   -- <= max_entries_per_block (TimeBucketer.scala:24-46)

The reference's superblock footer index (timestamp -> byte offset) maps to
the table's partition/min-max pruning: a time-range read prunes blocks on
``block_start_ts``/``block_validity`` before any decoding happens, and the
decode kernel touches only surviving rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["write_blocks", "read_blocks"]


def write_blocks(
    entries: DataFrame,
    key_cols: list[str],
    bucket_ms: int = 86_400_000,
    max_entries_per_block: int = 1000,
    compress: bool = True,
) -> DataFrame:
    """Encode an entries table into Gorilla blocks, one block per
    (series, time bucket, <=max_entries chunk). Returns the blocks table."""
    import pandas as pd

    from ..kernel.bucket import bucket_entries_maxn, bucket_generator
    from ..kernel.gorilla import compress_tuple_block

    key_fields = [entries.schema[k] for k in key_cols]
    out_schema = StructType(
        [
            *key_fields,
            StructField("block_start_ts", LongType()),
            StructField("block_validity", LongType()),
            StructField("block_type", StringType()),
            StructField("sample_rate", LongType()),
            StructField("block_bytes", BinaryType()),
            StructField("n_entries", IntegerType()),
        ]
    )

    from ._kernel import apply_per_series

    def _encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ents = list(zip(pdf["ts"], pdf["value"], pdf["validity"]))
        origin = int(ents[0][0]) - int(ents[0][0]) % bucket_ms
        blocks = bucket_entries_maxn(
            ents, bucket_generator(origin, bucket_ms), max_entries_per_block
        )
        rows = []
        for bstart, bents, bvalidity in blocks:
            if not bents:
                continue
            rows.append(
                (
                    int(bstart),
                    int(bvalidity),
                    "tuple",
                    None,
                    compress_tuple_block(bents, compress=compress),
                    len(bents),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "block_start_ts",
                "block_validity",
                "block_type",
                "sample_rate",
                "block_bytes",
                "n_entries",
            ],
        )

    return apply_per_series(entries, key_cols, _encode, out_schema)


def read_blocks(
    blocks: DataFrame,
    key_cols: list[str],
    from_ts: int | None = None,
    to_ts: int | None = None,
) -> DataFrame:
    """Decode a blocks table back to entries, pruning blocks by time range
    BEFORE decoding (the superblock-index read path,
    GorillaSuperBlock.scala:53-84)."""
    import pandas as pd

    from ..kernel.gorilla import decompress_sampled_block, decompress_tuple_block

    if from_ts is not None:
        blocks = blocks.filter(
            F.col("block_start_ts") + F.col("block_validity") > from_ts
        )
    if to_ts is not None:
        blocks = blocks.filter(F.col("block_start_ts") < to_ts)

    key_fields = [blocks.schema[k] for k in key_cols]
    out_schema = StructType(
        [
            *key_fields,
            StructField("ts", LongType()),
            StructField("value", DoubleType()),
            StructField("validity", LongType()),
        ]
    )

    def _decode(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                key = tuple(getattr(row, k) for k in key_cols)
                if row.block_type == "sampled":
                    ents = decompress_sampled_block(
                        bytes(row.block_bytes), int(row.sample_rate)
                    )
                else:
                    ents = decompress_tuple_block(bytes(row.block_bytes))
                out.extend((*key, t, v, d) for t, v, d in ents)
            yield pd.DataFrame(
                out, columns=[*key_cols, "ts", "value", "validity"]
            )

    return blocks.mapInPandas(_decode, schema=out_schema)
