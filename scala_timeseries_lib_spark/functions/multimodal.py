"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with metadata
extracted by Arrow-batched ``mapInPandas`` kernels. The decode step itself is
STUBBED (``decode_stub``) because no media libraries exist in this
environment -- it is a clearly-marked deterministic fake -- but the Spark
plumbing (schema, batching, partitioning, UDF signature) is real and is what
matters at scale: payload bytes stay in Arrow buffers end-to-end, and the
batch iterator never materializes more than one Arrow batch per worker.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["binary_metadata", "decode_stub", "META_SCHEMA"]

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("head_byte", IntegerType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
    ]
)


def decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic FAKE decode: stands in for an image decoder that is not
    installed here. Real deployments replace this one function; everything
    around it (Arrow batching, schema, partitioning) is production-shaped.

    Raises ``NotImplementedError`` for payloads that would require a real
    codec (here: anything starting with a JPEG/PNG magic byte), making the
    stub boundary explicit.
    """
    if payload[:2] in (b"\xff\xd8", b"\x89P"):
        raise NotImplementedError("real image decoding is stubbed in this build")
    return (len(payload) % 640 + 16, len(payload) % 480 + 16)


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Extract typed metadata from a binary payload column via mapInPandas.

    Input: (doc_id long, payload binary). Output: META_SCHEMA.
    """
    import pandas as pd

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            dims = [decode_stub(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(p) for p in payloads],
                    "head_byte": [p[0] if len(p) else -1 for p in payloads],
                    "fake_width": [d[0] for d in dims],
                    "fake_height": [d[1] for d in dims],
                }
            )

    return df.mapInPandas(_extract, schema=META_SCHEMA)
