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

__all__ = [
    "binary_metadata",
    "frame_sample",
    "extract_features",
    "decode_stub",
    "resize_stub",
    "META_SCHEMA",
]

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


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic FAKE resize: strided byte resampling to width*height
    bytes (repeat-truncate). Stands in for a real image resizer; the
    signature and the bytes-in/bytes-out contract are what a real codec
    plug-in must satisfy."""
    if width <= 0 or height <= 0:
        raise ValueError("target dimensions must be positive")
    if not payload:
        raise ValueError("cannot resize an empty payload")
    n = width * height
    reps = -(-n // len(payload))
    return (payload * reps)[:n]


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    frame_bytes: int = 256,
    stride: int = 4,
) -> DataFrame:
    """Strided frame sampling over a binary payload (the video
    frame-extraction shape): slice the payload into fixed ``frame_bytes``
    frames and emit every ``stride``-th one as its own row.

    One input row fans out to many output rows inside the Arrow batch; the
    frame bytes stay binary end-to-end. The per-payload slicing loop is the
    inherent codec boundary (a real build replaces it with the decoder's
    frame iterator); everything around it -- schema, batch iteration,
    explode shape -- is the production contract. Output:
    (doc_id long, frame_idx int, frame binary)."""
    import pandas as pd
    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc, p in zip(pdf["doc_id"], pdf[payload_col]):
                p = bytes(p)
                n_frames = (len(p) + frame_bytes - 1) // frame_bytes
                for k in range(0, n_frames, stride):
                    ids.append(doc)
                    idxs.append(k)
                    frames.append(p[k * frame_bytes:(k + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.mapInPandas(_frames, schema=out_schema)


def extract_features(
    df: DataFrame, payload_col: str = "payload", dims: int = 4
) -> DataFrame:
    """Deterministic FAKE feature extraction: an md5-derived ``dims``-float
    vector per payload, standing in for a real encoder (CLIP-style embed).
    The mapInPandas contract -- binary Arrow batch in, fixed-width
    array<double> out -- is exactly what a real model UDF needs; only the
    body is a stub. Output: (doc_id long, features array<double>)."""
    import hashlib

    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                h = hashlib.md5(bytes(p)).hexdigest()
                feats.append(
                    [int(h[8 * i:8 * i + 8], 16) % 100_000 / 100_000.0
                     for i in range(dims)]
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "features": feats}
            )

    return df.mapInPandas(_feats, schema=out_schema)


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
